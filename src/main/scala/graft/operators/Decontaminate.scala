package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/eval overlap check every
  * LLM-scale pipeline runs before shipping a corpus: a training-split
  * document is contaminated when it shares any word k-shingle with a
  * held-out (val/test) document, because the eval metric stops measuring
  * generalization the moment its n-grams leak into training.
  *
  * Scale stance (100 TB): shingles are md5-hashed to fixed-width keys and
  * the held-out shingle set is distinct-reduced before the semi join, so
  * the corpus never meets itself all-pairs — everything meets on the
  * shingle-hash key. In production the held-out side is a benchmark suite
  * (tiny next to the corpus), so AQE resolves the semi join to a
  * broadcast at any corpus size; with a corpus-sized held-out split both
  * sides shuffle on the hash. Split assignment reuses
  * [[Sampling.split]] — the same pure-function-of-doc_id contract that
  * keeps eval membership stable as the corpus grows.
  */
object Decontaminate {

  /** Per training doc (≥ k tokens): the number of its distinct k-shingles
    * that appear in ANY held-out doc, and the contamination flag. */
  def contamination(docs: DataFrame, trainUpto: Int, valUpto: Int, salt: String,
      k: Int = 3): DataFrame = {
    val tok = Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .withColumn("split", Sampling.splitLabel(trainUpto, valUpto, salt))
    val sh = tok
      .select(col("doc_id"), col("split"),
        explode(array_distinct(TextOps.shinglesOfTokens(col("toks"), k))).as("shingle"))
      .withColumn("shash", md5(col("shingle")))
    val held = sh.filter(col("split") =!= "train").select("shash").distinct()
    val shared = sh.filter(col("split") === "train")
      .join(held, Seq("shash"), "left_semi")
      // per-doc shingles are already distinct (array_distinct above), so
      // the count IS the distinct overlapping-shingle count
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    tok.filter(col("split") === "train").select("doc_id")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }
}
