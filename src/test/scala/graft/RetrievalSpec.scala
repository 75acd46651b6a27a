package graft

import graft.operators.Retrieval
import org.scalatest.funsuite.AnyFunSuite

/** BM25 exact-integer scoring: goldens hand-derived from the milli-unit
  * formulas in Retrieval.scala (floor division at every step), plus the
  * deterministic tie-break and OOV-term behavior the oracle relies on. */
class RetrievalSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // N=3, total_tok=8, avgdl_milli = 8000//3 = 2666
  // df: rare=1 → odds=5000//3=1666; common=3 → odds=1000//7=142
  // dl=3 → dlr=3000000//2666=1125, den=1000·tf+300+1012=1000·tf+1312
  // dl=2 → dlr=2000000//2666=750,  den=1000·tf+300+675 =1000·tf+975
  private val docs = Seq(
    (1L, "rare common common"),
    (2L, "common common common"),
    (3L, "common other")).toDF("doc_id", "text")

  test("hand-computed milli-scores, ranking, and hit counts") {
    // doc1: rare tf=1 sat=2200000//2312=951 → (1666·951)//1000=1584
    //       common tf=2 sat=4400000//3312=1328 → (142·1328)//1000=188
    // doc2: common tf=3 sat=6600000//4312=1530 → (142·1530)//1000=217
    // doc3: common tf=1 sat=2200000//1975=1113 → (142·1113)//1000=158
    val out = Retrieval.bm25TopK(docs, Seq(1 -> "rare common"), 3)
      .as[(Int, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq === Seq(
      (1, 1, 1L, 1772L, 2L),
      (1, 2, 2L, 217L, 1L),
      (1, 3, 3L, 158L, 1L)))
  }

  test("OOV query terms score nothing; matched terms still rank") {
    val out = Retrieval.bm25TopK(docs, Seq(7 -> "zzz rare"), 3)
      .as[(Int, Int, Long, Long, Long)].collect()
    // only doc1 contains 'rare'; zzz matches no corpus row at all
    assert(out.toSeq === Seq((7, 1, 1L, 1584L, 1L)))
  }

  test("score ties break on doc_id ascending (stable ranks)") {
    val twins = Seq((10L, "tie tie"), (11L, "tie tie"), (12L, "pad"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(twins, Seq(1 -> "tie"), 2)
      .as[(Int, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3)).toSeq === Seq((1, 10L), (2, 11L)))
    assert(out(0)._4 === out(1)._4) // genuinely tied scores
  }

  test("duplicate query terms collapse: 'rare rare' scores like 'rare'") {
    val once = Retrieval.bm25TopK(docs, Seq(1 -> "rare"), 3).collect()
    val twice = Retrieval.bm25TopK(docs, Seq(1 -> "rare rare"), 3).collect()
    assert(once.map(_.toSeq).toSet === twice.map(_.toSeq).toSet)
  }

  test("hybrid RRF: both legs contribute and dual-leg hits outrank single-leg ties") {
    import graft.operators.Hybrid
    import org.apache.spark.sql.functions._
    val docsT = Tables.documents(spark, TestSpark.Sf)
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    val fused = Hybrid.hybridTopK(docsT, emb, dfCap = 400).cache()
    // every query yields exactly k rows with dense ranks 1..k
    val perQ = fused.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5 || col("mn") =!= 1).count() === 0)
    // both legs surface in the fused top-k somewhere
    assert(fused.filter(col("rank_lex").isNotNull).count() > 0)
    assert(fused.filter(col("rank_vec").isNotNull).count() > 0)
    // RRF algebra: rrf_milli == contributions recomputed from the ranks
    val bad = fused.withColumn("expect",
        coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_vec)"), lit(0L)))
      .filter(col("expect") =!= col("rrf_milli"))
    assert(bad.count() === 0)
    // dominance: an id on BOTH legs at rank r beats any single-leg id
    // whose sole rank is also r (1/(60+r) + something > 1/(60+r))
    val dual = fused.filter(col("rank_lex").isNotNull && col("rank_vec").isNotNull)
    val single = fused.filter(col("rank_lex").isNull || col("rank_vec").isNull)
    val viol = dual.alias("d").join(single.alias("s"),
      col("d.query_id") === col("s.query_id") &&
        coalesce(col("s.rank_lex"), col("s.rank_vec")) ===
          least(col("d.rank_lex"), col("d.rank_vec")) &&
        col("d.rank") > col("s.rank"))
    assert(viol.count() === 0)
  }
}
