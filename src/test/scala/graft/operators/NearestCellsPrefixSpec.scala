package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R17 (optimization round): [[Bitext.mineRecall]]'s nprobe sweep now
  * computes ONE candidate join at the widest probe setting and derives
  * each arm by `filter(rn <= p)` — sound only if
  * [[Similarity.nearestCells]]' top-p cells are a PREFIX of its top-q
  * cells for p ≤ q. They are, because the cells sort by a deterministic
  * total order (score, then cell label, via array_sort over structs);
  * this spec pins that invariant on the real embedding fixture so a
  * future ordering change cannot silently turn the shared-candidate
  * sweep into a different query. */
class NearestCellsPrefixSpec extends AnyFunSuite with graft.WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearestCells top-p is a rank-exact prefix of top-q (p <= q)") {
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    val (cells, cents) = Similarity.ivfIndex(emb, lloydIters = 1, trainSampleMod = 7)
    val corpus = cells.select(col("vec_id"), col("q"), col("n2"))
    def ranked(n: Int) = Similarity.nearestCells(corpus, cents, n)
      .select(col("vec_id").cast("long"), col("cell").cast("long"),
        col("rn").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    val top2 = ranked(2)
    val top4 = ranked(4)
    assert(top2.nonEmpty)
    assert(top4.filter(_._3 <= 2) === top2,
      "filter(rn <= 2) of the widest probe relation must BE the nprobe=2 relation")
    // r18 (advisor): pin the invariant across the ACTUAL production
    // sweep (t_bitext_recall / d_sem_recall probe nprobe ∈ {1, 2, 4}),
    // every p <= q pair — cheap on the same ranked relations
    val probes = Seq(1, 2, 4)
    val byProbe = probes.map(p => p -> (if (p == 2) top2 else if (p == 4) top4 else ranked(p))).toMap
    for (p <- probes; q <- probes if p < q) {
      assert(byProbe(q).filter(_._3 <= p) === byProbe(p),
        s"filter(rn <= $p) of the nprobe=$q relation must BE the nprobe=$p relation")
    }
  }
}
