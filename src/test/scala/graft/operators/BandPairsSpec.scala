package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R17 (optimization round): the carry-payload band self-join that the
  * hamming retrievals (simhash 16/64, dHash/pHash/audio-fp) now ride —
  * each doc's code travels WITH its band rows through the one band
  * exchange instead of being re-derived and joined back per pair side.
  * This pins the primitive against the join-back formulation it
  * replaced: identical pair set, and the carried (pa, pb) are exactly
  * the per-doc payloads — including the occupancy-cap path and the
  * multi-band pair dedup path. */
class BandPairsSpec extends AnyFunSuite with graft.WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("carry-payload band pairs equal the join-back attach, with cap and " +
    "multi-band dedup") {
    val rows = Seq(
      // band X: three docs (pairs survive, payloads attach per doc)
      (1L, "X", 101L), (2L, "X", 102L), (3L, "X", 103L),
      // bands Y and Z shared by the SAME pair (multi-band dedup: one row)
      (4L, "Y", 104L), (5L, "Y", 105L), (4L, "Z", 104L), (5L, "Z", 105L),
      // band H: over the cap -> contributes nothing
      (6L, "H", 106L), (7L, "H", 107L), (8L, "H", 108L), (9L, "H", 109L))
      .toDF("doc_id", "band", "code")
    val carried = Dedup.pairsWithinBucketsCarrying(rows, "band", "code", maxBucket = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    val attach = rows.select("doc_id", "code").distinct()
    val wanted = Dedup.pairsWithinBuckets(rows.select("doc_id", "band"), "band", maxBucket = 3)
      .join(attach.select(col("doc_id").as("doc_a"), col("code").as("pa")), "doc_a")
      .join(attach.select(col("doc_id").as("doc_b"), col("code").as("pb")), "doc_b")
      .select("doc_a", "doc_b", "pa", "pb")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(carried === wanted)
    assert(carried === Set((1L, 2L, 101L, 102L), (1L, 3L, 101L, 103L),
      (2L, 3L, 102L, 103L), (4L, 5L, 104L, 105L)))
  }
}
