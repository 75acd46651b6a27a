package graft

import graft.operators.{Multimodal, Similarity}
import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embOf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine: identical vectors score 1, orthogonal score 0") {
    val d = embOf(
      (0L, Seq(1f, 0f, 2f)),
      (97L, Seq(1f, 0f, 2f)),   // query (97 % 97 == 0), identical to 0
      (2L, Seq(0f, 5f, 0f)))    // orthogonal
    val top = Similarity.bruteTopK(d, 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(top.map(_._1).forall(Set(0L, 97L)))
    val forQ = top.filter(_._1 == 97L)
    assert(forQ.head._3 === 0L)
    assert(forQ.head._4 === 1.0)
    assert(forQ.last._4 === 0.0)
  }

  test("bucketed top-k only meets same-sign-bucket candidates") {
    val d = embOf(
      (1L, Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (97L, Seq(2f, 2f, 2f, 2f, 2f, 2f, 2f, 2f)),    // query, same bucket as 1
      (5L, Seq(-1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)))    // different bucket
    val got = Similarity.bucketedTopK(d, 3).as[(Long, Int, Long, Double)].collect()
    assert(got.map(_._3).toSet === Set(1L))
    assert(got.head._4 >= 0.999999) // trunc-6 of a parallel pair

  }

  test("near-dup pairs surface high-cosine same-bucket pairs only") {
    val d = embOf(
      (1L, Seq(1f, 2f, 3f, 4f, 1f, 1f, 1f, 1f)),
      (2L, Seq(1.001f, 2.001f, 3.001f, 4.001f, 1f, 1f, 1f, 1f)),
      (3L, Seq(-4f, 3f, -2f, 1f, 1f, 1f, 1f, 1f)))
    val pairs = Similarity.cosineNearDups(d, 0.95).as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 > 0.999)
  }

  test("brute top-k on real embeddings: ranks dense, cos within [-1,1], self excluded") {
    val out = Similarity.bruteTopK(Tables.embeddings(spark, TestSpark.Sf), 5)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, _, c, cos) => q != c && cos <= 1.0 && cos >= -1.0 })
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1 to rows.length))
      // ranks ordered by non-increasing cosine
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("multimodal decode + frame sampling plumbing") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val meta = Multimodal.decodeMeta(docs).collect()
    assert(meta.length === docs.count())
    assert(meta.forall(m => Set("png", "jpg", "webp")(m.format)))
    assert(meta.forall(m => m.width >= 64 && m.width < 320))
    val frames = Multimodal.sampleFrames(docs)
    val counts = frames.groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(counts.forall { case (_, n) => n >= 1 && n <= 5 })
    assert(frames.filter(col("frame_ts_ms") >= 1000 || col("frame_ts_ms") < 0).count() === 0)
  }
}
