package graft

import org.apache.spark.sql.functions._

/** r18b phase probe (guide §1): attribute t_bitext_recall's wall to its
  * phases — IVF assignment pin, widest-probe candidate pin, the three
  * approx arms, and the quadratic exact arm — with a warm pass first
  * (solo protocol). Each phase is timed via the noop sink or the same
  * action the real query runs (localCheckpoint for pins). */
object ProbeBitext {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-probe-bitext")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Bitext, Similarity}
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = Tables.embeddings(spark, sfDir)
    for (pass <- Seq("warm", "timed")) {
      println(s"--- pass $pass ---")
      t("full mineRecall") { noop(Bitext.mineRecall(emb)) }
      val (cells0, cents) = Similarity.ivfIndex(emb, lloydIters = 1, trainSampleMod = 7)
      val cells = t("ivf+cells pin") { cells0.localCheckpoint() }
      val candMax = t("candMax pin") {
        Bitext.candidatesUpTo(cells, cents, 4).localCheckpoint() }
      t("approx arm p=1") { noop(Bitext.armFrom(
        candMax.filter(col("rn") <= 1).drop("rn"), 4, 1030L)) }
      t("approx arm p=4") { noop(Bitext.armFrom(
        candMax.filter(col("rn") <= 4).drop("rn"), 4, 1030L)) }
      t("exact sweep minus approx (mineRecall w/ probes but arms cheap)") {
        noop(Bitext.mineRecall(emb, probes = Seq(1)))
      }
    }
    spark.stop()
  }
}
