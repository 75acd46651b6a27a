package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (local iteration;
    // the driver always runs the full set)
    val only = args.drop(2).headOption.map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that fails to even *build* must not vanish from the round's
    // correctness report (r7 lost 42 queries to silence this way): leave a
    // non-parquet `_ERROR` marker in the query's output dir so any
    // downstream reader of `<out>/<name>` fails loudly as `err`, and
    // collect every failure into an `errors.json` sidecar.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
        // An analysis-time failure happens BEFORE overwrite deletes the
        // prior run's output — clear the dir first so stale parquet from
        // a reused out dir can never verify silently next to the marker
        // (which, underscore-prefixed, parquet globs skip as hidden).
        val qDir = Paths.get(outDir, name)
        if (Files.exists(qDir)) {
          import scala.jdk.CollectionConverters._
          Files.walk(qDir).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
        }
        Files.createDirectories(qDir)
        Files.writeString(qDir.resolve("_ERROR"), failed(name))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
  }
}
