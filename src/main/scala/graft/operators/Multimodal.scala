package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row (stub decode — see [[Multimodal.decodeMeta]]). */
final case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long)

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decode / feature-extract / frame-sample as partition-batched
  * operators.
  *
  * The real image/audio codecs are NOT in this container, so the decode
  * kernel is a clearly-marked deterministic STUB (a pure function of the
  * bytes). Everything around it — the binary column, the schema, the
  * `mapPartitions` batch shape (one decoder instance per partition, rows
  * streamed through it), the downstream explode — is the real production
  * plumbing and is tested. Swapping the stub for e.g. a JNI JPEG decoder
  * changes no plan shape.
  */
object Multimodal {

  /** Attach the opaque media bytes (here derived from text — stands in for
    * a real `binary` parquet column) plus typed metadata. */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      col("source").as("media_source"))

  /** STUB decode kernel: metadata as a pure function of the byte array.
    * A real decoder would parse the container header here. */
  private def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpg"
      case _ => "webp"
    }
    MediaMeta(id, format, 64 + (n % 256).toInt, 64 + (7 * n % 256).toInt, n)
  }

  /** Decode pass: `mapPartitions` so a per-partition decoder instance
    * amortizes across the batch (the Scala analog of `mapInPandas` —
    * same batch shape, same schema contract). Narrow, no shuffle. */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder context per partition would be initialized here
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** Frame sampling: each media row explodes into `1 + n_bytes % 5` frames
    * with evenly spaced timestamps over a nominal 1s clip. Pure column
    * ops over the decode output — the plan Spark would run for real video. */
  def sampleFrames(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeMeta(docs).toDF()
      .withColumn("n_frames", (col("n_bytes") % 5 + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("frame_idx", "f")))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 1000L / col("n_frames")).cast("long").as("frame_ts_ms"))
  }
}
