package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One tracker element's placement after splitting: element `idx` of
  * request `event_id` lands in sub-batch `batch_idx` (-1 = irreducible,
  * becomes a SizeViolation bad row). */
final case class PackedElement(event_id: Long, idx: Int, batch_idx: Int)

/** Greedy size-capped batch splitting (reference A1/A2:
  * `core/.../utils/SplitBatch.scala:40-74` greedy packer, `:81-113`
  * envelope re-pack). Order-sensitive and stateful per request, so it is a
  * typed `mapPartitions` — the one operator in the collector surface that
  * genuinely isn't a relational expression (SURVEY §2.4). Per-request work
  * is independent → embarrassingly parallel, no shuffle, scales linearly.
  */
object SplitBatch {

  /** Greedy pack: assign each element (by serialized size) to the first
    * batch with room. A batch costs `base` (envelope) + element sizes +
    * `join` bytes between consecutive elements. Elements that cannot fit
    * even alone (`base + size > max`) get batch -1 and do not disturb the
    * running batch (reference: oversized single events → SizeViolation).
    *
    * Invariants (property-tested): every batch ≤ max; element order
    * preserved; batch indices dense ascending.
    */
  def pack(sizes: IndexedSeq[Long], base: Long, join: Long, max: Long): IndexedSeq[Int] = {
    var batch = 0
    var used = base
    var empty = true
    sizes.map { s =>
      if (base + s > max) -1
      else {
        val cost = s + (if (empty) 0L else join)
        if (used + cost <= max) { used += cost; empty = false; batch }
        else {
          if (!empty) batch += 1
          used = base + s; empty = false; batch
        }
      }
    }
  }

  /** A4: sink-side re-chunk with BOTH a byte cap and a record-count cap
    * (the SQS shape: ≤10 messages per sendMessageBatch, ≤ bytes —
    * reference `KinesisSink.scala:545-572`). Same greedy order-preserving
    * contract as [[pack]]. */
  def packWithCount(
      sizes: IndexedSeq[Long], base: Long, join: Long,
      max: Long, maxCount: Int): IndexedSeq[Int] = {
    var batch = 0
    var used = base
    var n = 0
    sizes.map { s =>
      if (base + s > max) -1
      else {
        val cost = s + (if (n == 0) 0L else join)
        if (n < maxCount && used + cost <= max) { used += cost; n += 1; batch }
        else {
          if (n > 0) batch += 1
          used = base + s; n = 1; batch
        }
      }
    }
  }

  /** Split tp2 self-describing bodies: parse JSON for real (Jackson — one
    * ObjectMapper per partition, the Spark analog of the reference's
    * thread-local TSerializer), measure each `data[]` element re-serialized,
    * and greedy-pack into envelope copies of ≤ maxBytes. */
  def splitTp2(env: DataFrame, maxBytes: Int): Dataset[PackedElement] = {
    val spark = env.sparkSession
    import spark.implicits._
    env
      .filter(col("method") === "POST" &&
        col("body").startsWith("{\"schema\":\"iglu:com.snowplowanalytics.snowplow/payload_data/"))
      .select(col("event_id"), col("body"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val mapper = new ObjectMapper
        it.flatMap { case (id, body) =>
          val root = mapper.readTree(body)
          val uri = root.get("schema").asText
          val data = root.get("data")
          val sizes = (0 until data.size).map(i =>
            mapper.writeValueAsString(data.get(i)).getBytes("UTF-8").length.toLong)
          val base = s"""{"schema":"$uri","data":[]}""".getBytes("UTF-8").length.toLong
          pack(sizes, base, join = 1, max = maxBytes.toLong)
            .zipWithIndex
            .map { case (b, i) => PackedElement(id, i, b) }
        }
      }
  }
}
