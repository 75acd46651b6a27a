package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One tracker element's placement after splitting: element `idx` of
  * request `event_id` lands in sub-batch `batch_idx` (-1 = irreducible,
  * becomes a SizeViolation bad row). */
final case class PackedElement(event_id: Long, idx: Int, batch_idx: Int)

/** One event's sink-path routing decision (the reference's
  * `EventSerializeResult` summarized): `disposition` good | split | bad,
  * `n_good` wire records emitted, `n_bad` bad rows, `reason` the stable
  * prefix of the reference's error message (null when none). */
final case class WireRoute(
    event_id: Long, disposition: String, n_good: Int, n_bad: Int, reason: String)

/** One bad row the bad sink actually receives, pre-envelope (reference
  * `SplitBatch.oversizedPayload`): `actual_size` is the failed ELEMENT's
  * serialized size on the split path but the WHOLE event's wire size on
  * the unsplittable branches, `payload_prefix` is maxBytes/10 chars of the
  * whole event's thrift `toString()` on every branch. */
final case class BadRowFields(
    event_id: Long, timestamp_ms: Long, reason: String,
    actual_size: Long, payload_prefix: String)

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

  /** The reference's FULL `splitAndSerializePayload` decision tree
    * (`core/.../utils/SplitBatch.scala:81-113`) per payload, summarized as
    * one [[WireRoute]] row:
    *  - serialized size < maxBytes → good, 1 wire record;
    *  - oversized GET (no body) → 1 SizeViolation;
    *  - oversized POST: parse the self-describing body (real Jackson
    *    parse), strip `data`, re-check the stripped event, greedy-pack the
    *    elements into sub-batches under the reference's adjusted budget
    *    (`maxBytes − wholeBytes + dataBytes`), elements that can't fit
    *    alone → SizeViolation each;
    *  - unparseable / non-self-describing / no-array bodies → 1
    *    SizeViolation with the reference's message prefix (exception
    *    detail suffix omitted — deterministic subset).
    * [[CollectorPipeline.badRows]] stays the flat pre-split size gate
    * (its byte-exact golden is the no-split path); this operator is the
    * split-aware disposition the sink actually acts on. Same typed
    * mapPartitions shape as [[ThriftPayload.encode]]. */
  def routeWire(payloads: DataFrame, maxBytes: Int): Dataset[WireRoute] = {
    val spark = payloads.sparkSession
    implicit val enc0 = org.apache.spark.sql.Encoders.product[WireRoute]
    Spread(payloads)
      .select(
        col("event_id"), col("schema_uri"), col("ip"),
        col("timestamp_ms"), col("encoding"), col("collector"), col("user_agent"),
        col("referer_uri"), col("path"), col("querystring"), col("body"),
        col("headers"), col("content_type"),
        col("hostname"), col("network_userid"))
      .mapPartitions { it =>
        val ser = new ThriftPayload.Serializer
        val mapper = new ObjectMapper
        val UTF8 = java.nio.charset.StandardCharsets.UTF_8
        it.map { r =>
          def s(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
          val rec = PayloadRecord(
            s(1), s(2), r.getLong(3), s(4), s(5), s(6), s(7), s(8), s(9),
            s(10), if (r.isNullAt(11)) null else r.getSeq[String](11),
            s(12), s(13), s(14))
          val id = r.getLong(0)
          val whole = ser(rec).length
          def bad(reason: String) = WireRoute(id, "bad", 0, 1, reason)
          if (whole < maxBytes) WireRoute(id, "good", 1, 0, null)
          else if (rec.body == null) bad("GET requests cannot be split")
          else {
            val root = try mapper.readTree(rec.body) catch { case _: Exception => null }
            if (root == null) bad("cannot split POST requests which are not json")
            else {
              val schema = root.get("schema")
              val data = root.get("data")
              if (schema == null || !schema.isTextual || data == null)
                bad("cannot split POST requests which are not self-describing")
              else if (!data.isArray)
                bad("cannot split POST requests which do not contain a data array")
              else {
                val elems = (0 until data.size).map(i => mapper.writeValueAsString(data.get(i)))
                val dataBytes = elems.mkString("[", ",", "]").getBytes(UTF8).length
                if (whole - dataBytes >= maxBytes)
                  bad("cannot split this POST request because event without \"data\" field is still too big")
                else {
                  val budget = (maxBytes - whole + dataBytes).toLong
                  val assigned = pack(
                    elems.map(_.getBytes(UTF8).length.toLong).toIndexedSeq,
                    base = 0L, join = 1L, max = budget)
                  val nBad = assigned.count(_ == -1)
                  val nGood = assigned.filter(_ >= 0).distinct.size
                  WireRoute(id, if (nGood > 0) "split" else "bad", nGood, nBad,
                    if (nBad > 0) "this POST request split is still too large" else null)
                }
              }
            }
          }
        }
      }
  }

  /** The bad-row STREAM (vs [[routeWire]]'s per-event summary): one output
    * row per bad row the reference's bad sink would receive
    * (`core/.../utils/SplitBatch.scala:81-145`). Unsplittable events emit
    * one row carrying the whole event's wire size and the branch's fold
    * message; a split whose elements are irreducibly large emits one row
    * PER failed element carrying that element's serialized size and
    * "this POST request split is still too large". Every row keeps
    * maxBytes/10 chars of the whole event's thrift toString() — the
    * reference's debugging truncation. Same embarrassingly-parallel typed
    * mapPartitions shape as [[routeWire]]; flatMap, no shuffle. */
  def badRowFields(payloads: DataFrame, maxBytes: Int): Dataset[BadRowFields] = {
    val spark = payloads.sparkSession
    implicit val enc0 = org.apache.spark.sql.Encoders.product[BadRowFields]
    Spread(payloads)
      .select(
        col("event_id"), col("schema_uri"), col("ip"),
        col("timestamp_ms"), col("encoding"), col("collector"), col("user_agent"),
        col("referer_uri"), col("path"), col("querystring"), col("body"),
        col("headers"), col("content_type"),
        col("hostname"), col("network_userid"))
      .mapPartitions { it =>
        val ser = new ThriftPayload.Serializer
        val mapper = new ObjectMapper
        val UTF8 = java.nio.charset.StandardCharsets.UTF_8
        it.flatMap { r =>
          def s(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
          val rec = PayloadRecord(
            s(1), s(2), r.getLong(3), s(4), s(5), s(6), s(7), s(8), s(9),
            s(10), if (r.isNullAt(11)) null else r.getSeq[String](11),
            s(12), s(13), s(14))
          val id = r.getLong(0)
          val ts = r.getLong(3)
          val whole = ser(rec).length
          lazy val prefix = ThriftPayload.toStringRepr(rec).take(maxBytes / 10)
          def one(reason: String, size: Long) =
            List(BadRowFields(id, ts, reason, size, prefix))
          if (whole < maxBytes) Nil
          else if (rec.body == null) one("GET requests cannot be split", whole.toLong)
          else {
            val root = try mapper.readTree(rec.body) catch { case _: Exception => null }
            if (root == null) one("cannot split POST requests which are not json", whole.toLong)
            else {
              val schema = root.get("schema")
              val data = root.get("data")
              if (schema == null || !schema.isTextual || data == null)
                one("cannot split POST requests which are not self-describing", whole.toLong)
              else if (!data.isArray)
                one("cannot split POST requests which do not contain a data array", whole.toLong)
              else {
                val elems = (0 until data.size).map(i => mapper.writeValueAsString(data.get(i)))
                val dataBytes = elems.mkString("[", ",", "]").getBytes(UTF8).length
                if (whole - dataBytes >= maxBytes)
                  one("cannot split this POST request because event without \"data\" field is still too big", whole.toLong)
                else {
                  val sizes = elems.map(_.getBytes(UTF8).length.toLong).toIndexedSeq
                  val budget = (maxBytes - whole + dataBytes).toLong
                  pack(sizes, base = 0L, join = 1L, max = budget)
                    .zipWithIndex
                    .collect { case (-1, i) =>
                      BadRowFields(id, ts, "this POST request split is still too large",
                        sizes(i), prefix)
                    }
                }
              }
            }
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
