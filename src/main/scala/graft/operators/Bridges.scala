package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bridge transforms (reference P10-P13): vendor-specific request bodies →
  * per-event rows, via real JSON parsing (`from_json` + `posexplode`) —
  * codegen'd built-ins, no UDFs, no shuffle (narrow projections).
  *
  * Reference: Amplitude bridge `core/.../AmplitudeBridge.scala:183-232`
  * ($remote at :195-200, batch shape :44-54); tp2 self-describing body
  * `core/.../utils/SplitBatch.scala:115-122`.
  */
object Bridges {

  /** Schema of a tp2 self-describing `payload_data` body. */
  val Tp2BodySchema: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("e", StringType),
      StructField("aid", StringType),
      StructField("idx", IntegerType),
      StructField("p", StructType(Seq(StructField("k", LongType))))))))))

  /** Schema of an Amplitude batch body `{api_key, events:[...]}`. */
  val AmplitudeBodySchema: StructType = StructType(Seq(
    StructField("api_key", StringType),
    StructField("events", ArrayType(StructType(Seq(
      StructField("device_id", StringType),
      StructField("event_type", StringType),
      StructField("time", LongType),
      StructField("ip", StringType)))))))

  /** P13-analog for tp2: explode the self-describing body's `data[]` into
    * one row per tracker event. POST rows with a payload_data body only. */
  def tp2Events(env: DataFrame): DataFrame =
    env
      .filter(col("method") === "POST" &&
        col("body").startsWith("{\"schema\":\"iglu:com.snowplowanalytics.snowplow/payload_data/"))
      .withColumn("parsed", from_json(col("body"), Tp2BodySchema))
      .select(col("event_id"), posexplode(col("parsed.data")).as(Seq("idx", "ev")))
      .select(
        col("event_id"),
        col("idx"),
        col("ev.e").as("e"),
        col("ev.aid").as("aid"),
        col("ev.p.k").as("k"))

  /** P11-P13: Amplitude batch → per-event rows with the `$remote` IP
    * substitution (P12). `events_ingested` for the bridge response is just
    * `count(*)` grouped by request. */
  def amplitudeEvents(env: DataFrame): DataFrame =
    env
      .filter(CollectorPipeline.isAmplitude)
      .withColumn("parsed", from_json(col("body"), AmplitudeBodySchema))
      .select(
        col("event_id"), col("remote_ip"),
        posexplode(col("parsed.events")).as(Seq("idx", "ev")))
      .select(
        col("event_id"),
        col("idx"),
        col("ev.device_id").as("device_id"),
        col("ev.event_type").as("amp_event_type"),
        col("ev.time").as("dtm"),
        when(col("ev.ip") === "$remote", coalesce(col("remote_ip"), lit("unknown")))
          .otherwise(col("ev.ip")).as("ip_resolved"))
}
