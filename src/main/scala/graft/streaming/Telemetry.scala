package graft.streaming

import graft.operators.{CollectorConfig, SinkSettings}

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

/** R7: telemetry heartbeat — the reference POSTs a self-describing
  * `oss_context` event every 60 min from a scheduled actor
  * (`telemetry/TelemetryAkkaService.scala:52-102`, payload
  * `telemetry/package.scala:40-61`). Engine analog: a driver-side
  * scheduler building the same self-describing JSON; the transport (an
  * HTTP POST) is injected so the dataflow stays testable and the feature
  * stays optional (off unless scheduled). */
object Telemetry {

  val SchemaUri = "iglu:com.snowplowanalytics.oss/oss_context/jsonschema/1-0-1"

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Sink-derived cloud vendor + deployment region, the reference's
    * detection exactly (`telemetry/TelemetryAkkaService.scala:119-124`):
    * Kinesis/SQS → AWS with the sink's region, PubSub → GCP (no region),
    * anything else → neither. Wire form is the uppercase vendor name
    * (`telemetry/CloudVendor.scala:27` encoder). */
  def detectCloud(sink: SinkSettings): (Option[String], Option[String]) =
    sink.kind match {
      case "kinesis" | "sqs"           => (Some("AWS"), sink.region)
      case "google-pub-sub" | "pubsub" => (Some("GCP"), None)
      case _                           => (None, None)
    }

  /** The self-describing heartbeat payload
    * (`telemetry/TelemetryPayload.scala:18-29` field set; absent
    * options are skipped like circe's `dropNullValues`). */
  def heartbeatPayload(
      cfg: CollectorConfig,
      userProvidedId: Option[String],
      region: Option[String],
      cloud: Option[String] = None): String = {
    val fields = Seq(
      "userProvidedId" -> userProvidedId,
      "region" -> region,
      "cloud" -> cloud,
      "appGeneratedId" -> Some(java.util.UUID.nameUUIDFromBytes(
        cfg.collectorName.getBytes("UTF-8")).toString),
      "applicationName" -> Some(cfg.appName),
      "applicationVersion" -> Some(cfg.appVersion),
    ).collect { case (k, Some(v)) => s"${q(k)}: ${q(v)}" }
    s"""{"schema": ${q(SchemaUri)}, "data": {${fields.mkString(", ")}}}"""
  }

  /** Heartbeat with cloud/region auto-detected from the configured sink —
    * the analog of the reference's `initWithCollector`. */
  def heartbeatForConfig(cfg: CollectorConfig, userProvidedId: Option[String] = None): String = {
    val (cloud, region) = detectCloud(cfg.sink)
    heartbeatPayload(cfg, userProvidedId, region, cloud)
  }

  /** Schedule `send` every `intervalMinutes` on a daemon thread. Returns
    * the future for cancellation (graceful shutdown, R6). */
  def schedule(
      cfg: CollectorConfig,
      intervalMinutes: Long,
      send: String => Unit): ScheduledFuture[_] = {
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-telemetry"); t.setDaemon(true); t
    }
    val payload = heartbeatForConfig(cfg)
    exec.scheduleAtFixedRate(() => send(payload),
      0, intervalMinutes, TimeUnit.MINUTES)
  }

  // ---- R10: the real wire transport ------------------------------------

  /** The tracker-protocol POST body the reference's scala-tracker emits
    * (`TelemetryAkkaService.scala:88-101`: `trackSelfDescribingEvent` via
    * a SyncEmitter): a `payload_data` envelope whose single event is an
    * unstruct (`e=ue`) wrapping the heartbeat, with the tracker namespace
    * `tna=telemetry` and `aid=<appName>` exactly as the reference
    * constructs its Tracker. `ue_pr` is the JSON-escaped unstruct_event
    * envelope (the tracker's non-base64 wire spelling). */
  val PayloadDataSchemaUri =
    "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4"
  val UnstructSchemaUri =
    "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"

  def trackerBody(
      heartbeat: String, appName: String, nowMs: Long): String = {
    val uePr = s"""{"schema": ${q(UnstructSchemaUri)}, "data": $heartbeat}"""
    s"""{"schema": ${q(PayloadDataSchemaUri)}, "data": [{"e": "ue", """ +
      s""""ue_pr": ${q(uePr)}, "tna": "telemetry", "aid": ${q(appName)}, """ +
      s""""p": "srv", "dtm": "$nowMs"}]}"""
  }

  /** A real HTTP sender for [[schedule]]: POSTs the tracker body to
    * `http(s)://{url}:{port}/com.snowplowanalytics.snowplow/tp2` — the
    * scala-tracker SyncEmitter's endpoint shape
    * (`TelemetryAkkaService.scala:88-92`: EndpointParams(url, port,
    * https)). Failures are logged and swallowed, never thrown into the
    * scheduler (the reference's emitterCallback warns and continues —
    * telemetry must never take the collector down). */
  def httpSender(
      cfg: CollectorConfig,
      clock: () => Long = () => System.currentTimeMillis(),
      log: String => Unit = _ => ()): String => Unit = {
    val t = cfg.telemetry
    val scheme = if (t.secure) "https" else "http"
    val uri = java.net.URI.create(
      s"$scheme://${t.url}:${t.port}${CollectorConfig.Tp2Path}")
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()
    payload => {
      try {
        val body = trackerBody(payload, cfg.appName, clock())
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .header("Content-Type", "application/json; charset=utf-8")
          .timeout(java.time.Duration.ofSeconds(10))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.discarding())
        if (resp.statusCode() / 100 != 2)
          log(s"telemetry got unexpected HTTP ${resp.statusCode()} from $uri")
      } catch {
        case scala.util.control.NonFatal(e) =>
          log(s"telemetry failed to reach $uri: ${e.getClass.getSimpleName}")
      }
    }
  }
}
