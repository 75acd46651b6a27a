package graft.operators

/** Engine configuration — the Spark analog of the reference's pureconfig
  * model (reference `core/.../model.scala:54-298`). Only the knobs that
  * affect dataflow semantics live here; HTTP-tier settings are out of
  * engine scope (SURVEY.md §7.1).
  *
  * @param appName          collector application name
  * @param appVersion       collector version
  * @param sinkName         logical sink name; `collector` payload field is
  *                         "name-version-sink" (reference `CollectorService.scala:85-86`)
  * @param cookieName       name of the network-user-id cookie (reference
  *                         `model.scala:79`; test value "sp")
  * @param dntCookieName    do-not-track cookie name (reference `model.scala:69-72`)
  * @param dntCookieValue   regex the DNT cookie value must match to suppress
  *                         the event (reference `CollectorRoute.scala:182-191`)
  * @param paths            path-remap table (reference `CollectorService.scala:102-108`)
  * @param redirectDomains  allowlist for `/r/...` targets (reference
  *                         `CollectorService.scala:390-399`)
  * @param maxBytes         per-record size cap; larger events become
  *                         SizeViolation bad rows (reference `SplitBatch.scala:87-88`)
  * @param useIpAsPartitionKey partition key = client IP when true, else a
  *                         generated id (reference `CollectorService.scala:525-532`)
  */
final case class CollectorConfig(
    appName: String = "graft",
    appVersion: String = "0.1.0",
    sinkName: String = "spark",
    cookieName: String = "sp",
    dntCookieName: String = "sp-dnt",
    dntCookieValue: String = "true|yes",
    paths: Map[String, String] = CollectorConfig.defaultPaths,
    redirectDomains: Set[String] = Set("example.com"),
    maxBytes: Int = 1000000,
    useIpAsPartitionKey: Boolean = true,
    bounceEnabled: Boolean = false,
    bounceParamName: String = "n",
    corsEnabled: Boolean = false,
    corsDomains: Seq[String] = Seq("*"),
    cookieExpirationMs: Long = 365L * 24 * 3600 * 1000,
    cookieSecure: Boolean = true,
    cookieHttpOnly: Boolean = false,
    cookieSameSite: Option[String] = Some("None"),
    cookieDomains: Seq[String] = Seq.empty,
    fallbackDomain: Option[String] = None,
    enableDefaultRedirect: Boolean = true,
) {
  def collectorName: String = s"$appName-$appVersion-$sinkName"
}

object CollectorConfig {

  /** S7 config source: parse a reference-shaped config document (the
    * `collector { ... }` namespace of
    * `examples/config.kinesis.extended.hocon`; reference loader
    * `core/.../Collector.scala:54-85`). HOCON is a JSON superset and
    * the HOCON jar is not on this classpath, so the loader takes the
    * JSON subset — same keys, same nesting, same semantics. Absent keys
    * fall back to the case-class defaults. Driver-side only. */
  def fromJson(json: String): CollectorConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val c = mapper.readTree(json).path("collector")
    val d = CollectorConfig()
    def str(n: com.fasterxml.jackson.databind.JsonNode, dflt: String) =
      if (n.isMissingNode || n.isNull) dflt else n.asText
    def strOpt(n: com.fasterxml.jackson.databind.JsonNode, dflt: Option[String]) =
      if (n.isMissingNode || n.isNull) dflt else Some(n.asText)
    def strSeq(n: com.fasterxml.jackson.databind.JsonNode, dflt: Seq[String]) =
      if (!n.isArray) dflt
      else { val it = n.elements(); Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText).toSeq }
    val cookie = c.path("cookie")
    val dnt = c.path("doNotTrackCookie")
    val streams = c.path("streams")
    d.copy(
      appName = str(c.path("appName"), d.appName),
      appVersion = str(c.path("appVersion"), d.appVersion),
      sinkName = str(c.path("sinkName"), d.sinkName),
      cookieName = str(cookie.path("name"), d.cookieName),
      cookieSecure = if (cookie.path("secure").isMissingNode) d.cookieSecure else cookie.path("secure").asBoolean,
      cookieHttpOnly = if (cookie.path("httpOnly").isMissingNode) d.cookieHttpOnly else cookie.path("httpOnly").asBoolean,
      cookieSameSite = strOpt(cookie.path("sameSite"), d.cookieSameSite),
      cookieDomains = strSeq(cookie.path("domains"), d.cookieDomains),
      fallbackDomain = strOpt(cookie.path("fallbackDomain"), d.fallbackDomain),
      cookieExpirationMs =
        if (cookie.path("expirationMs").isMissingNode) d.cookieExpirationMs
        else cookie.path("expirationMs").asLong,
      dntCookieName = str(dnt.path("name"), d.dntCookieName),
      dntCookieValue = str(dnt.path("value"), d.dntCookieValue),
      paths = {
        val p = c.path("paths")
        if (!p.isObject) d.paths
        else {
          val it = p.fields()
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
            .map(e => e.getKey -> e.getValue.asText).toMap
        }
      },
      redirectDomains = strSeq(c.path("redirectDomains"), d.redirectDomains.toSeq).toSet,
      maxBytes =
        if (streams.path("sink").path("maxBytes").isMissingNode) d.maxBytes
        else streams.path("sink").path("maxBytes").asInt,
      useIpAsPartitionKey =
        if (streams.path("useIpAddressAsPartitionKey").isMissingNode) d.useIpAsPartitionKey
        else streams.path("useIpAddressAsPartitionKey").asBoolean,
      bounceEnabled =
        if (c.path("cookieBounce").path("enabled").isMissingNode) d.bounceEnabled
        else c.path("cookieBounce").path("enabled").asBoolean,
      bounceParamName = str(c.path("cookieBounce").path("name"), d.bounceParamName),
      corsEnabled =
        if (c.path("cors").path("enabled").isMissingNode) d.corsEnabled
        else c.path("cors").path("enabled").asBoolean,
      corsDomains = strSeq(c.path("cors").path("domains"), d.corsDomains))
  }

  /** Schema URI stamped on every payload (reference `CollectorService.scala:289`). */
  val PayloadSchemaUri =
    "iglu:com.snowplowanalytics.snowplow/CollectorPayload/thrift/1-0-0"
  /** Nil UUID used under SP-Anonymous (reference `CollectorService.scala:100`). */
  val NilUuid = "00000000-0000-0000-0000-000000000000"
  /** Self-describing bad-row schema URIs (reference emits these via the
    * snowplow-badrows library: `CollectorService.scala:185-189` for
    * generic_error, `utils/SplitBatch.scala:132-145` for size_violation). */
  val GenericErrorSchemaUri =
    "iglu:com.snowplowanalytics.snowplow.badrows/generic_error/jsonschema/1-0-0"
  val SizeViolationSchemaUri =
    "iglu:com.snowplowanalytics.snowplow.badrows/size_violation/jsonschema/1-0-0"
  /** tp2 canonical path. */
  val Tp2Path = "/com.snowplowanalytics.snowplow/tp2"

  /** Mirror of the reference's test path mappings (`TestUtils.scala:24-28`). */
  val defaultPaths: Map[String, String] = Map(
    "/com.acme/track" -> Tp2Path,
    "/com.acme/redirect" -> "/r/tp2",
    "/com.acme/iglu" -> "/com.snowplowanalytics.iglu/v1",
  )

  /** Test-scale config: maxBytes sits inside the synthetic payloads' wire
    * size distribution (min 344 / p50 693 / max 847 serialized bytes at
    * sf0.01) so the SizeViolation gate — serialized size, reference
    * `SplitBatch.scala:87` — exercises both branches. */
  val testScale: CollectorConfig = CollectorConfig(maxBytes = 800)

  /** maxBytes for the split-batch query surface: 2 tracker elements per
    * sub-batch at the synthetic element sizes. */
  val SplitMaxBytes = 200

  /** testScale with cookie-bounce tracking on (F2 query surface). */
  val bounceScale: CollectorConfig = testScale.copy(bounceEnabled = true)

  /** testScale with CORS origin whitelisting on (F5 query surface): one
    * wildcard domain and one exact domain, so the fixture origins exercise
    * every branch of the reference's `isOriginAllowed`
    * (`AmplitudeBridge.scala:60-68`). */
  val corsScale: CollectorConfig = testScale.copy(
    corsEnabled = true,
    corsDomains = Seq("*.allowed.example.com", "partner.io"))

  /** testScale with a tighter cap for the wire-route surface: at 700 the
    * synthetic corpus exercises good, split, split-still-too-large,
    * stripped-still-too-big AND not-self-describing dispositions (at 800
    * only good/split occur). */
  val wireRouteScale: CollectorConfig = testScale.copy(maxBytes = 700)

  /** testScale with cookie domain resolution on (P8/P9 query surface). */
  val cookieScale: CollectorConfig = testScale.copy(
    cookieDomains = Seq("allowed.example.com", "partner.io"),
    fallbackDomain = Some("fallback.example.com"))
}
