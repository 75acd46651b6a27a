package graft

import graft.operators.{CollectorConfig, SinkSettings}
import org.scalatest.funsuite.AnyFunSuite

/** S7 config fidelity: the reference's shipped example config
  * (`examples/config.kinesis.extended.hocon`) translated 1:1 into the
  * loader's JSON-subset document form, with EVERY consumed key asserted —
  * the golden that catches config-key drift. Plus the per-sink defaults
  * matrix ported from the reference core `ConfigSpec.scala:86-168`. */
class ConfigSpec extends AnyFunSuite with WallBudget {

  test("HOCON duration strings parse to millis") {
    import CollectorConfig.parseDurationMs
    assert(parseDurationMs("365 days") === 365L * 86400000)
    assert(parseDurationMs("60 minutes") === 3600000L)
    assert(parseDurationMs("1 second") === 1000L)
    assert(parseDurationMs("10 seconds") === 10000L)
    assert(parseDurationMs("500 ms") === 500L)
    assert(parseDurationMs("5000") === 5000L)
    assert(parseDurationMs("2 hours") === 7200000L)
    intercept[IllegalArgumentException](parseDurationMs("fortnight"))
    intercept[IllegalArgumentException](parseDurationMs("3 fortnights"))
  }

  /** `examples/config.kinesis.extended.hocon` (reference, 341 lines),
    * collector namespace, 1:1 — every setting the engine consumes, with
    * the example's literal values. Only the pekko logging-stack keys
    * (`loggers`/`loglevel`) remain out of scope (SURVEY §7.1); the HTTP
    * tier (interface/port, ssl, p3p, crossDomain, rootResponse,
    * preTermination*, warmup, server limits) is parsed since r10/r11. */
  private val kinesisExtended =
    """{"collector": {
      |  "paths": {},
      |  "p3p": {
      |    "policyRef": "/w3c/p3p.xml",
      |    "CP": "NOI DSP COR NID PSA OUR IND COM NAV STA"
      |  },
      |  "crossDomain": {"enabled": false, "domains": ["*"], "secure": true},
      |  "rootResponse": {"enabled": false, "statusCode": 302, "headers": {}, "body": ""},
      |  "cookie": {
      |    "enabled": true,
      |    "expiration": "365 days",
      |    "name": "sp",
      |    "secure": true,
      |    "httpOnly": true,
      |    "sameSite": "None"
      |  },
      |  "doNotTrackCookie": {"enabled": false, "name": "", "value": ""},
      |  "cookieBounce": {
      |    "enabled": false,
      |    "name": "n3pc",
      |    "fallbackNetworkUserId": "00000000-0000-4000-A000-000000000000",
      |    "forwardedProtocolHeader": "X-Forwarded-Proto"
      |  },
      |  "enableDefaultRedirect": false,
      |  "redirectDomains": [],
      |  "redirectMacro": {"enabled": false},
      |  "terminationDeadline": "10 seconds",
      |  "preTerminationPeriod": "10 seconds",
      |  "preTerminationUnhealthy": false,
      |  "cors": {"accessControlMaxAge": "60 minutes"},
      |  "streams": {
      |    "good": "good",
      |    "bad": "bad",
      |    "useIpAddressAsPartitionKey": false,
      |    "sink": {
      |      "enabled": "kinesis",
      |      "region": "eu-central-1",
      |      "aws": {"accessKey": "iam", "secretKey": "iam"},
      |      "threadPoolSize": 10,
      |      "sqsMaxBytes": 192000,
      |      "backoffPolicy": {"minBackoff": 500, "maxBackoff": 1500, "maxRetries": 3},
      |      "maxBytes": 1000000,
      |      "startupCheckInterval": "1 second"
      |    },
      |    "buffer": {"byteLimit": 3145728, "recordLimit": 500, "timeLimit": 5000}
      |  },
      |  "telemetry": {
      |    "disable": false,
      |    "interval": "60 minutes",
      |    "method": "POST",
      |    "url": "sp.snowcatcloud.com",
      |    "port": 443,
      |    "secure": true
      |  },
      |  "monitoring": {"metrics": {"statsd": {
      |    "enabled": false,
      |    "hostname": "localhost",
      |    "port": 8125,
      |    "period": "10 seconds",
      |    "tags": {"app": "collector"}
      |  }}},
      |  "experimental": {
      |    "enableAnalyticsJsBridge": false,
      |    "enableAmplitudeBridge": false
      |  }
      |}}""".stripMargin

  test("reference example config (kinesis extended) lands on every consumed key") {
    val cfg = CollectorConfig.fromJson(kinesisExtended)
    // paths: the example ships an EMPTY map (mappings commented out)
    assert(cfg.paths === Map.empty)
    // cookie block
    assert(cfg.cookieEnabled)
    assert(cfg.cookieExpirationMs === 365L * 86400000)
    assert(cfg.cookieName === "sp")
    assert(cfg.cookieSecure && cfg.cookieHttpOnly)
    assert(cfg.cookieSameSite === Some("None"))
    assert(cfg.cookieDomains === Seq.empty)
    assert(cfg.fallbackDomain === None)
    // doNotTrackCookie / cookieBounce
    assert(!cfg.dntEnabled && cfg.dntCookieName === "" && cfg.dntCookieValue === "")
    assert(!cfg.bounceEnabled)
    assert(cfg.bounceParamName === "n3pc")
    assert(cfg.bounceFallbackNuid === "00000000-0000-4000-A000-000000000000")
    assert(cfg.bounceForwardedProtocolHeader === Some("X-Forwarded-Proto"))
    assert(cfg.rootResponseHeaders === Map.empty) // headers = {} in the golden
    assert(cfg.terminationDeadlineMs === 10000L) // terminationDeadline = 10 seconds
    // r11: the two-phase shutdown keys (shipped :293-297)
    assert(cfg.preTerminationPeriodMs === 10000L) // preTerminationPeriod = 10 seconds
    assert(!cfg.preTerminationUnhealthy) // preTerminationUnhealthy = false
    // redirects: the example DISABLES /r/* (our engine default is enabled;
    // this key was silently unparsed before r5)
    assert(!cfg.enableDefaultRedirect)
    assert(cfg.redirectDomains === Set.empty)
    assert(!cfg.redirectMacroEnabled && cfg.redirectMacroPlaceholder === None)
    // p3p / crossDomain / rootResponse (served by OpsEndpoints)
    assert(cfg.p3pHeader ===
      "policyref=\"/w3c/p3p.xml\", CP=\"NOI DSP COR NID PSA OUR IND COM NAV STA\"")
    assert(!cfg.crossDomainEnabled && cfg.crossDomainDomains === Seq("*")
      && cfg.crossDomainSecure)
    assert(graft.streaming.OpsEndpoints.flashCrossDomainPolicy(cfg) ===
      (404, "404 not found")) // example ships crossDomain disabled
    assert(graft.streaming.OpsEndpoints.flashCrossDomainPolicy(
      cfg.copy(crossDomainEnabled = true)) === (200,
      "<?xml version=\"1.0\"?>\n<cross-domain-policy>\n" +
        "  <allow-access-from domain=\"*\" secure=\"true\" />" +
        "\n</cross-domain-policy>"))
    assert(!cfg.rootResponseEnabled && cfg.rootResponseStatus === 302
      && cfg.rootResponseBody === "")
    assert(graft.streaming.OpsEndpoints.rootResponse(cfg) === (404, "404 not found"))
    // cors
    assert(cfg.corsMaxAgeMs === 3600000L)
    // streams + sink + buffer
    assert(cfg.sink.kind === "kinesis")
    assert(cfg.sink.goodStream === "good" && cfg.sink.badStream === "bad")
    assert(!cfg.useIpAsPartitionKey)
    assert(cfg.sink.region === Some("eu-central-1"))
    assert(cfg.sink.awsAccessKey === "iam" && cfg.sink.awsSecretKey === "iam")
    assert(cfg.sink.threadPoolSize === 10)
    assert(cfg.sink.sinkMaxBytes === 1000000 && cfg.maxBytes === 1000000)
    assert(cfg.sink.sqsMaxBytes === 192000)
    assert(cfg.sink.minBackoffMs === 500 && cfg.sink.maxBackoffMs === 1500)
    assert(cfg.sink.maxRetries === 3)
    assert(cfg.sink.startupCheckIntervalMs === 1000)
    assert(cfg.sink.bufferByteLimit === 3145728L)
    assert(cfg.sink.bufferRecordLimit === 500)
    assert(cfg.sink.bufferTimeLimitMs === 5000)
    // telemetry
    assert(!cfg.telemetry.disable)
    assert(cfg.telemetry.intervalMs === 3600000L)
    assert(cfg.telemetry.method === "POST")
    assert(cfg.telemetry.url === "sp.snowcatcloud.com")
    assert(cfg.telemetry.port === 443 && cfg.telemetry.secure)
    // statsd
    assert(!cfg.statsd.enabled)
    assert(cfg.statsd.hostname === "localhost" && cfg.statsd.port === 8125)
    assert(cfg.statsd.periodMs === 10000L)
    assert(cfg.statsd.tags === Map("app" -> "collector"))
    // experimental bridges ship disabled
    assert(!cfg.analyticsJsBridgeEnabled && !cfg.amplitudeBridgeEnabled)
  }

  test("per-sink defaults matrix matches the reference core ConfigSpec") {
    // reference `ConfigSpec.scala:86-168` (sinkConfigRefFactory + buffer)
    val kinesis = SinkSettings.defaultsFor("kinesis")
    assert(kinesis.sinkMaxBytes === 1000000)
    assert(kinesis.minBackoffMs === 500 && kinesis.maxBackoffMs === 1500)
    assert(kinesis.maxRetries === 3 && kinesis.sqsMaxBytes === 192000)
    assert(kinesis.bufferByteLimit === 3145728L
      && kinesis.bufferRecordLimit === 500 && kinesis.bufferTimeLimitMs === 5000)

    val sqs = SinkSettings.defaultsFor("sqs")
    assert(sqs.sinkMaxBytes === 192000) // 256 kB SQS cap less base64 overhead
    assert(sqs.minBackoffMs === 500 && sqs.maxBackoffMs === 1500 && sqs.maxRetries === 3)

    val pubsub = SinkSettings.defaultsFor("google-pub-sub")
    assert(pubsub.sinkMaxBytes === 10000000)
    assert(pubsub.minBackoffMs === 1000 && pubsub.maxBackoffMs === 1000)
    assert(pubsub.bufferByteLimit === 100000L
      && pubsub.bufferRecordLimit === 40 && pubsub.bufferTimeLimitMs === 1000)

    val stdout = SinkSettings.defaultsFor("stdout")
    assert(stdout.sinkMaxBytes === 1000000000)

    val kafka = SinkSettings.defaultsFor("kafka")
    assert(kafka.sinkMaxBytes === 1000000 && kafka.kafkaRetries === 10
      && kafka.threadPoolSize === 10)

    val nsq = SinkSettings.defaultsFor("nsq")
    assert(nsq.sinkMaxBytes === 1000000)
  }

  test("HOCON front end: the syntax the reference's example files use") {
    // our own snippet, exercising every feature the shipped configs need:
    // comments, unquoted keys/values, = and : and bare-brace, newline
    // separators, durations as unquoted two-word values, dotted path
    // keys, deep merge of repeated objects, multi-line + empty blocks
    val doc =
      """collector {
        |  # line comment
        |  appName = graft-test        // trailing comment
        |  cookie {
        |    enabled = true
        |    expiration = 30 days
        |    name = sp
        |  }
        |  cookie { secure = false }   # deep-merges into the block above
        |  "doNotTrackCookie": { "enabled": false, "name": dnt }
        |  redirectDomains = [
        |    "a.example.com",
        |    "b.example.com"
        |  ]
        |  monitoring.metrics.statsd {
        |    enabled = true
        |    period = 10 seconds
        |  }
        |  streams {
        |    sink { enabled = sqs, maxBytes = 1000 }
        |    buffer { byteLimit = 42, recordLimit = 7, timeLimit = 99 }
        |  }
        |  rootResponse { headers = {
        |  } }
        |}""".stripMargin
    val cfg = CollectorConfig.fromHocon(doc)
    assert(cfg.appName === "graft-test")
    assert(cfg.cookieEnabled && cfg.cookieName === "sp" && !cfg.cookieSecure)
    assert(cfg.cookieExpirationMs === 30L * 86400000)
    assert(cfg.dntCookieName === "dnt")
    assert(cfg.redirectDomains === Set("a.example.com", "b.example.com"))
    assert(cfg.statsd.enabled && cfg.statsd.periodMs === 10000L)
    assert(cfg.sink.kind === "sqs" && cfg.sink.sinkMaxBytes === 1000)
    assert(cfg.sink.bufferByteLimit === 42L && cfg.sink.bufferRecordLimit === 7
      && cfg.sink.bufferTimeLimitMs === 99L)
  }

  test("collector-namespace precedence: namespaced and bare documents load identically") {
    // reference `Collector.scala:54-58` namespaced(): a document wrapped
    // in collector{...} is unwrapped with the wrapped keys taking
    // precedence over same-named top-level siblings (withFallback
    // order); an un-namespaced document (bare collector keys at the
    // root) loads identically. CollectorMain --config feeds both
    // spellings through this same loader.
    val wrapped =
      """interface = "127.0.0.9"     # top-level sibling: fallback only
        |port = 9999                  # loses to the namespaced port
        |collector {
        |  port = 8181
        |  appName = ns-test
        |  cookie { enabled = true, name = nsc, expiration = 1 days }
        |}
        |pekko.http.server.max-connections = 777
        |""".stripMargin
    val bare =
      """interface = "127.0.0.9"
        |port = 8181
        |appName = ns-test
        |cookie { enabled = true, name = nsc, expiration = 1 days }
        |pekko.http.server.max-connections = 777
        |""".stripMargin
    val a = CollectorConfig.fromHocon(wrapped)
    val b = CollectorConfig.fromHocon(bare)
    assert(a === b, "namespaced and bare documents must load identically")
    assert(a.port === 8181, "the collector{} block wins over the top-level sibling")
    assert(a.interface === "127.0.0.9", "non-shadowed top-level keys ride in as fallback")
    assert(a.appName === "ns-test" && a.cookieName === "nsc")
    assert(a.serverMaxConnections === 777, "the pekko sibling block still applies")
  }

  test("the reference's shipped example configs parse UNMODIFIED") {
    // strongest possible fidelity check: the actual files, byte-for-byte,
    // straight through the loader (input data, not copied code; skipped
    // where the reference checkout is absent)
    val dir = new java.io.File("/root/reference/examples")
    assume(dir.isDirectory, "reference examples not present")
    val files = dir.listFiles().filter(_.getName.endsWith(".hocon")).sortBy(_.getName)
    assert(files.nonEmpty)
    for (f <- files) {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val cfg = CollectorConfig.fromHocon(text)
      // every extended config ships these literal values
      if (f.getName.contains("extended")) {
        assert(cfg.cookieExpirationMs === 365L * 86400000, f.getName)
        assert(cfg.cookieName === "sp", f.getName)
        assert(!cfg.enableDefaultRedirect, f.getName)
        // R8 warmup block (experimental.warmup) — shipped disabled with
        // these literal knobs in every extended config
        assert(cfg.warmup ===
          graft.operators.WarmupSettings(false, 2000, 2000, 3), f.getName)
        // rabbitmq's example ships different exchange names (raw/bad-1)
        if (f.getName.contains("rabbitmq"))
          assert(cfg.sink.goodStream === "raw" && cfg.sink.badStream === "bad-1", f.getName)
        else
          assert(cfg.sink.goodStream === "good" && cfg.sink.badStream === "bad", f.getName)
      }
    }
    // and the kinesis extended file specifically lands its sink block
    val kin = files.find(_.getName == "config.kinesis.extended.hocon").get
    val cfg = CollectorConfig.fromHocon(
      new String(java.nio.file.Files.readAllBytes(kin.toPath), "UTF-8"))
    assert(cfg.sink.kind === "kinesis")
    assert(cfg.sink.region === Some("eu-central-1"))
    // r11: the shipped aws credentials block (:217-220 `accessKey = iam`)
    assert(cfg.sink.awsAccessKey === "iam" && cfg.sink.awsSecretKey === "iam")
    assert(graft.sinks.AwsCredentials.modeFor(cfg.sink) === graft.sinks.AwsCredentials.Iam)
    // r11: the OTHER shipped sink kinds land their connection blocks
    def load(name: String) = CollectorConfig.fromHocon(new String(
      java.nio.file.Files.readAllBytes(
        files.find(_.getName == name).get.toPath), "UTF-8")).sink
    val kafka = load("config.kafka.extended.hocon")
    assert(kafka.kafkaBrokers === "localhost:9092,another.host:9092")
    assert(kafka.kafkaRetries === 10)
    assert(kafka.kafkaMaxBlockMs === 5000 && kafka.kafkaRequestTimeoutMs === 5000)
    assert(kafka.kafkaDeliveryTimeoutMs === 10000 && kafka.kafkaMetadataMaxAgeMs === 5000)
    val ps = load("config.pubsub.extended.hocon")
    assert(ps.googleProjectId === Some("google-project-id"))
    // r12: the example carries no gcpUserAgent block → the reference's
    // shipped default (pubsub application.conf:21-23)
    assert(ps.gcpUserAgentProductName === "Snowplow OSS")
    // r12: the kafka example's sqs backup block ships commented-out →
    // no backup parsed
    assert(kafka.kafkaSqsBackup === None)
    assert(ps.pubsubTotalBackoffMs === 9223372036854L)
    assert(ps.pubsubMultiplier === 2.0 && ps.pubsubRpcTimeoutMultiplier === 2.0)
    assert(ps.pubsubInitialRpcTimeoutMs === 10000 && ps.pubsubMaxRpcTimeoutMs === 10000)
    assert(ps.pubsubRetryIntervalMs === 10000) // retryInterval = 10 seconds
    val nsq = load("config.nsq.extended.hocon")
    assert(nsq.nsqHost === "nsqHost" && nsq.nsqPort === 4150)
    val rmq = load("config.rabbitmq.extended.hocon")
    assert(rmq.rabbitUsername === "guest" && rmq.rabbitPassword === "guest")
    assert(rmq.rabbitVirtualHost === "/")
    assert(rmq.rabbitRoutingKeyGood === "raw" && rmq.rabbitRoutingKeyBad === "bad-1")
    assert(rmq.rabbitMultiplier === 2.0)
    assert(rmq.minBackoffMs === 100 && rmq.maxBackoffMs === 10000)
    assert(cfg.sink.minBackoffMs === 500 && cfg.sink.maxBackoffMs === 1500
      && cfg.sink.maxRetries === 3)
    assert(cfg.sink.sqsMaxBytes === 192000 && cfg.maxBytes === 1000000)
    assert(cfg.sink.bufferByteLimit === 3145728L && cfg.sink.bufferRecordLimit === 500)
    assert(cfg.telemetry.url === "sp.snowcatcloud.com" && cfg.telemetry.intervalMs === 3600000L)
    assert(cfg.statsd.tags === Map("app" -> "collector"))
    // r10: edge bind + TLS + the sibling pekko server-limit block
    assert(cfg.interface === "0.0.0.0" && cfg.port === 8080)
    assert(cfg.ssl === graft.operators.SslSettings(enable = false, redirect = false, port = 443))
    assert(cfg.maxUriLength === 32768)      // pekko.http.server.parsing.max-uri-length
    assert(cfg.serverMaxConnections === 2048) // pekko.http.server.max-connections
  }

  test("ssl/interface/pekko-limit parsing: explicit values, akka alias, size suffixes") {
    val cfg = CollectorConfig.fromHocon(
      """collector {
        |  interface = "10.0.0.5"
        |  port = 9090
        |  ssl { enable = true, redirect = true, port = 8443 }
        |}
        |akka.http.server {
        |  parsing { max-uri-length = 16k }
        |  max-connections = 512
        |}""".stripMargin)
    assert(cfg.interface === "10.0.0.5" && cfg.port === 9090)
    assert(cfg.ssl === graft.operators.SslSettings(enable = true, redirect = true, port = 8443))
    assert(cfg.maxUriLength === 16384 && cfg.serverMaxConnections === 512)
    assert(CollectorConfig.fromHocon(
      "akka.http.server.parsing { max-content-length = 2m }").maxContentLength === 2097152L)
    // absent blocks keep the pekko defaults
    val d = CollectorConfig.fromHocon("collector { appName = x }")
    assert(d.maxUriLength === 2048 && d.serverMaxConnections === 1024)
    assert(d.maxContentLength === 8388608L) // pekko max-content-length default
    assert(d.interface === "0.0.0.0" && d.port === 8080 && !d.ssl.enable)
  }

  test("two-phase shutdown keys: preTerminationPeriod is the drain sleep, not terminationDeadline") {
    // reference model.scala:249-251 keeps THREE distinct knobs; r10
    // conflated the first two (a deployment tuning preTerminationPeriod
    // silently got terminationDeadline as its drain) — parse all three
    // with non-default values and assert they land on distinct fields
    val cfg = CollectorConfig.fromHocon(
      """collector {
        |  terminationDeadline = 20 seconds
        |  preTerminationPeriod = 30 seconds
        |  preTerminationUnhealthy = true
        |}""".stripMargin)
    assert(cfg.terminationDeadlineMs === 20000L)
    assert(cfg.preTerminationPeriodMs === 30000L)
    assert(cfg.preTerminationUnhealthy)
    // reference.conf:3-5 defaults: 10s / 10s / false
    val d = CollectorConfig.fromHocon("collector { appName = x }")
    assert(d.terminationDeadlineMs === 10000L && d.preTerminationPeriodMs === 10000L
      && !d.preTerminationUnhealthy)
  }

  test("HOCON parser: hostile input terminates — parses or throws, never hangs") {
    import graft.operators.Hocon
    val rnd = new scala.util.Random(42)
    val alphabet = "{}[]=:,\"\n abc#/$.0-"
    for (_ <- 1 to 500) {
      val garbage = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try { Hocon.parse(garbage); () }
      catch {
        case _: IllegalArgumentException => () // clean rejection
        case e: Throwable => fail(s"non-clean failure ${e.getClass} on: $garbage")
      }
    }
    // truncated real-looking configs fail cleanly too
    for (doc <- Seq("collector {", "a = ", "a { b = [1, 2", "\"unclosed"))
      try { Hocon.parse(doc); () }
      catch { case _: IllegalArgumentException => () }
  }

  test("HOCON parser: deep nesting, duplicate dotted keys, numeric edges") {
    import graft.operators.Hocon
    // pathological nesting fails as a clean parse error, not a
    // StackOverflowError (an Error would skip config-failure handling);
    // plausibly-deep real configs still parse
    for (doc <- Seq("a{" * 2000, "b = " + "[" * 2000, ("a{" * 2000) + ("}" * 2000)))
      intercept[IllegalArgumentException](Hocon.parse(doc))
    val deep = Hocon.parse("a{" * 100 + "leaf = 1" + "}" * 100)
    assert(deep.at("/" + Seq.fill(100)("a").mkString("/") + "/leaf").asLong === 1L)

    // duplicate dotted keys deep-merge (HOCON semantics): later scalars
    // win, disjoint branches coexist, object-over-object merges recurse
    val merged = Hocon.parse(
      """m.a.x = 1
        |m.a.y = 2
        |m.a.x = 3
        |m { a { z = 4 }, b = 5 }
        |m.a { w = 6 }
        |""".stripMargin)
    assert(merged.at("/m/a/x").asLong === 3L) // last scalar wins
    assert(merged.at("/m/a/y").asLong === 2L) // disjoint sibling survives
    assert(merged.at("/m/a/z").asLong === 4L) // brace-merge recursed
    assert(merged.at("/m/a/w").asLong === 6L) // dotted-prefix merge recursed
    assert(merged.at("/m/b").asLong === 5L)
    // a scalar REPLACES an object at the same path (and vice versa)
    assert(Hocon.parse("k { x = 1 }\nk = 2").at("/k").asLong === 2L)
    assert(Hocon.parse("k = 2\nk { x = 1 }").at("/k/x").asLong === 1L)

    // a digit run longer than Long degrades to double, never throws;
    // dots-only and empty-segment keys stay literal keys
    assert(Hocon.parse("n = 99999999999999999999999").get("n").isDouble)
    assert(Hocon.parse("n = [99999999999999999999999]").get("n").get(0).isDouble)
    assert(Hocon.parse("n = 9223372036854775807").get("n").asLong === Long.MaxValue)
    assert(Hocon.parse(" ... = 1") != null)
    assert(Hocon.parse("a..b = 1").has("a..b"))
  }

  test("HOCON ${} substitutions: env, optional-absent, config-path, errors") {
    import graft.operators.Hocon
    val env = Map("PORT" -> "8080", "TOPIC" -> "good-topic", "FLAG" -> "true")
    val doc =
      """port = ${PORT}
        |streams { good = ${TOPIC}, bad = ${?UNSET_TOPIC} }
        |flag = ${?FLAG}
        |fallback = default
        |fallback = ${?UNSET}
        |ref = ${streams.good}
        |arr = [${PORT}, ${?UNSET}, x]
        |pair = ${PORT} ${PORT}
        |""".stripMargin
    val t = Hocon.parse(doc, env)
    assert(t.get("port").asLong === 8080L) // env value type-coerced
    assert(t.at("/streams/good").asText === "good-topic")
    assert(!t.get("streams").has("bad")) // unset ${?VAR} → key absent
    assert(t.get("flag").asBoolean === true)
    assert(t.get("fallback").asText === "default") // earlier value survives
    assert(t.get("ref").asText === "good-topic") // config-path post-pass
    assert(t.get("arr").size === 2 && t.get("arr").get(0).asLong === 8080L)
    assert(t.get("pair").asText === "8080 8080") // in-run env concat
    // loud failures: unresolvable required, unterminated, cycle
    intercept[IllegalArgumentException](Hocon.parse("x = ${NOPE}", Map.empty))
    intercept[IllegalArgumentException](Hocon.parse("x = ${unclosed", Map.empty))
    intercept[IllegalArgumentException](
      Hocon.parse("a = ${b}\nb = ${a}", Map.empty))
    // the reference's real shapes parse without mis-nesting: an unset
    // optional env substitution must not swallow the following keys
    // (pre-substitution the `}` of `${?X}` closed the enclosing block)
    val ref = Hocon.parse(
      """collector {
        |  streams {
        |    sink {
        |      enabled = ${?COLLECTOR_STREAMS_SINK_ENABLED}
        |      region = eu-central-1
        |    }
        |    buffer { byteLimit = 1000 }
        |  }
        |}""".stripMargin, Map.empty)
    assert(ref.at("/collector/streams/sink/region").asText === "eu-central-1")
    assert(ref.at("/collector/streams/buffer/byteLimit").asLong === 1000L)
  }

  test("HOCON triple-quoted strings: raw content, embedded quotes and comment markers") {
    import graft.operators.Hocon
    val doc =
      "re = \"\"\"[a-z]+\\d{2}\"\"\"\n" +
        "msg = \"\"\"say \"hi\" # not a comment // nor this\"\"\"\n" +
        "multi = \"\"\"line1\nline2\"\"\"\n" +
        "quotey = \"\"\"ends in quote\"\"\"\"\n" + // 4 closing quotes: one belongs to content
        "after = 1\n"
    val t = Hocon.parse(doc, Map.empty)
    assert(t.get("re").asText === """[a-z]+\d{2}""") // backslash NOT escape-processed
    assert(t.get("msg").asText === "say \"hi\" # not a comment // nor this")
    assert(t.get("multi").asText === "line1\nline2")
    assert(t.get("quotey").asText === "ends in quote\"")
    assert(t.get("after").asLong === 1L)
    intercept[IllegalArgumentException](Hocon.parse("x = \"\"\"unterminated", Map.empty))
  }

  test("HOCON include: positional merge through the injected resolver") {
    import graft.operators.Hocon
    val includes = Map(
      "defaults" ->
        """interface = 0.0.0.0
          |port = 8080
          |buffer { byteLimit = 1000, recordLimit = 10 }""".stripMargin,
      "site" -> "port = 9090\ninclude \"defaults\"\n",
      "loop" -> "include \"loop\"\nx = 1")
    // include then override: local keys AFTER the include win
    val t = Hocon.parse(
      """collector {
        |  include "defaults"
        |  port = 9999
        |  buffer { recordLimit = 500 }
        |}""".stripMargin, Map.empty, includes)
    assert(t.at("/collector/interface").asText === "0.0.0.0")
    assert(t.at("/collector/port").asLong === 9999L) // local override wins
    assert(t.at("/collector/buffer/byteLimit").asLong === 1000L) // deep-merge keeps
    assert(t.at("/collector/buffer/recordLimit").asLong === 500L)
    // override then include: the include wins positionally
    val t2 = Hocon.parse("include \"defaults\"", Map.empty, includes)
    assert(t2.get("port").asLong === 8080L)
    // nested includes work; a missing name is silently skipped
    val t3 = Hocon.parse("include \"site\"\ninclude \"missing\"", Map.empty, includes)
    assert(t3.get("port").asLong === 8080L) // site's own 9090 lost to its later include
    assert(t3.get("interface").asText === "0.0.0.0")
    // a key literally NAMED include still works
    val t4 = Hocon.parse("include = 5", Map.empty, includes)
    assert(t4.get("include").asLong === 5L)
    // substitutions inside an include resolve against the MERGED root
    val t5 = Hocon.parse(
      "include \"ref\"\nbase = 7",
      Map.empty, Map("ref" -> "derived = ${base}"))
    assert(t5.get("derived").asLong === 7L)
    // self-including resolver → clean error, not a hang
    intercept[IllegalArgumentException](Hocon.parse("include \"loop\"", Map.empty, includes))
  }

  test("bridge gates: a disabled bridge's requests vanish from the dispatch") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val env = graft.sources.EventEnvelopeAdapter.envelopes(spark, TestSpark.Sf)
    val all = graft.operators.Bridges.unifiedEvents(env)
    val noAmp = graft.operators.Bridges.unifiedEvents(env, amplitude = false)
    val noAjs = graft.operators.Bridges.unifiedEvents(env, analyticsJs = false)
    assert(all.filter(col("source") === "amplitude").count() > 0)
    assert(noAmp.filter(col("source") === "amplitude").count() === 0)
    assert(noAjs.filter(col("source") === "segment").count() === 0)
    // the other routes are untouched by a disabled bridge
    assert(noAmp.filter(col("source") =!= "amplitude").count() ===
      all.filter(col("source") =!= "amplitude").count())
    // reference default: both experimental bridges ship OFF
    val d = CollectorConfig()
    assert(!d.analyticsJsBridgeEnabled && !d.amplitudeBridgeEnabled)
  }

  test("sink kind selects its defaults; explicit keys override them") {
    val doc =
      """{"collector": {"streams": {"sink": {
        |  "enabled": "google-pub-sub", "maxBytes": 424242
        |}}}}""".stripMargin
    val cfg = CollectorConfig.fromJson(doc)
    assert(cfg.sink.kind === "google-pub-sub")
    assert(cfg.sink.sinkMaxBytes === 424242)        // explicit wins
    assert(cfg.sink.minBackoffMs === 1000)          // pubsub default holds
    assert(cfg.sink.bufferRecordLimit === 40)
  }

  test("HOCON value concatenation: quoted/unquoted/substitution splicing") {
    import graft.operators.Hocon
    val env = Map("USER" -> "alice", "PORT" -> "8080")
    val doc =
      """gap = "foo" "bar"
        |glueq = "foo""bar"
        |mixed = "/var/"${USER}"/logs"
        |addr = example.com:${PORT}
        |words = pre"mid"post
        |numish = "1" "2"
        |tail = "x" y z
        |""".stripMargin
    val t = Hocon.parse(doc, env)
    assert(t.get("gap").asText === "foo bar") // whitespace gap survives
    assert(t.get("glueq").asText === "foobar") // glued quotes splice
    assert(t.get("mixed").asText === "/var/alice/logs")
    assert(t.get("addr").asText === "example.com:8080")
    assert(t.get("words").asText === "premidpost")
    // a multi-part concatenation is a string, never numerically coerced
    assert(t.get("numish").isTextual && t.get("numish").asText === "1 2")
    assert(t.get("tail").asText === "x y z")
    // r10: inter-token whitespace is preserved EXACTLY (HOCON keeps the
    // gap text as-is, not a normalized single space)...
    val t2 = Hocon.parse("wide = 365   days\nmix = \"a\"  \tb\n", env)
    assert(t2.get("wide").asText === "365   days")
    assert(t2.get("mix").asText === "a  \tb")
    // ...and an all-unquoted GLUED run is still a string: ${P}0 must not
    // numeric-coerce into 80800
    val t3 = Hocon.parse("port = ${PORT}0\n", env)
    assert(t3.get("port").isTextual && t3.get("port").asText === "80800")
  }

  test("HOCON include modifiers: required()/file()/url() resolve hermetically") {
    import graft.operators.Hocon
    val includes = Map(
      "sink" -> "kind = kinesis",
      "https://example.com/cfg" -> "region = eu-west-1")
    // file()/url() still resolve through the injected map; required()
    // turns a missing name into a loud error instead of a silent skip
    val t = Hocon.parse(
      """include required(file("sink"))
        |include url("https://example.com/cfg")
        |include file("absent-is-fine")
        |extra = 1
        |""".stripMargin, Map.empty[String, String], includes)
    assert(t.get("kind").asText === "kinesis")
    assert(t.get("region").asText === "eu-west-1")
    assert(t.get("extra").asInt === 1)
    val err = intercept[IllegalArgumentException](
      Hocon.parse("""include required("nope")""", Map.empty[String, String], includes))
    assert(err.getMessage.contains("required include"))
    // a key literally named include still parses as a key
    val t2 = Hocon.parse("include = 5", Map.empty[String, String])
    assert(t2.get("include").asInt === 5)
    // malformed modifier chain fails loudly, not silently
    intercept[IllegalArgumentException](
      Hocon.parse("""include required(sink)""", Map.empty[String, String], includes))
  }

  test("HOCON fileResolver: file()/url() do REAL I/O; plain includes fall back map-then-file (r16)") {
    import graft.operators.Hocon
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("hocon-inc")
    Files.writeString(dir.resolve("sink.conf"), "kind = kinesis\nbuffer { byteLimit = 4500000 }")
    Files.writeString(dir.resolve("extra.hocon"), "region = eu-central-1")
    val nested = Files.createDirectory(dir.resolve("d"))
    Files.writeString(nested.resolve("deep.conf"), "include file(\"extra.hocon\")\ndepth = 2")
    val resolver = Hocon.fileResolver(dir, extra = Map("mapname" -> "frommap = true"))
    val t = Hocon.parse(
      """include required(file("sink"))
        |include url("URLBASE/extra.hocon")
        |include file("d/deep.conf")
        |include "mapname"
        |include "absent-stays-silent"
        |top = 1
        |""".stripMargin.replace("URLBASE", dir.toUri.toString.stripSuffix("/")),
      Map.empty[String, String], resolver)
    // file(): extensionless name retried as name.conf; a NESTED
    // include's own file() resolves too (against baseDir — the
    // resolver's documented anchor)
    assert(t.get("kind").asText === "kinesis")
    assert(t.get("buffer").get("byteLimit").asLong === 4500000L)
    assert(t.get("depth").asInt === 2)
    // url(): a real java.net.URL stream (file: scheme — no egress here)
    assert(t.get("region").asText === "eu-central-1")
    // plain include: map first, file fallback; misses stay silent
    assert(t.get("frommap").asBoolean === true)
    assert(t.get("top").asInt === 1)
    // required(file()) on a genuinely missing file is the loud error
    val err = intercept[IllegalArgumentException](Hocon.parse(
      """include required(file("no-such"))""", Map.empty[String, String], resolver))
    assert(err.getMessage.contains("required include"))
    // plain-name file fallback: a conf next to baseDir by bare name
    val t2 = Hocon.parse("""include "sink"""", Map.empty[String, String], resolver)
    assert(t2.get("kind").asText === "kinesis")
  }

  test("producerConf keeps only scalar values; kafka sqs block validates its queue URLs") {
    // r12 (ADVICE): the reference's producerConf is Map[String,String] —
    // a nested object/array must not be swallowed as ""
    val cfg = CollectorConfig.fromJson(
      """{"collector": {"streams": {"sink": {
        |  "enabled": "kafka",
        |  "producerConf": {"acks": "1", "batch.size": 16384,
        |    "nested": {"oops": true}, "arr": [1, 2]}
        |}}}}""".stripMargin)
    assert(cfg.sink.kafkaProducerConf ===
      Map("acks" -> "1", "batch.size" -> "16384"))
    // an sqs backup block missing a queue URL is a LOAD-time error
    // (reference Kafka.SQS requires both, model.scala:294-295)
    val err = intercept[IllegalArgumentException] {
      CollectorConfig.fromJson(
        """{"collector": {"streams": {"sink": {
          |  "enabled": "kafka", "sqs": {"region": "us-east-1",
          |    "goodQueueUrl": "https://sqs.us-east-1.amazonaws.com/1/g"}
          |}}}}""".stripMargin)
    }
    assert(err.getMessage.contains("badQueueUrl"))
  }
}
