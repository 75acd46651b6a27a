package graft

import graft.operators.Bridges
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P10 behavioral parity: segment body → snowplow tracker payload fields
  * (mirrors the reference's AnalyticsJsBridge mapping contract). */
class AnalyticsJsSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pageBody =
    """{"type":"page","userId":"u-42","messageId":"m1",
      |"properties":{"url":"https://site.example.com/a","page":"A"},
      |"context":{"locale":"en-US","timezone":"Europe/Berlin",
      |"library":{"name":"analytics.js","version":"4.1.5"}}}""".stripMargin.replace("\n", "")

  private val trackBody =
    """{"type":"track","event":"Clicked","properties":{},
      |"context":{"library":{"name":"analytics.js","version":"4.1.5"}}}""".stripMargin.replace("\n", "")

  private val bogusBody = """{"type":"nonsense","context":{"library":{"version":"1"}}}"""
  private val noVersion = """{"type":"page","context":{"library":{"name":"x"}}}"""

  private def df = Seq(
    (pageBody, "nuid-1", "cookie-user", "anon-9"),
    (trackBody, "nuid-2", null, null),
    (bogusBody, "nuid-3", null, null),
    (noVersion, "nuid-4", null, null),
  ).toDF("body", "network_userid", "ajs_user_id", "ajs_anonymous_id")

  test("page event maps url/page/locale/tz/uid/duid and wraps body in ue_px") {
    val out = Bridges.analyticsJsEvents(df).collect()
    assert(out.length === 2) // bogus type and missing tv dropped
    val page = out.find(_.getAs[String]("tnuid") == "nuid-1").get
    assert(page.getAs[String]("aid") === "ajs_bridge")
    assert(page.getAs[String]("e") === "ue")
    assert(page.getAs[String]("tv") === "4.1.5")
    assert(page.getAs[String]("p") === "web")
    assert(page.getAs[String]("url") === "https://site.example.com/a")
    assert(page.getAs[String]("page") === "A")
    assert(page.getAs[String]("lang") === "en-US")
    assert(page.getAs[String]("tz") === "Europe/Berlin")
    assert(page.getAs[String]("uid") === "cookie-user") // cookie beats body userId
    assert(page.getAs[String]("duid") === "anon-9")
    // ue_px decodes to the unstruct envelope embedding the original body
    val decoded = new String(java.util.Base64.getDecoder.decode(page.getAs[String]("ue_px")), "UTF-8")
    assert(decoded.startsWith(
      "{\"schema\":\"iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0\""))
    assert(decoded.contains("\"iglu:com.segment/page/jsonschema/2-0-0\""))
    assert(decoded.contains(pageBody))
  }

  test("track event: body userId fallback, optional fields null") {
    val track = Bridges.analyticsJsEvents(df)
      .filter(col("tnuid") === "nuid-2").head()
    assert(track.getAs[String]("uid") === null) // no cookie, no body userId
    assert(track.getAs[String]("url") === null)
    val decoded = new String(java.util.Base64.getDecoder.decode(track.getAs[String]("ue_px")), "UTF-8")
    assert(decoded.contains("\"iglu:com.segment/track/jsonschema/1-0-0\""))
  }
}
