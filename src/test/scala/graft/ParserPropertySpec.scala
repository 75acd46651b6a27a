package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** R12: property-based coverage for the two new byte/text parsers —
  * model-driven generators render hundreds of hostile-but-lawful inputs
  * and the parser must recover the model exactly. Complements the
  * hand-written goldens (TextDedupSpec / FuzzSpec) with the input
  * shapes nobody thinks to write by hand. Raw scalacheck (no scalatest
  * bridge in the dependency set): `SCTest.check` drives the props. */
class ParserPropertySpec extends AnyFunSuite with WallBudget {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- robots.txt group parser ---------------------------------------

  private case class RuleLine(allow: Boolean, prefix: String)
  private case class Group(agents: List[String], rules: List[RuleLine])

  private val genPrefix: Gen[String] = for {
    segs <- Gen.choose(1, 3)
    parts <- Gen.listOfN(segs, Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))
  } yield "/" + parts.mkString("/")

  private val genRule: Gen[RuleLine] = for {
    allow <- Gen.oneOf(true, false)
    p <- genPrefix
  } yield RuleLine(allow, p)

  private val genGroup: Gen[Group] = for {
    nAgents <- Gen.choose(1, 3)
    agents <- Gen.listOfN(nAgents,
      Gen.oneOf("*", "googlebot", "badbot", "x-crawler"))
    nRules <- Gen.choose(0, 4)
    rules <- Gen.listOfN(nRules, genRule)
  } yield Group(agents, rules)

  private val genModel: Gen[(List[Group], Long)] = for {
    n <- Gen.choose(0, 5)
    groups <- Gen.listOfN(n, genGroup)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (groups, seed)

  /** Render a model to a hostile robots.txt: random field-name case,
    * spaces around colons, inline comments, CRLF/LF mix, and junk lines
    * placed only where RFC semantics say they cannot matter (colon-less
    * junk and comments anywhere; orphan rule lines only before the first
    * group — between groups they would legally attach to the previous
    * group). */
  private def render(groups: List[Group], seed: Long): String =
    renderFull(groups, seed)._1

  /** [[render]] plus the directive expectations it baked in: the first
    * VALID crawl-delay emitted inside a `*`-group and every sitemap URL
    * in document order (r13 — the parseRobotsDoc surface). Sitemap
    * lines are placed only where a UA run is already closed (they ARE
    * run closers, so one between UA lines would change the grouping). */
  private def renderFull(groups: List[Group], seed: Long)
      : (String, Option[Long], List[String]) = {
    val rnd = new scala.util.Random(seed)
    var delay: Option[Long] = None
    val maps = List.newBuilder[String]
    def caseOf(s: String): String = rnd.nextInt(3) match {
      case 0 => s.toLowerCase
      case 1 => s.toUpperCase
      case _ => s
    }
    def eol: String = if (rnd.nextBoolean()) "\r\n" else "\n"
    def colon: String =
      (if (rnd.nextBoolean()) " " else "") + ":" + (if (rnd.nextBoolean()) "  " else "")
    def comment: String = if (rnd.nextInt(3) == 0) " # c" + rnd.nextInt(99) else ""
    def safeJunk: String = rnd.nextInt(4) match {
      case 0 => "# whole-line comment" + eol
      case 1 => eol // blank
      case 2 => "no colon here at all" + eol
      case _ => "" // nothing
    }
    val sb = new StringBuilder
    def sitemapMaybe(): Unit =
      if (rnd.nextInt(3) == 0) {
        val u = "https://h" + rnd.nextInt(9) + "/s" + rnd.nextInt(9) + ".xml"
        sb.append(caseOf("Sitemap")).append(colon).append(u).append(comment).append(eol)
        maps += u
      }
    def delayLine(star: Boolean): Unit = {
      val v = rnd.nextInt(4) match {
        case 0 => "10"
        case 1 => rnd.nextInt(100).toString
        case 2 => "99999999999999999999" // overflows Long: ignored, never thrown
        case _ => "soon" // non-numeric: must be ignored
      }
      sb.append(caseOf("Crawl-delay")).append(colon).append(v).append(comment).append(eol)
      if (star && delay.isEmpty && v.forall(_.isDigit) && v.length <= 9)
        delay = Some(v.toLong)
    }
    if (rnd.nextBoolean()) sb.append("\uFEFF")
    sb.append(safeJunk)
    sitemapMaybe() // global directive: counts even before any group
    if (rnd.nextBoolean()) sb.append("Disallow").append(colon).append("/orphan").append(eol)
    groups.foreach { g =>
      sb.append(safeJunk)
      g.agents.foreach { a =>
        sb.append(caseOf("User-agent")).append(colon).append(a).append(comment).append(eol)
        if (rnd.nextInt(3) == 0) sb.append(safeJunk) // safe between UA lines too
      }
      // a rule-less group MUST be closed by a non-rule directive —
      // otherwise its UA lines and the next group's form one continuous
      // UA run, which RFC 9309 (and the parser) treat as ONE merged
      // group; for rule-bearing groups the closer is optional dressing
      if (g.rules.isEmpty || rnd.nextInt(4) == 0)
        delayLine(star = g.agents.contains("*"))
      g.rules.foreach { r =>
        sb.append(caseOf(if (r.allow) "Allow" else "Disallow"))
          .append(colon).append(r.prefix).append(comment).append(eol)
        if (rnd.nextInt(3) == 0) sb.append(safeJunk)
        if (rnd.nextInt(5) == 0) sb.append(caseOf("Disallow")).append(colon).append(eol) // empty: no-op
        if (rnd.nextInt(5) == 0) delayLine(star = g.agents.contains("*"))
        sitemapMaybe() // UA run already closed by the rule line above
      }
      if (g.rules.isEmpty) sitemapMaybe() // run closed by the mandatory delay
    }
    sb.append(safeJunk)
    sitemapMaybe()
    (sb.toString, delay, maps.result())
  }

  test("property: robots parser recovers exactly the *-group rules from hostile renderings") {
    check(Prop.forAll(genModel) { case (groups, seed) =>
      val expected = groups.filter(_.agents.contains("*"))
        .flatMap(_.rules).map(r => (r.prefix, r.allow))
      graft.operators.UrlOps.parseRobotsTxt(render(groups, seed)) == expected
    })
  }

  test("property: crawl-delay and sitemaps recover exactly from hostile renderings") {
    check(Prop.forAll(genModel) { case (groups, seed) =>
      val (txt, wantDelay, wantMaps) = renderFull(groups, seed)
      val doc = graft.operators.UrlOps.parseRobotsDoc(txt)
      doc.crawlDelay == wantDelay && doc.sitemaps == wantMaps
    })
  }

  test("property: NFC kernel equals java.text.Normalizer on arbitrary codepoint soup") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.choose(0x20, 0x7E),       // ASCII (fast path)
      Gen.choose(0xC0, 0x17F),      // Latin-1/Extended (precomposed forms)
      Gen.choose(0x300, 0x36F),     // combining diacriticals
      Gen.choose(0x4E00, 0x4FFF),   // CJK (NFC-stable)
      Gen.oneOf(0x212B, 0x2126, 0x1E9B))), Gen.size) { (cps: List[Int], _: Int) =>
      val s = new String(cps.toArray, 0, cps.length)
      val spark = TestSpark.spark
      import spark.implicits._
      val got = Seq(Tuple1(s)).toDF("s")
        .select(graft.functions.NfcNormalize.nfc(org.apache.spark.sql.functions.col("s")))
        .head().getString(0)
      got == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    })
  }

  // ---- sitemap parser --------------------------------------------------

  private case class SmEntry(kind: String, loc: String, lastmod: String,
                             permille: Int)

  private val genSmEntry: Gen[SmEntry] = for {
    kind <- Gen.oneOf("url", "sitemap")
    host <- Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty)
    path <- Gen.alphaNumStr.map(_.take(8))
    lastmod <- Gen.oneOf("", "2026-08-15", "2025-01-01T12:00:00Z")
    permille <- Gen.oneOf(Gen.const(-1), Gen.choose(0, 1000))
  } yield SmEntry(kind, s"https://$host.example.com/$path?a=1&b=2", lastmod, permille)

  private val genSmModel: Gen[(List[SmEntry], Long)] = for {
    n <- Gen.choose(0, 6)
    entries <- Gen.listOfN(n, genSmEntry)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (entries, seed)

  /** Hostile sitemap rendering: random tag case, whitespace storms
    * around values, `&` entity-encoded (the protocol requires it) and
    * random other chars numerically encoded, permille rendered with
    * random trailing zeros, ghost entries inside comments, loc-less
    * entries sprinkled between real ones, random container tag. */
  private def renderSitemap(entries: List[SmEntry], seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    def caseOf(s: String): String = rnd.nextInt(3) match {
      case 0 => s.toLowerCase
      case 1 => s.toUpperCase
      case _ => s
    }
    def ws(): String = (0 to rnd.nextInt(3)).map(_ => " \n\t".charAt(rnd.nextInt(3))).mkString
    def encLoc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case c if rnd.nextInt(6) == 0 => s"&#${c.toInt};"
      case c => c.toString
    }
    def permilleText(p: Int): String = {
      val whole = p / 1000
      val frac = "%03d".format(p % 1000)
      if (p % 1000 == 0)
        rnd.nextInt(3) match {
          case 0 => whole.toString
          case 1 => s"$whole.0"
          case _ => s"$whole.000"
        }
      else {
        val trimmed = frac.reverse.dropWhile(_ == '0').reverse
        if (rnd.nextBoolean()) s"$whole.$frac" else s"$whole.$trimmed"
      }
    }
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\"?>")
    if (rnd.nextBoolean())
      sb.append("<!-- <url><loc>https://ghost.example.com/x</loc></url> -->")
    sb.append(s"<${caseOf("urlset")} xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">")
    entries.foreach { e =>
      if (rnd.nextInt(3) == 0) // loc-less ghost: must be skipped
        sb.append(s"<${caseOf(e.kind)}><${caseOf("lastmod")}>2020-01-01</${caseOf("lastmod")}></${caseOf(e.kind)}>")
      sb.append(s"<${caseOf(e.kind)}>").append(ws())
      sb.append(s"<${caseOf("loc")}>").append(ws()).append(encLoc(e.loc))
        .append(ws()).append(s"</${caseOf("loc")}>")
      if (e.lastmod.nonEmpty)
        sb.append(s"<${caseOf("lastmod")}>").append(ws()).append(e.lastmod)
          .append(ws()).append(s"</${caseOf("lastmod")}>")
      if (e.permille >= 0)
        sb.append(s"<${caseOf("priority")}>").append(ws())
          .append(permilleText(e.permille)).append(ws())
          .append(s"</${caseOf("priority")}>")
      sb.append(s"</${caseOf(e.kind)}>").append(ws())
    }
    sb.append(s"</${caseOf("urlset")}>")
    sb.toString
  }

  test("property: sitemap parser recovers the model entries from hostile renderings") {
    check(Prop.forAll(genSmModel) { case (entries, seed) =>
      val got = graft.operators.UrlOps.parseSitemap(renderSitemap(entries, seed))
      val want = entries.map(e =>
        graft.operators.UrlOps.SitemapEntry(e.kind, e.loc, e.lastmod, e.permille))
      got == want
    })
  }

  test("property: sitemap parser never throws on arbitrary text") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 0xFFFF).map(_.toChar)).map(_.mkString)) { s =>
      graft.operators.UrlOps.parseSitemap(s)
      true
    })
  }

  test("property: robots parser never throws on arbitrary text") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 0xFFFF).map(_.toChar)).map(_.mkString)) { s =>
      graft.operators.UrlOps.parseRobotsTxt(s)
      true
    })
  }

  // ---- WARC record walker --------------------------------------------

  test("property: WARC walker recovers every record — even payloads carrying the magic") {
    import graft.operators.Warc
    // payload bytes may contain ANYTHING, including "WARC/1.0\r\n" and
    // header-shaped text: Content-Length framing must protect them.
    // Junk between records (including truncated header blocks) is
    // skipped by the magic scan.
    val genPayload: Gen[Array[Byte]] = Gen.frequency(
      3 -> Gen.choose(0, 120).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)),
      1 -> Gen.const("WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes("UTF-8")),
      1 -> Gen.const("Content-Length: 99\r\n\r\n".getBytes("UTF-8")),
      1 -> Gen.const(Array.emptyByteArray))
    val genDoc: Gen[(Long, Array[Byte])] = for {
      id <- Gen.choose(0L, 999999L)
      p <- genPayload
    } yield (id, p)
    val genCase: Gen[(List[(Long, Array[Byte])], Long)] = for {
      n <- Gen.choose(0, 8)
      docs <- Gen.listOfN(n, genDoc)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (docs, seed)
    check(Prop.forAll(genCase) { case (docs, seed) =>
      val rnd = new scala.util.Random(seed)
      val out = new java.io.ByteArrayOutputStream()
      def junk(): Unit = rnd.nextInt(3) match {
        case 0 => out.write(s"--crawl noise ${rnd.nextInt(99)}--\r\n".getBytes("UTF-8"))
        case 1 => out.write("WARC/1.0\r\nbroken: header".getBytes("UTF-8")) // no blank line before next magic: malformed, skipped
        case _ => ()
      }
      docs.foreach { case (id, p) =>
        junk()
        out.write(Warc.synthRecord(id, "response", "application/octet-stream", p))
      }
      junk()
      val parsed = Warc.parseStreamRaw(out.toByteArray).toList
      parsed.map(_.doc_id) == docs.map(_._1) &&
        parsed.zip(docs).forall { case (r, (_, p)) =>
          java.util.Arrays.equals(r.payload, p)
        }
    })
  }

  // ---- EXIF GPS scrub ------------------------------------------------

  test("property: GPS scrub invariants hold for every doc id") {
    import graft.operators.Multimodal
    check(Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val bytes = Multimodal.synthGpsExifJpeg(id)
      val (scrubbed, had) = Multimodal.scrubExifGps(bytes)
      val (again, hadAgain) = Multimodal.scrubExifGps(scrubbed)
      had &&
        scrubbed.length == bytes.length &&
        !java.util.Arrays.equals(scrubbed, bytes) &&
        !Multimodal.exifHasGps(scrubbed) &&
        Multimodal.exifMeta(scrubbed).contains(
          (if (id % 2 == 0) "II" else "MM", (1 + id % 8).toInt, 3)) &&
        Multimodal.jpegDims(scrubbed) == Multimodal.jpegDims(bytes) &&
        !hadAgain && java.util.Arrays.equals(again, scrubbed)
    }, n = 300)
  }

  test("property: GPS scrub passes arbitrary bytes through unchanged, never throws") {
    import graft.operators.Multimodal
    val genBytes = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    check(Prop.forAll(genBytes) { bytes =>
      val (out, had) = Multimodal.scrubExifGps(bytes)
      !had && java.util.Arrays.equals(out, bytes)
    })
    // and every truncation of a real GPS jpeg is safe
    val good = Multimodal.synthGpsExifJpeg(12L)
    check(Prop.forAll(Gen.choose(0, good.length)) { n =>
      Multimodal.scrubExifGps(good.take(n))
      true
    }, n = 100)
  }
}
