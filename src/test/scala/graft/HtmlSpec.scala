package graft

import graft.operators.Html
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** HTML extractor coverage: hand-written hostile goldens for each
  * tokenizer rule, then a model-driven property — render a known
  * document model to hostile markup (random tag case, attribute junk,
  * comments, script/style ghosts, entity-encoded content, whitespace
  * storms) and require the parser to recover the model exactly. */
class HtmlSpec extends AnyFunSuite with WallBudget {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- entity decoding ------------------------------------------------

  test("entity decode: named, decimal, hex; malformed stays literal") {
    assert(Html.decodeEntities("A &amp; B") == "A & B")
    assert(Html.decodeEntities("&lt;p&gt;&quot;x&quot;&apos;") == "<p>\"x\"'")
    assert(Html.decodeEntities("a&nbsp;b") == "a b")
    assert(Html.decodeEntities("&#72;&#105;") == "Hi")
    assert(Html.decodeEntities("&#x48;&#X69;") == "Hi")
    // malformed: unknown name, empty numeric, no semicolon, too long,
    // out-of-range and surrogate codepoints — all stay literal
    assert(Html.decodeEntities("&zzz;") == "&zzz;")
    assert(Html.decodeEntities("&#;") == "&#;")
    assert(Html.decodeEntities("&amp") == "&amp")
    assert(Html.decodeEntities("&#xFFFFFFFF;") == "&#xFFFFFFFF;")
    assert(Html.decodeEntities("&#xD800;") == "&#xD800;")
    assert(Html.decodeEntities("&verylongentityname;") == "&verylongentityname;")
    assert(Html.decodeEntities("100 & 200") == "100 & 200")
  }

  // ---- tokenizer goldens ---------------------------------------------

  test("script, style and comments are dropped wholesale") {
    val d = Html.parse(
      "<p>keep</p><script>var a = \"<p>no</p>\"; if (1<2) {}</script>" +
        "<style>p { color: red } /* <p>no</p> */</style>" +
        "<!-- <p>no</p> --><p>also</p>")
    assert(d.blocks.map(_.text) == Vector("keep", "also"))
  }

  test("a '>' inside a quoted attribute does not close the tag") {
    val d = Html.parse("""<p title="a>b">text</p><p class='x>y'>two</p>""")
    assert(d.blocks.map(_.text) == Vector("text", "two"))
  }

  test("block tags split, inline tags do not, <br> splits") {
    val d = Html.parse("<p>a <b>bold</b> c</p><p>x<br>y</p><div>z</div>")
    assert(d.blocks.map(_.text) == Vector("a bold c", "x", "y", "z"))
  }

  test("table rows linearize to pipe-joined blocks; cells with block tags stay one cell") {
    val d = Html.parse(
      "<p>before</p><table><tr><th>k</th><th>v</th></tr>" +
        "<tr><td colspan=\"2\">a</td><td><p>b1</p><p>b2</p></td></tr>" +
        "<tr><td></td><td>c</td></tr></table><p>after</p>")
    assert(d.blocks.map(_.text) ===
      Vector("before", "k | v", "a | b1 b2", "c", "after"))
  }

  test("nested table emits outer row-so-far, its rows, then the outer row resumes") {
    val d = Html.parse(
      "<table><tr><td>pre<table><tr><td>n1</td><td>n2</td></tr></table>post</td>" +
        "<td>z</td></tr></table>")
    assert(d.blocks.map(_.text) === Vector("pre", "n1 | n2", "post | z"))
  }

  test("unclosed table at EOF still emits the pending row; caption is its own block") {
    val d = Html.parse("<table><caption>cap</caption><tr><td>a</td><td>b")
    assert(d.blocks.map(_.text) === Vector("cap", "a | b"))
  }

  test("orphan td/tr outside any table keep the old block-delimiter behavior") {
    val d = Html.parse("x<td>y</td>z</table>w")
    assert(d.blocks.map(_.text) === Vector("x", "y", "z", "w"))
  }

  test("anchor text inside a cell counts toward the row's link chars") {
    val d = Html.parse(
      "<table><tr><td><a href=\"/x\">click</a></td><td>plain</td></tr></table>")
    assert(d.blocks === Vector(Html.Block("click | plain", 5)))
    assert(d.links === Vector(("/x", "click")))
  }

  test("mixed-case tags are recognized") {
    val d = Html.parse("<P>one</P><BR><DIV>two</DIV><SCRIPT>var x;</SCRIPT>")
    assert(d.blocks.map(_.text) == Vector("one", "two"))
  }

  test("whitespace collapses like CSS white-space: normal") {
    val d = Html.parse("<p>  a   b\n\tc  </p>\n\n  <p> d </p>")
    assert(d.blocks.map(_.text) == Vector("a b c", "d"))
  }

  test("title is captured and entity-decoded, not a body block") {
    val d = Html.parse("<head><title> A &amp; B </title></head><body><p>x</p></body>")
    assert(d.title == "A & B")
    assert(d.blocks.map(_.text) == Vector("x"))
  }

  test("links come out in order with href quoting variants") {
    val d = Html.parse(
      """<p><a href="/a">One</a> <a href='/b'>Two</a> <a href=/c>Three</a></p>""")
    assert(d.links == Vector(("/a", "One"), ("/b", "Two"), ("/c", "Three")))
    assert(d.blocks.map(_.text) == Vector("One Two Three"))
    assert(d.blocks.head.linkChars == 11)
  }

  test("unclosed anchor and truncated tags at EOF are tolerated") {
    val d = Html.parse("""<p><a href="/x">dangling""")
    assert(d.links == Vector(("/x", "dangling")))
    assert(d.blocks.map(_.text) == Vector("dangling"))
    val t = Html.parse("<p>text<div")
    assert(t.blocks.map(_.text) == Vector("text"))
    assert(Html.parse("<p>a<!-- never closed").blocks.map(_.text) == Vector("a"))
  }

  test("bare '<' that opens no tag is literal text") {
    val d = Html.parse("<p>1 < 2 and <3 hearts</p>")
    assert(d.blocks.map(_.text) == Vector("1 < 2 and <3 hearts"))
  }

  test("doctype and processing instructions vanish without a break") {
    val d = Html.parse("<!DOCTYPE html><?xml version=\"1.0\"?><p>x</p>")
    assert(d.blocks.map(_.text) == Vector("x"))
  }

  test("link density separates chrome from prose") {
    val d = Html.parse(
      """<nav><a href="/">Home</a> <a href="/a">About</a></nav>""" +
        """<p>Plain prose with <a href="/r">one ref</a> in it.</p>""" +
        """<footer><a href="/c">Contact</a></footer>""")
    assert(d.blocks.length == 3)
    assert(Html.mainBlocks(d).map(_.text) ==
      Vector("Plain prose with one ref in it."))
  }

  // ---- synthesis golden ----------------------------------------------

  test("attribute names do not match prefixed look-alikes") {
    // data-href must not shadow href; xml:lang must not shadow lang
    val d = Html.parse(
      """<html xml:lang="fr" lang="en"><body>""" +
        """<p><a data-href="/tracker" href="/real">x</a></p></body></html>""")
    assert(d.links == Vector(("/real", "x")))
    assert(d.htmlLang == "en")
    val m = Html.parse(
      """<head><meta data-name="x" name="robots" content="noindex"></head>""")
    assert(m.metaRobots == "noindex")
  }

  test("attribute names inside other attributes' quoted values do not match") {
    // 'href=' inside the title VALUE must not shadow the real href —
    // attrs are tokenized as name=value pairs, not substring-searched
    val d = Html.parse(
      """<p><a title="see href=/fake here" href="/real">x</a></p>""")
    assert(d.links == Vector(("/real", "x")))
    val m = Html.parse(
      """<head><meta content="name=robots trick" name="author">""" +
        """<meta name="robots" content="noindex"></head>""")
    assert(m.metaRobots == "noindex")
  }

  test("raw-text elements close only on a complete close tag (HTML5 13.2.5)") {
    val d = Html.parse("""<script>x="</scripts>";secret()</script><p>keep</p>""")
    assert(d.blocks.map(_.text) == Vector("keep"))
    // same rule for style and title
    val t = Html.parse("<title>A</titles>B</title><p>x</p>")
    assert(t.title == "A</titles>B")
  }

  test("href-less anchors are navigation targets, not link edges") {
    val d = Html.parse(
      """<p><a name="top">Top</a> <a onclick="f()">More</a> <a href="/x">Go</a></p>""")
    assert(d.links == Vector(("/x", "Go")))
    // their text still reads as prose (zero link chars)
    assert(d.blocks.map(_.text) == Vector("Top More Go"))
    assert(d.blocks.head.linkChars == 2)
  }

  test("signed numeric character references stay literal") {
    assert(Html.decodeEntities("&#+65;") == "&#+65;")
    assert(Html.decodeEntities("&#-65;") == "&#-65;")
    assert(Html.decodeEntities("&#x+41;") == "&#x+41;")
    assert(Html.decodeEntities("&#65;") == "A")
  }

  test("metadata: lang, robots (first-win past the decoy), canonical") {
    val d = Html.parse(
      """<html LANG="en"><head>
        |<meta name="description" content="decoy a>b">
        |<meta NAME="robots" content="noindex">
        |<meta name="robots" content="index">
        |<link rel="canonical" href="https://x.example.com/p1">
        |<link rel="stylesheet" href="/css">
        |</head><body><p>x</p></body></html>""".stripMargin)
    assert(d.htmlLang == "en")
    assert(d.metaRobots == "noindex") // first robots meta wins
    assert(d.canonical == "https://x.example.com/p1")
    val none = Html.parse("<html><head></head><body><p>x</p></body></html>")
    assert(none.htmlLang == "" && none.metaRobots == "" && none.canonical == "")
  }

  test("synthHtml extraction is the uniform expectation for every variant") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    for (id <- 0L to 60L) {
      val d = Html.parse(Html.synthHtml(id, text, lang = "en"))
      assert(d.htmlLang == "en", s"id=$id")
      assert(d.metaRobots == (if (id % 7 == 0) "noindex,nofollow"
        else if (id % 7 == 3) "index,follow" else ""), s"id=$id")
      assert(d.canonical == (if (id % 3 != 1)
        s"https://site${id % 250}.example.com/p$id" else ""), s"id=$id")
      val h = text.length / 2
      assert(d.title == s"Doc $id & friends", s"id=$id")
      assert(d.blocks.map(_.text) == Vector(
        "Home About", s"Doc $id", text.substring(0, h).trim,
        text.substring(h).trim, "A & B C", s"See ref ${id % 7} here",
        "Contact"), s"id=$id")
      assert(d.links == Vector(
        ("/home", "Home"), ("/about", "About"),
        (s"https://site${(7 * id + 3) % 250}.example.com/p$id", s"ref ${id % 7}"),
        ("/contact", "Contact")), s"id=$id")
      assert(Html.mainBlocks(d).length == 5, s"id=$id")
    }
  }

  // ---- model-driven property -----------------------------------------

  private sealed trait Item
  private case class Para(words: List[String]) extends Item
  private case class Link(href: String, anchor: String) extends Item
  /** Prose with an inline anchor in the middle — one block, one link. */
  private case class Mixed(lead: List[String], href: String, anchor: String,
                           tail: List[String]) extends Item

  private val genWord: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val genItem: Gen[Item] = Gen.frequency(
    3 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genWord).map(Para)),
    1 -> (for {
      h <- genWord.map("/" + _)
      a <- genWord
    } yield Link(h, a)),
    1 -> (for {
      lead <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genWord))
      h <- genWord.map("/m/" + _)
      a <- genWord
      tail <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genWord))
    } yield Mixed(lead, h, a, tail)))

  private val genModel: Gen[(String, List[Item], Long)] = for {
    title <- Gen.option(Gen.listOfN(3, genWord).map(_.mkString(" "))).map(_.getOrElse(""))
    n <- Gen.choose(0, 8)
    items <- Gen.listOfN(n, genItem)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (title, items, seed)

  /** Render the model hostilely: random tag case, random attribute junk
    * (including quoted '>'), entity-encoded content characters, random
    * whitespace storms, comments / script / style ghosts between items. */
  private def render(title: String, items: List[Item], seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    def tcase(s: String): String =
      if (rnd.nextBoolean()) s.toUpperCase(java.util.Locale.ROOT) else s
    def ws(): String = {
      val chars = " \n\t"
      (0 to rnd.nextInt(3)).map(_ => chars.charAt(rnd.nextInt(3))).mkString
    }
    def enc(s: String): String = s.flatMap { c =>
      rnd.nextInt(4) match {
        case 0 => s"&#${c.toInt};"
        case 1 => s"&#x${c.toInt.toHexString};"
        case _ => c.toString
      }
    }
    def junk(): String = rnd.nextInt(4) match {
      case 0 => s"<!-- <p>ghost${rnd.nextInt(10)}</p> -->"
      case 1 => "<script>var a = \"</div><p>g</p>\"; if (1 < 2) {}</script>"
      case 2 => "<style>p { color: #fff } /* <p>g</p> */</style>"
      case _ => ws()
    }
    def attrs(): String = rnd.nextInt(3) match {
      case 0 => " class=\"x\""
      case 1 => " title=\"a>b\" data-k='v>w'"
      case _ => ""
    }
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head>")
    if (title.nonEmpty) sb.append(s"<title>${enc(title)}</title>")
    sb.append("</head><").append(tcase("body")).append(">")
    items.foreach { it =>
      sb.append(junk())
      it match {
        case Para(words) =>
          val tag = if (rnd.nextBoolean()) "p" else "div"
          val open = tcase(tag)
          sb.append(s"<$open${attrs()}>").append(ws())
          sb.append(words.map(enc).mkString(ws() + " " + ws()))
          sb.append(ws()).append(s"</${tcase(tag)}>")
        case Link(href, anchor) =>
          val q = if (rnd.nextBoolean()) "\"" else "'"
          sb.append(s"<p><a href=$q$href$q${attrs()}>")
            .append(enc(anchor)).append("</a></p>")
        case Mixed(lead, href, anchor, tail) =>
          // inline anchor and inline formatting tags mid-prose: no break
          val q = if (rnd.nextBoolean()) "\"" else "'"
          val inl = if (rnd.nextBoolean()) ("<" + tcase("b") + ">", "</" + tcase("b") + ">")
            else ("<" + tcase("span") + " class='s'>", "</" + tcase("span") + ">")
          sb.append(s"<p${attrs()}>")
            .append(lead.map(enc).mkString(" ")).append(ws()).append(" ")
            .append(s"<a href=$q$href$q>").append(enc(anchor)).append("</a>")
            .append(" ").append(ws())
            .append(inl._1).append(tail.map(enc).mkString(" ")).append(inl._2)
            .append("</p>")
      }
    }
    sb.append("</").append(tcase("body")).append("></html>")
    sb.toString
  }

  test("property: hostile rendering of a model document parses back to the model") {
    val prop = Prop.forAll(genModel) { case (title, items, seed) =>
      val d = Html.parse(render(title, items, seed))
      val expBlocks = items.map {
        case Para(words) => words.mkString(" ")
        case Link(_, anchor) => anchor
        case Mixed(lead, _, anchor, tail) =>
          (lead :+ anchor) ++ tail mkString " "
      }.toVector
      val expLinks = items.collect {
        case Link(h, a) => (h, a)
        case Mixed(_, h, a, _) => (h, a)
      }.toVector
      // link-density bookkeeping: a Mixed block's link chars are EXACTLY
      // its anchor's length — over-counting (e.g. charging the <b> tail
      // as link text) would misclassify prose as boilerplate
      val mixedOk = items.zipWithIndex.collect { case (m: Mixed, i) => (m, i) }
        .forall { case (m, i) => d.blocks(i).linkChars == m.anchor.length }
      d.title == title && d.blocks.map(_.text) == expBlocks &&
        d.links == expLinks && mixedOk
    }
    check(prop)
  }

  test("property: arbitrary byte soup never throws; blocks are normalized") {
    val soup = Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('<', '>', '&', '"', '\'', '/', '!', '-', '#', ';'),
      1 -> Gen.oneOf('\n', '\t', '\r', ' ', '�'))).map(_.mkString)
    val prop = Prop.forAll(soup) { s =>
      val d = Html.parse(s)
      // C0 controls smuggled through numeric references (&#11; etc.)
      // must not survive normalization either
      d.blocks.forall(b => b.text.nonEmpty && b.text == b.text.trim &&
        !b.text.exists(c => c < ' '))
    }
    check(prop, n = 500)
  }
}
