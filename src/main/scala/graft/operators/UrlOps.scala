package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the crawl-pipeline step that
  * runs BEFORE content dedup in production corpus builds (CCNet /
  * RefinedWeb dedupe fetched pages by normalized URL first; content
  * MinHash only meets the survivors). The reference collector's own
  * querystring handling (`CollectorService.scala:198-199`) stops at
  * parsing; the canonical form is this engine's training-data extension.
  *
  * Canonical form implemented here (the common denominator of the
  * published pipelines):
  *  - scheme and host lowercased; a leading `www.` label dropped;
  *  - an explicit default port (`:443` https / `:80` http) dropped;
  *  - the fragment dropped;
  *  - tracking parameters (`utm_*`, `fbclid`, `gclid`) dropped;
  *  - remaining query parameters SORTED bytewise (param order is
  *    transport noise, not identity);
  *  - path preserved verbatim (case-significant per RFC 3986).
  *
  * Everything is a pure column expression — regexp extracts + HOF
  * filter + array_sort — so the whole normalization fuses into one
  * WholeStageCodegen projection over the scan: at 100 TB this stage is
  * a narrow map, and the dedup that follows is ONE hash-aggregate
  * exchange on the canonical key with map-side combine.
  */
object UrlOps {

  /** Tracking-parameter prefixes stripped by [[canonicalize]]. */
  val TrackingParams: Seq[String] = Seq("utm_", "fbclid", "gclid")

  /** The real parser: canonical URL from a raw URL column (see object
    * doc for the normal form). Malformed inputs degrade per-component
    * (an unparseable authority canonicalizes to the empty host) rather
    * than throwing — hostile strings cannot kill the job. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val authority = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val hostRaw = lower(regexp_extract(authority, "^([^:]*)", 1))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val qs = regexp_extract(url, "\\?([^#]*)", 1)
    val trackingRe = "^(?:" + TrackingParams.map {
      case p if p.endsWith("_") => java.util.regex.Pattern.quote(p) + "[A-Za-z0-9_]*"
      case p => java.util.regex.Pattern.quote(p)
    }.mkString("|") + ")="
    val params = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(trackingRe))
    val sorted = array_sort(params)
    concat(
      scheme, lit("://"), host, portPart, pathPart,
      when(size(sorted) > 0, concat(lit("?"), array_join(sorted, "&")))
        .otherwise(lit("")))
  }

  /** Deterministic messy URL per document — REAL transport-noise shapes
    * (scheme/host case, `www.`, explicit `:443`, shuffled param order,
    * `utm_`/`fbclid` junk, fragments) dressed over a canonical identity
    * shared by every doc with the same `doc_id % 250`, so the corpus
    * contains genuine URL-duplicate groups. The dressing is pure column
    * arithmetic (the oracle mirrors it analytically, like `m_decode`'s
    * header synthesis); [[canonicalize]] must then genuinely parse it
    * back. */
  def synthUrl(docId: Column): Column = {
    val g = docId % 250
    val scheme = when(docId % 4 === 1, lit("HTTPS"))
      .when(docId % 4 === 3, lit("Https"))
      .otherwise(lit("https"))
    val www = when(docId % 3 === 0, lit("www."))
      .when(docId % 9 === 1, lit("WWW."))
      .otherwise(lit(""))
    val host = concat(
      when(docId % 5 === 0, lit("Site")).otherwise(lit("site")),
      g, lit(".example.com"))
    val port = when(docId % 7 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/a"), g % 10, lit("/p"), g)
    val baseParams = when(docId % 2 === 1,
      concat(lit("ref=home&id="), g))
      .otherwise(concat(lit("id="), g, lit("&ref=home")))
    val junk = concat(
      when(docId % 6 === 0, concat(lit("&utm_source=feed"), docId % 3)).otherwise(lit("")),
      when(docId % 11 === 0, concat(lit("&fbclid=f"), docId)).otherwise(lit("")))
    val frag = when(docId % 13 === 0, concat(lit("#sec"), docId % 4)).otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, lit("?"), baseParams, junk, frag)
  }

  /** Per-doc canonicalization: (doc_id, url, canonical_url). One narrow
    * codegen'd projection — no shuffle anywhere. */
  def urlNormalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      synthUrl(col("doc_id")).as("url"))
      .withColumn("canonical_url", canonicalize(col("url")))

  /** URL-keyed duplicate groups: ONE map-side-combined aggregate on the
    * canonical key — group size and the kept (minimum) doc id, the
    * keep-first policy URL dedup ships with. Only groups with an actual
    * duplicate surface (`n_dups >= 2`). */
  def urlDups(docs: DataFrame): DataFrame =
    urlNormalize(docs)
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc"))
      .filter(col("n_dups") >= 2)

  /** R11: the deterministic per-site robots rule table the filter runs
    * against (RFC 9309 shapes): every 5th site disallows everything
    * (`/`), the next bucket disallows `/p` but carves an `Allow: /p1`
    * exception (exercises longest-match), the next disallows an
    * unrelated prefix, the rest publish no rules. Real deployments swap
    * this for rules parsed out of the crawl's robots.txt captures — the
    * table shape (site, prefix, allow) and the join are unchanged. */
  def robotsRules(spark: org.apache.spark.sql.SparkSession, sites: Int = 250): DataFrame = {
    val g = spark.range(0, sites.toLong).toDF("r_site")
    val s = col("r_site")
    g.filter(s % 5 === 0).select(s, lit("/").as("prefix"), lit(false).as("allow"))
      .unionByName(g.filter(s % 5 === 1)
        .select(s, lit("/p").as("prefix"), lit(false).as("allow")))
      .unionByName(g.filter(s % 5 === 1)
        .select(s, lit("/p1").as("prefix"), lit(true).as("allow")))
      .unionByName(g.filter(s % 5 === 2)
        .select(s, lit("/q").as("prefix"), lit(false).as("allow")))
  }

  /** R11: robots.txt compliance filter — RFC 9309 §2.2.2 longest-match
    * semantics: of all rules whose prefix matches the URL path, the
    * LONGEST wins; on a length tie the Allow wins (the published
    * Google/RFC tie-break). No matching rule ⇒ allowed.
    *
    * Scale shape: the rule table is site-count sized (KBs against a
    * 100 TB crawl) and BROADCAST; the corpus side left-joins against it
    * (≤ a handful of candidate rules per URL) and the winner is an
    * in-aggregate `max(struct(len, allow, prefix))` argmax grouped on
    * the doc key — ONE shuffle total, no window over the corpus. */
  def robotsFilter(docs: DataFrame): DataFrame = {
    val d = Spread(docs).select(
      col("doc_id"),
      (col("doc_id") % 250).as("site"),
      concat(lit("/p"), col("doc_id").cast("string")).as("path"))
    val rules = robotsRules(docs.sparkSession)
    val m = d.join(broadcast(rules),
      d("site") === rules("r_site") && d("path").startsWith(rules("prefix")),
      "left")
    m.groupBy("doc_id", "site", "path")
      .agg(max(struct(
        length(col("prefix")).as("l"),
        col("allow").cast("int").as("a"),
        col("prefix").as("p"))).as("best"))
      .select(
        col("doc_id"),
        col("site").cast("long").as("site"),
        col("path"),
        // null best = no rule matched = allowed (RFC 9309 default)
        coalesce(col("best.a") === 1, lit(true)).as("allowed"),
        coalesce(col("best.p"), lit("")).as("matched_rule"))
  }
}
