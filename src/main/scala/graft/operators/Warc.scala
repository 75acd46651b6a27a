package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, length, lit, md5}

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** One parsed WARC record: identity from `WARC-Record-ID`, the target
  * URI, the declared payload length, and an md5 over the payload bytes
  * (proves the payload round-trips bit-exactly through the container —
  * and through gzip members on the compressed path). */
final case class WarcRecord(
    doc_id: Long, warc_type: String, target_uri: String,
    content_length: Long, payload_md5: String)

/** WARC (ISO 28500) record plumbing — the container crawl corpora
  * actually ship in (Common Crawl's WARC/WET files are the canonical
  * LLM-pretraining input). Same discipline as the other multimodal
  * codecs ([[Multimodal]]): REAL container bytes synthesized
  * deterministically, then genuinely parsed back — version line, header
  * block, `Content-Length`-delimited payload, record separator — with
  * the gzip path reading the per-record-member layout `.warc.gz` files
  * use (each record an independent gzip member, members concatenated).
  *
  * Scale shape: records are self-contained, so parsing is a narrow
  * `mapPartitions` over byte streams — embarrassingly parallel, no
  * shuffle; at 100 TB each task walks its own file split exactly like
  * the production WARC readers. The parser is tolerant: garbage between
  * records is skipped by scanning to the next `WARC/1.0` magic,
  * truncation yields the records completed so far — one corrupt crawl
  * file must never kill the job.
  */
object Warc {

  private val Crlf = "\r\n"

  /** Deterministic REAL WARC record for a document: response-type header
    * block + the document text as the payload. A stock WARC reader
    * (warcio et al.) parses these bytes. */
  private[graft] def synthRecord(docId: Long, text: String): Array[Byte] =
    synthRecord(docId, "response", "text/plain",
      text.getBytes(StandardCharsets.UTF_8))

  /** R11: the general record writer — real crawls interleave
    * `request`/`response`/`metadata` records (ISO 28500 §6.3-6.9) and
    * carry arbitrary binary payloads, so the type and content-type are
    * caller-chosen and the payload is raw bytes. */
  private[graft] def synthRecord(docId: Long, warcType: String,
      contentType: String, payload: Array[Byte]): Array[Byte] =
    synthRecord(docId, warcType, contentType,
      s"https://site${docId % 250}.example.com/p$docId", payload)

  /** r12: explicit-URI variant — robots.txt captures and other
    * non-page records carry their own target URI. */
  private[graft] def synthRecord(docId: Long, warcType: String,
      contentType: String, uri: String, payload: Array[Byte]): Array[Byte] = {
    val head =
      "WARC/1.0" + Crlf +
        s"WARC-Type: $warcType" + Crlf +
        s"WARC-Record-ID: <urn:graft:$docId>" + Crlf +
        "WARC-Date: 2026-01-01T00:00:00Z" + Crlf +
        s"WARC-Target-URI: $uri" + Crlf +
        s"Content-Type: $contentType" + Crlf +
        s"Content-Length: ${payload.length}" + Crlf +
        Crlf
    head.getBytes(StandardCharsets.UTF_8) ++ payload ++
      (Crlf + Crlf).getBytes(StandardCharsets.UTF_8)
  }

  /** One gzip MEMBER per record — the `.warc.gz` layout (members
    * concatenated; readers inflate member-by-member). */
  private[graft] def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(record); gz.close()
    out.toByteArray
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** A parsed record with its FULL header map and payload bytes — the
    * shape record-type filtering and payload sniffing consume. */
  private[graft] final case class RawWarc(
      doc_id: Long, headers: Map[String, String], payload: Array[Byte]) {
    def warcType: String = headers.getOrElse("warc-type", "")
  }

  /** Parse a (possibly hostile) stream of concatenated WARC records.
    * Malformed stretches are skipped by scanning to the next record
    * magic; a record whose payload is truncated is dropped. Never
    * throws. */
  private[graft] def parseStreamRaw(bytes: Array[Byte]): Iterator[RawWarc] = {
    val magic = "WARC/1.0\r\n".getBytes(StandardCharsets.UTF_8)
    def findMagic(from: Int): Int = {
      var i = math.max(0, from)
      while (i + magic.length <= bytes.length) {
        var j = 0
        while (j < magic.length && bytes(i + j) == magic(j)) j += 1
        if (j == magic.length) return i
        i += 1
      }
      -1
    }
    new Iterator[RawWarc] {
      private var pos = findMagic(0)
      private var nextRec: RawWarc = _
      advance()
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos >= 0) {
          parseOneIn(bytes, pos) match {
            case Some((rec, end)) => nextRec = rec; pos = findMagic(end)
            case None => pos = findMagic(pos + 1)
          }
        }
      }
      def hasNext: Boolean = nextRec != null
      def next(): RawWarc = { val r = nextRec; advance(); r }
    }
  }

  /** The metadata projection of [[parseStreamRaw]] (the r10 surface). */
  private[graft] def parseStream(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseStreamRaw(bytes).map { r =>
      WarcRecord(
        doc_id = r.doc_id,
        warc_type = r.warcType,
        target_uri = r.headers.getOrElse("warc-target-uri", ""),
        content_length = r.payload.length.toLong,
        payload_md5 = md5hex(r.payload))
    }

  /** One record at `start` (which points at the magic): Some(record,
    * endOffset) or None when the header block / payload is malformed or
    * truncated. */
  private def parseOneIn(bytes: Array[Byte], start: Int): Option[(RawWarc, Int)] = {
    // header block ends at the first blank line
    var i = start
    def lineEnd(from: Int): Int = {
      var k = from
      while (k + 1 < bytes.length && !(bytes(k) == '\r' && bytes(k + 1) == '\n')) k += 1
      if (k + 1 < bytes.length) k else -1
    }
    val headers = scala.collection.mutable.Map.empty[String, String]
    var firstLine = true
    var done = false
    while (!done) {
      val e = lineEnd(i)
      if (e < 0) return None // truncated header block
      val line = new String(bytes, i, e - i, StandardCharsets.UTF_8)
      i = e + 2
      if (line.isEmpty) done = true
      else if (firstLine) {
        if (line != "WARC/1.0") return None
        firstLine = false
      } else {
        val kv = line.split(":", 2)
        if (kv.length == 2) headers(kv(0).trim.toLowerCase) = kv(1).trim
      }
    }
    for {
      lenStr <- headers.get("content-length")
      len <- lenStr.toLongOption
      if len >= 0 && i + len <= bytes.length
      idStr <- headers.get("warc-record-id")
      id <- "<urn:graft:([0-9]+)>".r.findFirstMatchIn(idStr).map(_.group(1).toLong)
    } yield {
      val payload = java.util.Arrays.copyOfRange(bytes, i, (i + len).toInt)
      (RawWarc(id, headers.toMap, payload),
        (i + len).toInt + 4) // skip the \r\n\r\n record separator
    }
  }

  /** Inflate a stream of concatenated gzip members back to the plain
    * record stream (GZIPInputStream reads multi-member streams natively;
    * trailing garbage after the last member is dropped, matching the
    * tolerant-parse discipline). */
  private[graft] def gunzipMembers(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 1 << 16)
      val out = new ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var n = in.read(chunk)
      while (n >= 0) { out.write(chunk, 0, n); n = in.read(chunk) }
      out.toByteArray
    } catch {
      case _: java.io.IOException => Array.emptyByteArray
    }

  private def parsed(docs: DataFrame, gzip: Boolean): Dataset[WarcRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        // one concatenated stream per partition — exactly the shape of a
        // WARC file split — then the REAL parse back
        val out = new ByteArrayOutputStream()
        it.foreach { case (id, text) =>
          val rec = synthRecord(id, text)
          out.write(if (gzip) gzipMember(rec) else rec)
        }
        val stream = out.toByteArray
        parseStream(if (gzip) gunzipMembers(stream) else stream)
      }
  }

  /** Plain WARC stream → parsed records (one row per document). */
  def warcRecords(docs: DataFrame): DataFrame = parsed(docs, gzip = false).toDF()

  /** `.warc.gz` member-per-record stream → parsed records; output is
    * bit-identical to [[warcRecords]] (same oracle) — which is the
    * point: compression is transport, not semantics. */
  def warcRecordsGzip(docs: DataFrame): DataFrame = parsed(docs, gzip = true).toDF()

  /** R11: WET extraction records — the format text pipelines actually
    * read (Common Crawl's `.wet` files: a `warcinfo` header record, then
    * one `conversion` record per page carrying the EXTRACTED plain
    * text). The reader parses the container, filters to `conversion`,
    * and hands the RECOVERED text to the ordinary codegen'd column
    * functions (char/token counts + md5 — the first pass of every
    * pretraining pipeline). Narrow mapPartitions for the container walk,
    * declarative projection after; the md5 proves the text round-tripped
    * the container bit-exactly. */
  def wetRecords(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val recovered = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val out = new ByteArrayOutputStream()
        var first = true
        it.foreach { case (id, text) =>
          if (first) {
            // one warcinfo per file split, like real WET shards
            out.write(synthRecord(id, "warcinfo", "application/warc-fields",
              "software: graft-wet-writer\r\nformat: WARC File Format 1.0"
                .getBytes(StandardCharsets.UTF_8)))
            first = false
          }
          out.write(synthRecord(id, "conversion", "text/plain",
            text.getBytes(StandardCharsets.UTF_8)))
        }
        parseStreamRaw(out.toByteArray)
          .filter(_.warcType == "conversion")
          .map(r => (r.doc_id, new String(r.payload, StandardCharsets.UTF_8)))
      }.toDF("doc_id", "wet_text")
    recovered.select(
      col("doc_id"),
      lit("conversion").as("warc_type"),
      length(col("wet_text")).cast("long").as("n_chars"),
      graft.operators.TextOps.nTokens(col("wet_text")).cast("long").as("n_tokens"),
      md5(col("wet_text")).as("payload_md5"))
  }

  /** R11: REAL file ingestion — point the engine at a directory of
    * `.warc` / `.warc.gz` files (Common Crawl's on-disk layout) and get
    * the parsed record relation. Built on Spark's `binaryFile` source:
    * one task per file (checked against `maxPartitionBytes`; WARC
    * records span arbitrary offsets, so production WARC readers are
    * per-file or per-gzip-member too — Common Crawl ships ~1 GB shards
    * precisely so file-grain parallelism saturates a cluster), the
    * tolerant [[parseStreamRaw]] walk per file, gzip members inflated
    * when the name says `.gz`. Narrow, no shuffle; a corrupt shard
    * yields its parseable prefix, never a dead job. */
  def readWarcFiles(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (name, bytes) =>
        val stream = if (name.endsWith(".gz")) gunzipMembers(bytes) else bytes
        parseStream(stream)
      })
      .toDF()
  }

  /** One mixed-ingest row: the record that survived the type filter,
    * its sniffed payload container, and either the exact-integer pixel
    * sums (images — any container corruption changes them) or the
    * payload md5 (text). */
  final case class WarcMixedRow(
      doc_id: Long, warc_type: String, format: String,
      width: Int, height: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, text_md5: String)

  /** R11 mixed-container ingest — the shape real crawl WARCs actually
    * have (ISO 28500 §6: request/response/metadata record types
    * interleaved per fetch; Common Crawl ships exactly this). Each doc
    * contributes a THREE-record capture — a `request` record, the
    * `response` whose payload is the doc's text or a binary image
    * (png/gif/bmp by doc id), and a `metadata` record. The reader then
    * does what a production WARC pipeline does: parse every record,
    * FILTER on the `WARC-Type` header to responses, and sniff-dispatch
    * the payload bytes through the [[Multimodal]] magic decode — one
    * binary stream, heterogeneous payloads, no per-format branching
    * upstream of the sniff.
    *
    * Scale shape: identical to [[warcRecords]] — a narrow
    * `mapPartitions`, no shuffle; the type filter drops 2/3 of the
    * records inside the partition walk before any decode runs, which at
    * 100 TB is the difference between decoding the crawl and decoding
    * only its responses. */
  def warcMixed(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val out = new ByteArrayOutputStream()
        it.foreach { case (id, text) =>
          out.write(synthRecord(id, "request", "application/http;msgtype=request",
            s"GET /p$id HTTP/1.1\r\nHost: site${id % 250}.example.com\r\n\r\n"
              .getBytes(StandardCharsets.UTF_8)))
          val (payload, ctype) = (id % 4) match {
            case 0 => (text.getBytes(StandardCharsets.UTF_8), "text/plain")
            case 1 => (Multimodal.synthPngImage(id), "image/png")
            case 2 => (Multimodal.synthGifImage(id), "image/gif")
            case _ => (Multimodal.synthBmpImage(id), "image/bmp")
          }
          out.write(synthRecord(id, "response", ctype, payload))
          out.write(synthRecord(id, "metadata", "application/warc-fields",
            s"fetchTimeMs: ${10 + id % 90}".getBytes(StandardCharsets.UTF_8)))
        }
        parseStreamRaw(out.toByteArray)
          .filter(_.warcType == "response") // the WARC-Type record filter
          .map { r =>
            Multimodal.decodePixels(r.payload) match {
              case Some((fmt, (w, h, rgb))) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var p = 0
                while (p < rgb.length) {
                  sr += rgb(p) & 0xFF; sg += rgb(p + 1) & 0xFF
                  sb += rgb(p + 2) & 0xFF; p += 3
                }
                WarcMixedRow(r.doc_id, "response", fmt, w, h,
                  w.toLong * h, sr, sg, sb, "")
              case None =>
                WarcMixedRow(r.doc_id, "response", "text", 0, 0, 0L,
                  0L, 0L, 0L, md5hex(r.payload))
            }
          }
      }.toDF()
  }
}
