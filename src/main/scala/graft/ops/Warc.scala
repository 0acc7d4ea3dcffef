package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WARC (ISO 28500) front end — the stage BEFORE the URL gate in a real
 * crawl pipeline: fetchers write concatenated WARC records (a `warcinfo`
 * header record plus one `response` record per fetched page, each carrying
 * WARC headers, an HTTP response block, and the raw HTML payload), and the
 * corpus pipeline's first job is to split those files back into per-page
 * rows. The reference consumes Kafka records and has no crawl stage
 * (extension-brief surface, like the rest of `ops/`); the format here is
 * the public WARC/1.0 layout: `WARC/1.0\r\n<headers>\r\n\r\n<payload of
 * Content-Length bytes>\r\n\r\n`.
 *
 * Two halves:
 *  - [[files]] — deterministic fixture RENDER (the shared testdata carries
 *    extracted text, not crawls): pages from the existing URL + HTML
 *    renderers are wrapped into spec-shaped records and concatenated into
 *    ~[[PerFile]]-page files. Pure expression compute plus one
 *    per-file aggregation.
 *  - [[records]] — the real parser: Content-Length-driven byte walking
 *    (NOT sentinel splitting — a payload containing the literal bytes
 *    `WARC/1.0` cannot desynchronize it), HTTP status + header-block
 *    stripping for response records. Imperative per-FILE work with no
 *    cross-file state → `mapPartitions`, the sanctioned per-partition
 *    escape hatch; files are the parallelism unit exactly as on a
 *    1000-executor crawl read.
 *
 * The correctness gate is a ROUND TRIP: the DuckDB oracle does not parse —
 * it states the expected record table directly from the same generative
 * render, so `render → concat → parse` must be the identity on every
 * field (URI, date, byte-exact Content-Length, HTTP status, payload).
 */
object Warc {

  /** Pages per rendered WARC file (fixture knob). */
  val PerFile = 25

  private val Crlf = "\r\n"

  /** One parsed WARC record. `doc_id` is recovered from the
    * `WARC-Record-ID` urn (null for non-page records, e.g. warcinfo);
    * `http_status` and `target_uri` are null for non-response records;
    * `body` is the HTML payload with the HTTP header block stripped
    * (responses) or the raw payload (other types). */
  final case class Rec(warc_id: Long, rec_idx: Int, warc_type: String,
      doc_id: Option[Long], target_uri: Option[String],
      warc_date: Option[String], content_length: Long,
      http_status: Option[Int], body: String)

  private val InfoPayload = "software: graft-fetch/1.0\r\nformat: WARC File Format 1.0"

  /** Deterministic per-doc fetch date (fixture render). */
  private def dateOf(id: Column): Column =
    concat(lit("2026-01-"), lpad(((id % 28) + 1).cast("string"), 2, "0"),
      lit("T00:00:00Z"))

  /** Render the fixture corpus as WARC files `(warc_id, content)`:
    * `floor(doc_id / PerFile)` pages per file, each file = one warcinfo
    * record + the doc_id-ordered response records. The HTTP and WARC
    * Content-Length fields are BYTE lengths ([[octet_length]]) — the spec's
    * unit, and what the parser walks by. */
  def files(docs: DataFrame): DataFrame = {
    val pages = TextExtract.htmlPages(
      UrlOps.pageUrls(docs).select(col("doc_id"), col("url"), col("text"),
        col("source")), keep = Seq("url"))
    val http = concat(
      lit("HTTP/1.1 200 OK" + Crlf + "Content-Type: text/html" + Crlf +
        "Content-Length: "), octet_length(col("html")), lit(Crlf + Crlf),
      col("html"))
    val rec = concat(
      lit("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
        "WARC-Record-ID: <urn:graft:"), col("doc_id"),
      lit(">" + Crlf + "WARC-Target-URI: "), col("url"),
      lit(Crlf + "WARC-Date: "), dateOf(col("doc_id")),
      lit(Crlf + "Content-Length: "), octet_length(http),
      lit(Crlf + Crlf), http, lit(Crlf + Crlf))
    val info = concat(
      lit("WARC/1.0" + Crlf + "WARC-Type: warcinfo" + Crlf +
        "WARC-Record-ID: <urn:graft:info:"), col("warc_id"),
      lit(">" + Crlf + "WARC-Date: 2026-01-01T00:00:00Z" + Crlf +
        s"Content-Length: ${InfoPayload.getBytes(UTF_8).length}" +
        Crlf + Crlf + InfoPayload + Crlf + Crlf))
    pages
      .select(floor(col("doc_id") / PerFile).cast("long").as("warc_id"),
        col("doc_id"), rec.as("rec"))
      .groupBy(col("warc_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("doc_id"), col("rec")))),
          _.getField("rec")), "").as("responses"))
      .select(col("warc_id"), concat(info, col("responses")).as("content"))
  }

  /** Parse WARC files `(warc_id, content)` into per-record rows — see
    * [[Rec]] for the schema. Content-Length-driven: malformed input
    * (truncated header/payload, missing version line) fails loudly rather
    * than resynchronizing on a sentinel. */
  def records(warcs: DataFrame): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    val DocUrn = "urn:graft:(\\d+)".r
    val Status = "^HTTP/1\\.[01] (\\d+)".r
    warcs.select(col("warc_id"), col("content")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (wid, content) =>
          val bytes = content.getBytes(UTF_8)
          def sepAt(i: Int): Boolean = i + 3 < bytes.length &&
            bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n'
          val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
          var pos = 0
          var idx = 0
          while (pos < bytes.length) {
            var he = pos
            while (he < bytes.length && !sepAt(he)) he += 1
            require(he < bytes.length, s"warc $wid: truncated header at $pos")
            val header = new String(bytes, pos, he - pos, UTF_8)
            val lines = header.split(Crlf)
            require(lines.head.startsWith("WARC/"),
              s"warc $wid: bad version line '${lines.head.take(40)}'")
            val fields = lines.tail.iterator.map { l =>
              val c = l.indexOf(':')
              require(c > 0, s"warc $wid: bad header line '${l.take(40)}'")
              l.substring(0, c) -> l.substring(c + 1).trim
            }.toMap
            val cl = fields("Content-Length").toInt
            val start = he + 4
            require(start + cl <= bytes.length,
              s"warc $wid: truncated payload at $start")
            val payload = new String(bytes, start, cl, UTF_8)
            val wtype = fields("WARC-Type")
            val (status, body) =
              if (wtype == "response") {
                val i = payload.indexOf(Crlf + Crlf)
                require(i >= 0, s"warc $wid: response without HTTP header block")
                (Status.findFirstMatchIn(payload.substring(0, i))
                  .map(_.group(1).toInt), payload.substring(i + 4))
              } else (None, payload)
            val docId = fields.get("WARC-Record-ID")
              .flatMap(DocUrn.findFirstMatchIn(_)).map(_.group(1).toLong)
            out += Rec(wid, idx, wtype, docId, fields.get("WARC-Target-URI"),
              fields.get("WARC-Date"), cl.toLong, status, body)
            idx += 1
            pos = start + cl + 4 // trailing \r\n\r\n record separator
          }
          out
        }
      }.toDF()
  }

  /** The composed fixture query: render, concatenate, parse — the round
    * trip the oracle checks field-by-field. */
  def webWarc(docs: DataFrame): DataFrame = records(files(docs))
}
