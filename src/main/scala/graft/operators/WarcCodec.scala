package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G26 — WARC container reader (round 12): the raw-crawl ingest format
  * itself. WARC (ISO 28500; the Common Crawl / Internet Archive wire
  * format) is the unit a 100 TB acquisition pipeline actually receives:
  * one file = a sequence of records, each a version line (`WARC/1.0`),
  * CRLF-separated named headers, a blank line, then a `Content-Length`-
  * delimited binary block, then CRLF CRLF. Response records wrap a full
  * HTTP response (status line + headers + blank + body) inside the
  * block.
  *
  * Parser discipline (the m14/m16 byte-walk rules): bounded work per
  * byte, Content-Length-driven (the block is NEVER scanned for
  * delimiters — binary bodies legally contain anything), and
  * fail-soft per record: a malformed record ends the walk and the
  * remainder of the FILE is counted as dropped bytes, never silently
  * parsed past a desync (a wrong Content-Length makes every later
  * boundary a lie). Like JSONL quarantine (G25), nothing malformed is
  * invented and nothing clean is lost.
  *
  * Scale shape: one WARC file = one row (binary payload) = one bounded
  * mapPartitions walk — record extraction is narrow, shuffle-free, and
  * batch-shaped (the m2 convention); at 100 TB the files arrive via
  * binaryFile/stream sources and this operator is the first projection.
  */
object WarcCodec {

  final case class WarcRecord(rec_idx: Long, warc_type: String,
      target_uri: String, http_status: Long, content_type: String,
      n_body_bytes: Long, body: Array[Byte],
      offset: Long, rec_bytes: Long)

  final case class WarcParse(records: Seq[WarcRecord], dropped_bytes: Long)

  /** Fixture builder (the encodeGrayJpeg convention): one syntactically
    * real WARC response record. `body` is the HTTP body; the HTTP block
    * is assembled with correct Content-Lengths at both layers.
    */
  def encodeWarcResponse(uri: String, status: Int, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** A warcinfo header record (every real WARC file leads with one). */
  def encodeWarcInfo(fields: String): Array[Byte] = {
    val block = fields.getBytes("UTF-8")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("US-ASCII") ++
      block ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  private def indexOfCrlf(bytes: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i + 1 < until) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private val MaxGunzipBytes = 1L << 30 // 1 GiB: decompression-bomb cap

  /** Gunzip a whole (possibly multi-member — the .warc.gz convention is
    * one gzip member PER RECORD, concatenated) stream. JDK's
    * GZIPInputStream consumes concatenated members natively. Fail-soft:
    * a corrupt tail returns what decompressed cleanly (the parser's
    * dropped-bytes accounting then covers any truncated record); output
    * is CAPPED at 1 GiB so a decompression bomb degrades to a bounded
    * prefix instead of an OOM.
    */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    // Size hint in Long: `bytes.length * 4` overflows Int past 512 MiB
    // (Common Crawl .warc.gz ~1 GiB) and a negative hint would throw
    // OUTSIDE any try, breaking the never-throws contract.
    val hint = math.min(bytes.length.toLong * 4L, 1L << 20).toInt
    val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0 && out.size.toLong <= MaxGunzipBytes) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    out.toByteArray
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** [[parseWarcFile]] with transparent gzip: Common Crawl ships
    * `.warc.gz` (per-record gzip members, concatenated), so the
    * production read path sniffs the two magic bytes and decompresses
    * before the walk. Plain files parse unchanged.
    */
  def parseWarcFileAuto(bytes: Array[Byte]): WarcParse =
    if (isGzip(bytes)) parseWarcFile(gunzip(bytes)) else parseWarcFile(bytes)

  /** Parse one WARC file's bytes. Never throws; a desync drops the
    * remainder (counted), parsed records before it survive.
    */
  def parseWarcFile(bytes: Array[Byte]): WarcParse = {
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    var idx = 0L
    try {
      while (i < bytes.length) {
        val recStart = i
        // version line
        val vEnd = indexOfCrlf(bytes, i, bytes.length)
        if (vEnd < 0 || !new String(bytes, i, vEnd - i, "US-ASCII").startsWith("WARC/"))
          return WarcParse(out.result(), bytes.length - i)
        var p = vEnd + 2
        // named headers until the blank line
        var warcType = ""
        var uri = ""
        var contentLength = -1L
        var done = false
        var headers = 0
        while (!done) {
          val hEnd = indexOfCrlf(bytes, p, bytes.length)
          if (hEnd < 0 || headers > 64) return WarcParse(out.result(), bytes.length - i)
          if (hEnd == p) { done = true; p += 2 } // blank line
          else {
            val line = new String(bytes, p, hEnd - p, "US-ASCII")
            val c = line.indexOf(':')
            if (c > 0) {
              val k = line.substring(0, c).trim.toLowerCase
              val v = line.substring(c + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" =>
                  contentLength = v.toLongOption.getOrElse(-1L)
                case _ => ()
              }
            }
            headers += 1
            p = hEnd + 2
          }
        }
        if (contentLength < 0 || p + contentLength > bytes.length)
          return WarcParse(out.result(), bytes.length - i)
        val blockStart = p
        val blockEnd = p + contentLength.toInt
        // response records wrap an HTTP message: status line, headers,
        // blank, body — all INSIDE the Content-Length block
        var status = 0L
        var httpCt = ""
        var bodyStart = blockStart
        if (warcType == "response") {
          val sEnd = indexOfCrlf(bytes, blockStart, blockEnd)
          if (sEnd > 0) {
            val sl = new String(bytes, blockStart, sEnd - blockStart, "US-ASCII")
            val parts = sl.split(" ")
            if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
              status = parts(1).toLongOption.getOrElse(0L)
            var q = sEnd + 2
            var hDone = false
            var hs = 0
            while (!hDone && hs <= 64) {
              val hEnd = indexOfCrlf(bytes, q, blockEnd)
              if (hEnd < 0) { hDone = true; q = blockEnd }
              else if (hEnd == q) { hDone = true; q = hEnd + 2 }
              else {
                val line = new String(bytes, q, hEnd - q, "US-ASCII")
                val c = line.indexOf(':')
                if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("content-type"))
                  httpCt = line.substring(c + 1).trim
                hs += 1
                q = hEnd + 2
              }
            }
            bodyStart = q
          }
        } // non-response: the block IS the content (warc-fields etc.)
        val body = java.util.Arrays.copyOfRange(bytes, bodyStart, blockEnd)
        // record separator CRLF CRLF
        var e = blockEnd
        if (e + 4 <= bytes.length && bytes(e) == '\r' && bytes(e + 1) == '\n'
            && bytes(e + 2) == '\r' && bytes(e + 3) == '\n') e += 4
        else if (e != bytes.length) {
          // Missing CRLF CRLF separator mid-file: the record itself parsed
          // cleanly, so emit it and count ONLY the unconsumed suffix as
          // dropped — counting from recStart would tally the emitted
          // record's bytes as both parsed and dropped, breaking the
          // parsed-prefix + dropped == file-size identity.
          out += WarcRecord(idx, warcType, uri, status, httpCt,
            body.length.toLong, body, recStart.toLong, (blockEnd - recStart).toLong)
          return WarcParse(out.result(), bytes.length - blockEnd)
        }
        out += WarcRecord(idx, warcType, uri, status, httpCt,
          body.length.toLong, body, recStart.toLong, (e - recStart).toLong)
        idx += 1
        i = e
      }
      WarcParse(out.result(), 0L)
    } catch {
      case scala.util.control.NonFatal(_) => WarcParse(out.result(), (bytes.length - i).toLong)
    }
  }

  final case class FilePayload(file_id: Long, payload: Array[Byte])
  final case class FileRecord(file_id: Long, rec_idx: Long, warc_type: String,
      target_uri: String, http_status: Long, content_type: String,
      n_body_bytes: Long, dropped_bytes: Long)

  /** The operator: (file_id, payload) → one row per parsed record plus
    * the file's dropped-bytes tally on every row (0 on clean files —
    * the quarantine-evidence column). Batch-shaped mapPartitions; the
    * streaming attach (A55) runs this literal function. This is the
    * SLIM spelling (metadata only — stats, triage, the p22 oracle);
    * [[warcRecordsWithBody]] is the pipeline input.
    */
  def warcRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id"), col("payload"))
      .as[FilePayload]
      .mapPartitions(_.flatMap { f =>
        val parsed = parseWarcFileAuto(f.payload)
        parsed.records.map(r => FileRecord(f.file_id, r.rec_idx, r.warc_type,
          r.target_uri, r.http_status, r.content_type, r.n_body_bytes,
          parsed.dropped_bytes))
      })
      .toDF()
  }

  final case class CdxRow(file_id: Long, rec_idx: Long, warc_type: String,
      target_uri: String, http_status: Long, offset: Long, rec_bytes: Long)

  /** EXACT member boundaries of a concatenated-gzip stream, as
    * (offset, compressed_length) spans. No magic-byte scanning — a
    * 0x1f8b08 sequence inside compressed payload can't false-trigger
    * because boundaries come from the DEFLATE grammar itself: each
    * member's header is parsed (FLG extras skipped per RFC 1952), its
    * deflate stream is inflated to completion with a raw Inflater, and
    * the member end is header + (input consumed by the inflater) + the
    * 8-byte CRC32/ISIZE trailer. Fail-soft: a truncated or corrupt tail
    * returns the clean member prefix (the parser's dropped-byte
    * accounting covers the rest); per-member output is capped by the
    * gunzip bomb cap.
    */
  def gzipMemberSpans(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var p = 0
    try {
      while (p + 10 <= bytes.length &&
          (bytes(p) & 0xff) == 0x1f && (bytes(p + 1) & 0xff) == 0x8b &&
          (bytes(p + 2) & 0xff) == 8) {
        val start = p
        val flg = bytes(p + 3) & 0xff
        var q = p + 10
        if ((flg & 4) != 0) { // FEXTRA
          if (q + 2 > bytes.length) return out.result()
          q += 2 + ((bytes(q) & 0xff) | ((bytes(q + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { // FNAME (NUL-terminated)
          while (q < bytes.length && bytes(q) != 0) q += 1
          q += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT
          while (q < bytes.length && bytes(q) != 0) q += 1
          q += 1
        }
        if ((flg & 2) != 0) q += 2 // FHCRC
        if (q >= bytes.length) return out.result()
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(bytes, q, bytes.length - q)
          val buf = new Array[Byte](1 << 16)
          var outLen = 0L
          while (!inf.finished() && outLen <= MaxGunzipBytes) {
            val n = inf.inflate(buf)
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              return out.result() // truncated/underspecified deflate stream
            outLen += n
          }
          if (!inf.finished()) return out.result() // bomb cap tripped
          val end = q + ((bytes.length - q) - inf.getRemaining) + 8
          if (end > bytes.length) return out.result() // trailer truncated
          out += ((start.toLong, (end - start).toLong))
          p = end
        } finally inf.end()
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => out.result() }
  }

  /** CDX-style record index (the companion artifact every WARC archive
    * ships): (file, record) → byte offset + length, so a single page
    * re-fetches with ONE bounded slice parse instead of a whole-file
    * walk — the random-access path an annotation/inspection service
    * needs over a 100 TB archive. Plain .warc rows carry exact
    * uncompressed record spans; .warc.gz rows carry PER-MEMBER
    * COMPRESSED spans from [[gzipMemberSpans]] (the real-world CDX
    * convention — Common Crawl writes one gzip member per record, so a
    * member span IS a record span and random access never decompresses
    * more than one member; a nonconforming multi-record member indexes
    * each of its records at the member's coordinates, and the fetch
    * cost stays bounded by that member). Either way
    * [[fetchWarcRecord]] resolves the coordinates directly against the
    * stored file bytes.
    */
  def warcCdx(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id"), col("payload"))
      .as[FilePayload]
      .mapPartitions(_.flatMap { f =>
        if (isGzip(f.payload)) {
          var idx = 0L
          gzipMemberSpans(f.payload).flatMap { case (off, len) =>
            parseWarcFile(gunzip(java.util.Arrays.copyOfRange(
              f.payload, off.toInt, (off + len).toInt))).records.map { r =>
              val row = CdxRow(f.file_id, idx, r.warc_type, r.target_uri,
                r.http_status, off, len)
              idx += 1
              row
            }
          }
        } else {
          parseWarcFileAuto(f.payload).records.map(r =>
            CdxRow(f.file_id, r.rec_idx, r.warc_type, r.target_uri,
              r.http_status, r.offset, r.rec_bytes))
        }
      })
      .toDF()
  }

  /** Random access: every record parsed from one CDX coordinate span —
    * a gzip span (a .warc.gz member) is decompressed first; a plain
    * span parses directly. Bounded by the span, never the file.
    */
  def fetchWarcRecords(payload: Array[Byte], offset: Long,
      recBytes: Long): Seq[WarcRecord] = {
    if (offset < 0 || recBytes <= 0 || offset + recBytes > payload.length)
      return Seq.empty
    val slice = java.util.Arrays.copyOfRange(payload,
      offset.toInt, (offset + recBytes).toInt)
    parseWarcFile(if (isGzip(slice)) gunzip(slice) else slice).records
  }

  /** Random access: parse exactly one record from its CDX coordinates
    * (plain or compressed). None when the slice doesn't parse to a
    * record (stale index). */
  def fetchWarcRecord(payload: Array[Byte], offset: Long,
      recBytes: Long): Option[WarcRecord] =
    fetchWarcRecords(payload, offset, recBytes).headOption

  final case class FileRecordBody(file_id: Long, rec_idx: Long,
      warc_type: String, target_uri: String, http_status: Long,
      content_type: String, body: Array[Byte], dropped_bytes: Long)

  /** [[warcRecords]] carrying the body bytes — what the extraction
    * pipeline actually consumes (Demo 18 composes this with the p21
    * front end). Same walk, same fail-soft accounting; the body column
    * is the only difference, so record-boundary semantics cannot drift
    * between the slim and full spellings.
    */
  def warcRecordsWithBody(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id"), col("payload"))
      .as[FilePayload]
      .mapPartitions(_.flatMap { f =>
        val parsed = parseWarcFileAuto(f.payload)
        parsed.records.map(r => FileRecordBody(f.file_id, r.rec_idx,
          r.warc_type, r.target_uri, r.http_status, r.content_type, r.body,
          parsed.dropped_bytes))
      })
      .toDF()
  }
}
