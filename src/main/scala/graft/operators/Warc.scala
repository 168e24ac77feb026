package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** WARC (Web ARChive, ISO 28500) container lane — the format web-crawl
  * text corpora actually arrive in (Common Crawl ships WARC): a 100 TB
  * LLM-text pipeline's very first pass is a record walk over WARC files,
  * exactly as its video half is the MP4/MKV walks ([[Multimodal.qMm24]]
  * family; reference tie-in: README.md:3's migrate-every-stored-format
  * promise and A1's full-scan surface).
  *
  * Same fused executor-side shape as the rest of the container family:
  * REAL (if minimal) WARC/1.0 files are generated and walked in ONE
  * mapPartitions stage — file bytes never cross an exchange; only
  * record-metadata rows reach the output sort. Every generated field
  * derives from closed forms, so the DuckDB oracle replays the full
  * offset algebra as a running sum (the [[Multimodal.qMm27]] posture).
  * Compression is declared out of pure-JVM scope (real crawls are
  * per-record gzip members; the decompressed record walk is the part
  * with engine-side structure — a codec fleet inflates upstream).
  *
  * Record layout (all ASCII, fixed-width numerics so the oracle's
  * arithmetic needs no digits-of-n terms): `WARC/1.0\r\n`, a
  * `WARC-Type` line, a fixed-22-byte `WARC-Record-ID`, a zero-padded
  * 5-digit `Content-Length`, a blank line, the payload, and the
  * spec's closing `\r\n\r\n`. Header block = 88 + len(type) bytes.
  * Files are one `warcinfo` record followed by request/response pairs.
  */
object Warc {

  /** Records per file: 1 warcinfo + [[warcPairCount]] request/response
    * pairs → 5, 7, or 9 records. */
  def warcPairCount(id: Long): Int = (2 + id % 3).toInt
  def warcRecordCount(id: Long): Int = 1 + 2 * warcPairCount(id)

  /** Record r's WARC-Type: 0 = warcinfo, odd = request, even = response. */
  def warcType(r: Int): String =
    if (r == 0) "warcinfo" else if (r % 2 == 1) "request" else "response"

  /** Closed-form payload lengths per record kind. The response payload
    * is a 67-byte fixed-width HTTP/1.1 header block plus the body. */
  def warcInfoLen(id: Long): Int = 30 + (id % 17).toInt
  def warcRequestLen(id: Long, r: Int): Int = 40 + ((id + 11L * r) % 23).toInt
  def warcBodyLen(id: Long, r: Int): Int = 80 + ((id * 3 + 11L * r) % 53).toInt
  /** HTTP status: 404 on the (id + r) % 7 == 0 residue, else 200 —
    * status-dependent curation (drop 404 bodies) stays exercised. */
  def warcStatus(id: Long, r: Int): Int = if ((id + r) % 7 == 0) 404 else 200

  /** Fixed header-block sizes (the oracle's constants): the WARC header
    * is 88 + len(type); the HTTP block inside a response payload is 67. */
  val WarcHeaderBase = 88
  val HttpBlockLen = 67

  private def pad5(n: Int): String = f"$n%05d"

  /** REAL (if minimal) WARC/1.0 files, generated executor-side. */
  def warcAssets(spark: SparkSession, dir: String,
                 keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .where(col("doc_id") < Multimodal.AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sb = new java.io.ByteArrayOutputStream()
          def put(s: String): Unit = sb.write(s.getBytes("US-ASCII"))
          for (r <- 0 until warcRecordCount(id)) {
            val typ = warcType(r)
            val plen = typ match {
              case "warcinfo" => warcInfoLen(id)
              case "request"  => warcRequestLen(id, r)
              case _          => HttpBlockLen + warcBodyLen(id, r)
            }
            put("WARC/1.0\r\n")
            put(s"WARC-Type: $typ\r\n")
            put(f"WARC-Record-ID: <urn:graft:${id * 1000 + r}%010d>\r\n")
            put(s"Content-Length: ${pad5(plen)}\r\n")
            put("\r\n")
            typ match {
              case "response" =>
                val blen = warcBodyLen(id, r)
                // fixed-width status line: the reason phrase is 2-byte
                // filler so 200 and 404 lines are the same length
                put(s"HTTP/1.1 ${warcStatus(id, r)} OK\r\n")
                put("Content-Type: text/html\r\n")
                put(s"Content-Length: ${pad5(blen)}\r\n")
                put("\r\n")
                var k = 0
                while (k < blen) {
                  sb.write((33 + ((id + 5 * r + k) % 90)).toInt); k += 1
                }
              case _ =>
                var k = 0
                while (k < plen) {
                  sb.write((33 + ((id + 3 * r + k) % 90)).toInt); k += 1
                }
            }
            put("\r\n\r\n")
          }
          (id, "warc", sb.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** One record's facts: 1-based number, type, payload byte range. */
  final case class Rec(recNo: Long, recType: String, payloadOff: Long,
                       payloadLen: Long)
  /** One HTTP response's facts: status code and body byte range. */
  final case class Http(recNo: Long, status: Int, bodyOff: Long,
                        bodyLen: Long)

  /** Pure-JVM WARC/1.0 record walk — per record: WARC-Type,
    * Content-Length (the hop), payload byte range. Header lines are
    * scanned with an 8 KiB per-record bound so a crafted never-ending
    * header cannot trap the walk; Content-Length digits are bounded
    * (≤ 8) against overflow. None on ANY malformation — a record
    * overrunning the file, a missing version line, a non-numeric or
    * absent Content-Length, a missing record terminator, trailing
    * garbage — the container family's drop-never-throw contract.
    * O(file bytes), O(1) state beyond the output. */
  object WarcReader {
    private val MaxHeaderBlock = 8192

    /** (value, end-index) of the CRLF-terminated line at `o`, bounded. */
    private def line(bytes: Array[Byte], o: Int,
                     cap: Int): Option[(String, Int)] = {
      var i = o
      val stop = math.min(bytes.length - 1, cap)
      while (i <= stop) {
        if (bytes(i) == '\r' && i + 1 < bytes.length && bytes(i + 1) == '\n')
          return Some((new String(bytes, o, i - o, "US-ASCII"), i + 2))
        i += 1
      }
      None
    }

    def parse(bytes: Array[Byte]): Option[Seq[Rec]] = try {
      val out = Seq.newBuilder[Rec]
      var o = 0
      var recNo = 0L
      while (o < bytes.length) {
        val cap = o + MaxHeaderBlock
        var p = line(bytes, o, cap) match {
          case Some(("WARC/1.0", e)) => e
          case _ => return None
        }
        var typ: String = null
        var clen = -1L
        var open = true
        while (open) {
          line(bytes, p, cap) match {
            case Some(("", e)) => open = false; p = e
            case Some((l, e)) =>
              val c = l.indexOf(": ")
              if (c <= 0) return None
              val (k, v) = (l.substring(0, c), l.substring(c + 2))
              if (k == "WARC-Type") typ = v
              else if (k == "Content-Length") {
                if (v.isEmpty || v.length > 8 ||
                  !v.forall(ch => ch >= '0' && ch <= '9')) return None
                clen = v.toLong
              }
              p = e
            case None => return None
          }
        }
        if (typ == null || clen < 0L) return None
        if (p + clen + 4 > bytes.length) return None
        val end = p + clen.toInt
        if (bytes(end) != '\r' || bytes(end + 1) != '\n' ||
          bytes(end + 2) != '\r' || bytes(end + 3) != '\n') return None
        recNo += 1
        out += Rec(recNo, typ, p.toLong, clen)
        o = end + 4
      }
      if (recNo == 0L) return None
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }

    /** HTTP/1.1 parse of each `response` record's payload: status code
      * plus the body byte range, with the inner `Content-Length`
      * CROSS-CHECKED against the measured body (the q_mm27 Cues
      * posture — a length header that lies is malformation, not data).
      * Drops the whole clip on any malformed response. */
    def http(bytes: Array[Byte]): Option[Seq[Http]] = try {
      val recs = parse(bytes) match {
        case Some(rs) => rs; case None => return None
      }
      val out = Seq.newBuilder[Http]
      val it = recs.iterator
      while (it.hasNext) {
        val r = it.next()
        if (r.recType == "response") {
          val p = r.payloadOff.toInt
          val pEnd = p + r.payloadLen.toInt
          val st = line(bytes, p, pEnd) match {
            case Some((l, e)) if l.startsWith("HTTP/1.1 ") &&
              l.length >= 12 &&
              l.substring(9, 12).forall(ch => ch >= '0' && ch <= '9') =>
              (l.substring(9, 12).toInt, e)
            case _ => return None
          }
          var q = st._2
          var clen = -1L
          var open = true
          while (open) {
            line(bytes, q, pEnd) match {
              case Some(("", e)) => open = false; q = e
              case Some((l, e)) =>
                val c = l.indexOf(": ")
                if (c <= 0) return None
                if (l.substring(0, c) == "Content-Length") {
                  val v = l.substring(c + 2)
                  if (v.isEmpty || v.length > 8 ||
                    !v.forall(ch => ch >= '0' && ch <= '9')) return None
                  clen = v.toLong
                }
                q = e
              case None => return None
            }
          }
          val bodyLen = (pEnd - q).toLong
          if (bodyLen < 0L) return None // headers overran the payload
          if (clen >= 0L && clen != bodyLen) return None // lying header
          out += Http(r.recNo, st._1, q.toLong, bodyLen)
        }
      }
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Q-MM29 — WARC RECORD MAP: per file, every record's (record_no,
    * rec_type, payload_offset, payload_len) from the real record walk —
    * the fetch plan a 100 TB crawl-ingestion pass runs before anything
    * else touches the corpus. Scale: one fused generate+walk
    * mapPartitions stage, bytes never cross an exchange; only
    * record-metadata rows reach the output sort. */
  def qMm29(spark: SparkSession, dir: String): DataFrame =
    warcRecordMap(warcAssets(spark, dir)).orderBy("asset_id", "record_no")

  /** Narrow kernel of [[qMm29]] (PlanAuditSpec mm family list). */
  def warcRecordMap(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[Multimodal.AssetRow]
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            WarcReader.parse(a.bytes).toSeq.flatten.map(r =>
              (a.asset_id, r.recNo, r.recType, r.payloadOff, r.payloadLen))
          }
        }
      }
      .toDF("asset_id", "record_no", "rec_type", "payload_offset",
        "payload_len")
  }

  /** Q-MM30 — HTTP RESPONSE BODY MAP: per file, every response record's
    * (record_no, status, body_offset, body_len) through the real
    * two-level parse (WARC record walk, then HTTP/1.1 status line +
    * headers inside the payload, inner Content-Length cross-checked) —
    * the crawl-to-text step: a curation pass reads exactly these body
    * ranges (and drops 404s) without touching header bytes again.
    * Same fused single-stage shape as [[qMm29]]. */
  def qMm30(spark: SparkSession, dir: String): DataFrame =
    warcHttpMap(warcAssets(spark, dir)).orderBy("asset_id", "record_no")

  /** Narrow kernel of [[qMm30]] (PlanAuditSpec mm family list). */
  def warcHttpMap(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[Multimodal.AssetRow]
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            WarcReader.http(a.bytes).toSeq.flatten.map(h =>
              (a.asset_id, h.recNo, h.status.toLong, h.bodyOff, h.bodyLen))
          }
        }
      }
      .toDF("asset_id", "record_no", "status", "body_offset", "body_len")
  }
}
