package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TAR / WebDataset container lane — tar shards are the packaging format
  * multimodal training pipelines actually stream (WebDataset: one tar
  * member per modality, members of one sample sharing a basename key),
  * so the container family's archive half is a POSIX ustar header walk:
  * member names, verified header checksums, octal sizes, 512-byte block
  * geometry. (Reference tie-in: A1's full-scan surface and README.md:3's
  * migrate-every-stored-format promise.)
  *
  * Same fused executor-side shape as the rest of the family: REAL (if
  * minimal) ustar archives are generated and walked in ONE mapPartitions
  * stage — archive bytes never cross an exchange; only member-metadata
  * rows reach the exchange, and the WebDataset sample audit (q_mm32) is
  * a relational pass over those rows. Every generated field derives from
  * closed forms, so the DuckDB oracle replays the offset algebra as a
  * running sum over 512-byte blocks. Compression is declared codec-fleet
  * scope (WebDataset shards are commonly plain tar precisely so they can
  * be streamed and ranged).
  *
  * Layout per archive: [[tarSampleCount]] samples × three members each
  * (`<key>.jpg`, `<key>.txt`, `<key>.json` — key = 6-digit
  * asset·100+sample), then the two zero end-blocks. Header checksums are
  * REAL (unsigned byte sum with the checksum field spaced, stored in
  * octal) and the walker verifies them — a corrupted header drops the
  * archive, never yields a bogus member map. */
object Tar {

  /** WebDataset samples per shard (3..6); members per sample = 3. */
  def tarSampleCount(id: Long): Int = (3 + id % 4).toInt
  def tarMemberCount(id: Long): Int = 3 * tarSampleCount(id)

  /** Closed-form member payload sizes per modality. */
  def tarJpgLen(id: Long, k: Int): Int = 200 + ((id + 7L * k) % 64).toInt
  def tarTxtLen(id: Long, k: Int): Int = 50 + ((id * 3 + k) % 40).toInt
  def tarJsonLen(id: Long, k: Int): Int = 30 + ((id + 11L * k) % 20).toInt

  /** Member m (0-based) of asset id: sample k = m/3, modality m%3
    * (0 = jpg, 1 = txt, 2 = json). */
  def tarMemberName(id: Long, m: Int): String = {
    val key = id * 100 + m / 3
    val ext = (m % 3) match { case 0 => "jpg"; case 1 => "txt"; case _ => "json" }
    f"$key%06d.$ext"
  }
  def tarMemberLen(id: Long, m: Int): Int = (m % 3) match {
    case 0 => tarJpgLen(id, m / 3)
    case 1 => tarTxtLen(id, m / 3)
    case _ => tarJsonLen(id, m / 3)
  }

  private def octal(v: Long, width: Int): Array[Byte] = {
    // POSIX numeric field: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    val out = new Array[Byte](width)
    var i = 0
    while (i < width - 1 - s.length) { out(i) = '0'; i += 1 }
    for (c <- s) { out(i) = c.toByte; i += 1 }
    out(width - 1) = 0
    out
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420L /*0644*/, 8), 0, h, 100, 8) // mode
    System.arraycopy(octal(0L, 8), 0, h, 108, 8)            // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8)            // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)        // size
    System.arraycopy(octal(0L, 12), 0, h, 136, 12)          // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)          // chksum spaced
    h(156) = '0'                                            // typeflag: file
    System.arraycopy("ustar".getBytes("US-ASCII") :+ 0.toByte, 0, h, 257, 6)
    h(263) = '0'; h(264) = '0'                              // version "00"
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    // chksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum)
    var j = 148
    var pad = 6 - cs.length
    while (pad > 0) { h(j) = '0'; j += 1; pad -= 1 }
    for (c <- cs) { h(j) = c.toByte; j += 1 }
    h(154) = 0; h(155) = ' '
    h
  }

  /** REAL (if minimal) POSIX ustar WebDataset shards, executor-side. */
  def tarAssets(spark: SparkSession, dir: String,
                keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .where(col("doc_id") < Multimodal.AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          for (m <- 0 until tarMemberCount(id)) {
            val size = tarMemberLen(id, m)
            bos.write(header(tarMemberName(id, m), size.toLong))
            var k = 0
            while (k < size) {
              bos.write((33 + ((id + 13L * m + k) % 90)).toInt); k += 1
            }
            val slack = (512 - size % 512) % 512
            if (slack > 0) bos.write(new Array[Byte](slack))
          }
          bos.write(new Array[Byte](1024)) // two zero end-blocks
          (id, "tar", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** One member's facts: 1-based number, name, data byte range. */
  final case class Member(memberNo: Long, name: String, dataOff: Long,
                          size: Long)

  /** Pure-JVM ustar walk — per member: name, VERIFIED header checksum,
    * octal size, data byte range; hops in 512-byte blocks to the
    * two-zero-block end marker. None on ANY malformation — a checksum
    * mismatch (the tar analogue of q_mm27's lying Cues: a corrupted
    * header must drop the archive, never emit a bogus map), a
    * non-octal size field, a member overrunning the file, a missing
    * end marker, non-file typeflags (links/dirs are out of the declared
    * WebDataset-shard scope). O(file bytes), O(1) state. */
  object TarReader {
    private def isZeroBlock(bytes: Array[Byte], o: Int): Boolean = {
      var i = o
      while (i < o + 512) { if (bytes(i) != 0) return false; i += 1 }
      true
    }

    /** Parse a POSIX numeric field: optional LEADING blanks (historic
      * writers pad checksums as `%6o` with leading spaces — GNU tar's
      * from_oct skips them, review r18), octal digits, NUL/space pad. */
    private def numeric(bytes: Array[Byte], o: Int, w: Int): Option[Long] = {
      var v = 0L
      var i = o
      var seen = false
      while (i < o + w && !seen && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
      while (i < o + w) {
        val c = bytes(i) & 0xff
        if (c >= '0' && c <= '7') {
          if (v > (Long.MaxValue >> 3)) return None
          v = (v << 3) | (c - '0'); seen = true; i += 1
        } else if (c == 0 || c == ' ') i = o + w // trailing pad: stop
        else return None
      }
      if (seen) Some(v) else None
    }

    def parse(bytes: Array[Byte]): Option[Seq[Member]] = try {
      val out = Seq.newBuilder[Member]
      var o = 0
      var memberNo = 0L
      var ended = false
      while (!ended) {
        if (o + 512 > bytes.length) return None
        if (isZeroBlock(bytes, o)) {
          // end marker: TWO zero blocks
          if (o + 1024 > bytes.length || !isZeroBlock(bytes, o + 512))
            return None
          ended = true
        } else {
          // verify the header checksum: unsigned byte sum with the
          // checksum field itself treated as 8 spaces
          var sum = 0L
          var i = 0
          while (i < 512) {
            sum += (if (i >= 148 && i < 156) ' '.toLong
                    else (bytes(o + i) & 0xffL))
            i += 1
          }
          val stored = numeric(bytes, o + 148, 8) match {
            case Some(v) => v; case None => return None
          }
          if (stored != sum) return None // corrupted header: drop
          if (bytes(o + 156) != '0' && bytes(o + 156) != 0) return None
          var n = 0
          while (n < 100 && bytes(o + n) != 0) n += 1
          if (n == 0) return None
          val name = new String(bytes, o, n, "US-ASCII")
          val size = numeric(bytes, o + 124, 12) match {
            case Some(v) => v; case None => return None
          }
          val dataOff = o + 512L
          val padded = (size + 511L) / 512L * 512L
          if (dataOff + padded > bytes.length) return None
          memberNo += 1
          out += Member(memberNo, name, dataOff, size)
          o = (dataOff + padded).toInt
        }
      }
      if (memberNo == 0L) return None
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Q-MM31 — TAR MEMBER MAP: per shard, every member's (member_no,
    * name, data_offset, size) from the real ustar walk with verified
    * header checksums — the fetch plan a WebDataset loader runs: range
    * reads of exactly the members it wants, no full-shard decode.
    * Scale: one fused generate+walk mapPartitions stage; archive bytes
    * never cross an exchange. */
  def qMm31(spark: SparkSession, dir: String): DataFrame =
    tarMemberMap(tarAssets(spark, dir)).orderBy("asset_id", "member_no")

  /** Narrow kernel of [[qMm31]] (PlanAuditSpec mm family list). */
  def tarMemberMap(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[Multimodal.AssetRow]
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            TarReader.parse(a.bytes).toSeq.flatten.map(m =>
              (a.asset_id, m.memberNo, m.name, m.dataOff, m.size))
          }
        }
      }
      .toDF("asset_id", "member_no", "name", "data_offset", "size")
  }

  /** Q-MM32 — WEBDATASET SAMPLE AUDIT: group the member map by sample
    * key (the basename before the modality extension) and report each
    * sample's member count, total bytes, and modality presence flags —
    * the shard-integrity pass a training loader runs before an epoch
    * (an incomplete sample — image without caption, caption without
    * image — wastes a fetch or crashes a collate step at scale).
    *
    * Scale: the heavy part is the member walk (one fused stage); the
    * audit itself is one hash aggregation over member-METADATA rows
    * (name/size), grouped by (shard, key) — never touches member
    * bytes, shuffles ~60-byte rows. */
  def qMm32(spark: SparkSession, dir: String): DataFrame =
    tarMemberMap(tarAssets(spark, dir))
      .select(col("asset_id"),
        expr("substring_index(name, '.', 1)").as("sample_key"),
        expr("substring_index(name, '.', -1)").as("ext"),
        col("size"))
      .groupBy("asset_id", "sample_key")
      .agg(count(lit(1)).as("n_members"),
        sum("size").as("total_bytes"),
        max(when(col("ext") === "jpg", 1L).otherwise(0L)).as("has_img"),
        max(when(col("ext") === "txt", 1L).otherwise(0L)).as("has_txt"),
        max(when(col("ext") === "json", 1L).otherwise(0L)).as("has_meta"))
      .orderBy("asset_id", "sample_key")
}
