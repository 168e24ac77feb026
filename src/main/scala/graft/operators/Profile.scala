package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mixed-corpus FORMAT-SNIFFING PROFILER — the container arc's capstone:
  * a real 100 TB asset corpus is not sorted by format, so the very first
  * pass over it is one scan that sniffs each blob's magic bytes and
  * dispatches to the right container walk, emitting one NORMALIZED
  * profile row per asset (format, duration, dimensions, item count) for
  * the catalog every later curation/budget decision reads. This is the
  * reference's full-scan surface (A1) lifted to a heterogeneous binary
  * corpus: every per-format lane (q_mm24..q_mm31, plus q_mm34's FLAC
  * walker) composes into a single operator, proving the walkers share
  * one dispatchable contract.
  *
  * Scale: the sniff reads a handful of magic bytes before committing to
  * a walk; generation (six muxers on disjoint residue classes, unioned
  * NARROWLY — a union is not a shuffle) and sniff+walk fuse so blob
  * bytes never cross an exchange; only profile rows reach the output
  * sort. Unsniffable or malformed blobs DROP (the family contract) —
  * at 100 TB an unknown format is a quarantine row, not a job failure. */
object Profile {

  /** One normalized profile row; 0 where a format has no such fact.
    * `nItems` is the format's count of INDEPENDENTLY-FETCHABLE items —
    * the unit a downstream range-reading consumer budgets on: video
    * keyframes (mp4/mkv — the seekable decode points, review r18: both
    * video formats report the same semantics), audio frames, WARC
    * records, tar members, 1 for a single image. */
  final case class Row(format: String, durationMs: Long, width: Long,
                       height: Long, nItems: Long)

  /** PNG structural walk (review r18: the sniff must VALIDATE, not
    * trust 4 signature bytes): full 8-byte signature, IHDR first
    * (length 13) with positive dimensions, every chunk's CRC-32
    * verified over type+data (the lying-index posture — a corrupted
    * chunk drops the image), IEND last, no trailing garbage. Returns
    * (width, height). Pure JVM, O(file bytes), no decode. */
  private[graft] def pngStructure(bytes: Array[Byte]): Option[(Long, Long)] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 8 + 25 ||
      !sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b })
      return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var o = 8
    var first = true
    var dims: Option[(Long, Long)] = None
    var ended = false
    while (!ended) {
      if (o + 12 > bytes.length) return None
      val len = be32(o)
      if (len > bytes.length.toLong) return None
      val typ = new String(bytes, o + 4, 4, "US-ASCII")
      val dataEnd = o + 8 + len.toInt
      if (dataEnd + 4 > bytes.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, o + 4, 4 + len.toInt)
      if (crc.getValue != be32(dataEnd)) return None // corrupted chunk
      if (first) {
        if (typ != "IHDR" || len != 13L) return None
        val (w, h) = (be32(o + 8), be32(o + 12))
        if (w <= 0L || h <= 0L) return None
        dims = Some((w, h))
        first = false
      } else if (typ == "IEND") {
        if (len != 0L || dataEnd + 4 != bytes.length) return None
        ended = true
      }
      o = dataEnd + 4
    }
    dims
  }

  /** Sniff the container format from magic bytes and run its walk.
    * Order matters only for safety: every branch keys on a distinct
    * anchored signature (WARC's version line, PNG's signature, EBML's
    * 4-byte id, ISO-BMFF's `ftyp` at offset 4, ustar's magic at 257,
    * FLAC's `fLaC`, MP3's ID3 tag or frame sync) — none of the formats
    * can shadow another (the MP3 frame-sync branch is the loosest
    * signature, so it stays LAST; `fLaC` must precede it). None on an
    * unknown or malformed container. The fixture corpus below muxes six
    * of the seven dispatchable formats; the FLAC branch is pinned by
    * its own spec row over a directly-built frame.
    * The mkv branch pays TWO walks (the meta parse and the keyframe
    * map) — a declared trade: both are O(bytes) over an already-fetched
    * blob and the walkers keep distinct scopes (meta is lenient about
    * cluster internals, the map is strict about them), so fusing them
    * would entangle two independently spec-pinned contracts. */
  private[graft] def sniff(bytes: Array[Byte]): Option[Row] = {
    def at(o: Int, s: String): Boolean =
      bytes.length >= o + s.length &&
        s.getBytes("US-ASCII").zipWithIndex.forall {
          case (b, i) => bytes(o + i) == b
        }
    if (at(0, "WARC/1.0"))
      Warc.WarcReader.parse(bytes).map(rs =>
        Row("warc", 0L, 0L, 0L, rs.length.toLong))
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && at(1, "PNG"))
      pngStructure(bytes).map { case (w, h) => Row("png", 0L, w, h, 1L) }
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1A &&
      (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xDF &&
      (bytes(3) & 0xff) == 0xA3)
      for {
        m <- Multimodal.EbmlReader.parse(bytes)
        ks <- Multimodal.EbmlReader.keyframeMap(bytes)
      } yield Row("mkv", m.durationMs, m.width.toLong, m.height.toLong,
        ks.length.toLong)
    else if (at(4, "ftyp"))
      Multimodal.Mp4BoxReader.parse(bytes).map(m =>
        Row("mp4", m.durationMs, m.width.toLong, m.height.toLong,
          m.nKeyframes))
    else if (at(257, "ustar"))
      Tar.TarReader.parse(bytes).map(ms =>
        Row("tar", 0L, 0L, 0L, ms.length.toLong))
    else if (at(0, "fLaC"))
      Multimodal.FlacReader.parse(bytes).map(m =>
        Row("flac", m.durationMs, 0L, 0L, m.nFrames))
    else if (at(0, "ID3") || (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xE0) == 0xE0))
      Multimodal.Mp3Reader.parse(bytes).map(m =>
        Row("mp3", m.durationMs, 0L, 0L, m.nFrames))
    else None
  }

  /** The mixed fixture corpus: six container formats on disjoint
    * asset_id residue classes, unioned narrowly; the `kind` column is
    * NEUTRALIZED to `bin` so the sniffer cannot peek — format recovery
    * is the magic bytes' job alone. The residue predicate pushes INTO
    * each muxer (review r18): generation runs only for each format's
    * own sixth of the corpus, not all-then-filter above the
    * mapPartitions where Catalyst cannot prune it. */
  private[graft] def mixedAssets(spark: SparkSession, dir: String): DataFrame = {
    def keep(r: Int) = Some(col("asset_id") % 6 === r &&
      col("asset_id") < Multimodal.AssetDocBound)
    Seq(
      Multimodal.mp4Assets(spark, dir, keep(0)),
      Multimodal.mkvAssets(spark, dir, keep(1)),
      Multimodal.mp3Assets(spark, dir, keep(2)),
      Warc.warcAssets(spark, dir, keep(3)),
      Tar.tarAssets(spark, dir, keep(4)),
      Multimodal.pngMetaAssets(spark, dir, keep(5)))
      .map(_.select(col("asset_id"), lit("bin").as("kind"), col("bytes")))
      .reduce(_.unionByName(_))
  }

  /** Q-MM33 — MIXED-CORPUS PROFILE: one pass, six container formats,
    * one normalized catalog row per asset. */
  def qMm33(spark: SparkSession, dir: String): DataFrame =
    sniffProfile(mixedAssets(spark, dir)).orderBy("asset_id")

  /** Narrow kernel of [[qMm33]] (PlanAuditSpec mm family list). */
  def sniffProfile(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[Multimodal.AssetRow]
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            sniff(a.bytes).map(r =>
              (a.asset_id, r.format, r.durationMs, r.width, r.height,
                r.nItems))
          }
        }
      }
      .toDF("asset_id", "format", "duration_ms", "width", "height",
        "n_items")
  }
}
