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
  * corpus: every per-format lane (q_mm24..q_mm31) composes into a single
  * operator, proving the walkers share one dispatchable contract.
  *
  * Scale: the sniff reads a handful of magic bytes before committing to
  * a walk; generation (six muxers on disjoint residue classes, unioned
  * NARROWLY — a union is not a shuffle) and sniff+walk fuse so blob
  * bytes never cross an exchange; only profile rows reach the output
  * sort. Unsniffable or malformed blobs DROP (the family contract) —
  * at 100 TB an unknown format is a quarantine row, not a job failure. */
object Profile {

  /** One normalized profile row; 0 where a format has no such fact. */
  final case class Row(format: String, durationMs: Long, width: Long,
                       height: Long, nItems: Long)

  /** Sniff the container format from magic bytes and run its walk.
    * Order matters only for safety: every branch keys on a distinct
    * anchored signature (WARC's version line, PNG's signature, EBML's
    * 4-byte id, ISO-BMFF's `ftyp` at offset 4, ustar's magic at 257,
    * MP3's ID3 tag or frame sync) — none of the muxed formats can
    * shadow another. None on an unknown or malformed container. */
  private[graft] def sniff(bytes: Array[Byte]): Option[Row] = {
    def at(o: Int, s: String): Boolean =
      bytes.length >= o + s.length &&
        s.getBytes("US-ASCII").zipWithIndex.forall {
          case (b, i) => bytes(o + i) == b
        }
    if (at(0, "WARC/1.0"))
      Warc.WarcReader.parse(bytes).map(rs =>
        Row("warc", 0L, 0L, 0L, rs.length.toLong))
    else if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && at(1, "PNG"))
      // IHDR geometry straight from the header bytes (the q_mm10 fast
      // path, JVM-side): width/height big-endian at offsets 16/20
      Some(Row("png", 0L, 0L, 0L, 1L).copy(
        width = ((bytes(16) & 0xffL) << 24) | ((bytes(17) & 0xffL) << 16) |
          ((bytes(18) & 0xffL) << 8) | (bytes(19) & 0xffL),
        height = ((bytes(20) & 0xffL) << 24) | ((bytes(21) & 0xffL) << 16) |
          ((bytes(22) & 0xffL) << 8) | (bytes(23) & 0xffL)))
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
          m.nSamples))
    else if (at(257, "ustar"))
      Tar.TarReader.parse(bytes).map(ms =>
        Row("tar", 0L, 0L, 0L, ms.length.toLong))
    else if (at(0, "ID3") || (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xE0) == 0xE0))
      Multimodal.Mp3Reader.parse(bytes).map(m =>
        Row("mp3", m.durationMs, 0L, 0L, m.nFrames))
    else None
  }

  /** The mixed fixture corpus: six container formats on disjoint
    * asset_id residue classes, unioned narrowly; the `kind` column is
    * NEUTRALIZED to `bin` so the sniffer cannot peek — format recovery
    * is the magic bytes' job alone. */
  private[graft] def mixedAssets(spark: SparkSession, dir: String): DataFrame =
    Seq(
      Multimodal.mp4Assets(spark, dir) -> 0,
      Multimodal.mkvAssets(spark, dir) -> 1,
      Multimodal.mp3Assets(spark, dir) -> 2,
      Warc.warcAssets(spark, dir) -> 3,
      Tar.tarAssets(spark, dir) -> 4,
      Multimodal.pngMetaAssets(spark, dir)
        .where(col("asset_id") < Multimodal.AssetDocBound) -> 5)
      .map { case (df, res) =>
        df.where(col("asset_id") % 6 === res)
          .select(col("asset_id"), lit("bin").as("kind"), col("bytes"))
      }
      .reduce(_.unionByName(_))

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
