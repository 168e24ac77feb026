package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal asset plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators — the
  * shape a 100 TB training-data pipeline needs (decode → feature-extract →
  * frame-sample). The decode step is PLUGGABLE ([[Multimodal.AssetDecoder]]):
  * qMm1-3 run on the declared deterministic stub (feature = byte
  * fingerprint; audio/video codecs aren't in this container), while qMm4
  * exercises a REAL image decode via the pure-JVM
  * [[Multimodal.ImageIoDecoder]] — a deployment swaps in a JNI/codec
  * implementation without touching the Spark plumbing, which is what these
  * operators actually test.
  *
  * Scale posture: bytes never leave the executor (mapPartitions over the
  * binary column, batched `BatchSize` at a time to bound peak memory per
  * task the way an Arrow batch would); metadata lives in ordinary columns so
  * filters on kind/size push down to the scan WITHOUT reading the blob
  * column (parquet column pruning is the whole game for multimodal tables —
  * a metadata-only query must not touch terabytes of pixels).
  *
  * The asset table is derived deterministically from `documents` (text bytes
  * AS the blob; kind from doc_id mod 3) so the DuckDB oracle can replay the
  * same pipeline with substr+md5.
  */
object Multimodal {

  /** Rows per in-memory decode batch inside one task (the "batch shape" a
    * Pandas-UDF/Arrow pipeline would use). */
  val BatchSize = 64
  val FrameCount = 4

  case class AssetRow(asset_id: Long, kind: String, bytes: Array[Byte])
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long, fp: Long)
  case class Frame(asset_id: Long, frame_idx: Int, frame_len: Long, frame_fp: Long)

  /** Typed asset table: (asset_id, kind, bytes, meta). */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(length(col("text")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Deterministic stand-in for a real decoder: 32-bit md5 prefix of a byte
    * range (matches the oracle's `('0x' || substr(md5(x),1,8))::BIGINT`). */
  def fingerprint(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Decode + feature-extract: batched per-partition pass over the blobs.
    * STUB decode — features are (n_bytes, fingerprint); a real pipeline
    * would emit an embedding here with the identical plumbing. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map(a => AssetFeatures(a.asset_id, a.kind,
            a.bytes.length.toLong, fingerprint(a.bytes, 0, a.bytes.length)))
        }
      }.toDF()
  }

  /** Frame sampling for video assets: `FrameCount` equal byte ranges per
    * blob (a real pipeline seeks keyframes; the slicing/explode/schema
    * plumbing is identical). One input row fans out to FrameCount rows
    * executor-side — no shuffle. */
  def sampleFrames(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "video")
      .select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            val flen = a.bytes.length / FrameCount
            (0 until FrameCount).map(i =>
              Frame(a.asset_id, i, flen.toLong, fingerprint(a.bytes, i * flen, flen)))
          }
        }
      }.toDF()
  }

  case class Resized(asset_id: Long, r_len: Long, r_fp: Long)

  /** Target size for [[resize]] output. */
  val TargetBytes = 256

  /** Resize for image assets: stride-downsample each blob to ~[[TargetBytes]]
    * bytes (every k-th byte, k = ceil(n/target)) — the deterministic stand-in
    * for a pixel resample; a real pipeline swaps the stride loop for a codec
    * scale call on the SAME batched per-partition plumbing. Blobs shrink
    * executor-side before anything downstream sees them — at 100 TB the
    * resize is the compression boundary that makes the rest of the pipeline
    * metadata-sized. */
  def resize(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "image")
      .select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { a =>
            val n = a.bytes.length
            val k = (n + TargetBytes - 1) / TargetBytes
            val out = Array.range(0, n, math.max(k, 1)).map(a.bytes)
            Resized(a.asset_id, out.length.toLong,
              fingerprint(out, 0, out.length))
          }
        }
      }.toDF()
  }

  /** Q-MM1: metadata + stub-decoded features for every asset. */
  def qMm1(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(assets(spark, dir)).orderBy("asset_id")

  /** Q-MM2: deterministic frame samples of the video assets. */
  def qMm2(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(spark, dir)).orderBy("asset_id", "frame_idx")

  /** Q-MM3: stride-downsampled image assets. */
  def qMm3(spark: SparkSession, dir: String): DataFrame =
    resize(assets(spark, dir)).orderBy("asset_id")

  // ---- pluggable REAL decode (the interface the stub stands in for) ----

  /** Decoded samples of one asset: row-major per-pixel per-channel values.
    * For an image: y-major pixels, channels (r, g, b) per pixel. */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           samples: Array[Int])

  /** The decode boundary: executors call this per blob, inside the batched
    * mapPartitions — a deployment registers a codec-backed implementation
    * (JNI/ffmpeg/...) without touching any Spark plumbing. Must be
    * Serializable: the decoder object ships in the task closure. */
  trait AssetDecoder extends Serializable {
    /** None when the codec cannot parse the blob (corrupt/unknown format). */
    def decode(bytes: Array[Byte]): Option[Decoded]
  }

  /** No-codec fallback (the declared stub): treats the blob as a 1×n
    * single-channel "image" whose samples are the raw bytes — deterministic,
    * dependency-free, and honest about being a fake. */
  object StubDecoder extends AssetDecoder {
    override def decode(bytes: Array[Byte]): Option[Decoded] =
      Some(Decoded(bytes.length, 1, 1, bytes.map(_ & 0xff)))
  }

  /** REAL image decode via javax.imageio — pure JVM, no native codecs, PNG
    * and JPEG readers ship with the JDK. Retired the "decode is stubbed"
    * caveat for images; audio ([[WavDecoder]]), multi-frame video
    * ([[GifFrameDecoder]]) and the frame-sampling path
    * ([[Y4mFrameDecoder]]) followed — [[StubDecoder]] remains only as the
    * declared fallback for opaque blobs with no parseable container. */
  object ImageIoDecoder extends AssetDecoder {
    override def decode(bytes: Array[Byte]): Option[Decoded] = try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Int](w * h * 3)
        var k = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(k) = (rgb >> 16) & 0xff; out(k + 1) = (rgb >> 8) & 0xff
            out(k + 2) = rgb & 0xff
            k += 3
            x += 1
          }
          y += 1
        }
        Some(Decoded(w, h, 3, out))
      }
    } catch {
      // the decode CONTRACT is None-on-corrupt: a truncated blob whose
      // magic bytes still claim a reader throws from inside ImageIO — that
      // must drop the row, not fail the task (and with retries, the job)
      case scala.util.control.NonFatal(_) => None
    }
  }

  case class PixelFeatures(asset_id: Long, w: Int, h: Int, px_sum: Long)

  /** Decode via `decoder` and emit pixel statistics — same batched
    * per-partition shape as [[decodeFeatures]]; undecodable blobs are
    * dropped (a production pipeline would route them to a dead-letter
    * column, the merge engine's A13 pattern). */
  def pixelFeatures(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map(d =>
              PixelFeatures(a.asset_id, d.width, d.height,
                d.samples.foldLeft(0L)(_ + _)))
          }
        }
      }.toDF()
  }

  /** Side of the synthetic PNG canvas for [[qMm4]]. */
  val PngSide = 8

  /** Deterministic gray value of pixel (x, y) of asset `id` — the pixel
    * math the DuckDB oracle replays arithmetically (no decoder on its
    * side): g = (id*31 + x*7 + y*13) mod 256. */
  def pngGray(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** The asset-population rule: documents with doc_id below this bound
    * carry one image and one audio asset (the declared fixture subset).
    * [[graft.operators.MmIvf.append]] applies the SAME bound to a
    * gate-admitted delta, so append and rebuild see one population. */
  val AssetDocBound = 200L

  /** Real PNG assets, generated executor-side: an 8×8 gray canvas per
    * document (doc_id < [[AssetDocBound]]), ENCODED through the actual PNG
    * writer. The blobs are genuine images — a broken decoder cannot
    * reproduce the oracle's pixel sums from them. */
  def pngAssets(spark: SparkSession, dir: String): DataFrame =
    pngAssetsOf(spark, Tables.documents(spark, dir)
      .where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id")))

  /** [[pngAssets]] over a caller-supplied `asset_id` frame — the delta
    * form [[graft.operators.MmIvf.append]] feeds with a gate-admitted
    * batch's (bounded) asset ids. */
  private[graft] def pngAssetsOf(spark: SparkSession,
                                 ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("asset_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            PngSide, PngSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < PngSide) {
            var x = 0
            while (x < PngSide) {
              val g = pngGray(id, x, y)
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** REAL audio decode via javax.sound.sampled — pure JVM, the WAV/PCM
    * reader ships with the JDK (no audio hardware involved: parsing only).
    * Emits 16-bit signed samples as one channel. Retires the "audio stays
    * stubbed" caveat the way [[ImageIoDecoder]] did for images; video is
    * covered by [[GifFrameDecoder]] (codec'd multi-frame) and
    * [[Y4mFrameDecoder]] (uncompressed container + seekable sampling). */
  object WavDecoder extends AssetDecoder {
    override def decode(bytes: Array[Byte]): Option[Decoded] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val raw = in.readAllBytes()
          val n = raw.length / 2
          val out = new Array[Int](n)
          val le = !fmt.isBigEndian
          var k = 0
          while (k < n) {
            val (b0, b1) = (raw(2 * k) & 0xff, raw(2 * k + 1) & 0xff)
            out(k) = (if (le) (b1 << 8) | b0 else (b0 << 8) | b1).toShort.toInt
            k += 1
          }
          Some(Decoded(n, 1, 1, out))
        }
      } catch {
        // None-on-corrupt, like ImageIoDecoder: a truncated RIFF body
        // throws EOF/IO from inside the parser, not only
        // UnsupportedAudioFileException
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Samples per synthetic WAV asset for [[qMm5]]. */
  val WavSamples = 64

  /** Deterministic 16-bit sample k of asset `id` — the closed form the
    * oracle replays: s = (id*37 + k*11) mod 2048 − 1024. */
  def wavSample(id: Long, k: Int): Int =
    ((id * 37 + k * 11) % 2048 - 1024).toInt

  /** Real WAV assets, generated executor-side: [[WavSamples]] PCM-16 mono
    * samples per document (doc_id < [[AssetDocBound]]), encoded through
    * the actual JDK WAV writer — genuine audio containers, same posture
    * as [[pngAssets]]. */
  def wavAssets(spark: SparkSession, dir: String): DataFrame =
    wavAssetsOf(spark, Tables.documents(spark, dir)
      .where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id")))

  /** [[wavAssets]] over a caller-supplied `asset_id` frame (the
    * [[pngAssetsOf]] delta form, audio lane). */
  private[graft] def wavAssetsOf(spark: SparkSession,
                                 ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("asset_id")).as[Long]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val pcm = new Array[Byte](WavSamples * 2)
          var k = 0
          while (k < WavSamples) {
            val s = wavSample(id, k)
            pcm(2 * k) = (s & 0xff).toByte
            pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
            k += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, "audio", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Q-MM5: REAL audio decode — WAV-encode deterministic PCM, decode with
    * [[WavDecoder]], emit sample sums the oracle recomputes from the
    * closed-form sample function (PCM-in-WAV is lossless). Same batched
    * executor-side encode+decode pass as [[qMm4]]. */
  def qMm5(spark: SparkSession, dir: String): DataFrame =
    pixelFeatures(wavAssets(spark, dir), WavDecoder).orderBy("asset_id")

  /** Q-MM4: REAL decode — PNG-encode deterministic canvases, decode them
    * with [[ImageIoDecoder]], and emit pixel sums the oracle recomputes
    * from the closed-form pixel function. PNG is lossless, so
    * decoded == generated pixel-for-pixel; any decoder defect (channel
    * order, row order, color model) breaks the hash match. Encode and
    * decode both run inside one batched mapPartitions pass — bytes never
    * leave the executor, the multimodal scale contract. */
  def qMm4(spark: SparkSession, dir: String): DataFrame =
    pixelFeatures(pngAssets(spark, dir), ImageIoDecoder).orderBy("asset_id")

  case class TileStats(asset_id: Long, w: Int, h: Int,
                       t00: Long, t01: Long, t10: Long, t11: Long)

  /** Q-MM11: PATCH TILING through the real decode — the image splits into a
    * 2×2 grid (4×4-pixel tiles on the 8×8 canvas) and each tile reduces to
    * its integer sample sum: the ViT-patch plumbing (decode → grid →
    * per-patch reduction) with the patch embedding stubbed to the exact
    * integer statistic the oracle can replay arithmetically. The grid
    * arithmetic is channel-aware (samples are interleaved RGB; a pixel's
    * tile comes from its x, y — channel order, row order, and tile
    * boundaries are ALL pinned by the hash match, the defects patch
    * pipelines actually ship). Same batched mapPartitions shape as
    * [[pixelFeatures]]: an image enters an executor as bytes and leaves as
    * 4 longs; blobs never cross an exchange. */
  def tileStats(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val t = new Array[Long](4)
              val w = d.width
              var i = 0
              val n = d.samples.length
              while (i < n) {
                val p = i / d.channels
                val x = p % w; val y = p / w
                val tx = if (x * 2 >= w) 1 else 0
                val ty = if (y * 2 >= d.height) 1 else 0
                t(ty * 2 + tx) += d.samples(i)
                i += 1
              }
              TileStats(a.asset_id, w, d.height, t(0), t(1), t(2), t(3))
            }
          }
        }
      }.toDF()
  }

  def qMm11(spark: SparkSession, dir: String): DataFrame =
    tileStats(pngAssets(spark, dir), ImageIoDecoder).orderBy("asset_id")

  // ---- JPEG lane (q_mm13) ----

  /** Distinct gray levels for the JPEG canvases, spaced 16 apart in
    * [24, 232] — level(id) = (id·37) mod 14, gray(id) = level·16 + 24. */
  val JpegLevels = 14

  def jpegLevel(id: Long): Int = ((id * 37) % JpegLevels).toInt

  /** Real JPEG assets: one CONSTANT-gray 8×8 canvas per document
    * (doc_id < 200), encoded through the JDK's actual JPEG writer at
    * EXPLICIT quality 0.95 (the default is writer-dependent; pinning it
    * makes the blobs deterministic). JPEG is the dominant real-corpus
    * image format — javax.imageio decodes it natively, so the whole
    * image lane ([[pixelFeatures]], [[tileStats]], [[imageHashes]]) runs
    * on it unchanged. */
  def jpegAssets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).where(col("doc_id") < 200)
      .select(col("doc_id").as("asset_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val g = jpegLevel(id) * 16 + 24
          val img = new java.awt.image.BufferedImage(
            PngSide, PngSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < PngSide) {
            var x = 0
            while (x < PngSide) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("jpeg").next()
          val p = writer.getDefaultWriteParam
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(0.95f)
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try {
            writer.setOutput(out)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
          } finally { writer.dispose(); out.close() }
          (id, "image", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Q-MM13 — the JPEG DECODE lane: real JPEG blobs ([[jpegAssets]])
    * through the real [[ImageIoDecoder]], reduced to the recovered gray
    * LEVEL per asset.
    *
    * The oracle contract differs from [[qMm4]]'s by necessity: JPEG is
    * LOSSY, so "decoded == generated pixel-for-pixel" is impossible BY
    * DEFINITION — an exact-pixel-sum oracle would be asserting properties
    * of one codec build, not of this engine. Instead the canvases are
    * constant-gray at levels spaced 16 apart, and the checked statistic is
    * the DECISION-LEVEL recovery: lvl = (⌊px_sum / (w·h·3)⌋ − 16) DIV 16,
    * which reproduces the closed-form level for ANY decode whose mean
    * error is within ±8 gray units (measured JDK round-trip error on these
    * canvases: ≤ 2 — the PlanAuditSpec headroom test pins a ≤ 4 bound).
    * Width, height, and pixel count stay exact (lossy compression never
    * changes geometry). Same batched mapPartitions shape as the PNG lane:
    * blobs never cross an exchange.
    *
    * JDK-version contract: the oracle depends on the platform JPEG decoder
    * only through "mean round-trip error ≤ 4 on constant canvases" — half
    * the ±8 decision margin. The fold at a decision boundary is integer
    * floor division (exact boundary → the UPPER level), restated from
    * first principles by the adversarial boundary-canvas spec
    * (PlanAuditSpec), which also re-measures the error contract at the
    * level EDGE — so a JDK upgrade whose decoder drifts fails that spec
    * loudly instead of silently flipping a level here. */
  def qMm13(spark: SparkSession, dir: String): DataFrame =
    pixelFeatures(jpegAssets(spark, dir), ImageIoDecoder)
      .selectExpr("asset_id", "w", "h",
        "CAST(((px_sum DIV (CAST(w AS BIGINT) * h * 3)) - 16) DIV 16 AS BIGINT) AS lvl")
      .orderBy("asset_id")

  /** 64-bit average-hash of a decoded image as four 16-bit bands: bit k
    * (row-major pixel index) is set iff pixel_k × n ≥ Σ pixels (the
    * integer form of "above the mean" — no float division, so the oracle
    * replays it exactly). First channel only (the gray plane for r=g=b
    * canvases). Split into bands so the near-dup join below can pigeonhole. */
  final case class ImageHash(asset_id: Long, b0: Long, b1: Long, b2: Long,
                             b3: Long)

  /** Decode + average-hash in one batched executor pass — bytes never
    * leave the executor, same contract as [[pixelFeatures]]. */
  def imageHashes(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val n = d.width * d.height
              var total = 0L
              var k = 0
              while (k < n) { total += d.samples(k * d.channels); k += 1 }
              val bands = new Array[Long](4)
              k = 0
              while (k < n && k < 64) {
                if (d.samples(k * d.channels).toLong * n >= total)
                  bands(k / 16) |= 1L << (k % 16)
                k += 1
              }
              ImageHash(a.asset_id, bands(0), bands(1), bands(2), bands(3))
            }
          }
        }
      }.toDF()
  }

  /** Q-MM9: perceptual-hash image NEAR-DUP pairs — the dedup-family
    * pigeonhole ([[Dedup.qD6]]'s shape) applied to REAL decoded images:
    * PNG-decode → 64-bit average-hash → 4×16-bit bands → candidates =
    * band-equality join (complete for Hamming ≤ 3: 4 bands, ≤3 differing
    * bits, one band must match exactly) → exact Hamming verify on the
    * bit_count of the band XORs. Never all-pairs: candidate volume is the
    * band-bucket join's, and the verify is O(candidates). The hash frame
    * is referenced twice (both join sides) — at 100 TB persist it or
    * chain broadcasts as [[Dedup.qD11]] does; at asset-catalog sizes
    * (hashes are 5 longs/row, ~1e-6 of the corpus bytes) recompute is the
    * cheaper plan. */
  def qMm9(spark: SparkSession, dir: String): DataFrame = {
    val h = imageHashes(pngAssets(spark, dir), ImageIoDecoder)
    def banded(p: String) = h.toDF(
      s"${p}_id", s"${p}0", s"${p}1", s"${p}2", s"${p}3")
      .selectExpr(s"${p}_id", s"${p}0", s"${p}1", s"${p}2", s"${p}3",
        s"posexplode(array(${p}0, ${p}1, ${p}2, ${p}3)) AS (bi, bv)")
    banded("a").join(banded("b"), Seq("bi", "bv"))
      .where(col("a_id") < col("b_id"))
      .selectExpr("a_id", "b_id",
        "CAST(bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + " +
          "bit_count(a2 ^ b2) + bit_count(a3 ^ b3) AS BIGINT) AS dist")
      .where(col("dist") <= 3)
      .distinct()
      .orderBy("a_id", "b_id")
  }

  // ---- REAL multi-frame (video-path) decode ----

  /** The multi-frame decode boundary — the video analogue of
    * [[AssetDecoder]]: a frame-capable codec parses the whole container
    * into per-frame sample planes. None on a container the codec cannot
    * parse ([[sampleFrames]]' byte-range slicing stays the declared
    * no-codec fallback). */
  trait FrameDecoder extends Serializable {
    def decodeFrames(bytes: Array[Byte]): Option[Seq[Decoded]]
  }

  /** REAL multi-frame decode via the JDK's GIF reader (pure JVM, ships
    * with javax.imageio): animated GIF is the one multi-frame container a
    * dependency-free JVM can both write and read, which retires the
    * "video decode is stubbed" caveat the way [[ImageIoDecoder]] /
    * [[WavDecoder]] did for image and audio. Frames come back gray
    * (single channel) because [[gifAssets]] writes an explicit 256-gray
    * palette — palette-indexed GIF is lossless, so any frame-order or
    * compositing defect breaks the oracle hash. A deployment swaps in an
    * ffmpeg/JNI [[FrameDecoder]] for real codecs; the Spark plumbing
    * ([[frameFeatures]]) is identical. */
  object GifFrameDecoder extends FrameDecoder {
    override def decodeFrames(bytes: Array[Byte]): Option[Seq[Decoded]] = {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      var iis: javax.imageio.stream.ImageInputStream = null
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
        val n = reader.getNumImages(/*allowSearch=*/ true)
        if (n <= 0) None
        else Some((0 until n).map { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Int](w * h)
          var k = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out(k) = img.getRGB(x, y) & 0xff // gray palette: b == g == r
              k += 1
              x += 1
            }
            y += 1
          }
          Decoded(w, h, 1, out)
        })
      } catch {
        // None-on-corrupt, same contract as the scalar decoders: a
        // truncated GIF body throws from inside the reader mid-sequence
        case scala.util.control.NonFatal(_) => None
      } finally {
        reader.dispose()
        // the reader does not own its input stream: an unclosed
        // MemoryCacheImageInputStream leaks its cache per decoded asset
        if (iis != null) iis.close()
      }
    }
  }

  /** Side of the synthetic GIF canvas for [[qMm6]]. */
  val GifSide = 8

  /** Deterministic gray value of pixel (x, y) of frame `f` of asset `id` —
    * the closed form the DuckDB oracle replays arithmetically:
    * g = (id*31 + f*17 + x*7 + y*13) mod 256. */
  def gifGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  /** Real animated-GIF assets, generated executor-side: [[FrameCount]]
    * 8×8 frames per document (doc_id < 200), each a palette-indexed gray
    * canvas, written through the actual JDK GIF sequence writer — genuine
    * multi-frame containers, same posture as [[pngAssets]]/[[wavAssets]].
    * The explicit 256-gray IndexColorModel makes the encode LOSSLESS (the
    * writer keeps the palette instead of quantizing an RGB canvas). */
  def gifAssets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).where(col("doc_id") < 200)
      .select(col("doc_id").as("asset_id")).as[Long]
      .mapPartitions { it =>
        val grays = Array.tabulate[Byte](256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < FrameCount) {
              val img = new java.awt.image.BufferedImage(GifSide, GifSide,
                java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
              var y = 0
              while (y < GifSide) {
                var x = 0
                while (x < GifSide) {
                  img.getRaster.setSample(x, y, 0, gifGray(id, f, x, y))
                  x += 1
                }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally {
            writer.dispose()
            ios.close()
          }
          (id, "video", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Side of the synthetic Y4M canvas for [[qMm23]]. */
  val Y4mSide = 8

  /** Deterministic gray value of pixel (x, y) of frame `f` of asset `id`
    * for the Y4M lane — the closed form the oracle replays:
    * g = (id*23 + f*17 + x*5 + y*11) mod 256. */
  def y4mGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 23 + f * 17 + x * 5 + y * 11) % 256).toInt

  /** Real YUV4MPEG2 (Y4M) assets, generated executor-side: [[FrameCount]]
    * 8×8 monochrome frames per document (doc_id < [[AssetDocBound]]) in
    * the actual Y4M container (`YUV4MPEG2 …\n` header, `FRAME\n` + raw Y
    * plane per frame) — the UNCOMPRESSED video container a pure-JVM
    * pipeline can both write and read byte-exactly, same posture as
    * [[gifAssets]] (which covers the CODEC'd multi-frame path). Raw
    * planes are lossless by definition, so the oracle replays pixel math
    * with zero decode headroom. */
  def y4mAssets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(s"YUV4MPEG2 W$Y4mSide H$Y4mSide F25:1 Ip A1:1 Cmono\n"
            .getBytes("US-ASCII"))
          var f = 0
          while (f < FrameCount) {
            bos.write("FRAME\n".getBytes("US-ASCII"))
            var y = 0
            while (y < Y4mSide) {
              var x = 0
              while (x < Y4mSide) {
                bos.write(y4mGray(id, f, x, y))
                x += 1
              }
              y += 1
            }
            f += 1
          }
          (id, "video", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** REAL Y4M parse — pure JVM, no codec needed (the container is raw
    * planes): header tokens give W/H/C, each `FRAME\n` marker is followed
    * by exactly w·h Y bytes (mono). Because every frame is CONSTANT SIZE,
    * frame k lives at a closed-form offset — the property
    * [[sampleY4mFrames]] exploits to decode ONLY sampled frames, which is
    * the real 100 TB shape of frame sampling (contrast [[GifFrameDecoder]],
    * where inter-frame compositing forces sequential decode). None on any
    * malformed header/frame, the family's corrupt-input contract. */
  object Y4mFrameDecoder extends FrameDecoder {
    /** (width, height, first-frame offset) from the header, or None. */
    private[operators] def header(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      val nl = bytes.indexOf('\n'.toByte)
      if (nl <= 0) return None
      val toks = new String(bytes, 0, nl, "US-ASCII").split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
      // toIntOption, not toInt: a malformed numeric token ("Wx", "H")
      // must yield None — [[sampleY4mFrames]] calls header outside any
      // try, so a throwing parse would fail the whole job instead of
      // dropping the clip (ADVICE r16).
      val w = toks.collectFirst { case t if t.startsWith("W") => t }
        .flatMap(_.tail.toIntOption)
      val h = toks.collectFirst { case t if t.startsWith("H") => t }
        .flatMap(_.tail.toIntOption)
      val mono = toks.exists(_ == "Cmono")
      (w, h) match {
        case (Some(wv), Some(hv)) if mono && wv > 0 && hv > 0 =>
          Some((wv, hv, nl + 1))
        case _ => None
      }
    }

    private val FrameMarker = "FRAME\n".getBytes("US-ASCII")

    /** Decode frame k in O(1): frames are marker + w·h bytes each. */
    private[operators] def frameAt(bytes: Array[Byte], w: Int, h: Int,
                                   off0: Int, k: Int): Option[Decoded] = {
      val stride = FrameMarker.length + w * h
      val off = off0 + k * stride
      if (off + stride > bytes.length) return None
      var i = 0
      while (i < FrameMarker.length) {
        if (bytes(off + i) != FrameMarker(i)) return None
        i += 1
      }
      val out = new Array[Int](w * h)
      var p = 0
      while (p < out.length) {
        out(p) = bytes(off + FrameMarker.length + p) & 0xff
        p += 1
      }
      Some(Decoded(w, h, 1, out))
    }

    override def decodeFrames(bytes: Array[Byte]): Option[Seq[Decoded]] =
      try header(bytes).flatMap { case (w, h, off0) =>
        val stride = FrameMarker.length + w * h
        val n = (bytes.length - off0) / stride
        if (n <= 0 || (bytes.length - off0) % stride != 0) None
        else {
          val fs = (0 until n).flatMap(frameAt(bytes, w, h, off0, _))
          if (fs.length == n) Some(fs) else None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  case class FramePixels(asset_id: Long, frame_idx: Int, w: Int, h: Int,
                         px_sum: Long)

  /** Decode every frame via `decoder` and emit per-frame pixel statistics —
    * the multi-frame analogue of [[pixelFeatures]], same batched
    * per-partition shape (one input row fans out to n_frames rows
    * executor-side, no shuffle); unparseable containers are dropped. */
  def frameFeatures(assets: DataFrame, decoder: FrameDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decodeFrames(a.bytes).toSeq.flatMap(_.zipWithIndex.map {
              case (d, i) => FramePixels(a.asset_id, i, d.width, d.height,
                d.samples.foldLeft(0L)(_ + _))
            })
          }
        }
      }.toDF()
  }

  /** Q-MM6: REAL video-path decode — animated-GIF-encode deterministic
    * frame canvases, decode them with [[GifFrameDecoder]], emit per-frame
    * pixel sums the oracle recomputes from the closed-form frame math
    * (palette GIF is lossless). Any frame-count, frame-order, or palette
    * defect breaks the hash match. */
  def qMm6(spark: SparkSession, dir: String): DataFrame =
    frameFeatures(gifAssets(spark, dir), GifFrameDecoder)
      .orderBy("asset_id", "frame_idx")

  /** [[qMm23]]'s sampling stride: keep every 2nd frame. */
  val FrameSampleStride = 2

  /** REAL frame sampling over Y4M clips (VERDICT r15 task 8 — the last
    * stub decode path made real): per asset, decode ONLY the frames the
    * stride selects — Y4M's constant frame size gives frame k a
    * closed-form offset, so the kernel seeks instead of decoding the
    * whole clip (exactly how a production sampler treats raw/intra-only
    * video; [[sampleFrames]] remains the declared no-codec byte-range
    * fallback for opaque blobs). Same batched mapPartitions shape as
    * every decode kernel: one input row fans out to the sampled-frame
    * rows executor-side, bytes never cross an exchange. Corrupt-input
    * contract: a clip failing the HEADER parse is dropped (the family
    * rule); an individually corrupt sampled frame (bad marker, truncated
    * tail) is skipped while intact sampled frames still serve — what a
    * production sampler wants on a partially-damaged clip (the
    * all-or-nothing alternative is [[Y4mFrameDecoder.decodeFrames]]). */
  def sampleY4mFrames(assets: DataFrame, stride: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            Y4mFrameDecoder.header(a.bytes).toSeq.flatMap {
              case (w, h, off0) =>
                val frameBytes = "FRAME\n".length + w * h
                val n = (a.bytes.length - off0) / frameBytes
                (0 until n by stride).flatMap(k =>
                  Y4mFrameDecoder.frameAt(a.bytes, w, h, off0, k).map(d =>
                    FramePixels(a.asset_id, k, d.width, d.height,
                      d.samples.foldLeft(0L)(_ + _))))
            }
          }
        }
      }.toDF()
  }

  /** Q-MM23: REAL video frame sampling — Y4M-encode deterministic raw
    * frames, SEEK-decode every [[FrameSampleStride]]-th one, emit
    * per-sampled-frame pixel sums the oracle recomputes from the
    * closed-form pixel math ([[y4mGray]]; raw planes are lossless, so
    * there is no decode headroom to argue about). Completes the decode
    * arc: image (PNG/JPEG), audio (WAV), multi-frame codec (GIF), and
    * now the sampling path on an uncompressed container. */
  def qMm23(spark: SparkSession, dir: String): DataFrame =
    sampleY4mFrames(y4mAssets(spark, dir), FrameSampleStride)
      .orderBy("asset_id", "frame_idx")

  case class Motion(asset_id: Long, n_frames: Int, motion: Long)

  /** Per-asset TEMPORAL feature over decoded frames: motion energy = the
    * sum over consecutive frame pairs of per-pixel absolute differences —
    * the canonical shot-change / static-clip signal a video curation
    * pipeline computes right after decode. Per-PIXEL work across frames
    * (not a per-frame scalar), so a frame-order or compositing defect in
    * the decoder changes the value. Same batched mapPartitions shape as
    * [[frameFeatures]]; whole clips reduce to one row executor-side. */
  def frameMotion(assets: DataFrame, decoder: FrameDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decodeFrames(a.bytes).map { frames =>
              var m = 0L
              var f = 1
              while (f < frames.length) {
                val prev = frames(f - 1).samples
                val cur = frames(f).samples
                val n = math.min(prev.length, cur.length)
                var k = 0
                while (k < n) { m += math.abs(cur(k) - prev(k)); k += 1 }
                f += 1
              }
              Motion(a.asset_id, frames.length, m)
            }
          }
        }
      }.toDF()
  }

  /** Q-MM7: REAL temporal decode feature — motion energy of the animated
    * GIFs through [[GifFrameDecoder]]; the oracle replays the closed-form
    * pixel math ([[gifGray]]) and sums |g(f) − g(f−1)| arithmetically. */
  def qMm7(spark: SparkSession, dir: String): DataFrame =
    frameMotion(gifAssets(spark, dir), GifFrameDecoder).orderBy("asset_id")

  case class Keyframes(asset_id: Long, n_frames: Int, n_key: Int,
                       key_mask: Long)

  /** Per-asset KEYFRAME SELECTION over decoded frames: a frame is a
    * keyframe iff its inter-frame motion (the [[frameMotion]] per-pair
    * pixel-delta sum) is STRICTLY above the clip's average pair delta —
    * the standard cheap shot-change heuristic a video curation pipeline
    * runs to pick representative frames for captioning/embedding; frame 0
    * always keys. Integer-exact: `delta_f · (n_frames − 1) > total` avoids
    * the division entirely. `key_mask` bit f marks frame f (bit 0 always
    * set), so a downstream frame-sampler selects without re-decoding.
    * Same batched mapPartitions shape as [[frameMotion]]: whole clips
    * reduce to one row executor-side, blobs never cross an exchange. */
  def keyframes(assets: DataFrame, decoder: FrameDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decodeFrames(a.bytes).map { frames =>
              val nPairs = frames.length - 1
              val deltas = new Array[Long](math.max(nPairs, 0))
              var total = 0L
              var f = 1
              while (f < frames.length) {
                val prev = frames(f - 1).samples
                val cur = frames(f).samples
                val n = math.min(prev.length, cur.length)
                var k = 0
                var d = 0L
                while (k < n) { d += math.abs(cur(k) - prev(k)); k += 1 }
                deltas(f - 1) = d
                total += d
                f += 1
              }
              var mask = 1L
              var nKey = 1
              f = 1
              while (f < frames.length) {
                if (deltas(f - 1) * nPairs > total) {
                  mask |= 1L << f
                  nKey += 1
                }
                f += 1
              }
              Keyframes(a.asset_id, frames.length, nKey, mask)
            }
          }
        }
      }.toDF()
  }

  /** Q-MM16: keyframe detection through the real GIF decode; the oracle
    * replays the closed-form pixel math ([[gifGray]]) — per-pair deltas,
    * the strictly-above-average test, and the bit mask arithmetically. */
  def qMm16(spark: SparkSession, dir: String): DataFrame =
    keyframes(gifAssets(spark, dir), GifFrameDecoder).orderBy("asset_id")

  case class Vad(asset_id: Long, n_frames: Int, n_speech: Int,
                 speech_mask: Long, n_segs: Int)

  /** Per-clip energy-gate VOICE-ACTIVITY segmentation over the real WAV
    * decode: the clip splits into 8 equal time frames ([[audioBands]]'
    * banding, twice as fine); a frame is SPEECH iff its energy (exact
    * integer Σs²) is at least HALF the clip's mean frame energy
    * (2·e_f·F >= total — the classic energy-gate VAD threshold, division-
    * free), and maximal speech runs are counted as segments — the
    * trim-silence / segment-for-ASR pass a speech-data curation pipeline
    * runs right after decode. `speech_mask` bit f marks frame f so a
    * downstream splitter cuts without re-decoding. Same batched
    * mapPartitions shape as [[audioBands]]: one row per clip executor-side,
    * blobs never cross an exchange. */
  def audioVad(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val F = 8
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val e = new Array[Long](F)
              val n = d.samples.length
              var k = 0
              while (k < n) {
                val s = d.samples(k).toLong
                // Long bucket index: k * F overflows Int past ~268M samples
                // (~1.7h at 44.1kHz) and would throw on the executor
                e(math.min((k.toLong * F / math.max(n, 1)).toInt, F - 1)) += s * s
                k += 1
              }
              val total = e.sum
              var mask = 0L
              var nSpeech = 0
              var nSegs = 0
              var prev = false
              var f = 0
              while (f < F) {
                val sp = 2L * e(f) * F >= total
                if (sp) {
                  mask |= 1L << f
                  nSpeech += 1
                  if (!prev) nSegs += 1
                }
                prev = sp
                f += 1
              }
              Vad(a.asset_id, F, nSpeech, mask, nSegs)
            }
          }
        }
      }.toDF()
  }

  /** Q-MM17: VAD segmentation through the real WAV decode; the oracle
    * replays the closed-form sample function ([[wavSample]]), the
    * half-mean energy gate, and the run count arithmetically. */
  def qMm17(spark: SparkSession, dir: String): DataFrame =
    audioVad(wavAssets(spark, dir), WavDecoder).orderBy("asset_id")

  case class AudioBands(asset_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Q-MM8: audio FEATURE EXTRACTION through the real WAV decode — energy
    * (sum of squared 16-bit samples, exact integer math) in 4 consecutive
    * time bands of 16 samples each: the time-domain band-energy profile a
    * speech/music curation gate thresholds on. Same batched mapPartitions
    * shape as [[pixelFeatures]]; a clip reduces to one row executor-side.
    * The oracle replays the closed-form sample function ([[wavSample]]) —
    * PCM-in-WAV is lossless, so any decode defect (endianness, width,
    * offset) breaks the integer hash match. */
  def audioBands(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val e = new Array[Long](4)
              var k = 0
              val n = d.samples.length
              while (k < n) {
                val s = d.samples(k).toLong
                e(math.min(k * 4 / math.max(n, 1), 3)) += s * s
                k += 1
              }
              AudioBands(a.asset_id, e(0), e(1), e(2), e(3))
            }
          }
        }
      }.toDF()
  }

  def qMm8(spark: SparkSession, dir: String): DataFrame =
    audioBands(wavAssets(spark, dir), WavDecoder).orderBy("asset_id")

  case class AudioPrint(asset_id: Long, e0: Long, e1: Long, e2: Long, e3: Long,
                        e4: Long, e5: Long, e6: Long, e7: Long)

  /** Per-clip 8-frame energy profile (8 samples per frame, exact integer
    * Σs² per frame) through the real WAV decode — the raw material of the
    * [[qMm12]] audio fingerprint. Same batched executor-side shape as
    * [[audioBands]]: a clip reduces to 8 longs, bytes never cross an
    * exchange. */
  def audioPrints(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val e = new Array[Long](8)
              var k = 0
              val n = d.samples.length
              while (k < n) {
                val s = d.samples(k).toLong
                e(math.min(k * 8 / math.max(n, 1), 7)) += s * s
                k += 1
              }
              AudioPrint(a.asset_id, e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7))
            }
          }
        }
      }.toDF()
  }

  /** Q-MM12: audio-fingerprint NEAR-DUP pairs — the third modality of the
    * banded dedup family (text q_d6, image q_mm9, audio here), in the
    * Haitsma-Kalker shape: real WAV decode → 8 frame energies →
    * per-frame coarse code = floor-log2(energy+1) (the engine-exact
    * `length(bin(x))-1` idiom) → 2 bands of 4 codes → candidates = band
    * equality join (pigeonhole: ≤ 1 differing code ⇒ one band matches
    * exactly) → verify = count of differing codes ≤ 1 on the candidate
    * set only. Catches re-encoded / slightly-reprocessed clips that
    * byte-level dedup misses. Never all-pairs: candidate volume is the
    * band-bucket join's, verify is O(candidates); fingerprints are 8
    * small ints per clip (~1e-6 of the audio bytes), so at 100 TB the
    * fingerprint frame is the only thing that shuffles — the clip bytes
    * reduce executor-side in one batched decode pass. */
  def qMm12(spark: SparkSession, dir: String): DataFrame = {
    val q = audioPrints(wavAssets(spark, dir), WavDecoder)
      .selectExpr("asset_id" +: (0 to 7).map(f =>
        s"CAST(length(bin(e$f + 1)) - 1 AS BIGINT) AS q$f"): _*)
    // a band's 4 codes pack into ONE BIGINT (each code = floor-log2 of a
    // BIGINT, so < 64 = 6 bits) — the join key is a scalar, exactly
    // qMm9's shape, not a struct comparison
    def pack(fs: Range, p: String) =
      fs.map(f => s"${p}$f").reduce((acc, c) => s"($acc * 64 + $c)")
    def banded(p: String) = q.toDF(
      s"${p}_id" +: (0 to 7).map(f => s"${p}$f"): _*)
      .selectExpr((s"${p}_id" +: (0 to 7).map(f => s"${p}$f")) :+
        (s"posexplode(array(${pack(0 to 3, p)}, ${pack(4 to 7, p)})) " +
          "AS (bi, bv)"): _*)
    banded("a").join(banded("b"), Seq("bi", "bv"))
      .where(col("a_id") < col("b_id"))
      .selectExpr("a_id", "b_id",
        "CAST(" + (0 to 7).map(f =>
          s"CAST(a$f <> b$f AS INT)").mkString(" + ") + " AS BIGINT) AS n_diff")
      .where(col("n_diff") <= 1)
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** Real PNG assets with VARYING geometry for the metadata fast path
    * ([[qMm10]]): width 4 + id mod 13, height 4 + id mod 7, alternating
    * truecolor (even ids → PNG color type 2) and 8-bit grayscale (odd ids
    * → color type 0) canvases, encoded through the actual PNG writer —
    * so every header field the parser extracts varies per asset and a
    * wrong byte offset cannot accidentally match the oracle. */
  def pngMetaAssets(spark: SparkSession, dir: String,
                    keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).where(col("doc_id") < 300)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 13).toInt
          val h = 4 + (id % 7).toInt
          val t = if (id % 2 == 0) java.awt.image.BufferedImage.TYPE_INT_RGB
            else java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          val img = new java.awt.image.BufferedImage(w, h, t)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = pngGray(id, x, y)
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Q-MM10 — METADATA-ONLY fast path: image dimensions / bit depth /
    * color type parsed straight out of the PNG IHDR header bytes with
    * ordinary codegen'd expressions (substring + hex + conv big-endian
    * reads) — NO decoder, no mapPartitions, no codec on the executor
    * path. At 100 TB this is the difference between a metadata query that
    * reads 26 bytes per asset and one that inflates every pixel: asset
    * catalogs answer "which images are under 512px / not truecolor"
    * shapes constantly, and the decode-free plan keeps them scan-bound
    * (with blob offsets in a columnar store, near-free). The blobs are
    * REAL encoder output ([[pngMetaAssets]]) and every extracted field
    * varies per asset, so the oracle (closed-form geometry) catches any
    * offset/endianness mistake. Layout (PNG spec, RFC 2083 §4.1.1): 8
    * signature bytes, 4 chunk-length, 4 "IHDR", then width(4BE),
    * height(4BE), bit depth(1), color type(1) — bytes 17-26, 1-indexed. */
  def qMm10(spark: SparkSession, dir: String): DataFrame =
    pngMetaAssets(spark, dir)
      .selectExpr("asset_id",
        "CAST(conv(hex(substring(bytes, 17, 4)), 16, 10) AS BIGINT) AS w",
        "CAST(conv(hex(substring(bytes, 21, 4)), 16, 10) AS BIGINT) AS h",
        "CAST(conv(hex(substring(bytes, 25, 1)), 16, 10) AS BIGINT) AS bit_depth",
        "CAST(conv(hex(substring(bytes, 26, 1)), 16, 10) AS BIGINT) AS color_type")
      .orderBy("asset_id")

  case class CanonHash(asset_id: Long, chash: String)

  /** Canonical (dihedral-invariant) average-hash per image: the 64-bit
    * [[imageHashes]] hash computed for all 8 orientations of the top-left
    * m×m window (m = min(8, w, h) — rotations need a square window) and
    * reduced to the lexicographic MIN of the 16-hex-char encodings. Two
    * images that are flips/rotations of one another share the canonical
    * hash by construction — the identity orientation reproduces q_mm9's
    * exact bit layout, so canonical(img) <= plain(img) always. Pure
    * integer threshold math inside the batched decode kernel; only
    * (asset_id, 16-char hash) leaves the executor. */
  def canonicalImageHashes(assets: DataFrame, decoder: AssetDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            decoder.decode(a.bytes).map { d =>
              val n = d.width * d.height
              var total = 0L
              var k = 0
              while (k < n) { total += d.samples(k * d.channels); k += 1 }
              val m = math.min(8, math.min(d.width, d.height))
              def sample(x: Int, y: Int): Long =
                (d.samples((y * d.width + x) * d.channels) & 0xff).toLong
              // target (x, y) of orientation t reads this source pixel
              def srcX(t: Int, x: Int, y: Int): Int = t match {
                case 0 => x; case 1 => m - 1 - x; case 2 => x
                case 3 => m - 1 - x; case 4 => y; case 5 => m - 1 - y
                case 6 => y; case _ => m - 1 - y
              }
              def srcY(t: Int, x: Int, y: Int): Int = t match {
                case 0 => y; case 1 => y; case 2 => m - 1 - y
                case 3 => m - 1 - y; case 4 => x; case 5 => x
                case 6 => m - 1 - x; case _ => m - 1 - x
              }
              var best: String = null
              var t = 0
              while (t < 8) {
                val bands = new Array[Long](4)
                var yy = 0
                while (yy < m) {
                  var xx = 0
                  while (xx < m) {
                    if (sample(srcX(t, xx, yy), srcY(t, xx, yy)) * n >= total) {
                      val k2 = yy * 8 + xx
                      bands(k2 / 16) |= 1L << (k2 % 16)
                    }
                    xx += 1
                  }
                  yy += 1
                }
                val hstr =
                  f"${bands(0)}%04x${bands(1)}%04x${bands(2)}%04x${bands(3)}%04x"
                if (best == null || hstr < best) best = hstr
                t += 1
              }
              CanonHash(a.asset_id, best)
            }
          }
        }
      }.toDF()
  }

  /** Q-MM15 — FLIP/ROTATION-INVARIANT image dedup: [[qMm9]]'s perceptual
    * dedup hardened against the transform evasions real image dups carry
    * (mirrored reposts, EXIF-rotation variants) — assets grouped by their
    * CANONICAL dihedral hash ([[canonicalImageHashes]]). A mirrored copy
    * has a different plain average-hash but the identical canonical hash
    * by construction (spec-pinned by re-encoding a flipped canvas).
    * Output is CLUSTER accounting, not pairs — (chash, n_assets, keeper =
    * min asset id) per group with >= 2 members, the keep-one-per-cluster
    * decision frame — because pair output is quadratic within a group
    * while the groups themselves are corpus-linear (the q_d1 lesson
    * applied at the image layer).
    *
    * Scale: the hash frame is 2 scalars per asset; clustering is one
    * hash-keyed aggregation with map-side combine, never a self-join.
    * The oracle replays the closed-form canvases through all 8
    * orientations arithmetically, so only a correct decode + transform
    * indexing reproduces the clusters. */
  def qMm15(spark: SparkSession, dir: String): DataFrame = {
    canonicalImageHashes(pngAssets(spark, dir), ImageIoDecoder)
      .groupBy("chash")
      .agg(count(lit(1)).as("n_assets"), min("asset_id").as("keeper"))
      .where(col("n_assets") >= 2)
      .orderBy("chash")
  }

  case class Sharpness(asset_id: Long, w: Int, h: Int, lap_sum: Long,
                       sharp_c: Long, blur: Long)

  /** Q-MM18 — IMAGE SHARPNESS / BLUR-DETECTION AUDIT: per image, the
    * integer 4-neighbor Laplacian energy over the real PNG decode —
    * lap_sum = Σ over INTERIOR pixels of |4·g(x,y) − g(x−1,y) − g(x+1,y)
    * − g(x,y−1) − g(x,y+1)| (first channel, the gray plane), sharp_c its
    * per-interior-pixel mean in centi-units, and a `blur` flag at
    * sharp_c < 2000 — the variance-of-Laplacian idea (the classic OpenCV
    * blur gate) in an integer, engine-exact form. The curation signal
    * that drops out-of-focus/smooth-gradient images before they cost
    * vision-training compute: [[qMm14]] catches LOW-SPREAD histograms (a
    * blurry image can still have full spread), this catches LOW-GRADIENT
    * structure — the two are complementary gates.
    *
    * Exactness: pure integer sums; the interior-pixel count derives from
    * the DECODED geometry ((w−2)·(h−2), the qMm14 ADVICE-r11 lesson — no
    * canvas-size literal), with sub-3×3 images zero-guarded. On the
    * closed-form gradient canvases the Laplacian telescopes to 0 except
    * at mod-256 wrap seams, so the number is exactly the wrap count × 256
    * pattern the oracle replays — any decode defect (channel order, row
    * order, edge handling) breaks the hash.
    *
    * Scale: the Laplacian reduces to ONE fixed-width row per asset inside
    * the batched decode kernel — blobs never cross an exchange (the
    * family invariant); the only shuffle is the presentation sort. */
  def qMm18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngAssets(spark, dir).select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            ImageIoDecoder.decode(a.bytes).map { d =>
              val w = d.width; val h = d.height; val ch = d.channels
              def g(x: Int, y: Int): Long =
                (d.samples((y * w + x) * ch) & 0xff).toLong
              var s = 0L
              var y = 1
              while (y < h - 1) {
                var x = 1
                while (x < w - 1) {
                  s += math.abs(4 * g(x, y) - g(x - 1, y) - g(x + 1, y) -
                    g(x, y - 1) - g(x, y + 1))
                  x += 1
                }
                y += 1
              }
              val nInt = math.max((w - 2).toLong * (h - 2).toLong, 0L)
              val sharpC = if (nInt == 0) 0L else s * 100 / nInt
              Sharpness(a.asset_id, w, h, s, sharpC,
                if (sharpC < 2000) 1L else 0L)
            }
          }
        }
      }.toDF().orderBy("asset_id")
  }

  /** Q-MM14 — IMAGE HISTOGRAM-ENTROPY AUDIT: per image, the 16-bin gray
    * histogram's level spread (`n_levels`) and an integer entropy
    * surrogate (`h_cb`) — the curation signal that flags FLAT and
    * LOW-INFORMATION images (solid fills, letterboxed black frames,
    * synthetic gradients, single-color thumbnails) before they enter a
    * training mix, where they'd teach a vision model nothing while
    * costing full decode+train compute. h_cb = Σ over occupied bins of
    * c·(floor-log2(n_px) − floor-log2(c)) — the `length(bin(c))−1` idiom
    * ([[graft.operators.TextAnalysis.qT20]]) applied to pixel counts,
    * with the n_px term DERIVED from the decoded geometry (`w*h`, ADVICE
    * r11 — a hardcoded log2(64)=6 was only valid for 8×8 canvases), so a
    * constant canvas scores exactly 0 at ANY size (its one bin holds
    * c = n_px) and a spread histogram scores high, with NO float log on
    * either engine. First channel only (the
    * gray plane — r=g=b on these canvases), binned `g DIV 16`.
    *
    * Decode is the REAL PNG path (lossless — counts replay the closed
    * form exactly); the histogram reduces to 16 longs per asset inside
    * the batched decode kernel, so only fixed-width rows leave the
    * executor — blobs never cross an exchange (the family invariant). */
  def qMm14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngAssets(spark, dir).select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            ImageIoDecoder.decode(a.bytes).map { d =>
              val counts = new Array[Long](16)
              var i = 0
              while (i < d.samples.length) {
                counts((d.samples(i) & 0xff) >> 4) += 1
                i += d.channels
              }
              (a.asset_id, d.width, d.height, counts.toSeq)
            }
          }
        }
      }.toDF("asset_id", "w", "h", "bins")
      .select(col("asset_id"), col("w"), col("h"),
        expr("CAST(size(filter(bins, c -> c > 0)) AS BIGINT)").as("n_levels"),
        expr("aggregate(bins, 0L, (acc, c) -> acc + " +
          // floor-log2 of the decoded pixel count, not a canvas-size literal
          "CASE WHEN c > 0 THEN c * ((length(bin(CAST(w AS BIGINT) * h)) - 1) " +
          "- (length(bin(c)) - 1)) ELSE 0L END)")
          .as("h_cb"))
      .orderBy("asset_id")
  }

  // ---- MP4/ISO-BMFF container metadata lane (VERDICT r16 task 3) ----

  /** mvhd movie timescale of the synthetic MP4s — 600, the classic
    * QuickTime default, chosen so the duration round-trip exercises real
    * unit arithmetic (ms → units → ms) yet stays integer-exact: every
    * [[mp4DurationMs]] is a multiple of 500 and 500·600/1000 = 300. */
  val Mp4Timescale = 600L

  /** mdhd media timescale + per-sample tick count: n samples of 512
    * ticks at 12800 Hz — the 25 fps-ish shape real muxers emit. */
  val Mp4MediaTimescale = 12800L
  val Mp4SampleDelta = 512L

  /** Sync-sample cadence of the synthetic track: samples 1, 1+6, 1+12, …
    * are keyframes, so `n_keyframes = ceil(n_samples / 6)` — the closed
    * form the oracle replays. */
  val Mp4KeyInterval = 6

  /** Samples in the first mdat chunk of the synthetic track (the rest
    * fill chunk 2) — two chunks so [[Mp4BoxReader.keyframeMap]]'s stsc
    * sample→chunk mapping is exercised, contiguous so the oracle's
    * offset arithmetic stays one running sum. */
  val Mp4Chunk1Samples = 10

  /** Closed-form per-asset MP4 facts (what the generator writes INTO the
    * boxes and the DuckDB oracle recomputes arithmetically — the
    * [[y4mGray]] posture for container metadata). */
  def mp4DurationMs(id: Long): Long = 2000L + (id % 7) * 500L
  def mp4Width(id: Long): Int = 16 * (1 + (id % 4)).toInt
  def mp4Height(id: Long): Int = 16 * (1 + (id % 3)).toInt
  def mp4Codec(id: Long): String = (id % 3) match {
    case 0 => "avc1"; case 1 => "hvc1"; case _ => "av01"
  }
  def mp4SampleCount(id: Long): Int = 25 + ((id % 5) * 6).toInt

  private def beBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(n)
    bb.putInt(n)
    bb.put(typ.getBytes("US-ASCII"))
    payload.foreach(bb.put)
    bb.array()
  }
  private def beBytes(n: Int)(vals: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(n * vals.length)
    vals.foreach { v =>
      if (n == 4) bb.putInt(v.toInt)
      else if (n == 2) bb.putShort(v.toShort)
      else bb.put(v.toByte)
    }
    bb.array()
  }

  /** REAL (if minimal) ISO-BMFF files, generated executor-side: `ftyp` +
    * `mdat` (samples first — the non-faststart layout, which makes the
    * `stco` chunk offset computable before `moov` is built) + `moov`
    * with the full parse surface [[qMm24]] exercises: `mvhd` (movie
    * timescale/duration), `trak/tkhd` (16.16 fixed-point width/height),
    * `mdia/mdhd` + `hdlr('vide')`, and an `stbl` carrying `stsd` (a
    * proper 86-byte VisualSampleEntry with the codec fourcc), `stts`,
    * `stss` (sync samples every [[Mp4KeyInterval]]), `stsz` (per-sample
    * sizes), `stco`. Every field derives from the closed forms above, so
    * the oracle replays the parse arithmetically with zero container
    * headroom. Compressed-CODEC decode stays declared out of pure-JVM
    * scope — this is the container-level lane that makes asset profiling
    * and retention decisions real on MP4 corpora without a codec. */
  def mp4Assets(spark: SparkSession, dir: String,
                keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = mp4SampleCount(id)
          val sizes = Array.tabulate(n)(s => 100 + ((id + s) % 7).toInt)
          val ftyp = beBox("ftyp", "isom".getBytes("US-ASCII"),
            beBytes(4)(0x200L), "isommp42".getBytes("US-ASCII"))
          val mdat = beBox("mdat", Array.tabulate(sizes.sum)(k =>
            ((id + k) % 251).toByte))
          val mdatPayloadOff = ftyp.length + 8
          val durUnits = mp4DurationMs(id) * Mp4Timescale / 1000L
          val mvhd = beBox("mvhd", beBytes(4)(0L /*v0+flags*/, 0L, 0L,
              Mp4Timescale, durUnits, 0x00010000L),
            beBytes(2)(0x0100L, 0L), beBytes(4)(0L, 0L),
            beBytes(4)(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L,
              0x40000000L),
            beBytes(4)(0L, 0L, 0L, 0L, 0L, 0L, 2L /*next track*/))
          val tkhd = beBox("tkhd", beBytes(4)(7L /*v0, flags=enabled*/,
              0L, 0L, 1L /*track id*/, 0L, durUnits, 0L, 0L),
            beBytes(2)(0L, 0L, 0L, 0L),
            beBytes(4)(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L,
              0x40000000L),
            beBytes(4)(mp4Width(id).toLong << 16, mp4Height(id).toLong << 16))
          val mdhd = beBox("mdhd", beBytes(4)(0L, 0L, 0L,
              Mp4MediaTimescale, n * Mp4SampleDelta),
            beBytes(2)(0x55C4L /*'und'*/, 0L))
          val hdlr = beBox("hdlr", beBytes(4)(0L, 0L),
            "vide".getBytes("US-ASCII"), beBytes(4)(0L, 0L, 0L),
            "VideoHandler".getBytes("US-ASCII"), beBytes(1)(0L))
          val entry = { // 86-byte VisualSampleEntry
            val bb = java.nio.ByteBuffer.allocate(86)
            bb.putInt(86); bb.put(mp4Codec(id).getBytes("US-ASCII"))
            bb.put(new Array[Byte](6)); bb.putShort(1) // data_ref_index
            bb.put(new Array[Byte](16))
            bb.putShort(mp4Width(id).toShort); bb.putShort(mp4Height(id).toShort)
            bb.putInt(0x00480000); bb.putInt(0x00480000); bb.putInt(0)
            bb.putShort(1); bb.put(new Array[Byte](32))
            bb.putShort(0x18); bb.putShort(-1)
            bb.array()
          }
          val stsd = beBox("stsd", beBytes(4)(0L, 1L), entry)
          val stts = beBox("stts", beBytes(4)(0L, 1L, n.toLong,
            Mp4SampleDelta))
          val nKey = (n + Mp4KeyInterval - 1) / Mp4KeyInterval
          val stss = beBox("stss", beBytes(4)(0L, nKey.toLong),
            beBytes(4)(Array.tabulate(nKey)(k =>
              1L + k.toLong * Mp4KeyInterval): _*))
          val stsz = beBox("stsz", beBytes(4)(0L, 0L, n.toLong),
            beBytes(4)(sizes.map(_.toLong): _*))
          // TWO chunks (first Mp4Chunk1Samples samples, then the rest) so
          // the sample→chunk mapping in [[Mp4BoxReader.keyframeMap]] is
          // genuinely exercised; chunks are CONTIGUOUS in mdat, so the
          // oracle's offset closed form stays a single running sum
          val stsc = beBox("stsc", beBytes(4)(0L, 2L,
            1L, Mp4Chunk1Samples.toLong, 1L,
            2L, (n - Mp4Chunk1Samples).toLong, 1L))
          val stco = beBox("stco", beBytes(4)(0L, 2L,
            mdatPayloadOff.toLong,
            mdatPayloadOff.toLong + sizes.take(Mp4Chunk1Samples).sum))
          val stbl = beBox("stbl", stsd, stts, stsc, stss, stsz, stco)
          val minf = beBox("minf", stbl)
          val mdia = beBox("mdia", mdhd, hdlr, minf)
          val trak = beBox("trak", tkhd, mdia)
          val moov = beBox("moov", mvhd, trak)
          (id, "video", ftyp ++ mdat ++ moov)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Pure-JVM ISO-BMFF box walk — duration, resolution, codec fourcc,
    * sample/keyframe counts, NO codec touched. Generic container
    * recursion (`moov/trak/mdia/minf/stbl`), version-aware `mvhd`/`tkhd`
    * offsets (v0 32-bit and v1 64-bit times), `size==1` largesize and
    * `size==0` to-end boxes handled, a missing `stss` means every sample
    * is sync (the ISO default). None on ANY malformed structure — a box
    * overrunning its parent, a truncated header, a zero movie timescale
    * — the family's corrupt-input contract: drop the clip, never throw. */
  object Mp4BoxReader {
    final case class Meta(durationMs: Long, width: Int, height: Int,
                          codec: String, nSamples: Long, nKeyframes: Long)
    /** One sync sample's fetchable byte range: 1-based sample number,
      * absolute file offset, size — what a sampled decoder reads. */
    final case class Keyframe(sampleNo: Long, offset: Long, size: Long)

    private val Containers =
      Set("moov", "trak", "mdia", "minf", "stbl", "edts", "udta")

    private def be32(bytes: Array[Byte], o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    private def be64(bytes: Array[Byte], o: Int): Long =
      (be32(bytes, o) << 32) | be32(bytes, o + 4)

    /** Real files nest well under 10 container levels; a crafted file of
      * nothing but nested container headers would otherwise recurse once
      * per 8 bytes and StackOverflowError past the catch (fatal, not
      * NonFatal) — depth beyond the bound is malformation, drop. */
    private val MaxBoxDepth = 32

    /** Shared box iteration: visit every box (containers included, then
      * recurse into them). `visit(typ, payloadStart, boxEnd)` returns
      * false to flag a malformed leaf; structural damage (a box
      * overrunning its parent, a truncated header, a bad largesize,
      * nesting past [[MaxBoxDepth]]) is detected here. Returns false on
      * ANY malformation. */
    private def walkBoxes(bytes: Array[Byte], start: Int, end: Int,
                          depth: Int = 0)(
        visit: (String, Int, Int) => Boolean): Boolean = {
      if (depth > MaxBoxDepth) return false
      var o = start
      while (o < end) {
        if (o + 8 > end) return false
        val size32 = be32(bytes, o)
        val typ = new String(bytes, o + 4, 4, "US-ASCII")
        val (hdr, boxEnd) =
          if (size32 == 1L) {
            if (o + 16 > end) return false
            val ls = be64(bytes, o + 8)
            if (ls < 16L || ls > (end - o).toLong) return false
            (16, o + ls.toInt)
          } else if (size32 == 0L) (8, end)
          else {
            if (size32 < 8L || size32 > (end - o).toLong) return false
            (8, o + size32.toInt)
          }
        if (!visit(typ, o + hdr, boxEnd)) return false
        if (Containers(typ) &&
          !walkBoxes(bytes, o + hdr, boxEnd, depth + 1)(visit))
          return false
        o = boxEnd
      }
      true
    }

    def parse(bytes: Array[Byte]): Option[Meta] = {
      var ts = -1L; var dur = -1L; var w = -1; var h = -1
      var codec: Option[String] = None
      var nSamples = -1L; var nKey = -1L; var sawMoov = false
      def visit(typ: String, p: Int, boxEnd: Int): Boolean = {
        typ match {
          case "moov" => sawMoov = true
          case "mvhd" =>
            if (p + 4 > boxEnd) return false
            if (bytes(p) == 0) { // v0: 32-bit times
              if (p + 20 > boxEnd) return false
              ts = be32(bytes, p + 12); dur = be32(bytes, p + 16)
            } else { // v1: 64-bit times
              if (p + 32 > boxEnd) return false
              ts = be32(bytes, p + 20); dur = be64(bytes, p + 24)
            }
          case "tkhd" =>
            if (p + 4 > boxEnd) return false
            val wOff = if (bytes(p) == 0) p + 76 else p + 88
            if (wOff + 8 > boxEnd) return false
            w = (be32(bytes, wOff) >> 16).toInt
            h = (be32(bytes, wOff + 4) >> 16).toInt
          case "stsd" =>
            if (p + 16 > boxEnd || be32(bytes, p + 4) < 1L) return false
            codec = Some(new String(bytes, p + 12, 4, "US-ASCII"))
          case "stss" =>
            if (p + 8 > boxEnd) return false
            nKey = be32(bytes, p + 4)
          case "stsz" =>
            if (p + 12 > boxEnd) return false
            nSamples = be32(bytes, p + 8)
          case _ => ()
        }
        true
      }
      try {
        if (!walkBoxes(bytes, 0, bytes.length)(visit)) return None
        // dur near Long.MaxValue (adversarial v1 mvhd) would overflow
        // dur * 1000 into a bogus/negative duration — implausible
        // durations are malformation, drop (ADVICE r17)
        if (!sawMoov || ts <= 0L || dur < 0L || dur > Long.MaxValue / 1000L ||
          w < 0 || h < 0 || codec.isEmpty || nSamples < 0L) return None
        // absent stss: every sample is a sync sample (ISO 14496-12)
        val keys = if (nKey >= 0L) nKey else nSamples
        Some(Meta(dur * 1000L / ts, w, h, codec.get, nSamples, keys))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Sync-sample BYTE RANGES from the sample tables alone — the MP4
      * analogue of the Y4M closed-form seek: stsz (sizes), stco/co64
      * (chunk bases), stsc (sample-to-chunk runs), stss (sync numbers;
      * absent = every sample). A sampled decoder fetches exactly these
      * ranges and touches no other corpus bytes — the honest 100 TB
      * keyframe-sampling shape for compressed video, with the codec
      * itself still out of scope. General chunk mapping: each stsc run
      * covers chunks [first_chunk, next run's first_chunk), samples lay
      * out contiguously within a chunk from its stco base. None on any
      * inconsistency (chunks don't cover the sample count, truncated
      * tables, missing stco/stsc/stsz). */
    def keyframeMap(bytes: Array[Byte]): Option[Seq[Keyframe]] = {
      var sizes: Array[Long] = null
      var stco: Array[Long] = null
      var stsc: Array[(Long, Long)] = null
      var stss: Array[Long] = null
      def visit(typ: String, p: Int, boxEnd: Int): Boolean = {
        typ match {
          case "stsz" =>
            if (p + 12 > boxEnd) return false
            val uniform = be32(bytes, p + 4)
            val n = be32(bytes, p + 8)
            // a clip cannot hold more samples than it has bytes (each
            // sample is >= 1 byte of mdat): a corrupt uniform-size count
            // must drop the clip, not demand a count-proportional
            // allocation (OutOfMemoryError is not catchable here)
            if (n > bytes.length.toLong) return false
            if (uniform != 0L) sizes = Array.fill(n.toInt)(uniform)
            else {
              if (p + 12 + 4L * n > boxEnd) return false
              sizes = Array.tabulate(n.toInt)(k => be32(bytes, p + 12 + 4 * k))
            }
          case "stco" =>
            if (p + 8 > boxEnd) return false
            val n = be32(bytes, p + 4)
            if (p + 8 + 4L * n > boxEnd) return false
            stco = Array.tabulate(n.toInt)(k => be32(bytes, p + 8 + 4 * k))
          case "co64" =>
            if (p + 8 > boxEnd) return false
            val n = be32(bytes, p + 4)
            if (p + 8 + 8L * n > boxEnd) return false
            stco = Array.tabulate(n.toInt)(k => be64(bytes, p + 8 + 8 * k))
          case "stsc" =>
            if (p + 8 > boxEnd) return false
            val n = be32(bytes, p + 4)
            if (p + 8 + 12L * n > boxEnd) return false
            stsc = Array.tabulate(n.toInt)(k =>
              (be32(bytes, p + 8 + 12 * k), be32(bytes, p + 12 + 12 * k)))
          case "stss" =>
            if (p + 8 > boxEnd) return false
            val n = be32(bytes, p + 4)
            if (p + 8 + 4L * n > boxEnd) return false
            stss = Array.tabulate(n.toInt)(k => be32(bytes, p + 8 + 4 * k))
          case _ => ()
        }
        true
      }
      try {
        if (!walkBoxes(bytes, 0, bytes.length)(visit)) return None
        if (sizes == null || stco == null || stsc == null) return None
        if (stsc.isEmpty || stsc(0)._1 != 1L ||
          stsc.exists(_._2 <= 0L) ||
          stsc.sliding(2).exists(w => w.length == 2 && w(1)._1 <= w(0)._1))
          return None
        val sync: Long => Boolean =
          if (stss == null) _ => true else stss.toSet.contains
        val out = Seq.newBuilder[Keyframe]
        var s = 0 // 0-based sample cursor
        var run = 0
        var c = 1
        while (c <= stco.length && s < sizes.length) {
          while (run + 1 < stsc.length && stsc(run + 1)._1 <= c) run += 1
          var within = 0L
          var j = 0L
          while (j < stsc(run)._2 && s < sizes.length) {
            val sampleNo = (s + 1).toLong
            if (sync(sampleNo))
              out += Keyframe(sampleNo, stco(c - 1) + within, sizes(s))
            within += sizes(s)
            s += 1; j += 1
          }
          c += 1
        }
        if (s != sizes.length) return None // chunks failed to cover samples
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Q-MM24 — MP4 CONTAINER METADATA (VERDICT r16 task 3): per asset,
    * the container-level facts a 100 TB video curation pass filters and
    * budgets on — duration, resolution, codec id, sample and keyframe
    * counts — from a pure-JVM box walk, no codec. This is the honest MP4
    * shape for the declared no-codec boundary: real corpora are MP4/MKV,
    * and profiling/retention decisions need exactly these fields.
    *
    * Scale: generation and parse fuse into ONE mapPartitions stage —
    * clip bytes never cross an exchange (the mm family invariant,
    * PlanAuditSpec); only the per-asset metadata rows shuffle for the
    * final order. The parse is O(total box bytes) per clip with O(1)
    * state; a malformed container drops (None), never fails the job. */
  def qMm24(spark: SparkSession, dir: String): DataFrame =
    mp4Meta(mp4Assets(spark, dir)).orderBy("asset_id")

  /** Q-MM25 — MP4 KEYFRAME BYTE-RANGE MAP: per asset, every sync
    * sample's (sample_no, frame_offset, frame_size) derived purely from
    * the stss/stsz/stsc/stco tables — the MP4 generalization of the Y4M
    * closed-form seek ([[sampleY4mFrames]]): a sampled decoder fetches
    * exactly these byte ranges and decodes ONLY keyframes, which is the
    * honest 100 TB shape for compressed-video frame sampling (the codec
    * itself stays declared out of pure-JVM scope — this lane hands a
    * GPU/codec fleet its fetch plan). The synthetic track lays samples
    * across TWO chunks, so the stsc sample→chunk mapping is live, while
    * chunk contiguity keeps the oracle a single running sum.
    *
    * Scale: same fused shape as [[qMm24]] — muxing and table walk in one
    * mapPartitions stage, only (asset, keyframe)-sized metadata rows
    * reach the exchange for the output sort. */
  def qMm25(spark: SparkSession, dir: String): DataFrame =
    mp4KeyframeMap(mp4Assets(spark, dir)).orderBy("asset_id", "sample_no")

  /** Narrow kernel of [[qMm25]]: batched mapPartitions, no exchange;
    * malformed containers drop ([[Mp4BoxReader.keyframeMap]] contract). */
  def mp4KeyframeMap(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            Mp4BoxReader.keyframeMap(a.bytes).toSeq.flatten.map(k =>
              (a.asset_id, k.sampleNo, k.offset, k.size))
          }
        }
      }
      .toDF("asset_id", "sample_no", "frame_offset", "frame_size")
  }

  // ---- MKV/EBML container metadata lane (round 17, completes the
  //      MP4/MKV pair VERDICT r16 missing #2 named) ----

  /** Closed-form per-asset MKV facts (distinct from the MP4 forms so a
    * crossover bug cannot hash-cancel). TimestampScale is the Matroska
    * default 1,000,000 ns (1 ms ticks), so the float64 Duration is the
    * integer millisecond count — exactly representable, cross-engine
    * exact. */
  def mkvDurationMs(id: Long): Long = 3000L + (id % 5) * 250L
  def mkvWidth(id: Long): Int = 32 * (1 + (id % 3)).toInt
  def mkvHeight(id: Long): Int = 24 * (1 + (id % 4)).toInt
  def mkvCodec(id: Long): String = (id % 3) match {
    case 0 => "V_MPEG4/ISO/AVC"; case 1 => "V_MPEGH/ISO/HEVC"
    case _ => "V_AV1"
  }

  /** MKV block/cluster closed forms (round 18, q_mm27 — the Matroska
    * half of the keyframe-map pair). Every cluster holds exactly
    * [[MkvBlocksPerCluster]] SimpleBlocks at [[MkvBlockDeltaMs]] ticks;
    * block sizes stay < 127 so every SimpleBlock size VINT is one byte
    * and the oracle's offset algebra reduces to one running sum. */
  val MkvBlocksPerCluster = 4
  val MkvBlockDeltaMs = 40L
  def mkvBlockCount(id: Long): Int = (8 + (id % 5) * 4).toInt
  def mkvBlockSize(id: Long, b: Int): Int = 40 + ((id + b) % 23).toInt
  /** Keyframes: every cluster-opening block (the Matroska norm — clusters
    * start at keyframes) PLUS an occasional mid-cluster key, so the
    * SimpleBlock flag byte is load-bearing, not recoverable from block
    * position alone. */
  def mkvIsKey(id: Long, b: Int): Boolean =
    b % MkvBlocksPerCluster == 0 ||
      (b % MkvBlocksPerCluster == 2 && (id + b) % 5 == 0)

  private def ebmlVint(v: Long): Array[Byte] = {
    var l = 1
    while (l < 8 && v >= (1L << (7 * l)) - 1) l += 1
    val out = new Array[Byte](l)
    var x = v | (1L << (7 * l)) // length marker bit
    var i = l - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }
  private def ebmlUint(v: Long): Array[Byte] = {
    var l = 1
    while (l < 8 && v >= (1L << (8 * l))) l += 1
    val out = new Array[Byte](l)
    var x = v
    var i = l - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }
  private def ebmlId(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
  private def ebmlEl(id: Array[Byte], payload: Array[Byte]*): Array[Byte] =
    id ++ ebmlVint(payload.map(_.length.toLong).sum) ++
      payload.foldLeft(Array.emptyByteArray)(_ ++ _)

  /** REAL (if minimal) Matroska files, generated executor-side: EBML
    * header (DocType `matroska`), then a Segment of UNKNOWN size (the
    * all-ones VINT — the streamed-file shape every robust demuxer must
    * handle; it extends to end-of-file), containing Info (TimestampScale
    * 1e6 ns + float64 Duration), Tracks → TrackEntry (TrackType video,
    * CodecID string, Video → PixelWidth/PixelHeight), then
    * [[mkvBlockCount]]/[[MkvBlocksPerCluster]] Clusters — each a
    * Timestamp element plus [[MkvBlocksPerCluster]] SimpleBlocks whose
    * flag byte carries the real keyframe bit ([[mkvIsKey]]) — and a
    * trailing Cues element (CuePoint → CueTime + CueTrackPositions →
    * CueTrack/CueClusterPosition, positions relative to the segment data
    * start per the Matroska spec). Cues AFTER the clusters keeps every
    * CueClusterPosition a pure function of the preceding bytes, so the
    * DuckDB oracle replays the whole offset algebra as one running sum.
    * Cluster timestamps and cue fields are written as fixed 2-byte
    * uints (EBML permits leading zero octets) for the same reason.
    * Every field derives from the closed forms above. */
  def mkvAssets(spark: SparkSession, dir: String,
                keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val header = ebmlEl(ebmlId(0x1A, 0x45, 0xDF, 0xA3),
            ebmlEl(ebmlId(0x42, 0x82), "matroska".getBytes("US-ASCII")))
          val info = ebmlEl(ebmlId(0x15, 0x49, 0xA9, 0x66),
            ebmlEl(ebmlId(0x2A, 0xD7, 0xB1), ebmlUint(1000000L)),
            ebmlEl(ebmlId(0x44, 0x89), {
              val bb = java.nio.ByteBuffer.allocate(8)
              bb.putDouble(mkvDurationMs(id).toDouble); bb.array()
            }))
          val video = ebmlEl(ebmlId(0xE0),
            ebmlEl(ebmlId(0xB0), ebmlUint(mkvWidth(id).toLong)),
            ebmlEl(ebmlId(0xBA), ebmlUint(mkvHeight(id).toLong)))
          val track = ebmlEl(ebmlId(0xAE),
            ebmlEl(ebmlId(0x83), ebmlUint(1L)), // TrackType video
            ebmlEl(ebmlId(0x86), mkvCodec(id).getBytes("US-ASCII")),
            video)
          val tracks = ebmlEl(ebmlId(0x16, 0x54, 0xAE, 0x6B), track)
          val nClusters = mkvBlockCount(id) / MkvBlocksPerCluster
          val clusters = Array.tabulate(nClusters) { c =>
            val blocks = (0 until MkvBlocksPerCluster).map { j =>
              val b = c * MkvBlocksPerCluster + j
              val sz = mkvBlockSize(id, b)
              val rel = (j * MkvBlockDeltaMs).toInt // int16 BE, 0..120
              val hdr = Array[Byte](0x81.toByte, // track 1 (1-byte VINT)
                ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
                if (mkvIsKey(id, b)) 0x80.toByte else 0x00.toByte)
              ebmlEl(ebmlId(0xA3), hdr, // SimpleBlock, no lacing
                Array.tabulate(sz)(k => ((id * 3 + b * 7 + k) % 251).toByte))
            }
            ebmlEl(ebmlId(0x1F, 0x43, 0xB6, 0x75),
              (ebmlEl(ebmlId(0xE7), beBytes(2)( // cluster Timestamp
                c.toLong * MkvBlocksPerCluster * MkvBlockDeltaMs))
                +: blocks): _*)
          }
          // CueClusterPosition is relative to the segment DATA start
          val clusterPos =
            clusters.scanLeft((info.length + tracks.length).toLong)(_ + _.length)
          val cuePoints = Array.tabulate(nClusters) { c =>
            ebmlEl(ebmlId(0xBB), // CuePoint
              ebmlEl(ebmlId(0xB3), beBytes(2)( // CueTime
                c.toLong * MkvBlocksPerCluster * MkvBlockDeltaMs)),
              ebmlEl(ebmlId(0xB7), // CueTrackPositions
                ebmlEl(ebmlId(0xF7), ebmlUint(1L)), // CueTrack
                ebmlEl(ebmlId(0xF1), beBytes(2)(clusterPos(c)))))
          }
          val cues = ebmlEl(ebmlId(0x1C, 0x53, 0xBB, 0x6B), cuePoints: _*)
          // Segment of UNKNOWN size: 0x01 + 7 bytes 0xFF (all data bits
          // set) — extends to end of file
          val segBody = info ++ tracks ++
            clusters.foldLeft(Array.emptyByteArray)(_ ++ _) ++ cues
          val segment = ebmlId(0x18, 0x53, 0x80, 0x67) ++
            ebmlId(0x01, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF) ++
            segBody
          (id, "video", header ++ segment)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Pure-JVM EBML walk — duration, resolution, codec id from the
    * Matroska structure, no codec touched. Variable-length IDs (1-4
    * bytes) and sizes (1-8 bytes) per the EBML VINT rules, UNKNOWN-size
    * elements extend to the parent's end (the streamed-Segment shape),
    * containers (Segment/Info/Tracks/TrackEntry/Video) recurse, unknown
    * elements skip. TimestampScale defaults to 1e6 ns when absent;
    * Duration accepts float32 or float64. None on any malformation —
    * a zero first VINT byte, an element overrunning its parent, missing
    * Info/Tracks facts — the family's corrupt-input contract. */
  object EbmlReader {
    final case class Meta(durationMs: Long, width: Int, height: Int,
                          codec: String)
    /** One keyframe SimpleBlock's fetchable byte range: 1-based global
      * block number, absolute timestamp (cluster Timestamp + in-block
      * relative int16, in TimestampScale ticks = ms here), absolute file
      * offset of the frame payload, payload size. */
    final case class KeyBlock(blockNo: Long, tMs: Long, offset: Long,
                              size: Long)
    private val Containers: Set[Long] =
      Set(0x18538067L, 0x1549A966L, 0x1654AE6BL, 0xAEL, 0xE0L)

    private def beN(bytes: Array[Byte], o: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (bytes(o + i) & 0xffL); i += 1 }
      v
    }
    /** Unsigned-int element payload, bounded (ADVICE r17): EBML uints
      * are 1-8 octets; a 0- or >8-byte "uint" is malformation — reading
      * it through [[beN]] would shift in garbage (and overflow the Long),
      * so drop instead. Values past 2^63 surface as negative and are
      * rejected by every caller's range check. */
    private def uintEl(bytes: Array[Byte], p: Int, pEnd: Long): Option[Long] = {
      val n = (pEnd - p).toInt
      if (n <= 0 || n > 8) None else Some(beN(bytes, p, n))
    }
    // (value, lengthInBytes); IDs keep the marker bit (class spelling),
    // sizes strip it; None on a zero first byte or a truncated field
    private def vint(bytes: Array[Byte], o: Int, end: Int, keepMarker: Boolean,
                     maxLen: Int): Option[(Long, Int)] = {
      if (o >= end) return None
      val b0 = bytes(o) & 0xff
      if (b0 == 0) return None
      val len = java.lang.Integer.numberOfLeadingZeros(b0) - 24 + 1
      if (len > maxLen || o + len > end) return None
      val raw = beN(bytes, o, len)
      val v = if (keepMarker) raw else raw & ((1L << (7 * len)) - 1)
      Some((v, len))
    }

    def parse(bytes: Array[Byte]): Option[Meta] = {
      var scale = 1000000L
      var dur = Double.NaN
      var w = -1L; var h = -1L
      var codec: Option[String] = None
      var sawSegment = false
      def beNl(o: Int, n: Int): Long = beN(bytes, o, n)
      def vintL(o: Int, end: Int, keepMarker: Boolean,
                maxLen: Int): Option[(Long, Int)] =
        vint(bytes, o, end, keepMarker, maxLen)
      // depth-bounded like Mp4BoxReader.walkBoxes: a crafted file of
      // nothing but nested 2-byte TrackEntry headers must drop, not
      // StackOverflowError past the catch
      def walk(start: Int, end: Int, depth: Int = 0): Boolean = {
        if (depth > 32) return false
        var o = start
        while (o < end) {
          val idp = vintL(o, end, keepMarker = true, maxLen = 4) match {
            case Some(x) => x; case None => return false
          }
          val szpOpt = vintL(o + idp._2, end, keepMarker = false, maxLen = 8)
          val szp = szpOpt match {
            case Some(x) => x; case None => return false
          }
          val p = o + idp._2 + szp._2
          // all data bits set = UNKNOWN size: extends to the parent's end
          val unknown = szp._1 == (1L << (7 * szp._2)) - 1
          if (!unknown && szp._1 > Int.MaxValue.toLong) return false
          val pEnd = if (unknown) end.toLong else p + szp._1
          if (pEnd > end) return false
          idp._1 match {
            case id if Containers(id) =>
              if (id == 0x18538067L) sawSegment = true
              if (!walk(p, pEnd.toInt, depth + 1)) return false
            case 0x2AD7B1L =>
              scale = uintEl(bytes, p, pEnd).getOrElse(return false)
            case 0x4489L =>
              val n = (pEnd - p).toInt
              if (n == 8) dur = java.lang.Double.longBitsToDouble(beNl(p, 8))
              else if (n == 4)
                dur = java.lang.Float.intBitsToFloat(beNl(p, 4).toInt).toDouble
              else return false
            case 0x86L =>
              codec = Some(new String(bytes, p, (pEnd - p).toInt, "US-ASCII"))
            case 0xB0L =>
              w = uintEl(bytes, p, pEnd).getOrElse(return false)
            case 0xBAL =>
              h = uintEl(bytes, p, pEnd).getOrElse(return false)
            case _ => ()
          }
          o = pEnd.toInt
        }
        true
      }
      try {
        if (!walk(0, bytes.length)) return None
        // w/h past Int.MaxValue (or negative via a 2^63+ uint) are
        // malformation, not a resolution — drop rather than truncate
        if (!sawSegment || dur.isNaN || dur < 0 || w <= 0L || h <= 0L ||
          w > Int.MaxValue.toLong || h > Int.MaxValue.toLong ||
          codec.isEmpty || scale <= 0L) return None
        Some(Meta(math.round(dur * (scale.toDouble / 1e6)),
          w.toInt, h.toInt, codec.get))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Keyframe SimpleBlock BYTE RANGES from the Cluster block headers +
      * Cues cross-check — the Matroska analogue of
      * [[Mp4BoxReader.keyframeMap]] (VERDICT r17 task 1): a sampled
      * decoder fetches exactly these ranges and decodes ONLY keyframes.
      * Clusters stay opaque except each SimpleBlock's header (track
      * VINT + int16 relative timestamp + flags byte; bit 0x80 = key).
      * The declared scope is a SINGLE-track SimpleBlock stream: lacing
      * (flag bits 0x06), a BlockGroup element (0xA0 — the B-frame
      * reference structure), and a second track number all drop the
      * clip rather than return a fetch plan with silently missing or
      * foreign-track entries (review r18 — a keyframe map that lies by
      * omission is worse than no map). When a Cues element is present
      * it must AGREE with the
      * walked clusters — one CuePoint per cluster, CueTime equal to the
      * cluster Timestamp, CueClusterPosition equal to the cluster's
      * offset from the segment data start — a seek index that lies is
      * malformation, not data. None on ANY malformation, never throws. */
    def keyframeMap(bytes: Array[Byte]): Option[Seq[KeyBlock]] = {
      val clusters = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val cues = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val out = Seq.newBuilder[KeyBlock]
      var blockNo = 0L
      var track = -1L // single-track scope: first seen track binds it
      var sawSegment = false
      var sawCues = false

      // generic child iteration: onEl decides recursion/leaf handling;
      // returns false on structural damage (same VINT rules as parse)
      def children(start: Int, end: Int, depth: Int)(
          onEl: (Long, Int, Int, Int) => Boolean): Boolean = {
        if (depth > 32) return false
        var o = start
        while (o < end) {
          val idp = vint(bytes, o, end, keepMarker = true, maxLen = 4) match {
            case Some(x) => x; case None => return false
          }
          val szp = vint(bytes, o + idp._2, end, keepMarker = false,
            maxLen = 8) match {
            case Some(x) => x; case None => return false
          }
          val p = o + idp._2 + szp._2
          val unknown = szp._1 == (1L << (7 * szp._2)) - 1
          if (!unknown && szp._1 > Int.MaxValue.toLong) return false
          val pEnd = if (unknown) end.toLong else p + szp._1
          if (pEnd > end) return false
          if (!onEl(idp._1, o, p, pEnd.toInt)) return false
          o = pEnd.toInt
        }
        true
      }

      def simpleBlock(p: Int, pEnd: Int, clusterTs: Long): Boolean = {
        val trk = vint(bytes, p, pEnd, keepMarker = false, maxLen = 8) match {
          case Some(x) => x; case None => return false
        }
        if (trk._1 <= 0L) return false // track numbers are >= 1
        if (track < 0L) track = trk._1
        else if (trk._1 != track) return false // multi-track: out of scope
        val hp = p + trk._2
        if (hp + 3 > pEnd) return false
        val rel = ((bytes(hp) & 0xff) << 8 | (bytes(hp + 1) & 0xff)).toShort
        val flags = bytes(hp + 2) & 0xff
        if ((flags & 0x06) != 0) return false // lacing: out of scope, drop
        blockNo += 1
        if ((flags & 0x80) != 0)
          out += KeyBlock(blockNo, clusterTs + rel, (hp + 3).toLong,
            (pEnd - hp - 3).toLong)
        true
      }

      def cluster(p: Int, pEnd: Int, segBase: Int, elStart: Int,
                  depth: Int): Boolean = {
        var ts = -1L
        val ok = children(p, pEnd, depth) { (id, _, cp, cpEnd) =>
          id match {
            case 0xE7L => uintEl(bytes, cp, cpEnd) match {
              case Some(v) => ts = v; true
              case None => false
            }
            case 0xA3L =>
              // Matroska requires the cluster Timestamp before any block
              ts >= 0L && simpleBlock(cp, cpEnd, ts)
            case 0xA0L => false // BlockGroup: out of scope — drop, never
                                // return a map with missing keyframes
            case _ => true
          }
        }
        if (!ok || ts < 0L) return false
        clusters += ((ts, (elStart - segBase).toLong))
        true
      }

      def cuePoint(p: Int, pEnd: Int, depth: Int): Boolean = {
        var time = -1L; var pos = -1L
        val ok = children(p, pEnd, depth) { (id, _, cp, cpEnd) =>
          id match {
            case 0xB3L => uintEl(bytes, cp, cpEnd) match {
              case Some(v) => time = v; true
              case None => false
            }
            case 0xB7L =>
              children(cp, cpEnd, depth + 1) { (cid, _, ccp, ccpEnd) =>
                if (cid != 0xF1L) true
                else uintEl(bytes, ccp, ccpEnd) match {
                  case Some(v) => pos = v; true
                  case None => false
                }
              }
            case _ => true
          }
        }
        if (!ok || time < 0L || pos < 0L) return false
        cues += ((time, pos))
        true
      }

      def segment(p: Int, pEnd: Int, depth: Int): Boolean =
        children(p, pEnd, depth) { (id, elStart, cp, cpEnd) =>
          id match {
            case 0x1F43B675L => cluster(cp, cpEnd, p, elStart, depth + 1)
            case 0x1C53BB6BL =>
              sawCues = true
              children(cp, cpEnd, depth + 1) { (cid, _, ccp, ccpEnd) =>
                if (cid == 0xBBL) cuePoint(ccp, ccpEnd, depth + 2) else true
              }
            case _ => true // Info/Tracks/unknown: metadata lane's job
          }
        }

      try {
        val ok = children(0, bytes.length, 0) { (id, _, p, pEnd) =>
          if (id == 0x18538067L) {
            sawSegment = true
            segment(p, pEnd, 1)
          } else true // EBML header etc.
        }
        if (!ok || !sawSegment) return None
        // a present seek index must agree with the walked clusters
        if (sawCues && (cues.length != clusters.length ||
          cues.zip(clusters).exists { case ((ct, cp), (ts, pos)) =>
            ct != ts || cp != pos
          })) return None
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Q-MM26 — MKV CONTAINER METADATA: the Matroska half of the MP4/MKV
    * pair real 100 TB video corpora are stored in — duration,
    * resolution, codec id from a pure-JVM EBML walk ([[EbmlReader]]),
    * same fused generate+parse mapPartitions shape and corrupt-input
    * contract as [[qMm24]]; only metadata rows reach the output sort. */
  def qMm26(spark: SparkSession, dir: String): DataFrame =
    mkvMeta(mkvAssets(spark, dir)).orderBy("asset_id")

  /** Q-MM27 — MKV/WebM KEYFRAME BYTE-RANGE MAP (VERDICT r17 task 1): per
    * asset, every keyframe SimpleBlock's (block_no, t_ms, frame_offset,
    * frame_size) from the real Cluster block headers, cross-checked
    * against the real Cues seek index ([[EbmlReader.keyframeMap]]) — the
    * Matroska half of the [[qMm25]] pair. A 100 TB video corpus is MP4
    * *and* MKV/WebM; this hands a codec fleet its keyframe fetch plan on
    * both, with the codec itself still out of pure-JVM scope.
    *
    * Scale: same fused shape as the rest of the family — muxing and the
    * EBML walk in one mapPartitions stage, clip bytes never cross an
    * exchange; only (asset, keyframe)-sized metadata rows reach the
    * output sort. The walk is O(file bytes) with O(#clusters) state. */
  def qMm27(spark: SparkSession, dir: String): DataFrame =
    mkvKeyframeMap(mkvAssets(spark, dir)).orderBy("asset_id", "block_no")

  /** Narrow kernel of [[qMm27]]: batched mapPartitions, no exchange;
    * malformed containers (including a lying Cues index) drop per the
    * [[EbmlReader.keyframeMap]] contract. */
  def mkvKeyframeMap(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            EbmlReader.keyframeMap(a.bytes).toSeq.flatten.map(k =>
              (a.asset_id, k.blockNo, k.tMs, k.offset, k.size))
          }
        }
      }
      .toDF("asset_id", "block_no", "t_ms", "frame_offset", "frame_size")
  }

  /** Narrow kernel of [[qMm26]] (PlanAuditSpec mm family list). */
  def mkvMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            EbmlReader.parse(a.bytes).map(m =>
              (a.asset_id, m.durationMs, m.width.toLong, m.height.toLong,
                m.codec))
          }
        }
      }
      .toDF("asset_id", "duration_ms", "width", "height", "codec")
  }

  // ---- MP3 compressed-audio metadata lane (round 18, VERDICT r17
  //      task 4 — the audio half of the container arc) ----

  /** Closed-form per-asset MP3 facts. Bitrate and sample rate vary on
    * independent residues so a crossover bug cannot hash-cancel; frame
    * count spans 20..50. MPEG-1 Layer III: 1152 samples per frame, frame
    * length floor(144 * bitrate / sample_rate) + padding. */
  def mp3BitrateKbps(id: Long): Int = (id % 3) match {
    case 0 => 128; case 1 => 192; case _ => 256
  }
  def mp3SampleRate(id: Long): Int = ((id % 9) / 3) match {
    case 0 => 44100; case 1 => 48000; case _ => 32000
  }
  def mp3FrameCount(id: Long): Int = (20 + (id % 7) * 5).toInt
  /** Real MPEG-1 padding bit, alternated per frame so the hop arithmetic
    * (frame length + 1 on padded frames) is load-bearing — a walker that
    * ignores it desyncs and drops every clip. */
  def mp3Padded(id: Long, f: Int): Boolean = (id + f) % 2 == 0

  /** MPEG-1 Layer III bitrate-index table (kbps; index 0 = free and
    * 15 = reserved are malformation here). ISO/IEC 11172-3. */
  private val Mp3Bitrates =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** REAL (if minimal) MP3 streams, generated executor-side: an optional
    * ID3v2 tag (even ids — "ID3", version, flags, synchsafe 28-bit size;
    * every robust MP3 walker must skip it) followed by
    * [[mp3FrameCount]] CBR MPEG-1 Layer III frames — 0xFFFB sync,
    * bitrate/sample-rate indexes from the closed forms, real padding
    * bits, mono. Frame payloads are opaque deterministic fill (the codec
    * stays out of pure-JVM scope; this is the container walk that prices
    * and profiles a 100 TB audio corpus). */
  def mp3Assets(spark: SparkSession, dir: String,
                keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val br = mp3BitrateKbps(id)
          val sr = mp3SampleRate(id)
          val brIdx = Mp3Bitrates.indexOf(br)
          val srIdx = Mp3SampleRates.indexOf(sr)
          val id3 =
            if (id % 2 == 0) {
              val payload = (id % 23).toInt // synchsafe: fits 7 bits
              "ID3".getBytes("US-ASCII") ++
                Array[Byte](4, 0, 0, 0, 0, 0, payload.toByte) ++
                Array.fill(payload)(0x20.toByte)
            } else Array.emptyByteArray
          val frames = Array.tabulate(mp3FrameCount(id)) { f =>
            val pad = if (mp3Padded(id, f)) 1 else 0
            val flen = 144 * br * 1000 / sr + pad
            val frame = new Array[Byte](flen)
            frame(0) = 0xFF.toByte
            frame(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
            frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
            frame(3) = 0xC0.toByte // mono
            var k = 4
            while (k < flen) {
              frame(k) = ((id * 5 + f * 3 + k) % 251).toByte; k += 1
            }
            frame
          }
          (id, "audio", id3 ++ frames.foldLeft(Array.emptyByteArray)(_ ++ _))
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Pure-JVM MP3 frame-header walk — frame count, bitrate, sample rate,
    * duration; NO codec touched. Skips a leading ID3v2 tag (synchsafe
    * size), then hops frame to frame via the MPEG-1 Layer III length
    * formula (bitrate/sample-rate indexes + padding bit). The declared
    * scope is CBR MPEG-1 Layer III mono/stereo: version or layer bits
    * other than MPEG-1/Layer-III, free/reserved bitrate or sample-rate
    * indexes, a mid-stream bitrate change (VBR), a frame overrunning the
    * file, trailing garbage, or an empty stream are all malformation —
    * None, never throw (the container family's contract). The walk is
    * O(file bytes) with O(1) state and zero allocation. */
  object Mp3Reader {
    final case class Meta(nFrames: Long, bitrateKbps: Int, sampleRate: Int,
                          durationMs: Long)

    def parse(bytes: Array[Byte]): Option[Meta] = try {
      var o = 0
      // ID3v2: "ID3" + version(2) + flags(1) + synchsafe size(4)
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
        if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None
        val sz = (bytes(6) << 21) | (bytes(7) << 14) | (bytes(8) << 7) |
          bytes(9)
        if (10L + sz > bytes.length.toLong) return None
        o = 10 + sz
      }
      var n = 0L
      var br = -1; var sr = -1
      while (o < bytes.length) {
        if (o + 4 > bytes.length) return None
        val b1 = bytes(o) & 0xff; val b2 = bytes(o + 1) & 0xff
        val b3 = bytes(o + 2) & 0xff
        if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None // sync
        if (((b2 >> 3) & 3) != 3) return None // MPEG-1 only
        if (((b2 >> 1) & 3) != 1) return None // Layer III only
        val brIdx = (b3 >> 4) & 0xF
        val srIdx = (b3 >> 2) & 3
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val fbr = Mp3Bitrates(brIdx); val fsr = Mp3SampleRates(srIdx)
        if (br < 0) { br = fbr; sr = fsr }
        else if (fbr != br || fsr != sr) return None // CBR-only scope
        val flen = 144 * fbr * 1000 / fsr + ((b3 >> 1) & 1)
        if (o + flen > bytes.length) return None // truncated final frame
        o += flen
        n += 1
      }
      if (n == 0L) return None
      Some(Meta(n, br, sr, n * 1152L * 1000L / sr))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Q-MM28 — MP3 CONTAINER METADATA (VERDICT r17 task 4): per asset,
    * the facts an audio curation pass filters and budgets on — frame
    * count, bitrate, sample rate, duration — from a pure-JVM frame-header
    * walk ([[Mp3Reader]]), completing the container arc's audio half
    * alongside MP4 ([[qMm24]]) and MKV ([[qMm26]]).
    *
    * Scale: generation and walk fuse into ONE mapPartitions stage — clip
    * bytes never cross an exchange (the mm family invariant); only the
    * per-asset metadata rows shuffle for the final order. */
  def qMm28(spark: SparkSession, dir: String): DataFrame =
    mp3Meta(mp3Assets(spark, dir)).orderBy("asset_id")

  /** Narrow kernel of [[qMm28]]: batched mapPartitions, no exchange;
    * malformed streams drop per the [[Mp3Reader]] contract. */
  def mp3Meta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            Mp3Reader.parse(a.bytes).map(m =>
              (a.asset_id, m.nFrames, m.bitrateKbps.toLong,
                m.sampleRate.toLong, m.durationMs))
          }
        }
      }
      .toDF("asset_id", "n_frames", "bitrate_kbps", "sample_rate",
        "duration_ms")
  }

  // ---- FLAC lossless-audio metadata lane (round 18 — the lossless
  //      counterpart of the MP3 lane, completing the audio pair the
  //      way q_mm26/q_mm27 completed the video pair) ----

  /** Closed-form per-asset FLAC facts: sample rate on id%3, channels
    * on id%2, bit depth on (id%8)/4 (period 8 covers every
    * channels×depth combination), total samples on id%13, frame size on
    * id%11. The moduli OVERLAP the MP3 lane's (both use %3 and %2) —
    * the lanes cannot hash-cancel because they select different VALUES
    * (44100/48000/96000 vs 128/192/256) into different column sets, not
    * because the residues are disjoint. Blocksize is the fixed 4096 of
    * a typical encoder (STREAMINFO min == max — the constant-blocksize
    * stream every mainstream FLAC encoder emits). */
  def flacSampleRate(id: Long): Int = (id % 3) match {
    case 0 => 44100; case 1 => 48000; case _ => 96000
  }
  def flacChannels(id: Long): Int = 1 + (id % 2).toInt
  def flacBitsPerSample(id: Long): Int = 16 + 8 * ((id % 8) / 4).toInt
  def flacTotalSamples(id: Long): Long = 100000L + (id % 13) * 7777L
  def flacFrameSize(id: Long): Int = 200 + (id % 11).toInt * 9
  val FlacBlockSize = 4096
  /** Audio frames = ceil(total samples / blocksize) — the count the
    * walker must re-derive to audit STREAMINFO against measured bytes. */
  def flacFrameCount(id: Long): Long =
    (flacTotalSamples(id) + FlacBlockSize - 1) / FlacBlockSize

  /** REAL (if minimal) FLAC streams, generated executor-side: `fLaC`
    * magic, a spec-shaped STREAMINFO metadata block (34 bytes — u16
    * min/max blocksize, u24 min/max framesize, then the 64-bit packed
    * field: 20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit
    * total samples — and a 16-byte deterministic MD5 slot), an optional
    * VORBIS_COMMENT block (even ids; every robust walker must hop it),
    * a PADDING block carrying the last-metadata-block flag, then
    * [[flacFrameCount]] fixed-size pseudo-frames (0xFFF8 sync,
    * deterministic fill — the codec stays out of pure-JVM scope; this
    * is the container walk that prices a lossless-audio corpus). */
  def flacAssets(spark: SparkSession, dir: String,
                 keep: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).where(col("doc_id") < AssetDocBound)
      .select(col("doc_id").as("asset_id"))
    keep.fold(ids)(ids.where(_)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sr = flacSampleRate(id)
          val ch = flacChannels(id)
          val bps = flacBitsPerSample(id)
          val total = flacTotalSamples(id)
          val fsz = flacFrameSize(id)
          val out = new java.io.ByteArrayOutputStream()
          out.write("fLaC".getBytes("US-ASCII"))
          // STREAMINFO: type 0, not last, length 34
          out.write(Array[Byte](0, 0, 0, 34))
          def be(v: Long, n: Int): Unit = {
            var k = n - 1
            while (k >= 0) { out.write(((v >>> (8 * k)) & 0xff).toInt); k -= 1 }
          }
          be(FlacBlockSize, 2); be(FlacBlockSize, 2) // min/max blocksize
          be(fsz, 3); be(fsz, 3)                     // min/max framesize
          be((sr.toLong << 44) | ((ch - 1).toLong << 41) |
            ((bps - 1).toLong << 36) | total, 8)
          var k = 0
          while (k < 16) { out.write(((id * 7 + k * 13) % 251).toInt); k += 1 }
          if (id % 2 == 0) { // VORBIS_COMMENT: type 4, not last
            val clen = 8 + (id % 23).toInt
            out.write(Array[Byte](4, 0, 0, clen.toByte))
            k = 0
            while (k < clen) { out.write(((id + k * 3) % 127).toInt); k += 1 }
          }
          val plen = (id % 19).toInt // PADDING: type 1, LAST metadata block
          out.write(Array[Byte](0x81.toByte, 0, 0, plen.toByte))
          k = 0
          while (k < plen) { out.write(0); k += 1 }
          var f = 0L
          val nF = flacFrameCount(id)
          while (f < nF) {
            val frame = new Array[Byte](fsz)
            frame(0) = 0xFF.toByte; frame(1) = 0xF8.toByte // frame sync
            k = 2
            while (k < fsz) {
              frame(k) = ((id * 5 + f * 3 + k) % 251).toByte; k += 1
            }
            out.write(frame)
            f += 1L
          }
          (id, "audio", out.toByteArray)
        }
      }.toDF("asset_id", "kind", "bytes")
  }

  /** Pure-JVM FLAC metadata-block walk — sample rate, channels, bit
    * depth, total samples, duration; NO codec touched. Walks the `fLaC`
    * magic then the metadata-block chain (1-byte last-flag+type header,
    * u24 big-endian length) to the last-block flag, requiring exactly
    * one STREAMINFO and requiring it FIRST (both spec mandates), then
    * unpacks STREAMINFO's bit-packed 64-bit field. The declared scope is
    * constant-blocksize constant-framesize streams (STREAMINFO min ==
    * max for both — what mainstream encoders emit): the walker AUDITS
    * the header against measured structure, requiring the bytes after
    * the last metadata block to equal ceil(totalSamples/blocksize) ×
    * framesize exactly — a STREAMINFO lying about its stream (the lying-
    * index posture of the container family) drops the clip. Malformation
    * — bad magic, a second STREAMINFO, the forbidden block type 127, a
    * block overrunning the file, zero sample rate, out-of-spec blocksize
    * (<16) or bit depth (<4), min>max, zero total samples, byte-count
    * mismatch — is None, never throw. O(file bytes), O(1) state. */
  object FlacReader {
    /** `nFrames` is the audited audio-frame count — the independently-
      * fetchable unit the sniff profiler reports for this format. */
    final case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                          totalSamples: Long, nMetaBlocks: Int,
                          durationMs: Long, nFrames: Long)

    def parse(bytes: Array[Byte]): Option[Meta] = try {
      if (bytes.length < 4 + 4 + 34) return None
      if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
        bytes(3) == 'C')) return None
      def be(o: Int, n: Int): Long = {
        var v = 0L; var k = 0
        while (k < n) { v = (v << 8) | (bytes(o + k) & 0xffL); k += 1 }
        v
      }
      var o = 4
      var last = false
      var nBlocks = 0
      var si: Option[Meta] = None
      var auditFrames = 0L // frame geometry for the post-chain audit,
      var auditFsz = 0L    // local — parse runs on 32 threads at once
      while (!last) {
        if (o + 4 > bytes.length) return None
        val hdr = bytes(o) & 0xff
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7f
        if (typ == 127) return None // forbidden sentinel type
        val len = be(o + 1, 3)
        if (o + 4 + len > bytes.length) return None
        if (typ == 0) {
          if (si.isDefined || nBlocks != 0 || len != 34L) return None
          val minB = be(o + 4, 2); val maxB = be(o + 6, 2)
          val minF = be(o + 8, 3); val maxF = be(o + 11, 3)
          val packed = be(o + 14, 8)
          val sr = (packed >>> 44).toInt
          val ch = ((packed >>> 41) & 0x7).toInt + 1
          val bps = ((packed >>> 36) & 0x1f).toInt + 1
          val total = packed & 0xFFFFFFFFFL
          if (minB < 16 || minB > maxB || minF > maxF || sr <= 0 ||
            sr > 655350 || bps < 4 || total <= 0L) return None
          // declared scope: constant blocksize AND framesize
          if (minB != maxB || minF != maxF || minF <= 0L) return None
          auditFrames = (total + maxB - 1) / maxB; auditFsz = maxF
          si = Some(Meta(sr, ch, bps, total, 0, total * 1000L / sr,
            auditFrames))
        } else if (nBlocks == 0) return None // STREAMINFO must be first
        nBlocks += 1
        o += 4 + len.toInt
      }
      si match {
        case Some(m) =>
          // audit: measured audio bytes must match STREAMINFO exactly
          if (bytes.length.toLong - o != auditFrames * auditFsz) None
          else Some(m.copy(nMetaBlocks = nBlocks))
        case None => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Q-MM34 — FLAC CONTAINER METADATA: per asset, the facts a lossless-
    * audio curation pass filters and budgets on — sample rate, channels,
    * bit depth, total samples, metadata-block count, duration — from a
    * pure-JVM metadata-block walk ([[FlacReader]]), pairing the lossy
    * ([[qMm28]] MP3) and lossless halves of the audio container arc.
    *
    * Scale: generation and walk fuse into ONE mapPartitions stage — clip
    * bytes never cross an exchange (the mm family invariant); only the
    * per-asset metadata rows shuffle for the final order. */
  def qMm34(spark: SparkSession, dir: String): DataFrame =
    flacMeta(flacAssets(spark, dir)).orderBy("asset_id")

  /** Narrow kernel of [[qMm34]]: batched mapPartitions, no exchange;
    * malformed streams drop per the [[FlacReader]] contract. */
  def flacMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            FlacReader.parse(a.bytes).map(m =>
              (a.asset_id, m.sampleRate.toLong, m.channels.toLong,
                m.bitsPerSample.toLong, m.totalSamples,
                m.nMetaBlocks.toLong, m.durationMs))
          }
        }
      }
      .toDF("asset_id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "n_meta_blocks", "duration_ms")
  }

  /** The narrow kernel of [[qMm24]] over any (asset_id, kind, bytes)
    * frame — batched mapPartitions, no exchange (PlanAuditSpec's mm
    * family list pins it); malformed containers drop per the
    * [[Mp4BoxReader]] contract. */
  def mp4Meta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[AssetRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            Mp4BoxReader.parse(a.bytes).map(m =>
              (a.asset_id, m.durationMs, m.width.toLong, m.height.toLong,
                m.codec, m.nSamples, m.nKeyframes))
          }
        }
      }
      .toDF("asset_id", "duration_ms", "width", "height", "codec",
        "n_samples", "n_keyframes")
  }
}
