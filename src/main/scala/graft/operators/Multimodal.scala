package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal asset plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators — the
  * shape a 100 TB training-data pipeline needs (decode → feature-extract →
  * frame-sample), with the DECODE STEP STUBBED as a deterministic fake
  * (this container has no image/audio codecs; a real deployment swaps
  * [[Multimodal.fingerprint]] for a JNI/codec call without touching the
  * Spark plumbing, which is what these operators actually test).
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
}
