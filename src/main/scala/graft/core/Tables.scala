package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (repo:TESTDATA.md /
  * repo:FIXTURES.md §1). One parquet file per table under the sf directory.
  *
  * The reference enumerates containers via its catalog
  * (/root/reference/src/containers.py:78-89); here the "catalog" is the fixed
  * table set of the test star schema. All reads go through `spark.read.parquet`
  * so Catalyst gets pushdown/pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` normalized to session-TZ TIMESTAMP (µs) whatever the
    * parquet physical form — the generator has shipped this column as
    * TIMESTAMP(NANOS) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * across testdata drops, and every downstream query (unix_micros,
    * window(), casts) assumes TIMESTAMP:
    *  - TIMESTAMP(NANOS) with `spark.sql.legacy.parquet.nanosAsLong`
    *    ([[Sessions.configure]]) reads as a nanos-since-epoch long,
    *    truncated here to µs — the truncation DuckDB applies too;
    *  - TIMESTAMP(MICROS) naive reads as TIMESTAMP_NTZ, cast to TIMESTAMP —
    *    the identity on the wall clock under the UTC session timezone, so
    *    epoch arithmetic matches DuckDB's naive-timestamp reading;
    *  - TIMESTAMP passes through. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, NOT `/`: ns-since-epoch (~1.7e18) exceeds double's
        // exact integer range, so float division is off by ±1 µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Unsplittable-input guard for CPU-heavy per-row kernels (optimization
    * guide §2.5, round 19): a table stored as one small file / one parquet
    * row group scans as a SINGLE task, so everything fused into the scan
    * stage — tokenize-explodes, n-gram builds, signature kernels — runs on
    * one core while the rest of the cluster idles. When the scan's input
    * bytes fit in one split (the only case a single-task scan is even
    * possible), redistribute round-robin to the session's parallelism
    * BEFORE the kernel; otherwise return the frame untouched. At real
    * scale the input exceeds one split and this is the identity — the
    * decision reads only driver-side file metadata, never data. Apply it
    * ONLY between a bare scan and a heavy kernel: it would break predicate
    * pushdown if a filter were planned above it, and it costs one
    * (input-sized, tiny by construction) exchange.
    *
    * MEASURED SELECTIVITY (round 19, probe-vs-probe A/B over 18 kernel
    * queries): the exchange + extra AQE stage costs ~0.1-0.3 s at bench
    * SF, so only kernels whose single-core time clearly exceeds that win —
    * in this suite the 8-token-gram STRING BUILDERS (array_join over
    * sliced token arrays: q_d16/q_d17/tokenGrams consumers, −0.1..−0.2 s
    * each). Cheap fused kernels (simhash32/minhash_sig/lang_hits),
    * explode→partial-agg shapes (q_t9/q_t20/q_t25/q_t29/docWordTf), and
    * multi-consumer frames where per-consumer column pruning defeats
    * exchange reuse (blockedDocs: +1.0 s!) all measured net-NEGATIVE with
    * the guard and deliberately keep the fused single-split scan.
    *
    * Results are unaffected: round-robin repartition is deterministic
    * (sort-before-repartition stays on) and every consumer is
    * order-insensitive (aggregations / keyed windows / sorted outputs). */
  def spread(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val par = s.sparkContext.defaultParallelism
    val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.inputFiles.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getFileStatus(p).getLen
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue / 4096 }
    }.sum
    if (par > 1 && bytes < maxSplit) df.repartition(par) else df
  }
}
