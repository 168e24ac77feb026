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
}
