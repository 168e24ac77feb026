package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Co-located joins via bucketing — the pre-shuffle answer to the fact-fact
  * join (SURVEY.md §4.2 scale mandate: "repartition/bucketing for co-located
  * joins"). The reference's merge key `(id, pk)` makes every migration run
  * re-shuffle both sides (/root/reference/src/migration.py:119-146 does it
  * as N serial point-reads); bucketing both tables on the key once amortizes
  * that shuffle across every subsequent join — at 100 TB the shuffle IS the
  * job, so a recurring-join pipeline (incremental merge, verification,
  * dedup-vs-snapshot) should pay it at write time, not per query.
  *
  * Physical contract, asserted by PlanAuditSpec: scans of two tables bucketed
  * into the same bucket count on the join key report `SelectedBucketsCount`
  * and carry hash partitioning, so the equi-join AND the following
  * same-key aggregation plan with ZERO shuffle exchanges — the only exchange
  * left is the range partition for the final presentation ORDER BY.
  */
object Bucketing {

  /** Bucket count for the demo tables; at scale this is sized so one bucket
    * of the larger table fits an executor's memory (e.g. 100 TB / 8192). */
  val Buckets = 8

  private def ident(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Write `df` as a bucketed+sorted managed table (idempotent overwrite).
    * The session catalog is in-memory, so a table directory left by a
    * previous JVM is an ORPHAN the overwrite can't drop — clear it first or
    * CTAS fails with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    if (!s.catalog.tableExists(table)) {
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** q_j7: the qJ2 fact-fact join (orders ⋈ lineitem, per-order line counts)
    * executed over pre-bucketed tables. Results are identical to the plain
    * join; only the physical plan differs (no shuffle of either side). */
  def qJ7(s: SparkSession, dir: String): DataFrame = {
    val o = s"orders_bkt_${ident(dir)}"
    val l = s"lineitem_bkt_${ident(dir)}"
    // Bucket once, join many — the write is the amortized one-time cost, so
    // reuse tables already registered in this JVM (names are per-SF; the
    // testdata is immutable). Only the join key is needed for the count —
    // prune before writing so the bucket files are a single-column "join
    // index" of each table.
    if (!s.catalog.tableExists(o))
      writeBucketed(Tables.orders(s, dir).select("o_orderkey"), o, Buckets, "o_orderkey")
    if (!s.catalog.tableExists(l))
      writeBucketed(Tables.lineitem(s, dir).select("l_orderkey"), l, Buckets, "l_orderkey")
    s.table(o)
      .join(s.table(l), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .orderBy("o_orderkey")
  }
}
