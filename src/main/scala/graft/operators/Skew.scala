package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7.3 item 6). At 100 TB a handful of hot keys
  * (one celebrity `user_id`, one default partition key) can pin a whole
  * stage on one task. Two standing answers:
  *
  *  1. JOINS: rely on AQE's skew-join splitting
  *     (`spark.sql.adaptive.skewJoin.enabled`, on by default here via
  *     [[graft.core.Sessions.configure]]) — it splits oversized partitions
  *     at runtime using exact shuffle statistics, which beats static salting
  *     for joins.
  *  2. AGGREGATIONS with high-cardinality accumulators (collect_list,
  *     count-distinct buffers) where partial aggregation doesn't shrink the
  *     hot key's map-side state: explicit two-phase SALTED aggregation —
  *     spread each key over `buckets` sub-keys, aggregate, then combine.
  *
  * For algebraic aggregates (count/sum/min/max) Spark's partial aggregation
  * already does the equivalent — [[saltedCount]] exists as the template for
  * the non-algebraic cases and as the explicit form when partial agg is
  * defeated (e.g. aggregation right after an exchange on the group key).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the full row content, not
    * rand() — reproducible runs, and co-located duplicates still combine. */
  def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(buckets))

  /** Two-phase salted count per key: groupBy(key, salt) → partial counts →
    * groupBy(key) → sum. The hot key's rows land on `buckets` reducers in
    * phase 1; phase 2 combines `buckets` tiny rows per key. */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(buckets, df.columns.map(col).toSeq).as("__salt"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(keyCol).agg(sum("__c").as("c"))

  /** Two-phase salted distinct-collect per key (the genuinely non-algebraic
    * case: one giant array per hot key would OOM a single task's buffer).
    * Phase 1 dedups within (key, salt); phase 2 merges the per-salt arrays. */
  def saltedCollectSet(df: DataFrame, keyCol: String, valueCol: String,
                       buckets: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(buckets, Seq(col(valueCol))).as("__salt"))
      .agg(collect_set(valueCol).as("__vs"))
      .groupBy(keyCol)
      .agg(array_sort(array_distinct(flatten(collect_list("__vs")))).as("values"))
}
