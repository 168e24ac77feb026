package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** U-2: order-independent content checksum aggregate.
  *
  * The reference verifies a migration by comparing row COUNTS only
  * (/root/reference/src/migration.py:182-211) — equal counts don't prove
  * equal contents (wart B5, SURVEY.md §2.3). This aggregator XORs per-row
  * 64-bit hashes, so the result is independent of row order and
  * partitioning — checkable at 100 TB with one scan each and no shuffle
  * beyond the final 1-row reduce. XOR (not sum) because ANSI mode makes a
  * 64-bit hash sum overflow-error; the trade-off (rows duplicated an even
  * number of times cancel out) is acceptable for drift detection and
  * matches the SQL-portable `bit_xor(xxhash64(...))` form.
  *
  * Typed `Aggregator` (not a UDAF over rows) so the same object works in
  * `Dataset.select(...)`, SQL via `functions.udaf`, and streaming
  * aggregations. Partial aggregation (map-side combine) comes free: reduce
  * and merge are both XOR.
  */
object ContentChecksum extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(buf: Long, rowHash: Long): Long = buf ^ rowHash
  override def merge(a: Long, b: Long): Long = a ^ b
  override def finish(buf: Long): Long = buf
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Checksum column over the given content columns: xxhash64 per row →
    * order-independent sum. */
  def of(cols: Column*): Column = udaf(this).apply(xxhash64(cols: _*))

  /** Whole-frame checksum (all columns, name-sorted for stability). */
  def ofFrame(df: DataFrame): Column =
    of(df.columns.sorted.map(col).toIndexedSeq: _*)
}
