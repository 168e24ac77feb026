package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Masking

/** Oracle-checked surface of the PII-masking operator (U-1, reference
  * sanitizer /root/reference/src/sanitizer.py). The testdata star schema has
  * no PII-named columns, so the query derives a PII-shaped frame from
  * `customer` (renames + typed casts, mirrored in the DuckDB oracle) and
  * masks it with [[graft.functions.Masking]]. The interesting property the
  * oracle pins: masked values are a deterministic, engine-portable function
  * of the originals (md5-seeded templates), not random Faker draws.
  */
object Sanitize {

  /** Q-K1: deterministic masking of five representative field kinds
    * (name, city, accountnumber, payrate, ratingarea — string, formatted,
    * and numeric generator shapes). */
  def qK1(spark: SparkSession, dir: String): DataFrame = {
    val piiShaped = Tables.customer(spark, dir).select(
      col("c_custkey"),
      col("c_name").as("name"),
      col("c_mktsegment").as("city"),
      col("c_custkey").cast("string").as("accountnumber"),
      // integral-valued double: renders identically in Spark and DuckDB
      // string casts, so the md5 seed agrees bit-for-bit
      (col("c_custkey") % 97).cast("double").as("payrate"),
      col("c_nationkey").cast("long").as("ratingarea"))
    Masking(piiShaped).orderBy("c_custkey")
  }
}
