package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition-key semantics of the reference, re-expressed on columns.
  *
  * The reference extracts one or more `/`-separated paths from each document
  * (hierarchical pk: /root/reference/src/migration.py:19-39), rejects
  * documents whose pk value is null / empty-string / dict / list
  * (migration.py:101-109), and injects the extracted value into the document
  * body when the top-level field is absent (migration.py:112-114).
  *
  * On a DataFrame the traversal is just a nested-field reference — Catalyst
  * prunes untouched sibling fields out of the scan — and validity is a
  * Filter the optimizer can push down. "Is a scalar" is a schema property in
  * Spark (checked once at plan time, not per row), which is strictly cheaper
  * than the reference's per-document isinstance checks.
  */
object PartitionKeys {

  /** `a/b/c` → `col("a").getField("b").getField("c")`. Null-safe by
    * construction: Spark's getField on a null struct is null, matching the
    * reference's None short-circuit (migration.py:32-34). getField (not
    * `col("a.b.c")`) so path segments containing dots stay unambiguous. */
  def extract(path: String): Column = {
    val segs = path.stripPrefix("/").stripSuffix("/").split('/')
    segs.tail.foldLeft(col(segs.head))((c, s) => c.getField(s))
  }

  /** Plan-time check of the reference's "pk must be a scalar" rule: dicts
    * and lists are rejected per-document there (migration.py:104-109); here
    * the schema decides for the whole plan. */
  def isScalarType(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  }

  /** Runtime validity of a scalar pk value: non-null, and non-empty when it
    * is a string (migration.py:101-109). */
  def isValid(c: Column): Column =
    c.isNotNull && (c.cast(StringType) =!= lit(""))

  /** Valid-document predicate: id present and non-empty
    * (migration.py:92-97) and every pk path valid. */
  def validDoc(idCol: Column, pkCols: Seq[Column]): Column =
    pkCols.foldLeft(idCol.isNotNull && idCol.cast(StringType) =!= lit(""))(
      (acc, pk) => acc && isValid(pk))

  /** Inject the extracted pk value as a top-level column when absent
    * (migration.py:112-114): `coalesce(existing, extracted)`. */
  def inject(df: DataFrame, topField: String, path: String): DataFrame = {
    val extracted = extract(path)
    if (df.columns.contains(topField))
      df.withColumn(topField, coalesce(col(topField), extracted))
    else df.withColumn(topField, extracted)
  }
}
