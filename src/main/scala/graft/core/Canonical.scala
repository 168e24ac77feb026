package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical document form for content diffing.
  *
  * The reference diffs source vs target documents only after stripping the
  * Cosmos system fields `_etag,_rid,_self,_ts`
  * (/root/reference/src/migration.py:214-227) — but its recursion never
  * enters dicts that sit inside lists (bug B2, SURVEY.md §2.3), so a stale
  * `_etag` inside an array element makes the diff spuriously unequal and
  * forces a redundant write. This canonicalizer is schema-driven and strips
  * the system fields at EVERY depth: structs, arrays of structs, maps with
  * struct values, and any nesting thereof.
  *
  * Being a pure `StructType => Column` rewrite, the result stays inside
  * Catalyst (named_struct / transform / transform_values are all
  * codegen-friendly), so canonicalization adds no shuffle and no UDF barrier
  * — it is just a Project over the scan.
  */
object Canonical {

  /** Cosmos-maintained fields excluded from content comparison
    * (/root/reference/src/migration.py:218-221). */
  val SystemFields: Set[String] = Set("_etag", "_rid", "_self", "_ts")

  /** Rewrite one column to its canonical form (system fields removed at all
    * depths). Returns None when stripping empties a struct entirely. */
  def canonicalize(c: Column, dt: DataType): Option[(Column, DataType)] = dt match {
    case st: StructType =>
      val kept = st.fields.toSeq
        .filterNot(f => SystemFields.contains(f.name))
        .flatMap { f =>
          canonicalize(c.getField(f.name), f.dataType).map {
            case (cc, cdt) => (f.name, cc, StructField(f.name, cdt, f.nullable))
          }
        }
      if (kept.isEmpty) None
      else {
        val colOut = struct(kept.map { case (n, cc, _) => cc.as(n) }: _*)
        // struct(...) on a null struct yields a non-null row of nulls; keep
        // null-ness of the original so diffs don't invent phantom documents
        Some((when(c.isNull, lit(null)).otherwise(colOut),
          StructType(kept.map(_._3))))
      }
    case ArrayType(et, containsNull) =>
      canonicalize(lit(null), et) match {
        case Some((_, cet)) =>
          val rewritten = transform(c, x => canonicalize(x, et).get._1)
          Some((rewritten, ArrayType(cet, containsNull)))
        case None => None
      }
    case MapType(kt, vt, valueContainsNull) =>
      canonicalize(lit(null), vt) match {
        case Some((_, cvt)) =>
          val rewritten = transform_values(c, (_, v) => canonicalize(v, vt).get._1)
          Some((rewritten, MapType(kt, cvt, valueContainsNull)))
        case None => None
      }
    case _ => Some((c, dt))
  }

  /** Strip system fields from every column of `df`, at every depth. Columns
    * that ARE system fields (top level) are dropped; nested occurrences are
    * rewritten away. */
  def strip(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
      .filterNot(f => SystemFields.contains(f.name))
      .flatMap { f =>
        canonicalize(col(f.name), f.dataType).map { case (c, _) => c.as(f.name) }
      }
    df.select(cols: _*)
  }

  /** A single 64-bit content hash of the canonical form of `cols` — the
    * Spark-side cheap diff (hash compare instead of deep struct compare).
    * Not oracle-portable (xxhash64 is Spark-specific); oracle-checked queries
    * use [[graft.functions.Hashing.md5h32]] instead. */
  def contentHash(cols: Seq[Column]): Column = xxhash64(cols: _*)
}
