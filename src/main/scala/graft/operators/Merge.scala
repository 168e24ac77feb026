package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PartitionKeys, Tables}

/** The reference's heart: per-document merge of a source container into a
  * target container (/root/reference/src/migration.py:91-150). There it is a
  * serial loop — point-read the target for every source doc, deep-compare,
  * then create/replace — i.e. ≥2 synchronous round-trips per document. Here
  * the same semantics are ONE distributed plan:
  *
  *   source → Filter(valid id/pk)  →  Join(target, keys)  →  Project(CASE)
  *
  * Classification branches (migration.py:119-146):
  *   - error:  id missing/empty (:92-97) or pk invalid (:101-109)
  *   - insert: no target row with the same (id, pk)        (:140-146)
  *   - skip:   target content identical after canonicalization (:124-130)
  *   - update: target content differs                       (:132-138)
  *
  * Scale posture: the join shuffles both sides on (id ++ pkCols) once; AQE
  * picks broadcast when the target snapshot is small and splits skewed keys.
  * The "skip" branch is write-elision — at 100 TB re-syncs where most docs
  * are unchanged, eliding those writes is the dominant optimization (the
  * reference does the same per-row to save RU cost, migration.py:124-130).
  * Classification itself is a codegen'd Project: no extra shuffle, no UDF.
  */
object Merge {

  /** Per-row action classification of `src` against `tgt`.
    *
    * Output = all `src` columns + `action` ('error'|'insert'|'skip'|'update').
    * `contentCols` should already be canonical (see [[graft.core.Canonical]]);
    * equality is null-safe struct equality on them.
    */
  def classify(src: DataFrame, tgt: DataFrame, idCol: String,
               pkCols: Seq[String], contentCols: Seq[String]): DataFrame = {
    val keys = (idCol +: pkCols).distinct
    val valid = PartitionKeys.validDoc(col(idCol), pkCols.map(col))
    val srcCols = src.columns.toSeq.map(col)

    val tgtSel = tgt.select(
      keys.map(n => col(n).as(s"__t_$n")) :+
        struct(contentCols.map(col): _*).as("__t_content"): _*)
    val joinCond = keys.map(n => col(n) === col(s"__t_$n")).reduce(_ && _)

    val classified = src.filter(valid)
      .join(tgtSel, joinCond, "left_outer")
      .select(srcCols :+ when(col(s"__t_$idCol").isNull, lit("insert"))
        .when(struct(contentCols.map(col): _*) <=> col("__t_content"), lit("skip"))
        .otherwise(lit("update")).as("action"): _*)

    val errors = src.filter(!valid)
      .select(srcCols :+ lit("error").as("action"): _*)

    classified.unionAll(errors)
  }

  /** Post-merge target state: valid source rows win (insert/update), target
    * rows absent from the source are kept — the reference never deletes
    * (migration.py has no delete path). One full-outer join on the merge key.
    */
  def merged(src: DataFrame, tgt: DataFrame, idCol: String,
             pkCols: Seq[String], contentCols: Seq[String]): DataFrame = {
    val keys = (idCol +: pkCols).distinct
    val valid = PartitionKeys.validDoc(col(idCol), pkCols.map(col))
    val srcV = src.filter(valid)
    val tgtSel = tgt.select(
      (keys ++ contentCols).map(n => col(n).as(s"__t_$n")): _*)
    val joinCond = keys.map(n => col(n) === col(s"__t_$n")).reduce(_ && _)
    srcV.join(tgtSel, joinCond, "full_outer")
      .select((keys ++ contentCols).map(n =>
        coalesce(col(n), col(s"__t_$n")).as(n)): _*)
  }

  /** Attach the reference's four counters (migration.py:73,130,138,146) as
    * an `observe` metric — collected by a QueryExecutionListener with zero
    * extra passes over the data. */
  def withMetrics(classified: DataFrame, name: String = "merge"): DataFrame = {
    def n(a: String): Column = count(when(col("action") === a, 1)).as(a)
    classified.observe(name, n("insert"), n("update"), n("skip"), n("error"))
  }

  // ---- oracle-checked snapshot queries on the `documents` table ----
  //
  // The driver testdata has no paired source/target containers, so the
  // snapshots are derived deterministically (same arithmetic in the DuckDB
  // oracle, SparkEntry.oracleSql):
  //   - source: id nulled for doc_id%53=0 (missing-id errors, A4),
  //             pk emptied for doc_id%71=0 (invalid-pk errors, A6)
  //   - target: doc_id%10=3 rows absent (inserts), doc_id%10=7 rows stale
  //             (updates), the rest identical (skips)

  private def sourceSnapshot(docs: DataFrame): DataFrame = docs.select(
    when(col("doc_id") % 53 === 0, lit(null))
      .otherwise(col("doc_id").cast("string")).as("id"),
    when(col("doc_id") % 71 === 0, lit(""))
      .otherwise(col("lang")).as("pk"),
    col("text"))

  private def targetSnapshot(docs: DataFrame): DataFrame = docs
    .filter(col("doc_id") % 10 =!= 3)
    .select(
      col("doc_id").cast("string").as("id"),
      col("lang").as("pk"),
      when(col("doc_id") % 10 === 7, concat(col("text"), lit(" [stale]")))
        .otherwise(col("text")).as("text"))

  /** Q-M1: action histogram of the merge classification (A9-A12 + A23). */
  def qM1(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    classify(sourceSnapshot(docs), targetSnapshot(docs),
      "id", Seq("pk"), Seq("text"))
      .groupBy("action").agg(count(lit(1)).as("c"))
      .orderBy("action")
  }

  /** Q-M2: order-independent checksum of the post-merge target state (the
    * B5 fix: content parity, not just count parity). */
  def qM2(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    merged(sourceSnapshot(docs), targetSnapshot(docs),
      "id", Seq("pk"), Seq("text"))
      .selectExpr(
        s"${graft.functions.Hashing.md5h32("concat(id, '|', pk, '|', text)")} AS h32")
      .agg(count(lit(1)).as("n"), sum(col("h32")).as("h"))
  }

  /** Q-M3: idempotence — re-classifying the source against the merged state
    * must yield only 'skip' (plus the unchanged 'error' rows): the
    * reference's implicit contract that a second migration run writes
    * nothing (migration.py:124-130 + FIXTURES.md §2.4). */
  def qM3(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = sourceSnapshot(docs)
    val after = merged(src, targetSnapshot(docs), "id", Seq("pk"), Seq("text"))
    classify(src, after, "id", Seq("pk"), Seq("text"))
      .groupBy("action").agg(count(lit(1)).as("c"))
      .orderBy("action")
  }
}
