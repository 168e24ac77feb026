package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.Hashing.md5h32

/** The schemaless form of the reference's per-document merge
  * (/root/reference/src/migration.py:91-150): documents are RAW JSON lines,
  * never schema-inferred, so unknown fields of any shape — mixed-type,
  * heterogeneous nesting, dicts inside arrays — survive the pipeline
  * byte-exactly. This is the reference's actual data model (Cosmos documents
  * are schemaless; the migrator only ever interprets `id`, the pk paths, and
  * the four system fields) and SURVEY §7.3's declared risk #1.
  *
  * Structure is touched in exactly three per-row kernels
  * ([[graft.functions.JsonDocs]]): canonical content form for the diff
  * (Python-dict-equality semantics: key order and number format are
  * irrelevant, system fields stripped at every depth), pk extraction by
  * dict-only path traversal, and the reference's pre-write pk injection. A
  * line that fails to parse classifies as an 'error' row — the per-document
  * error channel (A13): corrupt input lands in the error counter and the
  * dead-letter file, never as a task failure.
  *
  * Scale shape: key extraction and canonical hashing are map-side projections
  * inside whole-stage codegen; the single shuffle is the (id ++ pk) equi-join
  * against the target snapshot, and the join payload carries the 32-char
  * canonical md5 instead of re-shipping parsed documents. AQE broadcasts a
  * small target and splits skewed keys.
  */
object RawMerge {

  /** Classification action column values, reference branch order
    * (migration.py:92-146): error → insert → skip → update. */
  private def actionCol: Column =
    when(col("__t_id").isNull, lit("insert"))
      .when(col("__ch") === col("__t_ch"), lit("skip"))
      .otherwise(lit("update"))

  private def pkNames(pkPaths: Seq[String]): Seq[String] =
    pkPaths.indices.map(i => s"__pk$i")

  /** Source side: raw + injected write-form + merge keys from ONE parse via
    * the [[graft.functions.JsonDocKeys]] struct kernel (codegen CSE
    * collapses the repeated field accesses, so even after Catalyst pushes
    * the validity predicates into the scan the document parses once per
    * operator, not once per derived column). The canonical hash rides in a
    * SECOND projection on purpose: it must not be part of the kernel the
    * scan-pushed predicates evaluate (see [[graft.functions.JsonDocs.docKeys]]). */
  /** `carry` columns of `src` pass through unchanged (e.g. a source-file
    * column a streaming caller captured before this keying). */
  private[graft] def srcKeyed(s: SparkSession, src: DataFrame,
                              pkPaths: Seq[String],
                              carry: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(s)
    val paths = pkPaths.map(_.stripPrefix("/"))
    val csv = paths.mkString(",")
    src.selectExpr("raw" +: carry :+ s"json_doc_keys(raw, '$csv', 'true') AS __m": _*)
      .selectExpr(
        (Seq("raw") ++ carry ++ Seq("__m.w AS __w", "__m.id AS __id") ++
          paths.indices.map(i => s"__m.pk$i AS __pk$i")): _*)
      .withColumn("__ch", expr("md5(canonical_json(__w))"))
  }

  /** Target side: keys + canonical hash + original bytes (kept for the skip
    * branch: a skipped document's bytes are the TARGET's, which the
    * reference leaves untouched, migration.py:124-130). No injection — the
    * target is compared exactly as stored, like the reference's read-back
    * document. */
  private def tgtKeyed(s: SparkSession, tgt: DataFrame,
                       pkPaths: Seq[String]): DataFrame = {
    GraftFunctions.register(s)
    val paths = pkPaths.map(_.stripPrefix("/"))
    val csv = paths.mkString(",")
    tgt.selectExpr("raw", s"json_doc_keys(raw, '$csv', 'false') AS __m")
      .selectExpr(
        Seq("raw AS __t_raw", "__m.id AS __t_id") ++
          paths.indices.map(i => s"__m.pk$i AS __t_pk$i"): _*)
      .withColumn("__t_ch", expr("md5(canonical_json(__t_raw))"))
  }

  /** Valid document predicate (migration.py:92-109): parseable, id present
    * and non-empty, every pk value a non-null non-empty scalar. */
  private[graft] def validCol(pkPaths: Seq[String]): Column =
    (Seq(col("__w").isNotNull, col("__id").isNotNull, col("__id") =!= "") ++
      pkNames(pkPaths).map(n => col(n).isNotNull && col(n) =!= ""))
      .reduce(_ && _)

  private def joinCond(pkPaths: Seq[String]): Column =
    (Seq(col("__id") === col("__t_id")) ++
      pkPaths.indices.map(i => col(s"__pk$i") === col(s"__t_pk$i")))
      .reduce(_ && _)

  /** Per-document action classification of raw `src` against raw `tgt` (both
    * single-`raw`-column frames). Output: `raw` (the injected write form for
    * valid rows, original bytes for error rows) + merge keys + `action`. */
  def classify(s: SparkSession, src: DataFrame, tgt: DataFrame,
               pkPaths: Seq[String]): DataFrame = {
    val keys = "__id" +: pkNames(pkPaths)
    val sk = srcKeyed(s, src, pkPaths)
    val tk = tgtKeyed(s, tgt, pkPaths)
    val valid = validCol(pkPaths)
    val classified = sk.filter(valid)
      .join(tk, joinCond(pkPaths), "left_outer")
      .select(col("__w").as("raw") +: keys.map(col) :+ actionCol.as("action"): _*)
    val errors = sk.filter(!valid)
      .select(col("raw") +: keys.map(col) :+ lit("error").as("action"): _*)
    classified.unionAll(errors)
  }

  /** Full-outer classification — ONE src⋈tgt shuffle that yields everything
    * an orchestrated merge needs: every source row classified exactly as
    * [[classify]] does, PLUS the target-only complement as `action =
    * 'target'`. Counters, the changed-row sink input, and the expected
    * post-merge state (verification) all derive from this single frame, so
    * the orchestrator never runs a second merge join.
    *
    * The `raw` column is already state-correct per branch: insert/update
    * rows carry the source's injected write form, skip and target-only rows
    * carry the target's ORIGINAL bytes (the reference never rewrites an
    * unchanged document), error rows carry the source's original bytes
    * (dead-letter form). */
  def classifyAll(s: SparkSession, src: DataFrame, tgt: DataFrame,
                  pkPaths: Seq[String]): DataFrame = {
    val keys = "__id" +: pkNames(pkPaths)
    val sk = srcKeyed(s, src, pkPaths)
    val tk = tgtKeyed(s, tgt, pkPaths)
    val valid = validCol(pkPaths)
    val action =
      when(col("__id").isNull, lit("target"))
        .when(col("__t_id").isNull, lit("insert"))
        .when(col("__ch") === col("__t_ch"), lit("skip"))
        .otherwise(lit("update"))
    val raw =
      when(col("action") === "insert" || col("action") === "update", col("__w"))
        .otherwise(col("__t_raw"))
    val classified = sk.filter(valid)
      .join(tk, joinCond(pkPaths), "full_outer")
      .withColumn("action", action)
      .select(raw.as("raw") +:
        keys.zipWithIndex.map { case (k, i) =>
          coalesce(col(k), col(if (i == 0) "__t_id" else s"__t_pk${i - 1}")).as(k)
        } :+ col("action"): _*)
    val errors = sk.filter(!valid)
      .select(col("raw") +: keys.map(col) :+ lit("error").as("action"): _*)
    classified.unionAll(errors)
  }

  /** Post-merge container state, byte-faithful: inserts/updates carry the
    * source's (injected, optionally masked) bytes; skips and target-only
    * rows carry the target's ORIGINAL bytes; error rows are excluded
    * (reference: counted and skipped). Masking applies only to written
    * documents (migration.py:131-136). Derived from [[classifyAll]] — one
    * full-outer join, shareable with the classification pass. */
  def mergedState(s: SparkSession, src: DataFrame, tgt: DataFrame,
                  pkPaths: Seq[String], sanitize: Boolean = false): DataFrame =
    mergedStateOf(classifyAll(s, src, tgt, pkPaths), pkPaths, sanitize)

  /** [[mergedState]] from an already-computed (possibly cached)
    * [[classifyAll]] frame: expected-state derivation costs zero additional
    * joins. */
  def mergedStateOf(all: DataFrame, pkPaths: Seq[String],
                    sanitize: Boolean): DataFrame = {
    val keys = "__id" +: pkNames(pkPaths)
    val written = if (sanitize) expr("mask_json(raw)") else col("raw")
    all.filter(col("action") =!= "error")
      .select(
        when(col("action").isin("insert", "update"), written)
          .otherwise(col("raw")).as("raw") +: keys.map(col): _*)
  }

  // ---- oracle-checked snapshot queries on the `documents` table ----
  //
  // Deterministic raw-JSON source/target snapshots built from `documents`
  // (the driver testdata has no raw containers). The snapshots exercise
  // exactly what schema inference destroys: key order differs between the
  // sides, numbers are value-equal but format-different (1.0 vs 1), and
  // system fields sit at top level AND inside a dict-in-array (the B2 case).
  // Expected actions are pure doc_id arithmetic, so the DuckDB oracle is
  // analytic ground truth, independent of the engine's JSON machinery:
  //   - doc_id % 101 == 0 → truncated line (corrupt)        → error
  //   - doc_id %  53 == 0 → id empty                        → error
  //   - doc_id %  71 == 0 → pk empty                        → error
  //   - doc_id %  10 == 3 → absent from target              → insert
  //   - doc_id %  10 == 7 → nested payload value differs    → update
  //   - otherwise: only key order / number format / system fields differ
  //                                                         → skip

  private[operators] def rawSource(docs: DataFrame): DataFrame = {
    val idStr = when(col("doc_id") % 53 === 0, lit(""))
      .otherwise(col("doc_id").cast("string"))
    val pkStr = when(col("doc_id") % 71 === 0, lit("")).otherwise(col("lang"))
    val full = concat(
      lit("{\"z\":1.0,\"id\":\""), idStr,
      lit("\",\"pk\":\""), pkStr,
      lit("\",\"payload\":{\"a\":[{\"v\":"), (col("doc_id") % 7).cast("string"),
      lit(",\"_etag\":\"s\"}],\"src\":\""), col("source"),
      lit("\"},\"_ts\":1}"))
    docs.select(
      when(col("doc_id") % 101 === 0, substring(full, 1, 20)).otherwise(full)
        .as("raw"))
  }

  private[operators] def rawTarget(docs: DataFrame): DataFrame = {
    val v2 = (col("doc_id") % 7 +
      when(col("doc_id") % 10 === 7, lit(1)).otherwise(lit(0))).cast("string")
    docs.filter(col("doc_id") % 10 =!= 3)
      .select(concat(
        lit("{\"id\":\""), col("doc_id").cast("string"),
        lit("\",\"z\":1,\"_rid\":\"r\",\"pk\":\""), col("lang"),
        lit("\",\"payload\":{\"src\":\""), col("source"),
        lit("\",\"a\":[{\"_etag\":\"t\",\"v\":"), v2,
        lit("}]},\"_ts\":2}")).as("raw"))
  }

  /** Q-M4: schemaless merge classification — the action histogram of the raw
    * merge over snapshots whose skip-rows differ in everything inference
    * breaks (key order, 1.0-vs-1, system fields at depth) and whose corrupt
    * rows exercise the error channel. */
  def qM4(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    classify(spark, rawSource(docs), rawTarget(docs), Seq("/pk"))
      .groupBy("action").agg(count(lit(1)).as("c"))
      .orderBy("action")
  }

  /** Q-M5: byte-fidelity checksum of the post-merge state — skips keep the
    * TARGET's exact bytes, inserts/updates the SOURCE's, target-only rows
    * survive; the oracle rebuilds the same strings and must match the
    * md5-sum exactly (the round-trip contract, hash-checked). */
  def qM5(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    mergedState(spark, rawSource(docs), rawTarget(docs), Seq("/pk"))
      .selectExpr(s"${md5h32("raw")} AS h32")
      .agg(count(lit(1)).as("n"), sum(col("h32")).as("h"))
  }
}
