package graft



import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.FileAccount
import graft.operators.RawMerge

/** Account-level migration orchestration — the reference's `main.py` loop
  * (A26: account → database → container, with `--database`/`--container`
  * narrowing) re-expressed as driver-side Scala over [[FileAccount]]s, with
  * the per-container work delegated to the distributed [[RawMerge]] plan.
  *
  * Per container (reference E3, SURVEY.md §3): read source RAW (schemaless —
  * unknown fields round-trip byte-exactly, no inference), classify against
  * the target, optionally mask PII on the written rows, land ONLY the
  * inserts/updates through the bucketed upsert sink
  * ([[FileAccount.upsertRaw]] — the skip branch costs zero writes, like the
  * reference's RU-saving skip, migration.py:124-130), then verify. Counters
  * come from one aggregation over the classified frame (the reference
  * increments Python ints per document, migration.py:130-146). Corrupt or
  * invalid documents land in the error counter and a per-container
  * dead-letter file (A13) — never a task failure; `maxErrors` bounds how
  * many before the container aborts. Verification fixes the reference's B5
  * wart: count parity AND an order-independent content hash, not counts
  * alone.
  */
object Orchestrator {

  /** A28: the reference's CLI/env config surface (main.py:10-28), minus
    * Cosmos connection secrets. `sanitize` is a real boolean (B3 fix);
    * `maxErrors` is the dead-letter bound (A13 — the reference's per-doc
    * retry loop handles transient faults, which Spark task retries cover;
    * persistent bad documents are counted, dead-lettered, and bounded). */
  /** `parallelism`: containers migrated concurrently. The reference loops
    * serially (main.py:71-76); on a cluster with many small containers,
    * serial per-container job submission leaves executors idle between
    * stages — concurrent submission lets the scheduler interleave them.
    * Results are independent per container, so this only changes timing. */
  /** `incremental`: prune the target read (and verification) to the bucket
    * directories the source keys hash to — the point-read analogue, right
    * when the source delta is small against a large target. `None` = auto:
    * incremental when source bytes × 4 ≤ target bytes (driver-side file
    * metadata). Full and incremental modes land identical states; they
    * differ only in how much of the target they read. */
  case class Config(
    scopeDatabase: Option[String] = None,
    scopeContainer: Option[String] = None,
    sanitize: Boolean = false,
    maxErrors: Long = Long.MaxValue,
    parallelism: Int = 1,
    incremental: Option[Boolean] = None)

  /** `verifyMode` documents what `verified` actually covered:
    *  - `"full"`: count + order-independent content hash over the ENTIRE
    *    post-merge target vs the expected merged state.
    *  - `"incremental"`: count + content hash over the AFFECTED buckets only,
    *    plus a driver-metadata listing check (file names/sizes/mtimes) that
    *    every unaffected bucket was left byte-for-byte untouched. Reduced
    *    coverage by design: content corruption in an unaffected bucket that
    *    preserves its file listing is NOT detected (it was also outside the
    *    run's write set); the global count invariant post = pre + inserts is
    *    implied by the two checks together without any full scan. */
  case class ContainerResult(
    database: String, container: String,
    inserted: Long, updated: Long, skipped: Long, errors: Long,
    sourceCount: Long, targetCount: Long, verified: Boolean,
    verifyMode: String = "full")

  case class Summary(results: Seq[ContainerResult], durationSec: Double) {
    def ok: Boolean = results.forall(_.verified)
    /** A24: the reference's written-docs/sec rate (migration.py:156-157). */
    def ratePerSec: Double =
      if (durationSec <= 0) 0.0
      else results.map(r => r.inserted + r.updated).sum / durationSec
  }

  /** A16: abort when source and target pk paths disagree
    * (migration.py:47-58). */
  def assertPkAligned(src: Seq[String], tgt: Seq[String],
                      db: String, container: String): Unit =
    require(src == tgt,
      s"partition key mismatch for $db/$container: source=$src target=$tgt")

  def migrateContainer(spark: SparkSession, source: FileAccount,
                       target: FileAccount, db: String, container: String,
                       cfg: Config): ContainerResult = {
    val props = source.containerProperties(db, container)
    target.createDatabaseIfAbsent(db)
    target.createContainerIfAbsent(db, container, props)
    assertPkAligned(props.pkPaths,
      target.containerProperties(db, container).pkPaths, db, container)

    val srcRaw = source.readRaw(spark, db, container)
    val pkPaths = props.pkPaths
    val keyCols = "__id" +: pkPaths.indices.map(i => s"__pk$i")

    // Incremental mode (the point-read analogue): when the source delta is
    // small against a large target, read — and canonical-hash, and verify —
    // only the bucket directories the source keys hash to. Classification is
    // unaffected: a matching target row always lives in its key's bucket.
    val hasTgt = target.hasData(db, container)
    val incremental = hasTgt && cfg.incremental.getOrElse(
      source.dataBytes(db, container) * 4 <= target.dataBytes(db, container))
    val (tgtRaw, affectedOpt) =
      if (!hasTgt) (srcRaw.limit(0), None)
      else if (incremental) {
        val srcKeys = RawMerge.srcKeyed(spark, srcRaw, pkPaths)
          .filter(RawMerge.validCol(pkPaths))
          .select(keyCols.map(col): _*)
        val (df, buckets) =
          target.readRawBucketsFor(spark, db, container, srcKeys, keyCols)
        (df, Some(buckets))
      } else (target.readRaw(spark, db, container), None)
    // incremental mode: capture the pre-merge listing signatures (driver
    // metadata, no data read) so verification can prove the unaffected
    // buckets were untouched — this replaces the full-container line count
    // the old count-parity invariant needed
    val preSigs: Map[Long, String] =
      if (incremental) target.bucketSignatures(db, container) else Map.empty
    // ONE full-outer src⋈tgt join for the whole container run: counters,
    // dead-letter, the sink input, AND the expected post-merge state all
    // derive from this cached frame (a second merge join for verification
    // would be ~2 extra container passes at scale)
    val classified = RawMerge.classifyAll(spark, srcRaw, tgtRaw, pkPaths).cache()
    val counts = classified.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)

    // A13 dead-letter: corrupt/invalid documents land next to the data, and
    // the run aborts only past the configured bound
    if (counts("error") > 0)
      classified.filter(col("action") === "error").select("raw")
        .write.mode("overwrite")
        .text(target.errorsPath(db, container))
    require(counts("error") <= cfg.maxErrors,
      s"$db/$container: ${counts("error")} error documents exceed maxErrors=${cfg.maxErrors}")

    // A11/A12: only inserts/updates reach the sink (write elision for skips);
    // masking applies to written rows only (migration.py:131-136)
    val changedRows = classified
      .filter(col("action").isin("insert", "update"))
      .select((("raw" +: keyCols).map(col)): _*)
    val changed =
      if (cfg.sanitize) changedRows.withColumn("raw", expr("mask_json(raw)"))
      else changedRows

    // A15 + B5 fix: count parity and content-hash parity of what landed vs
    // the intended merged state (byte-level: the raw lines themselves).
    // Expected-state metrics are materialized BEFORE the sink mutates the
    // target: the upsert may absorb/delete stray files that `tgtRaw`'s
    // lineage still references (the cache above bounds that exposure too).
    // Count and hash come from ONE aggregation — each stateStats call is a
    // single pass over its frame, which matters when the frame is a
    // container re-read. bit_xor, not sum: ANSI mode errors on 64-bit
    // hash-sum overflow
    def stateStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("raw")).as("h"))
        .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val expected = RawMerge.mergedStateOf(classified, pkPaths, cfg.sanitize)
    val (expectedCount, expectedHash) = stateStats(expected)

    target.upsertRaw(spark, db, container, changed, keyCols, pkPaths)
    classified.unpersist()

    val (verified, targetCount, verifyMode) = affectedOpt match {
      case Some(buckets) =>
        // incremental verify, O(delta + affected buckets) — no full scan:
        //  (1) count + content-hash parity of the affected buckets vs the
        //      expected merged state (everything the run could write);
        //  (2) listing-signature parity of every UNAFFECTED bucket vs the
        //      pre-merge capture (the sink's dynamic partition overwrite
        //      never lists them; this proves it) and no bucket dirs appeared
        //      outside the affected set.
        // Together these imply the old global invariant post = pre + inserts
        // without re-reading the container. The reported targetCount is the
        // sidecar sum (upsertRaw maintains per-bucket counts) — metadata,
        // not a scan.
        val back = target.readRawBuckets(spark, db, container, buckets)
        val postSigs = target.bucketSignatures(db, container)
        val untouched =
          (postSigs.keySet -- buckets) == (preSigs.keySet -- buckets) &&
            (postSigs.keySet -- buckets).forall(b => postSigs(b) == preSigs(b))
        val (backCount, backHash) = stateStats(back)
        val ok = backCount == expectedCount && backHash == expectedHash &&
          untouched
        (ok, target.countRows(spark, db, container), "incremental")
      case None =>
        val (writtenCount, writtenHash) = stateStats(
          target.readRaw(spark, db, container))
        val ok = writtenCount == expectedCount && writtenHash == expectedHash
        (ok, writtenCount, "full")
    }

    // every source row classifies into exactly one action, so the source
    // count is free — no extra scan
    val sourceCount =
      counts("insert") + counts("update") + counts("skip") + counts("error")
    ContainerResult(db, container,
      counts("insert"), counts("update"), counts("skip"), counts("error"),
      sourceCount, targetCount, verified, verifyMode)
  }

  /** A26 top loop with scoping; `--container` requires `--database`
    * (main.py:109-110). */
  def migrate(spark: SparkSession, source: FileAccount, target: FileAccount,
              cfg: Config = Config()): Summary = {
    require(cfg.scopeContainer.isEmpty || cfg.scopeDatabase.nonEmpty,
      "--container requires --database")
    require(source.testConnection(), s"source account unreachable: ${source.root}")
    require(target.testConnection(), s"target account unreachable: ${target.root}")

    val t0 = System.nanoTime()
    val dbs = cfg.scopeDatabase.map(Seq(_)).getOrElse(source.listDatabases())
    val pairs = for {
      db <- dbs
      c <- cfg.scopeContainer.map(Seq(_)).getOrElse(source.listContainers(db))
    } yield (db, c)
    val results =
      if (cfg.parallelism <= 1 || pairs.size <= 1)
        pairs.map { case (db, c) => migrateContainer(spark, source, target, db, c, cfg) }
      else {
        // Spark supports concurrent job submission from multiple driver
        // threads; each container's plan is independent
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.parallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(pairs.map { case (db, c) =>
            Future(migrateContainer(spark, source, target, db, c, cfg))
          }), Duration.Inf)
        finally pool.shutdown()
      }
    Summary(results, (System.nanoTime() - t0) / 1e9)
  }

  /** CLI surface (A28, main.py:10-28 minus Cosmos secrets):
    * {{{
    * runMain graft.Orchestrator <sourceDir> <targetDir>
    *   [--database D] [--container C] [--sanitize] [--summary path]
    * }}}
    * `--sanitize` is a plain flag (B3 fix: the reference's `type=bool` parses
    * any non-empty string, including "false", as true). Returns the process
    * exit code (0 = all containers verified, 1 = failure; main.py:163-167). */
  def run(args: Array[String]): Int = {
    var pos = Vector.empty[String]
    var cfg = Config()
    var summaryPath: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--database"  => cfg = cfg.copy(scopeDatabase = Some(args(i + 1))); i += 2
        case "--container" => cfg = cfg.copy(scopeContainer = Some(args(i + 1))); i += 2
        case "--sanitize"  => cfg = cfg.copy(sanitize = true); i += 1
        case "--max-errors" => cfg = cfg.copy(maxErrors = args(i + 1).toLong); i += 2
        case "--parallelism" => cfg = cfg.copy(parallelism = args(i + 1).toInt); i += 2
        case "--summary"   => summaryPath = Some(args(i + 1)); i += 2
        case p             => pos = pos :+ p; i += 1
      }
    }
    require(pos.length == 2,
      s"usage: graft.Orchestrator <sourceDir> <targetDir> [--database D] " +
        s"[--container C] [--sanitize] [--summary path]; got $pos")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-migrate")
    try {
      val summary = migrate(spark, FileAccount(pos(0)), FileAccount(pos(1)), cfg)
      summaryPath.foreach(writeSummary(summary, _))
      summary.results.foreach { r =>
        println(s"${r.database}/${r.container}: inserted=${r.inserted} " +
          s"updated=${r.updated} skipped=${r.skipped} errors=${r.errors} " +
          s"verified=${r.verified}")
      }
      if (summary.ok) 0 else 1
    } catch {
      case e: Exception => System.err.println(s"migration failed: ${e.getMessage}"); 1
    }
  }

  def main(args: Array[String]): Unit = sys.exit(run(args))

  /** A25: nested JSON run report (main.py:154-160). */
  def writeSummary(s: Summary, path: String): Unit = {
    val rows = s.results.map { r =>
      s"""    {"database": "${r.database}", "container": "${r.container}",
         |     "inserted": ${r.inserted}, "updated": ${r.updated},
         |     "skipped": ${r.skipped}, "errors": ${r.errors},
         |     "source_count": ${r.sourceCount}, "target_count": ${r.targetCount},
         |     "verified": ${r.verified}, "verify_mode": "${r.verifyMode}"}""".stripMargin
    }.mkString(",\n")
    graft.core.Storage.hadoop.writeString(path,
      s"""{\n  "duration_sec": ${s.durationSec},\n  "rate_docs_per_sec": ${s.ratePerSec},\n  "ok": ${s.ok},\n  "containers": [\n$rows\n  ]\n}\n""")
  }
}
