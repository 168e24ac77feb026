package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.RawMerge

/** SQL write path of [[GraftCatalog]] tables: `INSERT INTO graft.db.c`,
  * `INSERT OVERWRITE`, and `df.writeStream.toTable("graft.db.c")` all commit
  * through the SAME merge engine as the bespoke API — the reference's
  * per-document upsert loop (/root/reference/src/migration.py:91-150)
  * surfaced as a DataSource-V2 write, which closes the last non-SQL surface:
  * a container is now readable AND writable from plain Spark SQL.
  *
  * SEMANTICS — an INSERT is an UPSERT BY MERGE KEY, not a blind append
  * (a plain append could not maintain the pk-hash bucket layout, the
  * `_counts.json` sidecars, or key uniqueness — the properties every
  * point-read, pruned merge, and O(metadata) verification in this engine
  * relies on). Each committed batch runs the A9–A12 pipeline: parse + key
  * once, dead-letter invalid documents to the container's `_errors` channel
  * (A4/A13 — an INSERT of a corrupt line "succeeds" into the error channel,
  * exactly like the reference's per-document error branch), collapse
  * intra-batch duplicate keys deterministically (content-hash order),
  * canonical-diff against the CURRENT target (so re-inserting an unchanged
  * document is a SKIP — reruns are idempotent and rewrite nothing), and land
  * inserts/updates through [[FileAccount.upsertRaw]], rewriting only the
  * buckets that actually changed. `INSERT OVERWRITE` truncates the container
  * data first (filesystem truncate — not atomic with the subsequent write,
  * like every file-based overwrite), then merges into the empty layout.
  * There is deliberately NO separate MERGE INTO surface: INSERT already IS
  * the merge (same classify → upsert pipeline MERGE INTO would run).
  *
  * MECHANICS — executors stage their rows as raw text lines under
  * `container/_staging/<queryId>/` (one file per task, created-on-first-row;
  * the `_` prefix keeps staging invisible to every scan and signature walk),
  * and the driver-side commit reads ONLY the files named in the task commit
  * messages (so speculative / retried task attempts leave at most orphan
  * staging files, never duplicate rows), runs the distributed merge, then
  * deletes the staging tree. Work scales with the batch and its affected
  * buckets, never the container. Streaming commits are per-epoch under
  * `_staging/<queryId>/<epochId>/`; a replayed epoch re-merges and converges
  * (canonical-diff skips make it a no-op) — at-least-once delivery into an
  * idempotent sink, the same contract as [[graft.streaming.Streams
  * .syncContainers]]'s foreachBatch path. */
object ContainerMerge {

  /** Metadata-sized accounting of one committed batch (A23/A24). */
  final case class Stats(srcRows: Long, mergedKeys: Long, errorRows: Long,
                         rewrittenBuckets: Set[Long])

  /** Merge a raw-lines frame (single `raw` string column) into the
    * container through classify → upsert. Shared by the batch and
    * streaming commit paths; mirrors the foreachBatch merge in
    * [[graft.streaming.Streams.syncContainers]] minus the source-file
    * column (a SQL batch has no file order — intra-batch duplicate keys
    * collapse by content-hash order, deterministic under replay). */
  def mergeRaw(s: SparkSession, account: FileAccount, db: String,
               container: String, src: DataFrame): Stats = {
    graft.functions.GraftFunctions.register(s)
    val props = account.containerProperties(db, container)
    val pkPaths = props.pkPaths
    val keyCols = "__id" +: pkPaths.indices.map(i => s"__pk$i")
    val sk = RawMerge.srcKeyed(s, src, pkPaths)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val valid = RawMerge.validCol(pkPaths)
      // one aggregation for all three counters (the orchestrator pattern)
      val stats = sk.agg(
        count(lit(1)).as("n"),
        count(when(!valid, lit(1))).as("e"),
        count_distinct(when(valid,
          struct(keyCols.map(col): _*))).as("m")).head()
      val (srcRows, errorRows, mergedKeys) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      if (errorRows > 0)
        sk.filter(!valid).select("raw").write.mode("append")
          .text(account.errorsPath(db, container))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(col("__ch").desc)
      val srcOne = sk.filter(valid)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      val hasTgt = account.hasData(db, container)
      val (tgt, _) =
        if (hasTgt)
          account.readRawBucketsFor(s, db, container,
            srcOne.select(keyCols.map(col): _*), keyCols)
        else
          (s.range(0).select(lit(null).cast("string").as("raw")),
            Set.empty[Long])
      val changed = RawMerge.classify(s, srcOne.select("raw"), tgt, pkPaths)
        .filter(col("action").isin("insert", "update"))
        .select(("raw" +: keyCols).map(col): _*)
      val rewritten = account.upsertRaw(s, db, container, changed, keyCols, pkPaths)
      Stats(srcRows, mergedKeys, errorRows, rewritten)
    } finally { sk.unpersist(); () }
  }

  /** Commit of a group-based row-level rewrite (MERGE INTO / UPDATE /
    * non-key DELETE): `src` carries the REPLACEMENT rows of every read
    * group — Spark's rewrite already applied the matched/not-matched
    * logic, so unlike [[mergeRaw]] there is no classify step. The read
    * groups (`readFiles`: whole bucket dirs + any strays, as the scan
    * planned them) are deleted and the replacement rows land bucketed by
    * merge key; strays read are thereby absorbed into the layout.
    * Replacement rows violating the document contract (an UPDATE SET that
    * strips the id) dead-letter to `_errors` like every other write path.
    * Sidecar: replaced buckets get fresh (count, signature); a bucket that
    * was appended to without being read (not expected from Spark's
    * rewrite, but handled) only keeps a vouched entry when its prior count
    * was vouched too. */
  def replaceGroups(s: SparkSession, account: FileAccount, db: String,
                    container: String, readFiles: Seq[String],
                    src: DataFrame): Unit = {
    graft.functions.GraftFunctions.register(s)
    val props = account.containerProperties(db, container)
    val pkPaths = props.pkPaths
    val keyCols = "__id" +: pkPaths.indices.map(i => s"__pk$i")
    val sk = RawMerge.srcKeyed(s, src, pkPaths)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val valid = RawMerge.validCol(pkPaths)
      val nErr = sk.filter(!valid).count()
      if (nErr > 0)
        sk.filter(!valid).select("raw").write.mode("append")
          .text(account.errorsPath(db, container))
      // write form + layout bucket; materialized BEFORE the group delete
      // (the lineage reads staged files, not container files, but the
      // checkpoint keeps the commit window's reads bounded regardless)
      val out = sk.filter(valid)
        .withColumn("b", account.bucketCol(keyCols, props.buckets))
        .select(col("__w").as("raw"), col("b"))
        .localCheckpoint()
      val outCounts: Map[Long, Long] = out.groupBy("b").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prior = account.readBucketCounts(db, container)
        .map { case (b, (n, _)) => b -> n }
      val deleted = account.deleteGroups(db, container, readFiles)
      if (outCounts.nonEmpty)
        out.write.partitionBy("b")
          .mode(org.apache.spark.sql.SaveMode.Append)
          .text(account.dataPath(db, container))
      val touched = deleted ++ outCounts.keySet
      val counts: Map[Long, Long] = touched.iterator.flatMap { b =>
        if (deleted(b)) Some(b -> outCounts.getOrElse(b, 0L))
        else prior.get(b).map(p => b -> (p + outCounts.getOrElse(b, 0L)))
      }.toMap
      account.resignBuckets(db, container, touched, counts)
      // a row-level rewrite lands one part file per write task per bucket,
      // so a wide MERGE/UPDATE leaves batch-shaped small files exactly
      // like the upsert path — the same opt-in inline compaction bounds
      // them (O(touched buckets) upkeep, untouched buckets never examined)
      props.autocompactFiles.foreach { thr =>
        account.compactContainer(s, db, container,
          only = Some(touched), fileThreshold = thr)
      }
    } finally { sk.unpersist(); () }
  }
}

/** One staged task output; the ONLY files commit reads are the ones these
  * messages name (task-retry/speculation safety). `path == null` marks a
  * task that saw no rows and created no file. */
final case class StagedFileMessage(path: String) extends WriterCommitMessage

/** Group-based (copy-on-write) row-level operation: the engine behind SQL
  * `MERGE INTO`, `UPDATE`, and non-key-predicate `DELETE` on container
  * tables. Spark's rewrite reads the affected groups through [[newScanBuilder]]
  * (bucket dirs, runtime-filtered via the scan's `SupportsRuntimeFiltering`
  * to the buckets the merge/update keys hash to), computes each group's
  * replacement rows, and commits them through [[newWriteBuilder]] —
  * [[ContainerMerge.replaceGroups]] swaps exactly the read groups.
  *
  * Coordination: the scan reports its FINAL planned file list (after
  * runtime group filtering) into [[readFiles]] on this driver-side object;
  * scan tasks run before the write commit, so the commit always sees the
  * exact group set the replacement rows were computed from. */
final class ContainerRowLevelOperation(account: FileAccount, db: String,
                                       container: String,
                                       props: ContainerProps,
                                       tableName: String,
                                       cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  @volatile private[core] var readFiles: Seq[String] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft container row-level $cmd $db.$container"

  // keep the identity metadata columns alive through the rewrite: the
  // merge/update condition is typically ON t._key/_id = ..., and without
  // this declaration the rewrite's target relation carries only data
  // columns, leaving the condition unresolvable
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_key"),
      org.apache.spark.sql.connector.expressions.Expressions.column("_id"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ContainerScanBuilder(account, db, container, props, tableName,
      options, files => readFiles = files)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String =
          s"graft container group replacement ($cmd) $db.$container"

        override def toBatch: BatchWrite = new BatchWrite {
          private val staging =
            account.stagingPath(db, container, info.queryId())

          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DataWriterFactory = {
            val conf = new SerializableHadoopConf(Storage.sessionHadoopConf())
            val dir = staging
            // the replacement rows' raw column position in the write schema
            // (group-based rewrites may carry metadata columns alongside)
            val rawIdx = info.schema().fieldIndex("raw")
            new DataWriterFactory {
              override def createWriter(partitionId: Int,
                  taskId: Long): DataWriter[InternalRow] =
                new RawLineStagingWriter(dir,
                  s"part-$partitionId-$taskId.txt", conf, rawIdx)
            }
          }

          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val spark = SparkSession.active
            try {
              val files = messages.collect {
                case StagedFileMessage(p) if p != null => p }
              val staged =
                if (files.isEmpty)
                  spark.range(0).select(lit(null).cast("string").as("raw"))
                else spark.read.text(files: _*).select(col("value").as("raw"))
              ContainerMerge.replaceGroups(spark, account, db, container,
                readFiles, staged)
            } finally { Storage.hadoop.deleteRecursive(staging); () }
          }

          override def abort(messages: Array[WriterCommitMessage]): Unit = {
            Storage.hadoop.deleteRecursive(staging); ()
          }
        }
      }
    }
}

final class ContainerWriteBuilder(account: FileAccount, db: String,
                                  container: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsOverwrite {

  private var truncateFirst = false

  // INSERT OVERWRITE on an unpartitioned v2 table arrives as
  // overwrite-by-expression; only the unconditional form maps onto the
  // engine (truncate + merge) — a filtered overwrite would need per-row
  // deletes the bucket layout does not express
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]),
      s"graft containers support only unconditional INSERT OVERWRITE, got " +
        filters.mkString(", "))
    truncateFirst = true
    this
  }

  override def build(): Write = {
    val schema = info.schema()
    require(schema.length == 1 && schema.head.dataType == StringType,
      s"graft containers take a single raw JSON-line string column, got $schema")
    new ContainerWrite(account, db, container, info.queryId(), truncateFirst)
  }
}

final class ContainerWrite(account: FileAccount, db: String, container: String,
                           queryId: String, truncateFirst: Boolean)
    extends Write {

  override def description(): String =
    s"graft container merge-write $db.$container" +
      (if (truncateFirst) " (overwrite)" else "")

  override def toBatch: BatchWrite = new BatchWrite {
    private val staging = account.stagingPath(db, container, queryId)

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val conf = new SerializableHadoopConf(Storage.sessionHadoopConf())
      val dir = staging
      new DataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
          new RawLineStagingWriter(dir, s"part-$partitionId-$taskId.txt", conf)
      }
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      try {
        if (truncateFirst) account.truncateData(db, container)
        val files = messages.collect {
          case StagedFileMessage(p) if p != null => p }
        if (files.nonEmpty)
          ContainerMerge.mergeRaw(spark, account, db, container,
            spark.read.text(files: _*).select(col("value").as("raw")))
      } finally { Storage.hadoop.deleteRecursive(staging); () }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      Storage.hadoop.deleteRecursive(staging); ()
    }
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private def epochDir(epochId: Long): String =
      new HPath(account.stagingPath(db, container, queryId),
        s"epoch-$epochId").toString

    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
      val conf = new SerializableHadoopConf(Storage.sessionHadoopConf())
      val base = account.stagingPath(db, container, queryId)
      new StreamingDataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long,
                                  epochId: Long): DataWriter[InternalRow] =
          new RawLineStagingWriter(
            new HPath(base, s"epoch-$epochId").toString,
            s"part-$partitionId-$taskId.txt", conf)
      }
    }

    // a replayed epoch (failure between sink commit and checkpoint WAL)
    // re-merges the same documents: canonical-diff classifies them as
    // skips, so the replay converges without rewriting a bucket —
    // at-least-once delivery into an idempotent sink
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val dir = epochDir(epochId)
      try {
        val files = messages.collect {
          case StagedFileMessage(p) if p != null => p }
        if (files.nonEmpty)
          ContainerMerge.mergeRaw(spark, account, db, container,
            spark.read.text(files: _*).select(col("value").as("raw")))
      } finally { Storage.hadoop.deleteRecursive(dir); () }
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      Storage.hadoop.deleteRecursive(epochDir(epochId)); ()
    }
  }

}

/** Executor-side staging writer: raw lines to one text file, created on the
  * first row (an empty task stages nothing and commits a null path).
  * `rawIdx` locates the raw column in the incoming row — 0 for plain
  * INSERTs (schema is exactly `raw`), positional for row-level rewrites
  * whose write schema may carry extra attributes. */
final class RawLineStagingWriter(dir: String, name: String,
                                 conf: SerializableHadoopConf,
                                 rawIdx: Int = 0)
    extends DataWriter[InternalRow] {

  private var out: java.io.Writer = _
  private var path: String = _

  override def write(record: InternalRow): Unit = {
    if (out == null) {
      val p = new HPath(dir, name)
      val fs = p.getFileSystem(conf.value)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(p, true), StandardCharsets.UTF_8))
      path = p.toString
    }
    // a NULL raw (schema declares it non-null, but defend anyway) stages as
    // an empty line → parse failure → the merge's error channel, exactly
    // like any other invalid document
    val s = record.getUTF8String(rawIdx)
    if (s != null) out.write(s.toString)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    StagedFileMessage(path)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (path != null) { Storage.hadoop(conf.value).delete(path); () }
  }

  override def close(): Unit = if (out != null) out.close()
}
