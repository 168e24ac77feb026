package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DupClusters, TextAnalysis}

/** The durable dup-cluster index (VERDICT r9 task 1): build-once semantics,
  * fresh-session durability, and the append path's consistency contract —
  * an appended artifact must equal a from-scratch mining of the post-append
  * corpus (same pairs, same clusters), which is what keeps the ST-9
  * ingestion gate and offline curation looking at the same graph.
  */
class DupClustersSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "dupclusters-spec")
  val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("a_id", "b_id", "ham").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def clusterSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("id", "component", "rank_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("build: artifact pairs/clusters equal direct qD6 mining + components + PageRank") {
    val idx = DupClusters.build(spark, sf)
    assert(pairSet(idx.pairs) == pairSet(Dedup.qD6(spark, sf)),
      "stored pairs must equal a direct qD6 run")
    val direct = {
      val p = Dedup.qD6(spark, sf).select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val comp = Dedup.componentsOfPairs(spark, p, Dedup.MaxDriverPairs)
        val ranks = Dedup.pageRank(p, Dedup.PageRankIters)
          .selectExpr("id AS r_id", "r AS rank_e6")
        clusterSet(comp.join(ranks, col("id") === col("r_id"))
          .select("id", "component", "rank_e6"))
      } finally { p.unpersist(); () }
    }
    assert(clusterSet(idx.clusters) == direct,
      "stored clusters must equal direct components ⋈ PageRank")
    assert(idx.nDocs == 500L)
    // severed lanes (VERDICT r15 task 2): refuted/ is the edit-refuted
    // weak cut-set, severed/ the components over the surviving edges with
    // isolated nodes self-labelled and rank carried from clusters/
    val docs = graft.core.Tables.documents(spark, sf)
    val refDirect = Dedup.refutedWeakEdges(docs, idx.pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx.refuted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == refDirect, "stored refuted must equal a direct re-verification")
    assert(refDirect.nonEmpty,
      "spec corpus must exercise the severing (no refuted welds mined)")
    val sevDirect = {
      val surviving = idx.pairs.select("a_id", "b_id")
        .join(idx.refuted, Seq("a_id", "b_id"), "left_anti")
      val comp = Dedup.componentsOfPairs(spark, surviving, Dedup.MaxDriverPairs)
        .withColumnRenamed("component", "cs")
      clusterSet(idx.clusters.join(comp, Seq("id"), "left")
        .select(col("id"), coalesce(col("cs"), col("id")).as("component"),
          col("rank_e6")))
    }
    assert(clusterSet(idx.severed) == sevDirect,
      "stored severed must equal components over the surviving edges")
    // verdicts/ cache: at a cold build it covers EXACTLY the weak set,
    // and its refuted subset IS the refuted/ lane
    val weak = Dedup.weakEdges(idx.pairs.select("a_id", "b_id", "ham"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verdicts = idx.verdicts.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2))).toMap
    assert(verdicts.keySet == weak,
      "cold-build verdicts must cover exactly the weak set")
    assert(verdicts.filter(_._2).keySet == refDirect,
      "the verdicts' refuted subset must equal the refuted lane")
  }

  test("severed graph: the gated keeper's community routing fires strictly less often than on the raw graph") {
    // the VERDICT r15 task-2 acceptance: with refuted welds severed and
    // components recomputed, fewer members need the LPA chain-routing
    // fallback — the artifact is FIXED, not routed around
    val idx = DupClusters.build(spark, sf)
    def communityMembers(pairs: org.apache.spark.sql.DataFrame,
                         clusters: org.apache.spark.sql.DataFrame): Long =
      Dedup.gatedKeepMembers(spark, pairs, clusters)
        .where(col("mode") === "community").count()
    val raw = communityMembers(idx.pairs, idx.clusters)
    val surviving = idx.pairs.join(idx.refuted, Seq("a_id", "b_id"), "left_anti")
    val severed = communityMembers(surviving, idx.severed)
    info(s"community-routed members: raw graph = $raw, severed graph = $severed")
    assert(severed < raw,
      s"severing must shrink the chain-routing leg: raw $raw vs severed $severed")
  }

  test("durable: a fresh session loads the artifact (zero corpus passes) and answers identically") {
    val orig = TextAnalysis.qT19(spark, sf).collect().map(_.toString).toSeq
    val s2 = spark.newSession()
    val idx = DupClusters.build(s2, sf)
    // backing files of both served frames must be index files, never corpus
    def backing(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
            .HadoopFsRelation].location.inputFiles.toSeq
      }.flatten
    for ((df, what) <- Seq((idx.pairs, "pairs"), (idx.clusters, "clusters"),
      (idx.severed, "severed"), (idx.refuted, "refuted"))) {
      val files = backing(df)
      assert(files.nonEmpty && files.forall(_.contains("dup-index")),
        s"fresh-session $what must come from the durable artifact: ${files.take(3)}")
    }
    val fresh = TextAnalysis.qT19(s2, sf).collect().map(_.toString).toSeq
    assert(fresh == orig, "durable-artifact qT19 must match the building session")
  }

  test("append: delta advance equals from-scratch mining of the post-append corpus") {
    val root = Files.createTempDirectory("graft-dupappend").toString
    val corpus = s"$root/documents.parquet"
    val all = graft.core.Tables.documents(spark, sf)
    val base = all.where(col("doc_id") < 450)
    val delta = all.where(col("doc_id") >= 450)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.write.parquet(corpus)
    val idx0 = DupClusters.build(spark, root)
    // the corpus grows (the gate-admitted batch lands as appended files) …
    delta.write.mode("append").parquet(corpus)
    // … and the SAME delta advances the index with delta-sized work
    val idx1 = DupClusters.append(spark, root, idx0, delta.select("doc_id", "text"))
    assert(idx1.nDocs == 500L)
    // consistency: equal to mining the post-append corpus from scratch
    assert(pairSet(idx1.pairs) == pairSet(Dedup.qD6(spark, root)),
      "appended pairs must equal from-scratch qD6 on the new corpus")
    val scratch = {
      val p = Dedup.qD6(spark, root).select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val comp = Dedup.componentsOfPairs(spark, p, Dedup.MaxDriverPairs)
        val ranks = Dedup.pageRank(p, Dedup.PageRankIters)
          .selectExpr("id AS r_id", "r AS rank_e6")
        clusterSet(comp.join(ranks, col("id") === col("r_id"))
          .select("id", "component", "rank_e6"))
      } finally { p.unpersist(); () }
    }
    assert(clusterSet(idx1.clusters) == scratch,
      "appended clusters must equal from-scratch components ⋈ PageRank")
    // the severed lanes advance with the same consistency: edit distances
    // are immutable, so the appended severing equals a from-scratch one
    val scratchRef = Dedup.refutedWeakEdges(
      graft.core.Tables.documents(spark, root), idx1.pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx1.refuted.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == scratchRef,
      "appended refuted lane must equal a from-scratch re-verification")
    val scratchSev = {
      val surviving = idx1.pairs.select("a_id", "b_id")
        .join(idx1.refuted, Seq("a_id", "b_id"), "left_anti")
      val comp = Dedup.componentsOfPairs(spark, surviving, Dedup.MaxDriverPairs)
        .withColumnRenamed("component", "cs")
      clusterSet(idx1.clusters.join(comp, Seq("id"), "left")
        .select(col("id"), coalesce(col("cs"), col("id")).as("component"),
          col("rank_e6")))
    }
    assert(clusterSet(idx1.severed) == scratchSev,
      "appended severed lane must equal from-scratch severed components")
    // the verdicts cache is MONOTONE (delta-bounded verification: only
    // never-verified weak edges paid the text fetch) and covers every
    // currently-weak edge
    val keys = (df: org.apache.spark.sql.DataFrame) => df
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys(idx0.verdicts).subsetOf(keys(idx1.verdicts)),
      "append must carry the prior verdicts forward, never re-verify")
    assert(keys(Dedup.weakEdges(idx1.pairs.select("a_id", "b_id", "ham")))
      .subsetOf(keys(idx1.verdicts)),
      "every currently-weak edge must have a cached verdict")
    // the superseded handle's frames are RELEASED by the append (review
    // r11: a long-running gate appends every micro-batch — prior frames
    // must not pin the CacheManager until context stop)
    assert(idx0.pairs.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE &&
      idx0.clusters.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE &&
      idx0.severed.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE &&
      idx0.refuted.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE,
      "append must unpersist the superseded index's frames")
    delta.unpersist()
  }

  test("BSP loops take the RELIABLE checkpoint path when spark.graft.checkpointDir is set (graftfs://)") {
    // the cluster fault-tolerance option (VERDICT r9 task 5): localCheckpoint
    // blocks die with an executor; with the conf set, every round writes a
    // reliable checkpoint to the named fault-tolerant store instead — proven
    // here through a NON-DEFAULT Hadoop scheme, the boundary a real
    // deployment crosses for hdfs:// — with identical results either way
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val ckpt = Files.createTempDirectory(Paths.get("target"), "graft-ckpt")
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.checkpointDir", "graftfs:" + ckpt.toAbsolutePath)
    def pairsOn(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("a_id", "b_id")
    }
    // maxDriverPairs=0 forces the distributed loop (the driver fast path
    // neither checkpoints nor needs to — nothing iterative leaves the JVM)
    val reliable = Dedup.pageRank(pairsOn(s2), 2, 0)
      .collect().map(_.toString).sorted.toSeq
    val local = Dedup.pageRank(pairsOn(spark), 2, 0)
      .collect().map(_.toString).sorted.toSeq
    assert(reliable == local, "checkpoint mode must never change results")
    import scala.jdk.CollectionConverters._
    val written = Files.walk(ckpt).iterator().asScala
      .count(p => Files.isRegularFile(p) && p.toString.contains("rdd-"))
    assert(written > 0,
      s"reliable checkpoint files must land under $ckpt via graftfs://")
    // components + label propagation honor the same switch
    val c2 = Dedup.componentsOfPairs(s2, pairsOn(s2), 0)
      .collect().map(_.toString).sorted.toSeq
    val c1 = Dedup.componentsOfPairs(spark, pairsOn(spark), 0)
      .collect().map(_.toString).sorted.toSeq
    assert(c2 == c1)
  }

  test("reliable checkpoints are reclaimed per round, not accumulated (ADVICE r10)") {
    // without cleanup, every star round leaves an rdd-* directory until
    // context stop — a long-lived session iterating many corpus states
    // accumulates checkpoint data unboundedly. The loops now delete round
    // i's files once round i+1 materializes; only the FINAL frame's files
    // (consumed by the caller) may survive a call.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val ckpt = Files.createTempDirectory(Paths.get("target"), "graft-ckpt")
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.checkpointDir", "graftfs:" + ckpt.toAbsolutePath)
    import s2.implicits._
    // a 12-node chain: star rounds need several iterations to converge,
    // so >= 2 superseded checkpoints exist to reclaim
    val chain = (1L to 12L).sliding(2).map(p => (p.head, p.last)).toSeq
      .toDF("a_id", "b_id")
    def countRddDirs(): Int = {
      // the sc checkpoint root is process-global and set on FIRST use —
      // resolve the ACTUAL root (an earlier test may own it) and count
      // surviving round directories there
      s2.sparkContext.getCheckpointDir.map { uri =>
        val p = new org.apache.hadoop.fs.Path(uri)
        val fs = p.getFileSystem(s2.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) 0
        else fs.listStatus(p).count(_.getPath.getName.startsWith("rdd-"))
      }.getOrElse(0)
    }
    // prime: one call sets the global dir; measure the DELTA of a second
    val r1 = Dedup.componentsOfPairs(s2, chain, 0).collect()
    assert(r1.nonEmpty && r1.forall(_.getLong(1) == 1L),
      "chain must collapse to one component")
    val before = countRddDirs()
    Dedup.componentsOfPairs(s2, chain, 0).collect()
    val after = countRddDirs()
    assert(after - before <= 1,
      s"a multi-round star loop must leave at most its final checkpoint " +
        s"($before -> $after rdd-* dirs)")
  }

  test("e2e: gate-admitted batches keep the offline graph consistent via append") {
    // the full ingestion story (VERDICT r9 task 1's consistency clause):
    // ST-9 decides ADMISSION (MinHash bands at the door), the dup-cluster
    // index tracks the admitted corpus's near-dup STRUCTURE — each
    // admitted batch lands in the corpus AND advances the index by delta,
    // and after N batches the appended index equals a from-scratch build
    val store = Files.createTempDirectory(Paths.get("target"), "gate-e2e").toString
    val root = Files.createTempDirectory("graft-gatecorpus").toString
    val corpus = s"$root/documents.parquet"
    val all = graft.core.Tables.documents(spark, sf)
    // seed corpus + index
    all.where(col("doc_id") < 400).write.parquet(corpus)
    var idx = DupClusters.build(spark, root)
    graft.functions.GraftFunctions.register(spark)
    for ((lo, hi, bid) <- Seq((400, 450, 0L), (450, 500, 1L))) {
      val batch = all.where(col("doc_id") >= lo && col("doc_id") < hi)
        .select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (admitted, rejected) =
        graft.streaming.Streams.dedupGateBatch(spark, store, batch, bid)
      assert(admitted + rejected == hi - lo)
      // the admitted docs ARE the corpus delta (replicating what a
      // foreachBatch sink would write), and the SAME delta advances the index
      val adm = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .select("doc_id", "text")
      adm.write.mode("append").parquet(corpus)
      idx = DupClusters.append(spark, root, idx, adm)
      batch.unpersist()
    }
    // consistency: the incrementally-maintained index equals mining the
    // final corpus from scratch
    assert(pairSet(idx.pairs) == pairSet(Dedup.qD6(spark, root)),
      "gate-fed appended index must equal from-scratch mining")
    assert(idx.nDocs == graft.core.Tables.documents(spark, root).count())
  }

  test("advanceIndex gate: corpus + index advance under one marker; crash between landing and commit replays consistent") {
    // VERDICT r10 task 7: dedupGateBatch(advanceIndex = true) replaces the
    // gate-then-append two-call sequence with one crash-safe protocol
    val store = Files.createTempDirectory(Paths.get("target"), "gate-adv").toString
    val root = Files.createTempDirectory("graft-advcorpus").toString
    val corpus = s"$root/documents.parquet"
    val st = graft.core.Storage.hadoop
    val all = graft.core.Tables.documents(spark, sf)
    all.where(col("doc_id") < 400).write.parquet(corpus)
    DupClusters.build(spark, root)
    graft.functions.GraftFunctions.register(spark)
    def batchOf(lo: Int, hi: Int) =
      all.where(col("doc_id") >= lo && col("doc_id") < hi)
        .select("doc_id", "text")
    // happy path: one call lands the delta AND advances the index — the
    // reconciliation refusal must never fire here
    val (a0, r0) = graft.streaming.Streams.dedupGateBatch(
      spark, store, batchOf(400, 450), 0L,
      advanceIndex = true, corpusDir = Some(root))
    assert(a0 + r0 == 50)
    val idx0 = DupClusters.build(spark, root) // warm: the appended index
    assert(idx0.nDocs == graft.core.Tables.documents(spark, root).count())
    // replay of the committed batch is a no-op (corpus not re-appended)
    val before = graft.core.Tables.documents(spark, root).count()
    assert(graft.streaming.Streams.dedupGateBatch(spark, store,
      batchOf(400, 450), 0L, advanceIndex = true,
      corpusDir = Some(root)) == (0L, 0L))
    assert(graft.core.Tables.documents(spark, root).count() == before)
    // CRASH between the staging rename and the final commit: simulate by
    // running the gate WITHOUT the index advance, publishing the staged
    // delta by hand (what step 1 leaves behind), and dying before the
    // final marker (delete it — the plain gate wrote it)
    val (a1, r1) = graft.streaming.Streams.dedupGateBatch(
      spark, store, batchOf(450, 500), 1L)
    assert(a1 + r1 == 50)
    val adm = spark.read.parquet(s"$store/docs")
      .where(col("doc_id") >= 450 && col("doc_id") < 500)
      .select("doc_id", "text")
    adm.write.mode("overwrite").parquet(s"$store/_commits/1.delta")
    assert(st.delete(s"$store/_commits/1"))
    val nStaged = adm.count()
    val nPre = graft.core.Tables.documents(spark, root).count()
    // the replay must FINISH the landing (exactly once), derive a
    // consistent index for the resulting corpus state, and commit —
    // never double-append, never refuse
    assert(graft.streaming.Streams.dedupGateBatch(spark, store,
      batchOf(450, 500), 1L, advanceIndex = true,
      corpusDir = Some(root)) == (0L, 0L))
    assert(st.exists(s"$store/_commits/1"), "replay must finish the commit")
    assert(!st.exists(s"$store/_commits/1.delta"), "staging must be swept")
    val n1 = graft.core.Tables.documents(spark, root).count()
    assert(n1 == nPre + nStaged,
      s"delta must land exactly once: $nPre + $nStaged != $n1")
    val idx1 = DupClusters.build(spark, root)
    assert(idx1.nDocs == n1)
    assert(pairSet(idx1.pairs) == pairSet(Dedup.qD6(spark, root)),
      "post-crash index must equal from-scratch mining")
    // CRASH BEFORE the staging rename (the double-append window the
    // staged-delta protocol closes): the gate-store appends ran and the
    // marker is gone, but no delta was staged and nothing reached the
    // corpus. The replay recomputes bit-identical decisions (the store's
    // copy of the batch self-matches away) and lands the delta ONCE.
    // every 3-shingle must carry a varying token or the batch in-dedups
    // itself (near-identical texts band-collide by construction)
    val novel = spark.range(20).selectExpr(
      "CAST(910000 + id AS BIGINT) AS doc_id",
      "concat('novel', id, ' alpha', id * 7, ' beta', id * 13, " +
        "' gamma', id * 29, ' delta', id * 31, ' eps', id * 37) AS text")
    val (a2, r2) = graft.streaming.Streams.dedupGateBatch(
      spark, store, novel, 2L)
    assert(a2 == 20 && r2 == 0)
    assert(st.delete(s"$store/_commits/2")) // died before any staging
    val (a2r, r2r) = graft.streaming.Streams.dedupGateBatch(spark, store,
      novel, 2L, advanceIndex = true, corpusDir = Some(root))
    assert(a2r + r2r == 20, s"replay re-decides the batch: $a2r/$r2r")
    val n2 = graft.core.Tables.documents(spark, root).count()
    assert(n2 == n1 + a2r, s"pre-staging crash must land the delta once, " +
      s"corpus went $n1 -> $n2 with $a2r admitted")
    assert(DupClusters.build(spark, root).nDocs == n2)
    // and the NEXT happy-path batch still reconciles (nothing drifted)
    val batch3 = spark.range(1).selectExpr("CAST(900000 AS BIGINT) AS doc_id",
      "'a completely novel document about nothing else in the corpus' AS text")
    assert(graft.streaming.Streams.dedupGateBatch(spark, store, batch3, 3L,
      advanceIndex = true, corpusDir = Some(root)) == (1L, 0L))
    assert(DupClusters.build(spark, root).nDocs ==
      graft.core.Tables.documents(spark, root).count())
  }

  test("advanceLex gate: the inverted index advances under the same marker; crash replay re-derives both") {
    val store = Files.createTempDirectory(Paths.get("target"), "gate-lex").toString
    val root = Files.createTempDirectory("graft-lexcorpus").toString
    val corpus = s"$root/documents.parquet"
    val st = graft.core.Storage.hadoop
    val all = graft.core.Tables.documents(spark, sf)
    all.where(col("doc_id") < 400).write.parquet(corpus)
    graft.functions.GraftFunctions.register(spark)
    def batchOf(lo: Int, hi: Int) =
      all.where(col("doc_id") >= lo && col("doc_id") < hi)
        .select("doc_id", "text")
    def lexServedEqualsDirect(): Unit = {
      // end-to-end: the index-served Jaccard lane over the POST-APPEND
      // corpus equals the index-free formulation — the consistency the
      // lexical consumers (BM25/hybrid) actually need
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(rows(graft.operators.LexIndex.jaccardTopDocs(spark, root, 5, 100))
        == rows(graft.operators.Similarity.lexLaneDirect(spark, root)),
        "served lexical lane diverged from the corpus after the gate advance")
    }
    // happy path: one call lands the delta and advances BOTH artifacts
    val (a0, r0) = graft.streaming.Streams.dedupGateBatch(
      spark, store, batchOf(400, 450), 0L,
      advanceIndex = true, corpusDir = Some(root), advanceLex = true)
    assert(a0 + r0 == 50)
    val nNow = graft.core.Tables.documents(spark, root).count()
    assert(graft.operators.LexIndex.build(spark, root).nDocsAll == nNow)
    assert(DupClusters.build(spark, root).nDocs == nNow)
    lexServedEqualsDirect()
    // replay of the committed batch is a no-op
    assert(graft.streaming.Streams.dedupGateBatch(spark, store,
      batchOf(400, 450), 0L, advanceIndex = true, corpusDir = Some(root),
      advanceLex = true) == (0L, 0L))
    assert(graft.core.Tables.documents(spark, root).count() == nNow)
    // crash between the staging rename and the final commit (the staged
    // delta is durable, neither append may have published): the replay
    // must finish the landing exactly once, re-derive BOTH artifacts for
    // the resulting corpus state, and commit
    val (a1, r1) = graft.streaming.Streams.dedupGateBatch(
      spark, store, batchOf(450, 500), 1L)
    assert(a1 + r1 == 50)
    val adm = spark.read.parquet(s"$store/docs")
      .where(col("doc_id") >= 450 && col("doc_id") < 500)
      .select("doc_id", "text")
    adm.write.mode("overwrite").parquet(s"$store/_commits/1.delta")
    assert(st.delete(s"$store/_commits/1"))
    val nStaged = adm.count()
    val nPre = graft.core.Tables.documents(spark, root).count()
    assert(graft.streaming.Streams.dedupGateBatch(spark, store,
      batchOf(450, 500), 1L, advanceIndex = true, corpusDir = Some(root),
      advanceLex = true) == (0L, 0L))
    assert(st.exists(s"$store/_commits/1"), "replay must finish the commit")
    val nAfter = graft.core.Tables.documents(spark, root).count()
    assert(nAfter == nPre + nStaged,
      s"delta must land exactly once: $nPre + $nStaged != $nAfter")
    assert(graft.operators.LexIndex.build(spark, root).nDocsAll == nAfter)
    lexServedEqualsDirect()
  }

  test("advanceAnn gate: the ANN index advances under the same marker; crash replays land it exactly once, equal to a from-scratch build") {
    // VERDICT r12 task 3: the gated corpus's embeddings land with the
    // documents under ONE staged-delta rename, and the IVF index follows
    // via the fingerprint-republishing appendFor — so the vector serving
    // lane resolves the post-delta corpus warm, never via a corpus pass.
    import graft.operators.Similarity
    val store = Files.createTempDirectory(Paths.get("target"), "gate-ann").toString
    val root = Files.createTempDirectory("graft-anncorpus").toString
    val st = graft.core.Storage.hadoop
    val prevIvf = sys.props.get("graft.ivf.root")
    val gateIvfRoot =
      Files.createTempDirectory(Paths.get("target"), "ivf-gate").toString
    sys.props("graft.ivf.root") = gateIvfRoot
    try {
      val all = graft.core.Tables.documents(spark, sf)
      val allE = graft.core.Tables.embeddings(spark, sf)
      all.where(col("doc_id") < 400).write.parquet(s"$root/documents.parquet")
      allE.where(col("vec_id") < 400).write.parquet(s"$root/embeddings.parquet")
      graft.functions.GraftFunctions.register(spark)
      // the append == rebuild equality holds for deltas WITHIN the frozen
      // int8 scale (appendFor's documented contract; a scale-raising delta
      // saturates in the appended lane while a rebuild would retrain the
      // scale) — halve the delta vectors so the corpus max stays in the
      // base. Cell assignment is cosine-based, so halving is rank-neutral.
      def batchOf(lo: Int, hi: Int) =
        all.where(col("doc_id") >= lo && col("doc_id") < hi)
          .select("doc_id", "text")
          .join(allE.selectExpr("vec_id AS doc_id",
            "transform(embedding, x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))" +
              " AS embedding"), "doc_id")
      def annState(idx: Similarity.IvfIndex.Index) = (
        idx.assigned.collect().map(_.toString).toSet,
        idx.qassigned.collect().map(_.toString).toSet,
        idx.scale,
        idx.cellIds.toSeq,
        idx.cents.map(_.toSeq).toSeq)
      // happy path: one call lands BOTH deltas and advances the ANN index
      val (a0, r0) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(400, 450), 0L,
        advanceIndex = true, corpusDir = Some(root), advanceAnn = true)
      assert(a0 + r0 == 50)
      val nDocs = graft.core.Tables.documents(spark, root).count()
      val nEmbs = graft.core.Tables.embeddings(spark, root).count()
      assert(nDocs == nEmbs, "both corpus files must advance together")
      val served = Similarity.IvfIndex.build(spark, root, lloydIters = 0)
      assert(served.assigned.count() == nEmbs,
        "every landed vector must be in the served assignment")
      // the append-published index is BIT-EQUAL to a from-scratch build of
      // the same corpus state (lloydIters = 0: seeds are the unchanged
      // vec_id < k vectors; delta within the frozen scale)
      val servedState = annState(served)
      val rebuildRoot = Files
        .createTempDirectory(Paths.get("target"), "ivf-rebuild").toString
      sys.props("graft.ivf.root") = rebuildRoot
      Similarity.IvfIndex.evictSession(spark)
      val rebuilt = Similarity.IvfIndex.build(spark, root, lloydIters = 0)
      assert(annState(rebuilt) == servedState,
        "gate-appended index must equal the from-scratch build")
      sys.props("graft.ivf.root") = gateIvfRoot
      Similarity.IvfIndex.evictSession(spark)
      // replay of the committed batch is a no-op for BOTH corpus files
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(400, 450), 0L, advanceIndex = true, corpusDir = Some(root),
        advanceAnn = true) == (0L, 0L))
      assert(graft.core.Tables.embeddings(spark, root).count() == nEmbs)
      // crash between the staging rename and the final commit: the staged
      // docs/ + embs/ subtrees are durable; the replay must land both
      // exactly once and derive the ANN index for the resulting state
      val (a1, r1) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(450, 500), 1L)
      assert(a1 + r1 == 50)
      val adm = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= 450 && col("doc_id") < 500)
      adm.select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$store/_commits/1.delta/docs")
      adm.selectExpr("doc_id AS vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$store/_commits/1.delta/embs")
      assert(st.delete(s"$store/_commits/1"))
      val nStaged = adm.count()
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(450, 500), 1L, advanceIndex = true, corpusDir = Some(root),
        advanceAnn = true) == (0L, 0L))
      assert(st.exists(s"$store/_commits/1"), "replay must finish the commit")
      val nEmbsAfter = graft.core.Tables.embeddings(spark, root).count()
      assert(nEmbsAfter == nEmbs + nStaged,
        s"embeddings delta must land exactly once: $nEmbs + $nStaged != $nEmbsAfter")
      assert(graft.core.Tables.documents(spark, root).count() == nEmbsAfter)
      val replayed = Similarity.IvfIndex.build(spark, root, lloydIters = 0)
      assert(replayed.assigned.count() == nEmbsAfter,
        "the replay-derived index must cover the resulting corpus state")
    } finally {
      prevIvf match {
        case Some(p) => sys.props("graft.ivf.root") = p
        case None    => sys.props.remove("graft.ivf.root")
      }
      Similarity.IvfIndex.evictSession(spark)
    }
  }

  test("advanceMm gate: both mm lanes advance under the same marker; append equals rebuild; crash replay re-derives; seed-raising delta routes to rebuild") {
    // VERDICT r15 task 3: the ingestion gate previously advanced corpus +
    // DupClusters + LexIndex + text-IVF but left the multimodal index
    // stale until a full rebuild. advanceMm closes that: both decode-kernel
    // lanes append with frozen centroids under the batch marker.
    import graft.operators.{MmIvf, Multimodal}
    val store = Files.createTempDirectory(Paths.get("target"), "gate-mm").toString
    val root = Files.createTempDirectory("graft-mmcorpus").toString
    val st = graft.core.Storage.hadoop
    val prevMm = sys.props.get("graft.mmivf.root")
    val gateMmRoot =
      Files.createTempDirectory(Paths.get("target"), "mm-gate").toString
    sys.props("graft.mmivf.root") = gateMmRoot
    try {
      val all = graft.core.Tables.documents(spark, sf)
      // base corpus: docs < 100 WITHOUT doc 7 — the mm quantizer seeds are
      // then {0..6}, leaving 7 as the seed-raising delta for the last leg
      all.where(col("doc_id") < 100 && col("doc_id") =!= 7)
        .write.parquet(s"$root/documents.parquet")
      def mmState(idx: MmIvf.Index) = (
        idx.feats.selectExpr("asset_id", "f", "CAST(cell AS BIGINT) AS cell")
          .collect().map(_.toString).toSet,
        idx.cellIds.toSeq, idx.cents.map(_.toSeq).toSeq)
      def batchOf(lo: Int, hi: Int) =
        all.where(col("doc_id") >= lo && col("doc_id") < hi)
          .select("doc_id", "text")
      // happy path: one gated batch lands the delta and advances BOTH lanes
      val (a0, r0) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(100, 150), 0L,
        advanceIndex = true, corpusDir = Some(root), advanceMm = true)
      assert(a0 + r0 == 50)
      val nAssets = graft.core.Tables.documents(spark, root)
        .where(col("doc_id") < Multimodal.AssetDocBound).count()
      val served = MmIvf.build(spark, root) // warm-load of the appended index
      val servedAud = MmIvf.buildAudio(spark, root)
      assert(served.feats.count() == nAssets &&
        servedAud.feats.count() == nAssets,
        "every landed asset must be served by both lanes")
      // gate-admitted assets appear in the served index EXACTLY ONCE
      val admittedAssets = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= 100 &&
          col("doc_id") < Multimodal.AssetDocBound)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val inIdx = served.feats.select("asset_id").collect().map(_.getLong(0))
      assert(inIdx.length == inIdx.distinct.length,
        "no asset may be indexed twice")
      assert(admittedAssets.subsetOf(inIdx.toSet),
        "every gate-admitted asset must be in the served image index")
      assert(MmIvf.qMm19(spark, root)
        .where(col("n_id").isin(admittedAssets.toSeq.map(Long.box): _*))
        .count() > 0,
        "admitted assets must surface in q_mm19's served results")
      // append-published lanes are BIT-EQUAL to from-scratch builds of the
      // same corpus state (frozen seeds {0..6} unchanged by the delta)
      val servedState = mmState(served)
      val servedAudState = mmState(servedAud)
      val rebuildRoot = Files
        .createTempDirectory(Paths.get("target"), "mm-rebuild").toString
      sys.props("graft.mmivf.root") = rebuildRoot
      MmIvf.evictSession(spark)
      assert(mmState(MmIvf.build(spark, root)) == servedState,
        "gate-appended image lane must equal the from-scratch build")
      assert(mmState(MmIvf.buildAudio(spark, root)) == servedAudState,
        "gate-appended audio lane must equal the from-scratch build")
      sys.props("graft.mmivf.root") = gateMmRoot
      MmIvf.evictSession(spark)
      // replay of the committed batch is a no-op
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(100, 150), 0L, advanceIndex = true, corpusDir = Some(root),
        advanceMm = true) == (0L, 0L))
      assert(graft.core.Tables.documents(spark, root)
        .where(col("doc_id") < Multimodal.AssetDocBound).count() == nAssets)
      // crash between the staging rename and the final commit: the replay
      // must land the delta exactly once and re-derive BOTH mm lanes for
      // the resulting corpus state
      val (a1, r1) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(150, 220), 1L)
      assert(a1 + r1 == 70)
      val adm = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= 150 && col("doc_id") < 220)
        .select("doc_id", "text")
      adm.write.mode("overwrite").parquet(s"$store/_commits/1.delta")
      assert(st.delete(s"$store/_commits/1"))
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(150, 220), 1L, advanceIndex = true, corpusDir = Some(root),
        advanceMm = true) == (0L, 0L))
      assert(st.exists(s"$store/_commits/1"), "replay must finish the commit")
      val nAssets2 = graft.core.Tables.documents(spark, root)
        .where(col("doc_id") < Multimodal.AssetDocBound).count()
      MmIvf.evictSession(spark)
      assert(MmIvf.build(spark, root).feats.count() == nAssets2 &&
        MmIvf.buildAudio(spark, root).feats.count() == nAssets2,
        "crash replay must re-derive both lanes for the resulting state")
      // SEED-RAISING delta: doc 7 lands (out-of-band append) — an asset id
      // inside the seed range; the frozen-centroid append must route to a
      // rebuild whose seeds now include 7
      val prior = MmIvf.build(spark, root)
      assert(prior.cellIds.toSeq == (0L to 6L),
        s"pre-delta seeds must be {0..6}: ${prior.cellIds.toSeq}")
      all.where(col("doc_id") === 7).select("doc_id", "text")
        .write.mode("append").parquet(s"$root/documents.parquet")
      import spark.implicits._
      val after = MmIvf.append(spark, root, prior,
        Seq(7L).toDF("asset_id"), "img")
      assert(after.cellIds.toSeq == (0L to 7L),
        s"seed-raising delta must rebuild with the new seed: ${after.cellIds.toSeq}")
      assert(after.feats.count() == nAssets2 + 1)
    } finally {
      prevMm match {
        case Some(p) => sys.props("graft.mmivf.root") = p
        case None    => sys.props.remove("graft.mmivf.root")
      }
      graft.operators.MmIvf.evictSession(spark)
    }
  }

  test("verdicts cache vacuum (VERDICT r16 task 5): a verdict whose edge " +
    "left the pair set drops at publish; the artifact stays pair-bounded") {
    import spark.implicits._
    val prior = Seq((1L, 2L, true), (3L, 4L, false), (5L, 6L, true))
      .toDF("a_id", "b_id", "refuted")
    val pairs = Seq((1L, 2L, 0), (3L, 4L, 1)).toDF("a_id", "b_id", "ham")
    val kept = DupClusters.vacuumVerdicts(prior, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(kept == Set((1L, 2L, true), (3L, 4L, false)),
      s"the (5,6) verdict must drop with its edge: $kept")
    // the invariant on the real artifact: every cached verdict's edge is
    // in the live pair set (vacuum runs at every publish)
    val idx = DupClusters.build(spark, sf)
    assert(idx.verdicts.join(idx.pairs.select("a_id", "b_id"),
      Seq("a_id", "b_id"), "left_anti").isEmpty,
      "artifact verdicts must be a subset of the live pair set")
  }

  test("extVectors gate (VERDICT r16 task 2): external encoder vectors " +
    "ride the _commits marker exactly once; crash replay finishes the " +
    "staged append; an unseeded lane refuses") {
    import graft.operators.MmIvf
    import spark.implicits._
    val store = Files.createTempDirectory(Paths.get("target"), "gate-ext").toString
    val root = Files.createTempDirectory("graft-extcorpus").toString
    val st = graft.core.Storage.hadoop
    val prevMm = sys.props.get("graft.mmivf.root")
    sys.props("graft.mmivf.root") =
      Files.createTempDirectory(Paths.get("target"), "mm-extgate").toString
    try {
      val all = graft.core.Tables.documents(spark, sf)
      all.where(col("doc_id") < 100).write.parquet(s"$root/documents.parquet")
      def vecsOf(ids: Seq[Long]) = ids
        .map(i => (i, Seq.tabulate(4)(d => ((i * 7 + d * 3) % 11))))
        .toDF("asset_id", "f")
      def batchOf(lo: Int, hi: Int) =
        all.where(col("doc_id") >= lo && col("doc_id") < hi)
          .select("doc_id", "text")
      // an UNSEEDED ext lane refuses at the door — the gate must never
      // fixture-build it implicitly (vector-space mixing)
      val e = intercept[IllegalArgumentException](
        graft.streaming.Streams.dedupGateBatch(spark, store,
          batchOf(100, 150), 0L, advanceIndex = true,
          corpusDir = Some(root), advanceMm = true,
          extVectors = Some(vecsOf(100L until 150L))))
      assert(e.getMessage.contains("SEEDED"), e.getMessage)
      // seed with caller vectors, then one gated batch advances the lane
      val seeded = MmIvf.buildExternal(spark, root,
        Some(vecsOf(0L until 100L)))
      val (a0, r0) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(100, 150), 0L, advanceIndex = true,
        corpusDir = Some(root), advanceMm = true,
        extVectors = Some(vecsOf(100L until 150L)))
      assert(a0 > 0 && a0 + r0 == 50)
      val admitted = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= 100).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val ext = MmIvf.buildExternal(spark, root) // warm: just published
      val extIds = ext.feats.select("asset_id").collect().map(_.getLong(0))
      assert(extIds.length == extIds.distinct.length,
        "no asset may be indexed twice in the ext lane")
      assert(admitted.subsetOf(extIds.toSet),
        "every gate-admitted doc's external vector must serve")
      assert(((100L until 150L).toSet -- admitted)
        .forall(!extIds.contains(_)),
        "a rejected doc's vector must NOT index")
      assert(ext.cellIds.toSeq == seeded.cellIds.toSeq,
        "centroids stay frozen across the gated append")
      // the staged extv vectors are NOT corpus data
      assert(graft.core.Tables.documents(spark, root).count() == 100 + a0,
        "extv staging must never land in documents.parquet")
      // replay of the committed batch: no-op, ext lane unchanged
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(100, 150), 0L, advanceIndex = true, corpusDir = Some(root),
        advanceMm = true,
        extVectors = Some(vecsOf(100L until 150L))) == (0L, 0L))
      MmIvf.evictSession(spark)
      assert(MmIvf.buildExternal(spark, root).feats.count() ==
        extIds.length.toLong, "replay must not grow the ext lane")
      // CRASH between the staging rename and the final commit: the staged
      // extv/ + _extprior are the ONLY copy of the delta's vectors — the
      // replay must finish exactly the interrupted append
      val (a1, r1) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(150, 200), 1L)
      assert(a1 + r1 == 50)
      val adm1 = spark.read.parquet(s"$store/docs")
        .where(col("doc_id") >= 150 && col("doc_id") < 200)
      val priorPath = MmIvf.buildExternal(spark, root).path
      adm1.select("doc_id", "text")
        .write.parquet(s"$store/_commits/1.delta/docs")
      val adm1Ids = adm1.select("doc_id").collect().map(_.getLong(0)).toSeq
      vecsOf(adm1Ids).write.parquet(s"$store/_commits/1.delta/extv")
      st.writeString(s"$store/_commits/1.delta/_extprior", priorPath)
      assert(st.delete(s"$store/_commits/1"))
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(150, 200), 1L, advanceIndex = true, corpusDir = Some(root),
        advanceMm = true,
        extVectors = Some(vecsOf(adm1Ids))) == (0L, 0L))
      assert(st.exists(s"$store/_commits/1"), "replay must finish the commit")
      MmIvf.evictSession(spark)
      val ext2 = MmIvf.buildExternal(spark, root)
      val ext2Ids = ext2.feats.select("asset_id").collect().map(_.getLong(0))
      assert(ext2Ids.length == ext2Ids.distinct.length,
        "crash replay must not double-index")
      assert(adm1Ids.toSet.subsetOf(ext2Ids.toSet),
        "crash replay must finish the staged external append")
      assert(ext2.cellIds.toSeq == seeded.cellIds.toSeq)
      // EMPTY ext delta (review r17): vectors that all belong to
      // rejected/absent docs still commit the batch and REPUBLISH the
      // lane at the new fingerprint (explicit-schema read of the empty
      // staged frame), so the next batch's seeded check stays green
      val (a2, r2) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(200, 230), 2L, advanceIndex = true,
        corpusDir = Some(root), advanceMm = true,
        extVectors = Some(vecsOf(900L until 930L)))
      assert(a2 > 0, "docs must admit even when no ext vector matches")
      MmIvf.evictSession(spark)
      val ext3 = MmIvf.buildExternal(spark, root)
      assert(ext3.feats.count() == ext2Ids.length.toLong,
        "an empty ext delta must republish the lane unchanged")
      // REPLAY of an old committed batch after the fingerprint moved on
      // (review r17): must short-circuit on its marker, never hit the
      // seeded check
      assert(graft.streaming.Streams.dedupGateBatch(spark, store,
        batchOf(100, 150), 0L, advanceIndex = true, corpusDir = Some(root),
        advanceMm = true,
        extVectors = Some(vecsOf(100L until 150L))) == (0L, 0L),
        "a committed batch's replay is a no-op at any later fingerprint")
      // and a FRESH batch against a lane another batch left behind
      // (corpus advanced without extVectors) refuses with the seeded
      // message — the operator contract the scaladoc states
      val (a3, _) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batchOf(230, 250), 3L, advanceIndex = true,
        corpusDir = Some(root), advanceMm = true)
      assert(a3 > 0)
      val stale = intercept[IllegalArgumentException](
        graft.streaming.Streams.dedupGateBatch(spark, store,
          batchOf(250, 260), 4L, advanceIndex = true,
          corpusDir = Some(root), advanceMm = true,
          extVectors = Some(vecsOf(250L until 260L))))
      assert(stale.getMessage.contains("SEEDED"), stale.getMessage)
    } finally {
      prevMm match {
        case Some(p) => sys.props("graft.mmivf.root") = p
        case None    => sys.props.remove("graft.mmivf.root")
      }
      graft.operators.MmIvf.evictSession(spark)
    }
  }

  test("gate auto-expire: superseded fingerprints bounded under streaming appends; warm serving unaffected") {
    // VERDICT r11 task 8: advanceLex publishes one superseded lex (and dup)
    // fingerprint per admitted micro-batch — autoExpireKeepLast wires the
    // expire_indexes sweep into the gate's post-commit upkeep, mirroring
    // auto-compaction's posture. Isolated roots so the count is exact.
    val store = Files.createTempDirectory(Paths.get("target"), "gate-exp").toString
    val root = Files.createTempDirectory("graft-expcorpus").toString
    val corpus = s"$root/documents.parquet"
    val prevLex = sys.props.get("graft.lexindex.root")
    val prevDup = sys.props.get("graft.dupindex.root")
    sys.props("graft.lexindex.root") =
      Files.createTempDirectory(Paths.get("target"), "lex-exp").toString
    sys.props("graft.dupindex.root") =
      Files.createTempDirectory(Paths.get("target"), "dup-exp").toString
    try {
      val st = graft.core.Storage.hadoop
      val all = graft.core.Tables.documents(spark, sf)
      all.where(col("doc_id") < 400).write.parquet(corpus)
      graft.functions.GraftFunctions.register(spark)
      val keep = 1
      for (i <- 0 until 5) {
        val lo = 400 + i * 10
        val batch = all.where(col("doc_id") >= lo && col("doc_id") < lo + 10)
          .select("doc_id", "text")
        graft.streaming.Streams.dedupGateBatch(spark, store, batch, i.toLong,
          advanceIndex = true, corpusDir = Some(root), advanceLex = true,
          autoExpireKeepLast = Some(keep))
      }
      // live fingerprint + at most keep_last_n superseded per root
      val lexDirs = st.listDirNames(sys.props("graft.lexindex.root"))
      val dupDirs = st.listDirNames(sys.props("graft.dupindex.root"))
      assert(lexDirs.size <= keep + 1,
        s"lex fingerprints unbounded under auto-expire: $lexDirs")
      assert(dupDirs.size <= keep + 1,
        s"dup fingerprints unbounded under auto-expire: $dupDirs")
      // warm serving unaffected mid-sweep: both live artifacts answer for
      // the CURRENT corpus state, and the served lexical lane still equals
      // the index-free formulation
      val nNow = graft.core.Tables.documents(spark, root).count()
      assert(graft.operators.LexIndex.build(spark, root).nDocsAll == nNow)
      assert(DupClusters.build(spark, root).nDocs == nNow)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(rows(graft.operators.LexIndex.jaccardTopDocs(spark, root, 5, 100))
        == rows(graft.operators.Similarity.lexLaneDirect(spark, root)),
        "served lexical lane diverged after auto-expire")
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(p) => sys.props(k) = p; ()
        case None    => sys.props.remove(k); ()
      }
      restore("graft.lexindex.root", prevLex)
      restore("graft.dupindex.root", prevDup)
    }
  }

  test("append refuses a delta that does not reconcile with the corpus") {
    val root = Files.createTempDirectory("graft-dupref").toString
    val corpus = s"$root/documents.parquet"
    val all = graft.core.Tables.documents(spark, sf)
    all.where(col("doc_id") < 100).write.parquet(corpus)
    val idx0 = DupClusters.build(spark, root)
    // fingerprint unchanged → the delta is not in the corpus yet
    val eSame = intercept[IllegalArgumentException](
      DupClusters.append(spark, root, idx0,
        all.where(col("doc_id") >= 100).select("doc_id", "text")))
    assert(eSame.getMessage.contains("fingerprint unchanged"))
    // corpus advanced by 400 docs but the claimed delta has 10 → refuse
    all.where(col("doc_id") >= 100).write.mode("append").parquet(corpus)
    val eCount = intercept[IllegalArgumentException](
      DupClusters.append(spark, root, idx0,
        all.where(col("doc_id") >= 490).select("doc_id", "text")))
    assert(eCount.getMessage.contains("out-of-band"))
  }

  test("weak links (q_g11): two cliques welded by one bridge emit exactly the bridge; chains emit every link") {
    import spark.implicits._
    // clique {1,2,3} + clique {4,5,6} welded by (3,4): every clique edge
    // is triangle-supported, the bridge is not — it is the cut the gated
    // keeper routes around and the pair a curation run re-verifies
    val welded = Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 2),
        (4L, 5L, 0), (4L, 6L, 1), (5L, 6L, 2), (3L, 4L, 2))
      .toDF("a_id", "b_id", "ham")
    assert(pairSet(Dedup.weakEdges(welded)) == Set((3L, 4L, 2)),
      "exactly the bridge must be weak")
    // a pure chain 7-8-9 has no triangles at all: every link is weak
    val chain = Seq((7L, 8L, 1), (8L, 9L, 1)).toDF("a_id", "b_id", "ham")
    assert(pairSet(Dedup.weakEdges(chain)) == Set((7L, 8L, 1), (8L, 9L, 1)),
      "every chain link must be weak")
    // corpus graph: the distributed anti-join equals an independent
    // driver-side hash-set replay (the graph is MaxDriverPairs-bounded
    // at spec SF, the qG9 hybrid's own bound)
    val idx = DupClusters.build(spark, sf)
    val edges = pairSet(idx.pairs.select("a_id", "b_id", "ham"))
    val adj = edges.toSeq.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = edges.filter { case (a, b, _) =>
      (adj(a) & adj(b)).isEmpty }
    assert(pairSet(Dedup.weakEdges(idx.pairs.select("a_id", "b_id", "ham")))
      == expected, "distributed weak set must equal the driver replay")
    assert(Dedup.qG11(spark, sf).count() == expected.size.toLong)
    // round-19 hybrid pin: the driver fast path (default bound) and the
    // distributed probe (forced with maxDriverPairs = 0) must stay
    // bit-equal on fixtures AND the mined corpus graph
    val corpus = idx.pairs.select("a_id", "b_id", "ham")
    assert(pairSet(Dedup.weakEdges(corpus, maxDriverPairs = 0)) ==
      pairSet(Dedup.weakEdges(corpus)),
      "hybrid weakEdges paths diverged on the corpus graph")
    assert(pairSet(Dedup.weakEdges(welded, maxDriverPairs = 0)) ==
      Set((3L, 4L, 2)) &&
      pairSet(Dedup.weakEdges(chain, maxDriverPairs = 0)) ==
        Set((7L, 8L, 1), (8L, 9L, 1)),
      "forced-distributed weakEdges diverged on fixtures")
  }
}
