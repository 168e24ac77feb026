package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** DURABLE dup-cluster index over the SimHash near-dup graph — the artifact
  * form of the [[Dedup.qD6]] → components → PageRank pipeline that
  * [[TextAnalysis.qT18]] (cluster-routed split), [[TextAnalysis.qT19]]
  * (keep-canonical), [[TextAnalysis.qT26]] (dedup-aware mix) and the qG*
  * structural diagnostics all consume. Without it, every one of those
  * queries re-mines the band graph and re-runs the BSP loops from raw text
  * per invocation; with it, the graph is mined ONCE per corpus state and
  * every consumer afterwards reads graph-sized parquet.
  *
  * Same durability pattern as [[Similarity.IvfIndex]] (the template this
  * deliberately mirrors): corpus-fingerprint-keyed directory under
  * `graft.dupindex.root`, staged build published by ONE atomic rename with
  * the metadata marker written last, all mutation under the shared
  * stale-safe index lock, and an in-process memo so a session pays the
  * parquet read once. A changed corpus hashes to a different directory, so
  * load-on-miss can never serve a stale graph.
  *
  * On-disk layout (`v1-<fp>-p<iters>/`):
  *   - `sigs/`     (doc_id, simhash)            — node-sized; what appends
  *                                                 join new docs against
  *   - `pairs/`    (a_id, b_id, ham)            — the verified qD6 edges
  *   - `clusters/` (id, component, rank_e6)     — component label (min
  *                    reachable id, [[Dedup.componentsOfPairs]]) and
  *                    integer-micro PageRank ([[Dedup.pageRank]],
  *                    [[Dedup.PageRankIters]] rounds) per non-singleton node
  *   - `severed/`  (id, component, rank_e6)     — components over the
  *                    SURVIVING edges after refuted welds drop (q_g12;
  *                    severing-isolated nodes self-label); what the gated
  *                    keeper consumes
  *   - `refuted/`  (a_id, b_id)                 — the dropped cut-set
  *   - `verdicts/` (a_id, b_id, refuted)        — weld-verdict cache for
  *                    edges in the live pair set (append verifies only
  *                    new weak edges; [[vacuumVerdicts]] drops rows whose
  *                    edge left the pair set, so the cache is pair-bounded
  *                    rather than append-history-monotone)
  *   - `meta.tsv`                                — doc count + params;
  *                    its existence IS the published-index predicate
  *
  * Scale posture: the build is ONE corpus pass (the fused simhash32
  * projection — the persisted signature frame feeds both the stored
  * `sigs/` and the band-join mining), plus graph-sized joins and the
  * O(iters×|E|) BSP loops; everything written is graph- or node-sized,
  * orders of magnitude below the corpus. Warm consumers run ZERO corpus
  * passes (q_t19/q_g4 touch only artifact files — PlanAuditSpec pins this
  * via `inputFiles`, the qSim3 discipline). [[append]] keeps the artifact
  * consistent under ingestion (the ST-9 gate's admitted batches) with
  * delta-sized work: new signatures band-join against the stored node-sized
  * `sigs/`, never against corpus text.
  */
object DupClusters {

  /** A loaded index: `pairs`, `clusters`, `severed`, and `refuted` are
    * persisted + materialized (MEMORY_AND_DISK); `sigs` stays a lazy
    * reader — only [[append]] needs it, and only as the build side of a
    * delta join. `severed` is (id, component, rank_e6) over the SURVIVING
    * edge set (refuted weld edges dropped, [[Dedup.refutedWeakEdges]]) —
    * the graph the gated keeper consumes; `refuted` is the dropped
    * cut-set (a_id, b_id), so warm consumers derive surviving pairs with
    * one graph-sized anti-join and zero corpus passes. `verdicts` stays a
    * lazy reader like `sigs` — the (a_id, b_id, refuted) weld-verdict
    * cache, consumed only by [[append]] (its content depends on WHEN
    * edges were verified — a superset of the current weak set, bounded
    * by the live pair set via [[vacuumVerdicts]] — so it is a CACHE,
    * never compared by the consistency specs). */
  final case class DupIndex(path: String, nDocs: Long, sigs: DataFrame,
                            pairs: DataFrame, clusters: DataFrame,
                            severed: DataFrame, refuted: DataFrame,
                            verdicts: DataFrame)

  private val cache = new graft.core.SessionCache[DupIndex](i => {
    i.pairs.unpersist(); i.clusters.unpersist()
    i.severed.unpersist(); i.refuted.unpersist(); ()
  })

  private lazy val store: graft.core.Storage = graft.core.Storage.hadoop

  /** Root for durable dup-cluster indexes (`graft.dupindex.root` overrides;
    * any Hadoop URI on a rename-capable store — the same coordination
    * contract [[Similarity.IvfIndex]] enforces through the shared lock). */
  private def indexRoot: String =
    sys.props.getOrElse("graft.dupindex.root", "target/dup-index")

  /** Bump when the graph recipe (banding, Hamming bound, iteration counts)
    * or the layout changes — an index built by an older recipe must not be
    * served for the same corpus. v2: + `corpus_files.tsv` (the corpus file
    * listing at build time, [[append]]'s out-of-band-change guard).
    * v3: + `severed/` (components over the surviving edge set after
    * refuted weld edges are dropped) and `refuted/` (the dropped cut-set)
    * — VERDICT r15 task 2. v4: + `verdicts/` (every weld verdict ever
    * computed — the monotone cache that makes [[append]]'s text
    * verification DELTA-bounded: edit distances are immutable, so only
    * never-verified weak edges pay the fetch+DP). */
  private val FormatVersion = 4

  private def sub(base: String, child: String): String =
    new org.apache.hadoop.fs.Path(base, child).toString

  private def corpusPath(dir: String): String =
    new org.apache.hadoop.fs.Path(dir, "documents.parquet").toString

  private def indexPath(dir: String): String =
    new org.apache.hadoop.fs.Path(indexRoot,
      s"v$FormatVersion-" +
        Similarity.IvfIndex.fileFingerprint(corpusPath(dir)) +
        s"-p${Dedup.PageRankIters}").toString

  /** Corpus doc count from parquet metadata — a driver-cheap reconciliation
    * handle ([[append]] refuses a delta that doesn't add up). */
  private def corpusCount(s: SparkSession, dir: String): Long =
    Tables.documents(s, dir).count()

  /** Retention sweep over this root: drop superseded fingerprint dirs
    * (never a listed corpus's live fingerprint, never a lock-held build)
    * outside the newest `keepLastN` and older than `olderThanMs`. `dirs`
    * must list EVERY corpus served from this root — an unlisted corpus's
    * live index is indistinguishable from a superseded one. See
    * [[IndexRetention]] and `CALL graft.system.expire_indexes`. */
  def expireStale(dirs: Seq[String], keepLastN: Option[Int],
                  olderThanMs: Option[Long]): Seq[IndexRetention.Swept] =
    IndexRetention.sweep(store, indexRoot, "dup",
      dirs.flatMap(d =>
        IndexRetention.liveCorpusFile(store, d, corpusPath(d))
          .map(Similarity.IvfIndex.fileFingerprint)).toSet,
      keepLastN, olderThanMs)

  /** Build (or fetch) the index for `dir`: in-process memo, then the
    * durable on-disk copy, and only on a true miss the one-pass corpus
    * build — staged and atomically renamed into place under the shared
    * mutation lock (two racing JVMs: one rename wins, the loser loads). */
  def build(s: SparkSession, dir: String): DupIndex =
    cache.getOrCompute(s, indexPath(dir))(loadOrBuild(s, dir))

  private def loadOrBuild(s: SparkSession, dir: String): DupIndex = {
    val path = indexPath(dir)
    val marker = sub(path, "meta.tsv")
    if (!store.exists(marker)) {
      store.mkdirs(indexRoot)
      Similarity.IvfIndex.withIndexLock(path + ".lock") {
        if (!store.exists(marker)) {
          // a marker-less directory is a crashed pre-publish leftover —
          // safe to clear under the lock
          if (store.exists(path)) store.deleteRecursive(path)
          val entries = LexIndex.corpusEntries(corpusPath(dir))
          val sigs = Dedup.simhash(s, dir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val pairs = Dedup.pairsOfSigs(sigs)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try stageAndPublish(s, path, sigs, pairs, corpusCount(s, dir),
              entries, Tables.documents(s, dir), None)
            finally { pairs.unpersist(); () }
          } finally { sigs.unpersist(); () }
        }
      }
    }
    load(s, path)
  }

  /** Verdicts-cache vacuum (VERDICT r16 task 5): keep only cached weld
    * verdicts whose edge still appears in the CURRENT pair set. Without
    * it the cache is append-history-monotone — graph-bounded, but a
    * long-lived gate rewrites an ever-growing superset wholesale each
    * publish. Semantics-preserving by construction: the refuted set is
    * `weak-now ∩ refuted-ever`, and an edge absent from `pairs` cannot
    * be weak-now; if a dropped edge ever re-enters the pair set (a
    * re-banded recipe is a new FormatVersion, so in practice it cannot),
    * the append re-verifies it — same verdict, edit distances are
    * immutable. One graph-sized left-semi join at publish time. */
  private[graft] def vacuumVerdicts(prior: DataFrame,
                                    pairs: DataFrame): DataFrame =
    prior.select("a_id", "b_id", "refuted")
      .join(pairs.select("a_id", "b_id"), Seq("a_id", "b_id"), "left_semi")

  /** Stage the six frames + marker into `<path>.tmp-*`, publish by ONE
    * atomic rename. `pairs` must be persisted by the caller — components,
    * PageRank, the severing, and the parquet write all read it. `docs` is
    * the post-state corpus reader — the severing's edit-distance
    * re-verification ([[Dedup.refutedWeakEdges]]) fetches endpoint text
    * for the weak cut-set through it: a map-only broadcast-pruned scan,
    * the one place the build touches text beyond the signature pass. */
  private def stageAndPublish(s: SparkSession, path: String, sigs: DataFrame,
                              pairs: DataFrame, nDocs: Long,
                              entries: Seq[String], docs: DataFrame,
                              priorVerdicts: Option[DataFrame]): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val staging = path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    val edges = pairs.select("a_id", "b_id")
    val comp = Dedup.componentsOfPairs(s, edges, Dedup.MaxDriverPairs)
    val ranks = Dedup.pageRank(edges, Dedup.PageRankIters)
      .selectExpr("id AS r_id", "r AS rank_e6")
    sigs.write.mode("overwrite").parquet(sub(staging, "sigs"))
    pairs.write.mode("overwrite").parquet(sub(staging, "pairs"))
    comp.join(ranks, col("id") === col("r_id"))
      .select("id", "component", "rank_e6")
      .write.mode("overwrite").parquet(sub(staging, "clusters"))
    // severing (VERDICT r15 task 2): refute the weak cut-set by bounded
    // edit distance, recompute components over the surviving edges, and
    // keep severed-isolated nodes as their own singleton families — the
    // graph the gated keeper ships against. Verification is CACHED in
    // verdicts/ (edit distances are immutable): an append verifies only
    // the weak edges its prior has never verified — delta-bounded text
    // work — while a cold build verifies the whole weak set; both paths
    // land the SAME refuted set (the weak-now ∩ refuted-ever semantics),
    // which is what keeps append ≡ from-scratch build.
    val prior = priorVerdicts
      .map(vacuumVerdicts(_, pairs))
      .getOrElse(pairs.select("a_id", "b_id").limit(0)
        .withColumn("refuted", lit(false)))
    val weak = Dedup.weakEdges(pairs).select("a_id", "b_id").persist(lvl)
    try {
      val verdicts = prior.select("a_id", "b_id", "refuted")
        .unionByName(Dedup.verifyEdges(docs,
          weak.join(prior, Seq("a_id", "b_id"), "left_anti")))
        .persist(lvl)
      try {
        verdicts.write.mode("overwrite").parquet(sub(staging, "verdicts"))
        val refuted = weak.join(verdicts.where(col("refuted")),
          Seq("a_id", "b_id"), "left_semi").persist(lvl)
        try {
          refuted.write.mode("overwrite").parquet(sub(staging, "refuted"))
          val surviving = pairs.select("a_id", "b_id")
            .join(refuted, Seq("a_id", "b_id"), "left_anti")
          val sevComp = Dedup
            .componentsOfPairs(s, surviving, Dedup.MaxDriverPairs)
            .withColumnRenamed("component", "comp_sev")
          comp.join(ranks, col("id") === col("r_id"))
            .join(sevComp, Seq("id"), "left")
            .select(col("id"),
              coalesce(col("comp_sev"), col("id")).as("component"),
              col("rank_e6"))
            .write.mode("overwrite").parquet(sub(staging, "severed"))
        } finally { refuted.unpersist(); () }
      } finally { verdicts.unpersist(); () }
    } finally { weak.unpersist(); () }
    store.writeString(sub(staging, "corpus_files.tsv"),
      entries.mkString("", "\n", "\n"))
    store.writeString(sub(staging, "meta.tsv"),
      s"nDocs\t$nDocs\npageRankIters\t${Dedup.PageRankIters}\n")
    if (!(store.rename(staging, path) && store.exists(sub(path, "meta.tsv")))) {
      store.deleteRecursive(staging)
      throw new IllegalStateException(
        s"dup-cluster index: publishing $staging -> $path failed")
    }
  }

  private def load(s: SparkSession, path: String): DupIndex = {
    val meta = store.readString(sub(path, "meta.tsv"))
      .linesIterator.map(_.split("\t")).collect { case Array(k, v) => k -> v }
      .toMap
    val pairs = s.read.parquet(sub(path, "pairs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize: consumers must not re-read per branch
    val clusters = s.read.parquet(sub(path, "clusters"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clusters.count()
    val severed = s.read.parquet(sub(path, "severed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    severed.count()
    val refuted = s.read.parquet(sub(path, "refuted"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    refuted.count()
    DupIndex(path, meta("nDocs").toLong,
      s.read.parquet(sub(path, "sigs")), pairs, clusters, severed, refuted,
      s.read.parquet(sub(path, "verdicts")))
  }

  /** Incremental maintenance — the ingestion-side contract that keeps the
    * ST-9 dedup gate and this offline graph CONSISTENT: after new documents
    * land in the corpus (e.g. a gate-admitted micro-batch appended to
    * `documents.parquet`), the caller hands the SAME delta here and the
    * index advances with delta-sized work:
    *
    *   1. delta signatures — one fused simhash32 pass over `newDocs` only;
    *   2. delta pairs — the new signatures band-join the stored node-sized
    *      `sigs/` (complete by the qD6 pigeonhole: every new pair has a
    *      delta endpoint, and prior-prior pairs are already stored);
    *   3. components + PageRank + the weld severing recompute over the
    *      UNIFIED pair frame — graph-sized BSP; the only text touched is
    *      the endpoints of weak edges the prior NEVER VERIFIED (the
    *      `verdicts/` cache — a delta-bounded set, since an old weak
    *      edge's verdict is already stored and adding edges never makes
    *      a supported edge weak; edit distances are immutable, so the
    *      cached verdicts agree with what a from-scratch build computes
    *      and the published refuted/severed lanes are IDENTICAL);
    *   4. publish at the NEW corpus fingerprint's path (atomic rename).
    *
    * Spec-pinned equal to a from-scratch [[build]] on the post-append
    * corpus (same pairs, same clusters — DupClustersSpec), which is the
    * consistency statement: gate-admitted data and offline curation see
    * the same graph. `newDocs` needs (doc_id, text) with genuinely new ids
    * (dedupe upstream — the gate already guarantees this for admitted
    * docs). Out-of-band guards (BOTH must pass, else rebuild): the count
    * reconciliation `prior.nDocs + |delta| = |corpus|`, AND (ADVICE r10 —
    * an in-place edit can keep the count unchanged) a per-file check that
    * every corpus file recorded at the prior build is still unchanged
    * (size + mtime + content token, `corpus_files.tsv` — ADVICE r11: the
    * token catches same-size preserved-mtime rewrites; shared with
    * [[LexIndex.changedPriorFiles]]) — an append only ADDS files. */
  def append(s: SparkSession, dir: String, prior: DupIndex,
             newDocs: DataFrame): DupIndex = {
    GraftFunctions.register(s)
    val newPath = indexPath(dir)
    require(newPath != prior.path,
      "dup-cluster append: corpus fingerprint unchanged — the delta is not " +
        "in the corpus yet (append AFTER the new files land)")
    val priorEntries = store.readString(sub(prior.path, "corpus_files.tsv"))
      .linesIterator.filter(_.nonEmpty).toSeq
    val nowEntries = LexIndex.corpusEntries(corpusPath(dir))
    val changed = LexIndex.changedPriorFiles(priorEntries, nowEntries)
    require(changed.isEmpty,
      s"dup-cluster append: ${changed.size} pre-existing corpus file(s) " +
        s"changed out-of-band (${changed.take(3).mkString(", ")}) — " +
        "rebuild instead of appending onto a stale base")
    val now = corpusCount(s, dir)
    val nNew = newDocs.count()
    require(prior.nDocs + nNew == now,
      s"dup-cluster append: prior ${prior.nDocs} docs + delta $nNew != " +
        s"corpus $now — out-of-band change detected, rebuild instead")
    val dSigs = newDocs.selectExpr("doc_id", "simhash32(text) AS simhash")
      .where(col("simhash").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val allSigs = prior.sigs.unionByName(dSigs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // delta mining: all-sigs × delta-sigs on the band keys. The delta
        // side broadcasts (micro-batch-sized); the node-sized signature
        // frame streams map-only — the corpus text is never touched.
        def bandsOf(df: DataFrame) = df.selectExpr("doc_id", "simhash",
          """stack(3, 0, simhash & 2047,
            |         1, (simhash >> 11) & 2047,
            |         2, (simhash >> 22) & 1023) AS (band, bv)""".stripMargin)
        val a = bandsOf(allSigs)
          .selectExpr("doc_id AS x_id", "simhash AS sx", "band", "bv")
        val d = bandsOf(dSigs)
          .selectExpr("doc_id AS y_id", "simhash AS sy",
            "band AS band_d", "bv AS bv_d")
        val newPairs = a.join(broadcast(d),
            col("band") === col("band_d") && col("bv") === col("bv_d") &&
              col("x_id") =!= col("y_id"))
          .withColumn("ham", expr("bit_count(sx ^ sy)"))
          .where(col("ham") <= 2)
          // canonicalize: a delta id can sit on either side of an edge
          .selectExpr("least(x_id, y_id) AS a_id",
            "greatest(x_id, y_id) AS b_id", "CAST(ham AS INT) AS ham")
          .distinct()
        val pairs = prior.pairs.unionByName(newPairs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          Similarity.IvfIndex.withIndexLock(newPath + ".lock") {
            if (!store.exists(sub(newPath, "meta.tsv"))) {
              if (store.exists(newPath)) store.deleteRecursive(newPath)
              stageAndPublish(s, newPath, allSigs, pairs, now, nowEntries,
                Tables.documents(s, dir), Some(prior.verdicts))
            }
          }
        } finally { pairs.unpersist(); () }
      } finally { allSigs.unpersist(); () }
    } finally { dSigs.unpersist(); () }
    // the superseded handle's persisted frames must not pin the
    // CacheManager until context stop — a long-running advanceIndex gate
    // appends every micro-batch (the IvfIndex.append discipline; review
    // r11: evictSession's release never fires on this production path)
    prior.pairs.unpersist(); prior.clusters.unpersist()
    prior.severed.unpersist(); prior.refuted.unpersist()
    cache.getOrCompute(s, newPath)(load(s, newPath))
  }

  /** Test/maintenance hook: drop this session's memoized frames so a fresh
    * [[build]] exercises the durable load path. */
  private[graft] def evictSession(s: SparkSession): Unit =
    cache.evictSession(s)
}
