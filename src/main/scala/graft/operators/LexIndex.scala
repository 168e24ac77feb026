package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** DURABLE INVERTED INDEX over the `documents` corpus — the artifact form
  * of the lexical retrieval lanes (VERDICT r10 task 2): [[TextAnalysis
  * .qT21]]'s BM25 scoring and [[Similarity.qSim15]]'s Jaccard lane both
  * used to re-tokenize the WHOLE corpus per run; with this index the
  * corpus is tokenized ONCE per corpus state and every lexical consumer
  * afterwards reads index-sized parquet — postings for the query's terms
  * (bucket-pruned), term- and node-sized sidecars, zero corpus passes.
  *
  * Same durability pattern as [[Similarity.IvfIndex]] / [[DupClusters]]:
  * corpus-fingerprint-keyed directory under `graft.lexindex.root`, staged
  * build published by ONE atomic rename with `meta.tsv` written last (its
  * existence IS the published predicate), all mutation under the shared
  * stale-safe index lock, and a session-scoped memo ([[graft.core
  * .SessionCache]]) so a session pays the sidecar reads once.
  *
  * On-disk layout (`v1-<fp>-b<buckets>/`):
  *   - `postings/wb=<b>/` (w, doc_id, tf) — one row per (doc, distinct
  *     non-empty token), hash-partitioned on the TERM into `buckets`
  *     directories so a k-term query prunes the read to <= k buckets
  *     (parquet partition pruning on `wb`; the classic posting-list seek,
  *     expressed as directory pruning). Empty-string tokens (split()'s
  *     artifacts around doubled/leading spaces) are NOT posted — they are
  *     accounted by `has_empty` below so set semantics stay exact.
  *   - `terms/`  (w, df) — term-sized document frequencies; query
  *     selection and idf read THIS, never the corpus.
  *   - `doclen/` (doc_id, dl, nterms, has_empty) — node-sized per-doc
  *     stats: dl = non-empty token count (BM25 length norm), nterms =
  *     distinct non-empty tokens, has_empty = whether split() produced ""
  *     (so distinct-set sizes including "" are reconstructible:
  *     |set| = nterms + has_empty). Every corpus doc has a row (token-less
  *     docs carry dl = 0) — Jaccard consumers rank the WHOLE corpus.
  *   - `meta.tsv` — nDocsAll / nTok (docs with >= 1 token — BM25's N) /
  *     tTok (total tokens — avgdl's numerator) / buckets.
  *   - `corpus_files.tsv` — the corpus file listing
  *     (relPath:size:mtime:contentToken) at build time; [[append]]'s
  *     out-of-band-change guard (a corpus whose PRE-EXISTING files changed
  *     must rebuild, not append — the count-only check ADVICE r10 flagged
  *     on DupClusters is not enough, and ADVICE r11 adds the content token
  *     so a same-size preserved-mtime rewrite cannot slip through either).
  *
  * Scale posture: the build is one tokenize-explode corpus pass with
  * map-side partial aggregation (the qT9/qT21 shape) plus a map-only
  * per-doc stats projection; everything written is index-sized. Warm BM25
  * reads <= k posting buckets + the term/doclen sidecars; the Jaccard lane
  * streams postings (index-sized, far below corpus text) against a
  * broadcast probe set. [[append]] advances the index with DELTA-sized
  * tokenization (new docs only) — prior postings are re-laid-out
  * bucket-by-bucket without ever touching corpus text; at petabyte scale
  * the same layout admits per-bucket file appends.
  */
object LexIndex {

  /** A loaded index: `terms` and `doclen` are persisted + materialized
    * (bounded: term- and node-sized); `postings` stays a LAZY reader —
    * it is the one index-scale frame, and its consumers either
    * bucket-prune it (BM25) or stream it map-only (Jaccard). */
  final case class Index(path: String, nDocsAll: Long, nTok: Long,
                         tTok: Long, buckets: Int, postings: DataFrame,
                         terms: DataFrame, doclen: DataFrame) {
    /** Corpus-state constants of the served index, memoized on the handle
      * (round-19 optimization): [[jaccardTopDocs]]' df-cap gate re-ran
      * these scalar aggregates over the PERSISTED sidecars on EVERY call —
      * ~0.3 s of pure driver-job overhead per lexical-lane query, measured
      * warm. They are immutable properties of a published index state
      * (exactly like the meta.tsv totals), so the session-cached handle
      * pays each once; a changed corpus gets a new fingerprint, hence a
      * new handle, hence fresh values — no staleness channel. */
    lazy val maxDf: Long =
      terms.agg(coalesce(max("df"), lit(0L))).head().getLong(0)
    lazy val dfEmpty: Long = doclen
      .agg(coalesce(sum(when(col("has_empty"), 1L).otherwise(0L)), lit(0L)))
      .head().getLong(0)
    /** Corpus-min distinct-set size (the Jaccard upper bound's ssn floor). */
    lazy val ssnMin: Long = doclen.agg(
      coalesce(min(col("nterms") + when(col("has_empty"), 1L).otherwise(0L)),
        lit(0L))).head().getLong(0)
  }

  private val cache = new graft.core.SessionCache[Index](i => {
    i.terms.unpersist(); i.doclen.unpersist(); ()
  })

  private lazy val store: graft.core.Storage = graft.core.Storage.hadoop

  /** Root for durable inverted indexes (`graft.lexindex.root` overrides;
    * any Hadoop URI on a rename-capable store). */
  private def indexRoot: String =
    sys.props.getOrElse("graft.lexindex.root", "target/lex-index")

  /** Postings hash-partition count, frozen at build time (recorded in
    * meta.tsv — pruning math must use the BUILD-time value forever).
    * Default 64 suits the test SFs; a 100 TB corpus wants thousands
    * (`-Dgraft.lexindex.buckets=4096`) so per-term reads stay file-sized. */
  private def configuredBuckets: Int =
    sys.props.getOrElse("graft.lexindex.buckets", "64").toInt

  /** Bump when the tokenization recipe or the layout changes — an index
    * built by an older recipe must not be served for the same corpus. */
  private val FormatVersion = 1

  private def sub(base: String, child: String): String =
    new org.apache.hadoop.fs.Path(base, child).toString

  private def corpusPath(dir: String): String =
    new org.apache.hadoop.fs.Path(dir, "documents.parquet").toString

  private def indexPath(dir: String): String =
    indexPathWith(dir, configuredBuckets)

  /** [[append]] names the successor with the PRIOR's frozen bucket count
    * (the layout it actually writes), not the session's configured one — a
    * `-b4096`-named dir holding a 64-bucket layout would mislead every
    * later session into a duplicate rebuild or coarser-than-requested
    * pruning. */
  private def indexPathWith(dir: String, buckets: Int): String =
    new org.apache.hadoop.fs.Path(indexRoot,
      s"v$FormatVersion-" +
        Similarity.IvfIndex.fileFingerprint(corpusPath(dir)) +
        s"-b$buckets").toString

  /** Retention sweep over this root: drop superseded fingerprint dirs
    * (never a listed corpus's live fingerprint, never a lock-held build)
    * outside the newest `keepLastN` and older than `olderThanMs`. `dirs`
    * must list EVERY corpus served from this root — an unlisted corpus's
    * live index is indistinguishable from a superseded one. See
    * [[IndexRetention]] and `CALL graft.system.expire_indexes`. */
  def expireStale(dirs: Seq[String], keepLastN: Option[Int],
                  olderThanMs: Option[Long]): Seq[IndexRetention.Swept] =
    IndexRetention.sweep(store, indexRoot, "lex",
      dirs.flatMap(d =>
        IndexRetention.liveCorpusFile(store, d, corpusPath(d))
          .map(Similarity.IvfIndex.fileFingerprint)).toSet,
      keepLastN, olderThanMs)

  /** The corpus file listing serialized for `corpus_files.tsv` — one
    * `relPath:size:mtimeMs:t<crc>` line per DATA file, sorted. The trailing
    * token is [[graft.core.Storage.contentToken]] (CRC32C of length +
    * first/last 4 KiB — ADVICE r11: size+mtime alone misses a same-size
    * preserved-mtime in-place rewrite). Hidden/metadata files (basename
    * starting `_` or `.` — `_SUCCESS`, checksum sidecars) are excluded:
    * readers ignore them by the Hadoop convention, and an append
    * legitimately rewrites `_SUCCESS`. [[append]]'s out-of-band guard
    * compares these entries exactly. */
  private[graft] def corpusEntries(p: String): Seq[String] = {
    def hidden(rel: String): Boolean = {
      val base = rel.substring(rel.lastIndexOf('/') + 1)
      base.startsWith("_") || base.startsWith(".")
    }
    val walked = store.walk(p).filterNot(f => hidden(f.relPath))
    val parts =
      if (walked.nonEmpty) walked.map { f =>
        val tok = store.contentToken(sub(p, f.relPath))
        s"${f.relPath}:${f.size}:${f.mtimeMs}:$tok"
      }
      else store.fileMeta(p)
        .map(f => s":${f.size}:${f.mtimeMs}:${store.contentToken(p)}").toSeq
    parts.sorted
  }

  /** Out-of-band-change guard (ADVICE r10/r11): every file recorded at the
    * prior build must still exist UNCHANGED — same size, mtime, AND content
    * token — in the current corpus; a delta append only ADDS files. A
    * prior listing written before the token existed (v1: no `:t<crc>`
    * suffix) is compared on its own fields — the one-time migration: the
    * successor index this append publishes records v2 entries, so every
    * LATER append verifies content too. Returns the changed/missing prior
    * entries (empty = safe to append). */
  /** Classify one listing entry by FIELD COUNT from the right (ADVICE
    * r12): a v2 entry is `relPath:size:mtimeMs:t<crc>` — size/mtime are
    * digit-only and the token starts `t`, so the three trailing `:`-fields
    * identify the version unambiguously even when relPath itself contains
    * `:` (or ends in `:t<hex>`, which the pre-r13 suffix regex could
    * mis-strip). A v1 entry's last field is the digit-only mtime, so it
    * can never be misread as v2. Returns (v1 form, hadToken). */
  private def splitEntry(e: String): (String, Boolean) = {
    val parts = e.split(":", -1)
    def digits(x: String) = x.nonEmpty && x.forall(_.isDigit)
    def tok(x: String) = x.length > 1 && x.head == 't' &&
      x.drop(1).forall(c => c.isDigit || (c >= 'a' && c <= 'f'))
    if (parts.length >= 4 && tok(parts.last) &&
        digits(parts(parts.length - 2)) && digits(parts(parts.length - 3)))
      (e.substring(0, e.lastIndexOf(':')), true)
    else (e, false)
  }

  private[graft] def changedPriorFiles(prior: Seq[String],
                                       current: Seq[String]): Seq[String] = {
    val cur = current.toSet
    val curV1 = current.map(e => splitEntry(e)._1).toSet
    prior.filterNot { e =>
      val (v1, hadToken) = splitEntry(e)
      if (hadToken) cur.contains(e) else curV1.contains(v1)
    }
  }

  /** The tokenization recipe, shared by build and append so the index and
    * its delta advance are definitionally the same function of the text.
    * One row per doc: (doc_id, toks). */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))

  private def tfOf(tok: DataFrame): DataFrame =
    tok.select(col("doc_id"), explode(col("toks")).as("w"))
      .where(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  private def doclenOf(tok: DataFrame): DataFrame =
    // map-only: every stat is per-row over toks — no shuffle
    tok.select(col("doc_id"),
      size(filter(col("toks"), t => t =!= "")).cast("long").as("dl"),
      size(array_distinct(filter(col("toks"), t => t =!= "")))
        .cast("long").as("nterms"),
      array_contains(col("toks"), "").as("has_empty"))

  private def withBucket(tf: DataFrame, buckets: Int): DataFrame =
    tf.withColumn("wb", pmod(xxhash64(col("w")), lit(buckets.toLong)))

  /** Bucket ids for literal terms — one 1-row driver job so the pruning
    * predicate uses the exact engine hash (no driver-side reimplementation
    * of xxhash64 to drift). */
  private def bucketsOf(s: SparkSession, ws: Seq[String], buckets: Int): Seq[Long] =
    if (ws.isEmpty) Seq.empty
    else s.range(1).select(
        ws.map(w => pmod(xxhash64(lit(w)), lit(buckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct

  /** Build (or fetch) the index for `dir`: session memo, then the durable
    * on-disk copy, and only on a true miss the one-pass corpus build —
    * staged and atomically renamed into place under the shared mutation
    * lock (two racing JVMs: one rename wins, the loser loads). */
  def build(s: SparkSession, dir: String): Index =
    cache.getOrCompute(s, indexPath(dir))(loadOrBuild(s, dir))

  private def loadOrBuild(s: SparkSession, dir: String): Index = {
    val path = indexPath(dir)
    val marker = sub(path, "meta.tsv")
    if (!store.exists(marker)) {
      store.mkdirs(indexRoot)
      Similarity.IvfIndex.withIndexLock(path + ".lock") {
        if (!store.exists(marker)) {
          if (store.exists(path)) store.deleteRecursive(path)
          val entries = corpusEntries(corpusPath(dir))
          val tok = tokenized(Tables.documents(s, dir))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val dlen = doclenOf(tok)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val tf = tfOf(tok)
              val totals = dlen.agg(
                count(lit(1)).as("all"),
                sum(when(col("dl") > 0, 1L).otherwise(0L)).as("ntok"),
                sum("dl").as("ttok")).head()
              stageAndPublish(s, path, tf, dlen, entries,
                totals.getLong(0), totals.getLong(1), totals.getLong(2),
                configuredBuckets)
            } finally { dlen.unpersist(); () }
          } finally { tok.unpersist(); () }
        }
      }
    }
    load(s, path)
  }

  /** Stage postings (term-bucketed) + sidecars + markers into
    * `<path>.tmp-*`, publish by ONE atomic rename, meta.tsv written last.
    * `termsOverride`: [[append]] passes the prior-terms ⊕ delta-df merge
    * (term- + delta-sized) so the df sidecar never re-aggregates the full
    * postings frame. */
  private def stageAndPublish(s: SparkSession, path: String, tf: DataFrame,
                              dlen: DataFrame, entries: Seq[String],
                              nAll: Long, nTok: Long, tTok: Long,
                              buckets: Int,
                              termsOverride: Option[DataFrame] = None): Unit = {
    val staging = path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    val bucketed = withBucket(tf, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // repartition on wb so each bucket directory gets ~1 file (not one
      // per upstream task); sort by term inside so parquet min/max stats
      // skip row groups within a bucket — the posting-list seek's second
      // level once buckets grow multi-file
      bucketed.repartition(col("wb")).sortWithinPartitions("w", "doc_id")
        .write.mode("overwrite").partitionBy("wb")
        .parquet(sub(staging, "postings"))
      termsOverride
        .getOrElse(bucketed.groupBy("w").agg(count(lit(1)).as("df")))
        .write.mode("overwrite").parquet(sub(staging, "terms"))
      dlen.write.mode("overwrite").parquet(sub(staging, "doclen"))
      store.writeString(sub(staging, "corpus_files.tsv"),
        entries.mkString("", "\n", "\n"))
      store.writeString(sub(staging, "meta.tsv"),
        s"nDocsAll\t$nAll\nnTok\t$nTok\ntTok\t$tTok\nbuckets\t$buckets\n")
      if (!(store.rename(staging, path) && store.exists(sub(path, "meta.tsv")))) {
        store.deleteRecursive(staging)
        throw new IllegalStateException(
          s"lex index: publishing $staging -> $path failed")
      }
    } finally { bucketed.unpersist(); () }
  }

  private def load(s: SparkSession, path: String): Index = {
    val meta = store.readString(sub(path, "meta.tsv"))
      .linesIterator.map(_.split("\t")).collect { case Array(k, v) => k -> v }
      .toMap
    val terms = s.read.parquet(sub(path, "terms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    terms.count() // materialize: consumers must not re-read per branch
    val doclen = s.read.parquet(sub(path, "doclen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    doclen.count()
    Index(path, meta("nDocsAll").toLong, meta("nTok").toLong,
      meta("tTok").toLong, meta("buckets").toInt,
      s.read.parquet(sub(path, "postings")), terms, doclen)
  }

  /** Incremental maintenance: after new documents land in the corpus,
    * hand the SAME delta here and the index advances with delta-sized
    * tokenization — delta postings/doclen from `newDocs` only, term df
    * merged term-frame-against-delta, prior postings re-laid-out without
    * touching corpus text. Guards (both must pass, else rebuild):
    *   - count reconciliation: prior.nDocsAll + |delta| = |corpus|;
    *   - file reconciliation: every corpus file recorded at the prior
    *     build is still byte-identical (size+mtime) — an in-place edit
    *     with unchanged row count CANNOT slip through (ADVICE r10).
    * Spec-pinned equal to a from-scratch [[build]] on the post-append
    * corpus. `newDocs` needs (doc_id, text) with genuinely new ids. */
  def append(s: SparkSession, dir: String, prior: Index,
             newDocs: DataFrame): Index = {
    val newPath = indexPathWith(dir, prior.buckets)
    require(newPath != prior.path,
      "lex index append: corpus fingerprint unchanged — the delta is not " +
        "in the corpus yet (append AFTER the new files land)")
    val priorEntries = store.readString(sub(prior.path, "corpus_files.tsv"))
      .linesIterator.filter(_.nonEmpty).toSeq
    val nowEntries = corpusEntries(corpusPath(dir))
    val changed = changedPriorFiles(priorEntries, nowEntries)
    require(changed.isEmpty,
      s"lex index append: ${changed.size} pre-existing corpus file(s) " +
        s"changed out-of-band (${changed.take(3).mkString(", ")}) — " +
        "rebuild instead of appending onto a stale base")
    val now = Tables.documents(s, dir).count()
    val nNew = newDocs.count()
    require(prior.nDocsAll + nNew == now,
      s"lex index append: prior ${prior.nDocsAll} docs + delta $nNew != " +
        s"corpus $now — out-of-band change detected, rebuild instead")
    val tok = tokenized(newDocs.select("doc_id", "text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dTf = tfOf(tok)
      val dDlen = doclenOf(tok)
      val allTf = prior.postings.select("doc_id", "w", "tf").unionByName(dTf)
      val allDlen = prior.doclen.unionByName(dDlen)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dTotals = dDlen.agg(
          coalesce(sum(when(col("dl") > 0, 1L).otherwise(0L)), lit(0L))
            .as("ntok"),
          coalesce(sum("dl"), lit(0L)).as("ttok")).head()
        val mergedTerms = prior.terms
          .unionByName(dTf.groupBy("w").agg(count(lit(1)).as("df")))
          .groupBy("w").agg(sum("df").as("df"))
        Similarity.IvfIndex.withIndexLock(newPath + ".lock") {
          if (!store.exists(sub(newPath, "meta.tsv"))) {
            if (store.exists(newPath)) store.deleteRecursive(newPath)
            stageAndPublish(s, newPath, allTf, allDlen, nowEntries,
              now, prior.nTok + dTotals.getLong(0),
              prior.tTok + dTotals.getLong(1), prior.buckets,
              termsOverride = Some(mergedTerms))
          }
        }
      } finally { allDlen.unpersist(); () }
    } finally { tok.unpersist(); () }
    // release the superseded handle's persisted sidecars (the
    // DupClusters.append / IvfIndex.append discipline) — the streaming
    // gate appends every micro-batch and would otherwise pin 2 frames per
    // batch until context stop
    prior.terms.unpersist(); prior.doclen.unpersist()
    cache.getOrCompute(s, newPath)(load(s, newPath))
  }

  // ---------------------------------------------------------------- serving

  /** [[TextAnalysis.qT21]] served from the index: pick the 3 df-closest-to-
    * N/2 terms from the TERM-sized sidecar (3-row bounded collect), read
    * ONLY those terms' posting buckets (parquet partition pruning on `wb`),
    * join the node-sized doclen, and score with qT21's exact integer BM25 —
    * identical output, zero corpus passes when warm. */
  def bm25TopDocs(s: SparkSession, dir: String, nTerms: Int = 3,
                  topN: Int = 20): DataFrame = {
    val idx = build(s, dir)
    val n = idx.nTok
    val t = idx.tTok
    // bounded collect: nTerms rows by construction (the query pick)
    val qt = idx.terms
      .orderBy(abs(col("df") * 2 - lit(n)), col("w"))
      .limit(nTerms)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ws = qt.map(_._1).toSeq
    val wbs = bucketsOf(s, ws, idx.buckets)
    val dfMap = typedLit(qt.map { case (w, d) => w -> d }.toMap)
    idx.postings
      .where(col("wb").isin(wbs: _*) && col("w").isin(ws: _*))
      .join(idx.doclen.select("doc_id", "dl"), "doc_id")
      .withColumn("df", element_at(dfMap, col("w")))
      .select(col("doc_id"),
        expr(s"((2 * (CAST($n AS BIGINT) - df) + 1) * 1000) DIV (2 * df + 1)")
          .as("idf_s"),
        expr(s"(22000 * tf * CAST($t AS BIGINT)) DIV " +
          s"(10 * tf * CAST($t AS BIGINT) + 3 * CAST($t AS BIGINT) + " +
          s"9 * dl * CAST($n AS BIGINT))").as("tfpart"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"),
        sum(col("idf_s") * col("tfpart")).as("bm25_s"))
      .orderBy(desc("bm25_s"), col("doc_id"))
      .limit(topN)
  }

  /** USER-SUPPLIED-QUERY BM25 (VERDICT r14 task 3): `bm25TopDocs` derives
    * its terms from the corpus df distribution — self-contained for the
    * oracle, but a RAG consumer has a query STRING. This is that entry
    * point: tokenize `query` with the INDEX's tokenizer (split on single
    * spaces after [[graft.functions.SparkLower]] — the byte-exact mirror
    * of the `split(lower(text), ' ')` the index was built with, so a
    * query term matches its postings byte-for-byte), look the distinct
    * terms up in the TERM-sized sidecar (one bounded ≤|query-terms|-row
    * collect), read ONLY those terms' posting buckets (parquet partition
    * pruning on `wb`), and score with the same exact integer BM25 as
    * [[bm25TopDocs]]. Out-of-vocabulary terms have no postings and
    * contribute nothing — they are skipped, not errored (df = 0 would
    * divide fine but match no rows anyway). A query with NO in-vocabulary
    * terms returns an empty frame, not an error.
    *
    * Scale: identical to [[bm25TopDocs]]'s serving shape — zero corpus
    * passes warm, candidate rows bounded by the query terms' posting
    * lists, TakeOrdered top-N. */
  def bm25ForQuery(s: SparkSession, dir: String, query: String,
                   topN: Int = 20): DataFrame = {
    val idx = build(s, dir)
    val n = idx.nTok
    val t = idx.tTok
    val qTerms = graft.functions.SparkLower(query).split(" ", -1)
      .filter(_.nonEmpty).distinct.toSeq
    // bounded collect: <= |query terms| rows (vocabulary lookup)
    val qt =
      if (qTerms.isEmpty) Array.empty[(String, Long)]
      else idx.terms.where(col("w").isin(qTerms: _*))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    if (qt.isEmpty) {
      import s.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_hit", "bm25_s")
    }
    val ws = qt.map(_._1).toSeq
    val wbs = bucketsOf(s, ws, idx.buckets)
    val dfMap = typedLit(qt.map { case (w, d) => w -> d }.toMap)
    idx.postings
      .where(col("wb").isin(wbs: _*) && col("w").isin(ws: _*))
      .join(idx.doclen.select("doc_id", "dl"), "doc_id")
      .withColumn("df", element_at(dfMap, col("w")))
      .select(col("doc_id"),
        expr(s"((2 * (CAST($n AS BIGINT) - df) + 1) * 1000) DIV (2 * df + 1)")
          .as("idf_s"),
        expr(s"(22000 * tf * CAST($t AS BIGINT)) DIV " +
          s"(10 * tf * CAST($t AS BIGINT) + 3 * CAST($t AS BIGINT) + " +
          s"9 * dl * CAST($n AS BIGINT))").as("tfpart"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"),
        sum(col("idf_s") * col("tfpart")).as("bm25_s"))
      .orderBy(desc("bm25_s"), col("doc_id"))
      .limit(topN)
  }

  /** Declared df bound for [[jaccardTopDocs]] candidate generation (the
    * [[Dedup.MaxDriverPairs]] pattern): tokens with document frequency at
    * most this participate in the candidate join; more frequent
    * (stopword-class) tokens are priced separately — they contribute to
    * candidate SCORES through a candidate-bounded rescore, and can only
    * SELECT candidates through the per-probe exactness fallback. Candidate
    * pair rows are therefore <= (probe tokens) × DfCandCap per probe, by
    * construction, whatever the corpus df distribution. */
  val DfCandCap = 100000L

  /** Test seam (ScaleShapeSpec): the probe ids the LAST [[jaccardTopDocs]]
    * call on this JVM routed through the exactness fallback — lets a spec
    * distinguish "bounded path verified exact" from "everything fell back
    * and the bounded path went untested". Driver-side only. */
  @volatile private[graft] var lastFallbackProbes: Seq[Long] = Nil

  /** [[Similarity.qSim15]]'s lexical lane served from the index: per-probe
    * distinct-token Jaccard rank reconstructed from postings ∩ + the
    * node-sized set-size sidecar — set identities make it bit-equal to
    * intersecting the raw token arrays, with zero corpus passes when warm.
    * Returns (q_id, n_id, r_l <= topR).
    *
    * CANDIDATE-BOUNDED IN df (VERDICT r12 task 2, the PPJoin prefix idea
    * adapted to exact top-R): the candidate join keys only on probe tokens
    * with df <= `dfCap` — pair rows <= Σ_{t ∈ probe, df(t) <= dfCap} df(t)
    * <= |probe| × dfCap per probe, so a stopword-bearing probe can no
    * longer make the posting join corpus-sized. Exactness is preserved in
    * three steps, all decisions made through BOUNDED driver collects:
    *   1. RESCORE — candidates found via sub-cap tokens get their frequent
    *      (df > dfCap) intersections added back by streaming postings
    *      through a broadcast filter on the candidate doc ids, so every
    *      scored jac4 is the full-set value (rows <= candidate-doc tokens
    *      matching frequent probe terms — candidate-bounded, never df-
    *      bounded).
    *   2. UPPER BOUND — a doc sharing ONLY frequent tokens with probe q
    *      has inter <= f_q (q's frequent-token count) and ssn >=
    *      max(ssnMin, inter), so jac4 <= f_q·10⁴ DIV (ssq +
    *      max(ssnMin, f_q) − f_q) =: UB_q (the bound is attained at
    *      inter = f_q; for inter < f_q the expression is dominated —
    *      monotone in inter for feasible ssn).
    *   3. FALLBACK — iff UB_q >= jac4 of q's rank-topR row (kth_q, read
    *      from an nProbes-row bounded collect) a frequent-only doc could
    *      enter q's top-R (ties break by n_id, so >= not >), and ONLY
    *      then does that probe re-run the full-token lane. The fallback
    *      is the price of exact top-R when the rank-topR neighborhood is
    *      stopword-noise; corpora with real near-dup structure have
    *      kth >> UB and never pay it.
    * When no token anywhere exceeds dfCap (one in-memory agg over the
    * persisted term sidecar decides) the plan is EXACTLY the pre-cap
    * candidate-bounded plan — same frames, same hashes, no new work.
    *
    * The "" token split() produces around doubled/leading spaces is
    * re-added from `has_empty` as its own join key (postings never post
    * it, so "" cannot collide with a real term) and df-classified like any
    * term (df("") = corpus has_empty count, from the same bounded scalar
    * job as ssnMin); `inter` is directly |set intersection incl. ""|.
    * Every non-candidate pair has jac4 = 0 and, in the exact ordering
    * (jac4 desc, n_id), the jac4 = 0 region is simply ascending n_id — so
    * when a probe has fewer than topR positive-jac4 candidates the tail is
    * padded from the `topR + 1` globally-smallest doc ids (TakeOrdered,
    * bounded): per padding probe at most n_pos + 1 pool entries are
    * occluded (its own id plus its positives), and n_pos < topR there, so
    * topR + 1 always covers the (topR - n_pos)-row deficit. A max-jac4
    * dedup keeps a pair that is both a positive candidate and a pool row
    * single; positive jac4 then outranks every pad exactly as the full
    * ordering would.
    *
    * Shape: the probe side (its postings rows + sidecar row) is tiny and
    * broadcast; postings stream map-only into a (q, n)-keyed partial-agg
    * shuffle bounded by candidate pairs; per-doc set sizes arrive by an
    * equi-join of that candidate frame against the node-sized doclen; the
    * ranking window partitions are candidate-sized, never corpus-sized —
    * no nested-loop against doclen anywhere (PlanAuditSpec pins it). */
  def jaccardTopDocs(s: SparkSession, dir: String, nProbes: Int = 5,
                     topR: Int = 100, dfCap: Long = DfCandCap): DataFrame = {
    val idx = build(s, dir)
    val probeIds = idx.doclen.where(col("doc_id") < nProbes)
      .select(col("doc_id").as("q_id"),
        (col("nterms") + when(col("has_empty"), 1L).otherwise(0L)).as("ssq"))
    // token streams with "" re-added as a join key (see scaladoc)
    val probeTok = idx.postings.where(col("doc_id") < nProbes)
        .select(col("doc_id").as("q_id"), col("w"))
      .unionByName(idx.doclen
        .where(col("doc_id") < nProbes && col("has_empty"))
        .select(col("doc_id").as("q_id"), lit("").as("w")))
    val corpusTok = idx.postings.select(col("doc_id").as("n_id"), col("w"))
      .unionByName(idx.doclen.where(col("has_empty"))
        .select(col("doc_id").as("n_id"), lit("").as("w")))

    def finish(ranked: DataFrame): DataFrame =
      ranked.select("q_id", "n_id", "r_l")
    lastFallbackProbes = Nil

    // fast path: the whole vocabulary INCLUDING the empty token is
    // sub-cap (one agg over the PERSISTED term sidecar + one over the
    // node-sized doclen, two 1-row bounded collects). The "" token never
    // posts, so its df — the corpus has_empty count — must enter the gate
    // explicitly: a corpus where every real term is sub-cap but many docs
    // carry has_empty would otherwise take the exact plan and fan the ""
    // join key out nProbes × df("") ≈ corpus-sized, violating the
    // DfCandCap bound the cap exists to guarantee.
    val maxDf = idx.maxDf
    val dfEmpty = idx.dfEmpty
    if (math.max(maxDf, dfEmpty) <= dfCap) {
      val pos = exactPos(idx, probeTok, probeIds, corpusTok)
      return finish(rankedTop(idx, pos, probeIds, topR))
    }

    // corpus-min set size (UB's ssn floor) — handle-memoized constant
    val ssnMin = idx.ssnMin

    // per-probe-token df: every REAL probe token is in the term sidecar
    // (the probe is an indexed doc), so an inner join with the probe side
    // broadcast recovers the left join without ever building on the
    // term-sized side; "" (never posted) gets df_empty explicitly
    val probeTokDf = idx.terms.join(broadcast(probeTok.where(col("w") =!= "")), "w")
      .select(col("q_id"), col("w"), col("df").as("dfw"))
      .unionByName(probeTok.where(col("w") === "")
        .select(col("q_id"), col("w"), lit(dfEmpty).as("dfw")))
    // bounded collect: nProbes rows — frequent-token count per probe
    val fCounts: Map[Long, Long] = probeTokDf.groupBy("q_id")
      .agg(coalesce(sum(when(col("dfw") > dfCap, 1L).otherwise(0L)), lit(0L))
        .as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (fCounts.values.forall(_ == 0L)) {
      // frequent terms exist in the corpus but none in the probes — the
      // probe-token join is already sub-cap-bounded as-is
      val pos = exactPos(idx, probeTok, probeIds, corpusTok)
      return finish(rankedTop(idx, pos, probeIds, topR))
    }

    val probeTokRare = probeTokDf.where(col("dfw") <= dfCap)
      .select("q_id", "w")
    val probeTokFreq = probeTokDf.where(col("dfw") > dfCap)
      .select("q_id", "w")
    // candidate pairs: df-bounded by construction; checkpointed because
    // three consumers (ids, rescore filter, score base) reuse it
    val candPairs = broadcast(probeTokRare).join(corpusTok, "w")
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id").agg(count(lit(1)).as("inter_r"))
      .localCheckpoint()
    // exact rescore: frequent-token intersections for candidate docs only
    // — postings stream through a broadcast doc-id filter, so this is
    // candidate-bounded, never df-bounded
    val candIds = candPairs.select("n_id").distinct()
    val interF = broadcast(probeTokFreq)
      .join(corpusTok.join(broadcast(candIds), "n_id"), "w")
      .join(broadcast(candPairs.select("q_id", "n_id")),
        Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id", "n_id").agg(count(lit(1)).as("inter_f"))
    val pos = candPairs.join(interF, Seq("q_id", "n_id"), "left")
      .withColumn("inter", col("inter_r") + coalesce(col("inter_f"), lit(0L)))
      .join(idx.doclen.select(col("doc_id").as("n_id"),
        (col("nterms") + when(col("has_empty"), 1L).otherwise(0L)).as("ssn")),
        "n_id")
      .join(broadcast(probeIds), "q_id")
      .withColumn("jac4", expr("(inter * 10000) DIV (ssq + ssn - inter)"))
      .where(col("jac4") > 0)
      .select("q_id", "n_id", "jac4")
    val ranked = rankedTop(idx, pos, probeIds, topR).localCheckpoint()
    // bounded collects: nProbes rows each — rank-topR score and set size
    val kth: Map[Long, Long] = ranked.where(col("r_l") === topR)
      .select("q_id", "jac4")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ssqs: Map[Long, Long] = probeIds
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fallback: Seq[Long] = fCounts.collect {
      case (q, f) if f > 0L &&
          f * 10000L / (ssqs(q) + math.max(ssnMin, f) - f) >=
            kth.getOrElse(q, 0L) => q
    }.toSeq.sorted
    lastFallbackProbes = fallback
    if (fallback.isEmpty) return finish(ranked)
    // exactness demands the full-token lane for these probes — rare at
    // scale (kth >> UB whenever real near-dup structure exists), and
    // scoped to exactly the probes that need it
    val fbIds = probeIds.where(col("q_id").isin(fallback: _*))
    val fbTok = probeTok.where(col("q_id").isin(fallback: _*))
    val posFull = exactPos(idx, fbTok, fbIds, corpusTok)
    val fullRanked = rankedTop(idx, posFull, fbIds, topR)
    finish(ranked.where(!col("q_id").isin(fallback: _*))
      .unionByName(fullRanked))
  }

  /** The full-token candidate score: every doc sharing >= 1 probe token,
    * jac4 from the posting intersection + node-sized set sizes. Exact but
    * df-UNBOUNDED — [[jaccardTopDocs]] routes through it only when every
    * token is sub-cap or a probe's exactness fallback fires. */
  private def exactPos(idx: Index, probeTok: DataFrame, probeIds: DataFrame,
                       corpusTok: DataFrame): DataFrame =
    broadcast(probeTok)
      .join(corpusTok, "w")
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id").agg(count(lit(1)).as("inter"))
      .join(idx.doclen.select(col("doc_id").as("n_id"),
        (col("nterms") + when(col("has_empty"), 1L).otherwise(0L)).as("ssn")),
        "n_id")
      .join(broadcast(probeIds), "q_id")
      .withColumn("jac4", expr("(inter * 10000) DIV (ssq + ssn - inter)"))
      .where(col("jac4") > 0)
      .select("q_id", "n_id", "jac4")

  /** Shared ranking tail: pad each probe to topR rows from the bounded
    * pool, dedup pair/pool overlap by max-jac4, rank (jac4 desc, n_id).
    * Keeps jac4 in the output (the fallback decision reads the rank-topR
    * score); [[jaccardTopDocs]] projects it away. */
  private def rankedTop(idx: Index, pos: DataFrame, probeIds: DataFrame,
                        topR: Int): DataFrame = {
    // bounded pad pool: the topR+1 smallest doc ids (a TakeOrdered, never
    // a corpus-wide window), keyed on a column-derived constant (pmod(id,1)
    // is 0 for every row but not foldable — a literal key would be
    // constant-folded away, degrading the fan-out to a nested loop) so it
    // stays a broadcast HASH join — no BroadcastNestedLoopJoin in the plan
    val pool = idx.doclen.select(col("doc_id").as("n_id"))
      .orderBy("n_id").limit(topR + 1)
      .withColumn("one", pmod(col("n_id"), lit(1L)))
    val pad = broadcast(probeIds.select("q_id")
        .withColumn("one", pmod(col("q_id"), lit(1L))))
      .join(pool, "one")
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), lit(0L).as("jac4"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
    pos.unionByName(pad)
      .groupBy("q_id", "n_id").agg(max("jac4").as("jac4"))
      .withColumn("r_l", row_number().over(
        w.orderBy(desc("jac4"), col("n_id"))))
      .where(col("r_l") <= topR)
  }

  /** Test hook (ScaleShapeSpec): the df-bounded candidate pair frame for
    * the given cap — the frame whose row count [[DfCandCap]] prices. */
  private[graft] def rareCandidates(s: SparkSession, dir: String,
                                    nProbes: Int, dfCap: Long): DataFrame = {
    val idx = build(s, dir)
    val probeTok = idx.postings.where(col("doc_id") < nProbes)
        .select(col("doc_id").as("q_id"), col("w"))
      .unionByName(idx.doclen
        .where(col("doc_id") < nProbes && col("has_empty"))
        .select(col("doc_id").as("q_id"), lit("").as("w")))
    val corpusTok = idx.postings.select(col("doc_id").as("n_id"), col("w"))
      .unionByName(idx.doclen.where(col("has_empty"))
        .select(col("doc_id").as("n_id"), lit("").as("w")))
    val dfEmpty = idx.dfEmpty
    val probeTokDf = idx.terms
      .join(broadcast(probeTok.where(col("w") =!= "")), "w")
      .select(col("q_id"), col("w"), col("df").as("dfw"))
      .unionByName(probeTok.where(col("w") === "")
        .select(col("q_id"), col("w"), lit(dfEmpty).as("dfw")))
    broadcast(probeTokDf.where(col("dfw") <= dfCap).select("q_id", "w"))
      .join(corpusTok, "w")
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id").agg(count(lit(1)).as("inter_r"))
  }

  /** Test/maintenance hook: drop this session's memoized frames so a fresh
    * [[build]] exercises the durable load path. */
  private[graft] def evictSession(s: SparkSession): Unit =
    cache.evictSession(s)
}
