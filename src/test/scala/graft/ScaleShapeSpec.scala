package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ContainerProps, FileAccount}
import graft.Orchestrator.{Config, migrate}

/** Scale-shape proof for the incremental merge (SURVEY.md §4.2): on a target
  * 10× the sf0.1 documents table, a 1% delta merged in incremental mode must
  * cost a delta-sized fraction of the full-refresh merge — in bytes READ
  * (task input metrics) and in wall-time — and land the identical state.
  * This is the local-mode stand-in for the 100 TB claim: target work scales
  * with the delta and its affected buckets, not with the container.
  */
class ScaleShapeSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "scale-shape")
  val sf = "/root/testdata/sf0.1"

  /** TRUE file bytes read while `body` runs, from the Hadoop local-FS
    * statistics (local[*]: executors share this JVM, so the counter sees
    * every task's reads). Unlike task input metrics this does NOT count
    * cache-block re-reads at their in-memory size — it is the honest
    * "how much of the container did we actually re-read" number. */
  private def measuredFileBytes(body: => Unit): Long = {
    val stats = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    val before = stats.getLong("bytesRead")
    body
    stats.getLong("bytesRead") - before
  }

  test("1% delta on a 10x container: incremental cost scales with the delta") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    graft.functions.GraftFunctions.register(spark)
    val root = Files.createTempDirectory(Paths.get("target"), "scale-shape")

    // 10×-duplicated documents (unique ids via a per-replica offset), as raw
    // JSON lines — ~50k docs
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 400).as("text"))
    val replicas = spark.range(10).select(col("id").as("r"))
    val tenX = docs.crossJoin(replicas)
      .select((col("doc_id") + col("r") * lit(5000000L)).as("id10"),
        col("lang"), col("text"))
    def rawLine(idCol: org.apache.spark.sql.Column, textCol: org.apache.spark.sql.Column) =
      to_json(struct(idCol.cast("string").as("id"),
        col("lang").as("pk"), textCol.as("text")))

    val src = FileAccount(root.resolve("src").toString)
    Files.createDirectories(Paths.get(src.root))
    src.createDatabaseIfAbsent("db")
    src.createContainerIfAbsent("db", "c", ContainerProps(Seq("/pk"), buckets = 2048))
    val srcData = Paths.get(src.root, "db", "c", "data")
    tenX.select(rawLine(col("id10"), col("text")).as("raw"))
      .write.mode("overwrite").text(srcData.toString)

    val tgt = FileAccount(root.resolve("tgt").toString)
    Files.createDirectories(Paths.get(tgt.root))
    val seeded = migrate(spark, src, tgt).results.head
    assert(seeded.verified && seeded.inserted == 50000, seeded.toString)
    val tgtBytes = tgt.dataBytes("db", "c")

    // 1% delta: 500 updated docs (text changed) — a fresh delta-only source
    def deltaSource(tag: String): FileAccount = {
      val d = FileAccount(root.resolve(s"delta-$tag").toString)
      Files.createDirectories(Paths.get(d.root))
      d.createDatabaseIfAbsent("db")
      d.createContainerIfAbsent("db", "c", ContainerProps(Seq("/pk"), buckets = 2048))
      tenX.filter(col("id10") % 100 === 7).limit(500)
        .select(rawLine(col("id10"), concat(col("text"), lit(" [v2]"))).as("raw"))
        .coalesce(1)
        .write.mode("overwrite").text(
          Paths.get(d.root, "db", "c", "data").toString)
      d
    }

    // full-refresh merge of the delta on a CLONE of the target
    val tgtFull = FileAccount(root.resolve("tgt-full").toString)
    Files.createDirectories(Paths.get(tgtFull.root))
    org.apache.commons.io.FileUtils.copyDirectory(
      Paths.get(tgt.root).toFile, Paths.get(tgtFull.root).toFile)
    // build both delta sources OUTSIDE the measured sections (their build
    // reads the parquet corpus)
    val deltaFull = deltaSource("full")
    val deltaInc = deltaSource("inc")

    var fullRes: Orchestrator.ContainerResult = null
    val t0 = System.nanoTime()
    val fullBytes = measuredFileBytes {
      fullRes = migrate(spark, deltaFull, tgtFull,
        Config(incremental = Some(false))).results.head
    }
    val fullSec = (System.nanoTime() - t0) / 1e9

    var incRes: Orchestrator.ContainerResult = null
    val t1 = System.nanoTime()
    val incBytes = measuredFileBytes {
      incRes = migrate(spark, deltaInc, tgt,
        Config(incremental = Some(true))).results.head
    }
    val incSec = (System.nanoTime() - t1) / 1e9

    info(f"full: $fullSec%.1fs ${fullBytes / 1e6}%.1f MB read; " +
      f"incremental: $incSec%.1fs ${incBytes / 1e6}%.1f MB read; " +
      f"target ${tgtBytes / 1e6}%.1f MB")
    assert(fullRes.verified && incRes.verified)
    assert(fullRes.updated == 500 && incRes.updated == 500,
      s"full=$fullRes inc=$incRes")
    assert(incRes.targetCount == fullRes.targetCount)

    // the scale-shape claims (generous bounds):
    //  (a) incremental reads less than ONE container scan — the full path
    //      reads the container several times (classify, expected state,
    //      written-state verify), so this alone separates the modes;
    //  (b) incremental bytes are a delta-sized fraction of full-mode bytes
    //      (500 uniform keys over 2048 buckets touch ≤ ~22% of them);
    //  (c) wall-time follows the bytes.
    assert(incBytes < tgtBytes,
      s"incremental read $incBytes vs container $tgtBytes — full scan detected")
    assert(incBytes < fullBytes / 2,
      s"incremental bytes must scale with the delta: $incBytes vs full $fullBytes")
    assert(incSec < fullSec * 0.8,
      f"incremental wall-time must scale with the delta: $incSec%.1fs vs $fullSec%.1fs")

    // identical final state, mode-independent (order-free content hash)
    def stateHash(acc: FileAccount): Long =
      acc.readRaw(spark, "db", "c")
        .select(xxhash64(col("raw")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(stateHash(tgt) == stateHash(tgtFull), "modes must land identical state")
  }

  test("128-bit gram-hash keying is bit-equal to string keying (q_d16/17/18/19, q_t29, q_t31, q_t32, q_t33)") {
    // VERDICT r11 task 4: the scaladocs' "at 100 TB the join groups by the
    // gram's 128-bit hash" claim, made true: every gram-keyed query has a
    // hash-keyed twin behind -Dgraft.gramHashKeys, pinned here on the test
    // corpus. sf0.001 keeps the pin fast; the forms differ only in key
    // representation, never in dataflow.
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    import graft.operators.{Dedup, TextAnalysis}
    assert(rows(Dedup.qD16Keyed(spark, dir, hashKeys = true)) ==
      rows(Dedup.qD16Keyed(spark, dir, hashKeys = false)), "q_d16 diverged")
    assert(rows(Dedup.qD17Keyed(spark, dir, hashKeys = true)) ==
      rows(Dedup.qD17Keyed(spark, dir, hashKeys = false)), "q_d17 diverged")
    assert(rows(Dedup.qD18Keyed(spark, dir, hashKeys = true)) ==
      rows(Dedup.qD18Keyed(spark, dir, hashKeys = false)), "q_d18 diverged")
    assert(rows(Dedup.qD19Keyed(spark, dir, hashKeys = true)) ==
      rows(Dedup.qD19Keyed(spark, dir, hashKeys = false)), "q_d19 diverged")
    assert(rows(TextAnalysis.qT29Keyed(spark, dir, hashKeys = true)) ==
      rows(TextAnalysis.qT29Keyed(spark, dir, hashKeys = false)), "q_t29 diverged")
    assert(rows(TextAnalysis.qT31Keyed(spark, dir, hashKeys = true)) ==
      rows(TextAnalysis.qT31Keyed(spark, dir, hashKeys = false)), "q_t31 diverged")
    assert(rows(TextAnalysis.qT32Keyed(spark, dir, hashKeys = true)) ==
      rows(TextAnalysis.qT32Keyed(spark, dir, hashKeys = false)), "q_t32 diverged")
    assert(rows(TextAnalysis.qT33Keyed(spark, dir, hashKeys = true)) ==
      rows(TextAnalysis.qT33Keyed(spark, dir, hashKeys = false)), "q_t33 diverged")
    assert(rows(TextAnalysis.qT37Keyed(spark, dir, hashKeys = true)) ==
      rows(TextAnalysis.qT37Keyed(spark, dir, hashKeys = false)), "q_t37 diverged")
    // and the switch actually selects the hash form: its plan groups on
    // xxhash64-derived keys, the string form's does not
    val hashed = Dedup.qD16Keyed(spark, dir, hashKeys = true)
      .queryExecution.optimizedPlan.toString
    assert(hashed.contains("xxhash64"), "hash form must key on xxhash64")
  }

  test("served Jaccard candidate generation is df-bounded: a df=N token never fans out; exactness survives via rescore + UB-checked fallback") {
    // VERDICT r12 task 2: jaccardTopDocs' candidate join must stay bounded
    // under a stopword-bearing probe. Synthetic corpus: 300 docs, one
    // universal token 'the' (df = 300 = N), five parity tokens (df = 150),
    // one unique token per doc (df = 1). Every doc: |set| = 7.
    import graft.operators.LexIndex
    val root = Files.createTempDirectory(Paths.get("target"), "dfcap-corpus")
      .toString
    val idxRoot = Files.createTempDirectory(Paths.get("target"), "dfcap-idx")
      .toString
    val prevRoot = sys.props.get("graft.lexindex.root")
    sys.props("graft.lexindex.root") = idxRoot
    try {
      spark.range(300).selectExpr("id AS doc_id",
        "concat('the x', id % 2, ' y', id % 2, ' z', id % 2, ' w', id % 2," +
          " ' v', id % 2, ' r', id) AS text")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/documents.parquet")
      LexIndex.evictSession(spark)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // default cap: maxDf = 300 <= 100000 → the pre-cap exact plan; pin
      // it against the index-free formulation first
      val exact = rows(LexIndex.jaccardTopDocs(spark, root, 5, 100))
      assert(LexIndex.lastFallbackProbes.isEmpty)
      assert(exact ==
        rows(graft.operators.Similarity.lexLaneDirect(spark, root)),
        "served lane diverged from the index-free oracle")
      // cap = 200 classifies ONLY 'the' as frequent. Each probe then has
      // 149 same-parity candidates (5 shared parity tokens, jac4 =
      // 5*10^4 DIV 9 = 5555) >= topR, so kth = 5555; UB = 1*10^4 DIV
      // (7 + 7 - 1) = 769 < kth → the bounded path must serve WITHOUT
      // fallback and still match bit-for-bit (rescore adds 'the' back
      // into candidate scores)
      val capped = rows(LexIndex.jaccardTopDocs(spark, root, 5, 100,
        dfCap = 200L))
      assert(capped == exact, "df-capped serving diverged")
      assert(LexIndex.lastFallbackProbes.isEmpty,
        "cap=200 must be served by the bounded path, not the fallback")
      // the priced frame: candidate pairs exclude the df=N token entirely —
      // 5 probes x 149 same-parity docs, never 5 x 299
      val cand = LexIndex.rareCandidates(spark, root, 5, dfCap = 200L)
      assert(cand.count() == 5L * 149,
        "candidate pairs must come from sub-cap tokens only")
      assert(cand.where(expr("q_id % 2 <> n_id % 2")).count() == 0,
        "a cross-parity pair can only arise via the df=N token")
      // cap = 10: every SHARED token is frequent → zero candidates → kth
      // from pads = 0 <= UB → the exactness fallback must fire for every
      // probe and reproduce the exact result
      val tiny = rows(LexIndex.jaccardTopDocs(spark, root, 5, 100,
        dfCap = 10L))
      assert(tiny == exact, "fallback serving diverged")
      assert(LexIndex.lastFallbackProbes == Seq(0L, 1L, 2L, 3L, 4L),
        "cap=10 must route every probe through the fallback")
      // degenerate cap = 0: everything frequent, still exact
      assert(rows(LexIndex.jaccardTopDocs(spark, root, 5, 100,
        dfCap = 0L)) == exact, "cap=0 serving diverged")
    } finally {
      prevRoot match {
        case Some(v) => sys.props("graft.lexindex.root") = v
        case None    => sys.props.remove("graft.lexindex.root"); ()
      }
      LexIndex.evictSession(spark)
    }
  }

  test("candidate generators hold their declared bounds over two decades " +
    "(sf0.001 -> sf0.1): q_d16 / q_d14 / q_d10 / q_j6 (VERDICT r14 task 5)") {
    // These four carried the worst 10x slopes in SCALING_SLOPE.json
    // (3.0-3.4x at 10x data) — all documented as candidate-frame growth.
    // This pins the documentation at the NEXT decade, per query's own
    // declared bound. (The testdata decades are uneven: documents grow
    // 10x over sf0.001 -> sf0.1, lineitem/events 100x.)
    val small = "/root/testdata/sf0.001"
    val large = "/root/testdata/sf0.1"
    def docsOf(d: String) = graft.core.Tables.documents(spark, d)
    // q_d16's candidate frame: the per-doc-distinct 8-gram stream (the
    // explode feeding the df count) — linear in token mass by construction
    def d16Cands(d: String): Long = docsOf(d)
      .select(split(lower(col("text")), " ").as("w"))
      .select(explode(when(size(col("w")) >= 8,
          expr("array_distinct(transform(sequence(1, size(w) - 7), " +
            "i -> array_join(slice(w, i, 8), ' ')))"))
        .otherwise(expr("CAST(array() AS array<string>)"))).as("gram"))
      .count()
    // q_d10/q_d14's candidate frame: within-block pairs on the 12-char
    // prefix key, supersized blocks (> MaxBlockSide) SKIPPED — so the
    // declared bound is docs x cap / 2, linear in corpus whatever the
    // prefix distribution. Raw (uncapped) pairs measured alongside: on
    // this corpus they grow ~60x at 10x docs (occupancy-driven, the
    // round-14 slope warning) — exactly why the cap exists.
    def blockSizes(d: String) = docsOf(d)
      .selectExpr("substring(trim(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', '')), 1, 12) AS blk")
      .where(length(col("blk")) > 0)
      .groupBy("blk").agg(count(lit(1)).as("n"))
    def cappedPairs(d: String): Long = blockSizes(d)
      .where(col("n") <= graft.operators.Dedup.MaxBlockSide)
      .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L))).head().getLong(0)
    // q_j6's joined row count IS its output scalar (unique composite key
    // -> one match per row): read it from the query itself
    def j6Rows(d: String): Long =
      graft.operators.Joins.qJ6(spark, d).head().getLong(0)
    val docsS = docsOf(small).count(); val docsL = docsOf(large).count()
    val docRatio = docsL.toDouble / docsS
    val liRatio = graft.core.Tables.lineitem(spark, large).count().toDouble /
      graft.core.Tables.lineitem(spark, small).count()
    val margin = 1.5
    val d16r = d16Cands(large).toDouble / math.max(d16Cands(small), 1L)
    val bpS = cappedPairs(small); val bpL = cappedPairs(large)
    val j6r = j6Rows(large).toDouble / math.max(j6Rows(small), 1L)
    info(f"ratios: docs $docRatio%.1f, lineitem $liRatio%.1f; d16 grams " +
      f"$d16r%.1f; capped block pairs $bpS -> $bpL; j6 rows $j6r%.1f")
    assert(d16r <= margin * docRatio,
      f"q_d16 candidate stream super-linear: $d16r%.1f at $docRatio%.1fx")
    // the declared LINEAR bound: capped pairs <= docs x cap / 2, both SFs
    assert(bpS <= docsS * graft.operators.Dedup.MaxBlockSide / 2 &&
      bpL <= docsL * graft.operators.Dedup.MaxBlockSide / 2,
      s"q_d10/q_d14 capped pairs exceed docs x cap / 2: $bpS / $bpL")
    assert(j6r <= margin * liRatio,
      f"q_j6 join rows super-linear: $j6r%.1f at $liRatio%.1fx")
    // and the cap itself WORKS: a synthetic corpus with one supersized
    // block (shared 12-char prefix) yields zero candidates from it, while
    // a small block still pairs — the skip is the linearity mechanism
    val root = Files.createTempDirectory(Paths.get("target"), "blockcap")
      .toString
    spark.range(graft.operators.Dedup.MaxBlockSide + 40)
      .selectExpr("id AS doc_id",
        // oversized-block docs are IDENTICAL (containment 10000) — if the
        // cap ever stopped skipping them, ~C(1001,2) verified pairs would
        // appear and the forall below would fail loudly
        s"CASE WHEN id < ${graft.operators.Dedup.MaxBlockSide + 1} " +
          "THEN 'aaaabbbbcccc identical oversized block body' " +
          "ELSE concat('ddddeeeeffff small block ', id % 2) END AS text",
        "'en' AS lang", "'web' AS source")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/documents.parquet")
    val pairs = graft.operators.Dedup.qD14(spark, root).collect()
    assert(pairs.nonEmpty, "small block must still produce verified pairs")
    assert(pairs.forall(r => r.getLong(0) > graft.operators.Dedup.MaxBlockSide),
      s"oversized block must be skipped entirely: ${pairs.take(3).toSeq}")
  }

  test("severing chain holds its declared bounds over two decades " +
    "(sf0.001 -> sf0.1): weak/refuted edges linear in the pair graph, " +
    "verdicts cache pair-bounded, reuse delta-bounded (VERDICT r16 task 6)") {
    // The severing cost curve as a SPEC: per corpus state the build pays
    // edit-distance verification on weak (zero-triangle) edges only, the
    // cache is bounded by the live pair set (the r16 vacuum), and an
    // append re-verifies only never-cached weak edges. Pin all three at
    // the next decade so the curve is not just a bench observation.
    val small = "/root/testdata/sf0.001"
    val large = "/root/testdata/sf0.1"
    def shape(d: String): (Long, Long, Long, Long) = {
      val idx = graft.operators.DupClusters.build(spark, d)
      (idx.pairs.count(),
        graft.operators.Dedup.weakEdges(idx.pairs).count(),
        idx.refuted.count(), idx.verdicts.count())
    }
    val (pS, wS, rS, vS) = shape(small)
    val (pL, wL, rL, vL) = shape(large)
    info(s"pairs $pS -> $pL, weak $wS -> $wL, refuted $rS -> $rL, " +
      s"verdicts $vS -> $vL")
    // structural bounds at BOTH scales: refuted <= weak <= pairs, and the
    // cache covers the weak set while never exceeding the pair set
    for ((p, w, r, v) <- Seq((pS, wS, rS, vS), (pL, wL, rL, vL))) {
      assert(r <= w && w <= p, s"refuted $r <= weak $w <= pairs $p")
      assert(w <= v && v <= p, s"weak $w <= verdicts $v <= pairs $p")
    }
    // growth bounds: the verification queue (weak) and the cut-set
    // (refuted) grow no faster than the pair graph, with margin — the
    // linearity that keeps the text-fetch leg graph-sized at 100 TB
    val margin = 1.5
    val pairRatio = pL.toDouble / math.max(pS, 1L)
    assert(wL.toDouble / math.max(wS, 1L) <= margin * pairRatio,
      f"weak edges super-linear in pairs: $wS -> $wL at $pairRatio%.1fx")
    assert(rL.toDouble / math.max(rS, 1L) <= margin * pairRatio,
      f"refuted edges super-linear in pairs: $rS -> $rL at $pairRatio%.1fx")
    // reuse is delta-bounded in COUNT: append an isolated delta and the
    // cache grows by at most the never-cached weak edges (the carry-
    // forward subset law is pinned in DupClustersSpec; this is the
    // arithmetic the cost model depends on)
    val root = Files.createTempDirectory(Paths.get("target"), "sever-scale")
      .toString
    val docs = graft.core.Tables.documents(spark, small)
    docs.where(col("doc_id") < 400)
      .write.parquet(s"$root/documents.parquet")
    val pre = graft.operators.DupClusters.build(spark, root)
    val preVerdicts = pre.verdicts.count()
    val delta = docs.where(col("doc_id") >= 400)
    delta.write.mode("append").parquet(s"$root/documents.parquet")
    val post = graft.operators.DupClusters.append(spark, root, pre,
      delta.select("doc_id", "text"))
    val postWeak = graft.operators.Dedup.weakEdges(post.pairs)
    val neverCached = postWeak.select("a_id", "b_id")
      .join(pre.verdicts.select("a_id", "b_id"), Seq("a_id", "b_id"),
        "left_anti").count()
    assert(post.verdicts.count() <= preVerdicts + neverCached,
      s"append must verify only never-cached weak edges: " +
        s"${post.verdicts.count()} > $preVerdicts + $neverCached")
  }
}
