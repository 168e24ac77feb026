package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{GraftFunctions, Hashing}
import graft.functions.Hashing.md5h32

/** Deduplication operators over `documents` / `embeddings` — the dedup family
  * a training-data pipeline needs (SURVEY.md Q-X5 + the exact / MinHash-LSH /
  * SimHash / n-gram-Jaccard / embedding-cosine extensions).
  *
  * Scale design: signatures (minhash, simhash, fingerprints) are computed as
  * per-row HOF expressions — one corpus scan, zero shuffle, no materialized
  * token table. Pairwise comparison is never all-pairs at scale: the LSH path
  * (qD4) shuffles only (doc, band-key) rows and compares within buckets,
  * which is the standard sub-quadratic route; the all-pairs forms (qD2, qD7)
  * are deliberately bounded (key-range predicates / verified candidate sets)
  * and serve as the oracle-checked exact baselines for LSH recall.
  */
object Dedup {

  /** Q-X5: exact content-hash dedup — distinct canonical-hash count. */
  def qX5(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("count(DISTINCT md5(lower(text))) AS n")

  /** Exact dedup, keep-first: group by canonical hash, keep min doc_id and
    * the duplicate count. Single hash-agg; at 100 TB this is the cheapest
    * dedup and runs map-side-partial first. */
  def qD1(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(expr("md5(lower(text))").as("h"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dups"))
      .select("doc_id", "dups")
      .orderBy("doc_id")

  /** Distinct word-set per document (1-gram shingles). */
  private def wordSets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "array_distinct(split(lower(text), ' ')) AS w")

  /** n-gram Jaccard near-dup pairs (exact, bounded): word-set Jaccard >= 0.9
    * over doc_id < 100. The exact-verification baseline the LSH path (qD4)
    * approximates; unbounded all-pairs is O(n²) and intentionally NOT offered
    * as a scale path. */
  def qD2(s: SparkSession, dir: String): DataFrame = {
    val ws = wordSets(s, dir).where(col("doc_id") < 100)
    val a = ws.select(col("doc_id").as("a_id"), col("w").as("wa"))
    val b = ws.select(col("doc_id").as("b_id"), col("w").as("wb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("jac",
        expr("CAST(size(array_intersect(wa, wb)) AS DOUBLE) / size(array_union(wa, wb))"))
      .where(col("jac") >= 0.9)
      .selectExpr("a_id", "b_id", "ROUND(jac, 4) AS jac")
      .orderBy("a_id", "b_id")
  }

  /** Q-D20 — LSH BAND PLANNING: choose (bands, rows-per-band) for a
    * 4-row MinHash signature FROM MEASUREMENT, not folklore — for each
    * admissible split (1×4, 2×2, 4×1), evaluate the S-curve
    * P(candidate) = 1 − (1 − s^r)^b against the CORPUS'S OWN pair-Jaccard
    * distribution and report measured recall on the target pairs
    * (jac ≥ 0.7) and the false-candidate rate on the rest — the two
    * numbers that price a banding choice (q_d4 hard-codes 2×2; this is
    * the evidence for or against it on a given corpus).
    *
    * Exactness discipline: s = jac4/10000.0 is an exact IEEE division of
    * a small integer; the S-curve is evaluated as explicit left-assoc
    * multiplications (no pow() — library pow may differ in the last ulp
    * between engines), floored to integer ppm PER PAIR, and only integers
    * are summed/divided after that — order-independent, hash-exact.
    *
    * Scale: the pair distribution comes from the declared bounded sample
    * (doc_id < 100, the qD2 baseline bound); a production planner feeds
    * the same math a pair reservoir (e.g. qD13's estimated Jaccards), and
    * everything downstream of the sample is sample-sized — one projection
    * computing all three splits' curves, one aggregate row, a 3-row
    * unpivot. */
  def qD20(s: SparkSession, dir: String): DataFrame = {
    val ws = wordSets(s, dir).where(col("doc_id") < 100)
    val pairs = ws.select(col("doc_id").as("a_id"), col("w").as("wa"))
      .join(ws.select(col("doc_id").as("b_id"), col("w").as("wb")),
        col("a_id") < col("b_id"))
      .selectExpr("(size(array_intersect(wa, wb)) * 10000) DIV " +
        "size(array_union(wa, wb)) AS jac4")
      .selectExpr("jac4", "CAST(jac4 AS DOUBLE) / 10000.0 AS s")
    def curvePpm(b: Int, r: Int): String = {
      val sr = Seq.fill(r)("s").mkString(" * ")
      val miss = Seq.fill(b)(s"(1.0 - ($sr))").mkString(" * ")
      s"CAST(FLOOR((1.0 - ($miss)) * 1000000.0) AS BIGINT)"
    }
    pairs
      .selectExpr("jac4",
        curvePpm(1, 4) + " AS p14",
        curvePpm(2, 2) + " AS p22",
        curvePpm(4, 1) + " AS p41")
      .agg(
        sum(when(col("jac4") >= 7000, 1L).otherwise(0L)).as("nt"),
        sum(when(col("jac4") < 7000, 1L).otherwise(0L)).as("nf"),
        sum(when(col("jac4") >= 7000, col("p14")).otherwise(0L)).as("t14"),
        sum(when(col("jac4") < 7000, col("p14")).otherwise(0L)).as("f14"),
        sum(when(col("jac4") >= 7000, col("p22")).otherwise(0L)).as("t22"),
        sum(when(col("jac4") < 7000, col("p22")).otherwise(0L)).as("f22"),
        sum(when(col("jac4") >= 7000, col("p41")).otherwise(0L)).as("t41"),
        sum(when(col("jac4") < 7000, col("p41")).otherwise(0L)).as("f41"))
      // NULLIF (ADVICE r12): a bounded sample can legitimately hold zero
      // pairs at/above (or below) the 0.7 target — the NULL row is then a
      // DELIBERATE "no evidence for this class" signal (and ANSI-safe),
      // not an accidental divide-by-zero artifact.
      .selectExpr("stack(3, " +
        "1L, 4L, nt, nf, t14 DIV NULLIF(nt, 0L), f14 DIV NULLIF(nf, 0L), " +
        "2L, 2L, nt, nf, t22 DIV NULLIF(nt, 0L), f22 DIV NULLIF(nf, 0L), " +
        "4L, 1L, nt, nf, t41 DIV NULLIF(nt, 0L), f41 DIV NULLIF(nf, 0L)" +
        ") AS (bands, rows_per_band, n_target, n_other, recall_ppm, false_cand_ppm)")
      .orderBy("bands")
  }

  /** Distinct word-3-gram shingle set per document, via the codegen'd
    * [[graft.functions.WordShingles]] expression (one virtual call per row
    * inside the whole-stage span). Semantically identical to the composable
    * built-in form — `array_distinct` over space-joined 3-grams of
    * `split(lower(text), ' ')` — but that form needs two nested `zip_with`
    * lambdas which evaluate interpreted per element: measured ~2× slower
    * steady-state and ~4× slower on first run (nested-HOF codegen compile)
    * at sf0.1. Docs shorter than 3 words get an empty set. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "word_shingles(text, 3) AS g")
      .where(size(col("g")) > 0)
  }

  /** MinHash signatures (k=4 permutations over 3-gram shingles), via the
    * fused [[graft.functions.MinhashSig]] kernel: shingle + hash + the 4
    * permutation minima in ONE codegen'd pass per document — a map-only
    * projection with NO explode generator and NO aggregation (the previous
    * explode → md5 → 33-column partial agg shape shuffled (doc_id, 4 longs)
    * per document; this shuffles nothing). Zero-shingle docs return null
    * and are filtered, matching the explode form's dropped groups. */
  private[operators] def minhashSig(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "minhash_sig(text, 3) AS ms")
      .where(col("ms").isNotNull)
      .selectExpr("doc_id", "ms.m1 AS m1", "ms.m2 AS m2", "ms.m3 AS m3", "ms.m4 AS m4")
  }

  /** MinHash signature query (oracle-checked form of the signature math). */
  def qD3(s: SparkSession, dir: String): DataFrame =
    minhashSig(s, dir).orderBy("doc_id")

  /** MinHash-LSH near-dup pairs: band the 4-row signature into 2 bands of 2,
    * self-join on the (band, key) bucket — (doc, band) rows, never n² — then
    * exact-verify candidates with true shingle Jaccard.
    *
    * Single-tokenize shape (the r2 verdict's ask — this query used to run
    * three corpus tokenizes): the corpus is tokenized+hashed exactly once,
    * inside the fused [[graft.functions.MinhashSig]] kernel — a map-only
    * projection, no explode, no aggregation shuffle. Both sides of the band
    * self-join are the SAME exploded-bands subtree, so ReuseExchange
    * collapses them onto one signature pipeline (see the explode comment
    * below — a union of two projections defeats this). Verification then
    * flows FORWARD: the (small) candidate set broadcasts into two
    * equi-joins against `documents`, and `word_shingles` runs only on the
    * matched rows — so the two verify passes cost two column scans plus
    * candidate-only tokenize work, not two more full-corpus tokenizes. The
    * only all-rows shuffle is the (band, key) bucket join, carrying
    * (doc_id, band key) rows. */
  def qD4(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(s, dir)
    // both band rows come from ONE signature row via explode — a union of
    // two projections over `sig` lets column pruning specialize each
    // branch's partial aggregate (branch 1 aggregates only m1/m2, branch 2
    // only m3/m4), which defeats exchange reuse and runs the corpus
    // tokenize twice
    val bands = sig.selectExpr("doc_id",
      """explode(array(
        |  named_struct('band', 1, 'bk', concat(m1, '_', m2)),
        |  named_struct('band', 2, 'bk', concat(m3, '_', m4)))) AS b""".stripMargin)
      .selectExpr("doc_id", "b.band AS band", "b.bk AS bk")
    // merge hint, not AQE's choice: the bands frame is O(corpus), so at
    // scale it must never be the build side of a broadcast — and at ANY
    // scale the SMJ shape makes both sides identical shuffle subtrees, so
    // ReuseExchange computes the signature pass ONCE (a broadcast build
    // side would re-run it for the broadcast payload)
    val cand = bands.as("x").hint("merge").join(bands.as("y"),
        expr("x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id"))
      .selectExpr("x.doc_id AS a_id", "y.doc_id AS b_id")
      .distinct()
    // verification: each side broadcasts ONLY the bare (a_id, b_id) pairs
    // into `documents` — never the shingle arrays (a candidate set carrying
    // whole-document shingles through the driver can blow the broadcast
    // limit on a dense corpus); the shingle-bearing sides then meet in an
    // equi-join on the pair key, which shuffles candidate-bounded rows and
    // AQE broadcasts only if their MEASURED size is small
    val withGa = Tables.documents(s, dir)
      .join(broadcast(cand), col("doc_id") === col("a_id"))
      .selectExpr("a_id", "b_id", "word_shingles(text, 3) AS ga")
    val withGb = Tables.documents(s, dir)
      .join(broadcast(cand), col("doc_id") === col("b_id"))
      .selectExpr("a_id AS a2", "b_id AS b2", "word_shingles(text, 3) AS gb")
    withGa.join(withGb, col("a_id") === col("a2") && col("b_id") === col("b2"))
      .withColumn("jac",
        expr("CAST(size(array_intersect(ga, gb)) AS DOUBLE) / size(array_union(ga, gb))"))
      .selectExpr("a_id", "b_id", "ROUND(jac, 4) AS jac")
      .orderBy("a_id", "b_id")
  }

  /** Q-D13 — MinHash ESTIMATOR ERROR audit: for every LSH candidate pair
    * ([[qD4]]'s band-bucket set), the signature-estimated Jaccard (matched
    * permutation minima / k, the unbiased MinHash estimator) side-by-side
    * with the exact shingle Jaccard, and their absolute error — all in
    * integer permyriad. The estimator-quality audit run before trusting
    * signature-only pipelines (the [[TextAnalysis.qT13]] confusion-matrix
    * pattern applied to the dedup family: measure the proxy against truth
    * on THIS corpus, then decide whether k=4 permutations suffice or the
    * signature needs widening).
    *
    * Scale: identical shape to qD4's verify — bare candidate pairs
    * broadcast into `documents`, signature + shingles computed ONLY on
    * matched rows, the two sides meet in a candidate-bounded equi-join.
    * Integer permyriad arithmetic end-to-end (matches are counted, never
    * averaged as floats), so the oracle replays it exactly. */
  def qD13(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(s, dir)
    val bands = sig.selectExpr("doc_id",
      """explode(array(
        |  named_struct('band', 1, 'bk', concat(m1, '_', m2)),
        |  named_struct('band', 2, 'bk', concat(m3, '_', m4)))) AS b""".stripMargin)
      .selectExpr("doc_id", "b.band AS band", "b.bk AS bk")
    val cand = bands.as("x").hint("merge").join(bands.as("y"),
        expr("x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id"))
      .selectExpr("x.doc_id AS a_id", "y.doc_id AS b_id")
      .distinct()
    val docs = Tables.documents(s, dir)
    val withA = docs.join(broadcast(cand), col("doc_id") === col("a_id"))
      .selectExpr("a_id", "b_id", "minhash_sig(text, 3) AS sa",
        "word_shingles(text, 3) AS ga")
    val withB = docs.join(broadcast(cand), col("doc_id") === col("b_id"))
      .selectExpr("a_id AS a2", "b_id AS b2", "minhash_sig(text, 3) AS sb",
        "word_shingles(text, 3) AS gb")
    withA.join(withB, col("a_id") === col("a2") && col("b_id") === col("b2"))
      .selectExpr("a_id", "b_id",
        """CAST((CASE WHEN sa.m1 = sb.m1 THEN 2500 ELSE 0 END)
          |   + (CASE WHEN sa.m2 = sb.m2 THEN 2500 ELSE 0 END)
          |   + (CASE WHEN sa.m3 = sb.m3 THEN 2500 ELSE 0 END)
          |   + (CASE WHEN sa.m4 = sb.m4 THEN 2500 ELSE 0 END) AS BIGINT) AS est_e4""".stripMargin,
        "CAST((size(array_intersect(ga, gb)) * 10000) DIV size(array_union(ga, gb)) AS BIGINT) AS jac_e4")
      .withColumn("err_e4", abs(col("est_e4") - col("jac_e4")))
      .orderBy("a_id", "b_id")
  }

  /** Declared occupancy cap for the blocking-key candidate generators
    * ([[qD10]] / [[qD14]]) — the [[graft.operators.LexIndex.DfCandCap]]
    * analog for blocks: a block with MORE members than this is skipped
    * entirely (standard record-linkage supersized-block practice — a
    * 12-char prefix shared by 10⁵ documents is boilerplate, and its
    * C(n,2) pairs would be the quadratic term that kills the run). With
    * the cap, candidate pairs are ≤ docs × cap / 2 — LINEAR in corpus
    * size with a declared constant, whatever the prefix distribution
    * (ScaleShapeSpec pins both the skip and the bound; the observed sf
    * max block is 13, so sf-scale results are unchanged and the oracle
    * replays the same rule). */
  val MaxBlockSide = 1000L

  /** The shared [[qD10]]/[[qD14]] doc frame: normalized 12-char blocking
    * key + distinct word set, with supersized blocks (> [[MaxBlockSide]])
    * removed — one map-combined block-count agg (block-count-sized
    * output) and a broadcast anti-join against the near-empty oversized
    * set. */
  private def blockedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).selectExpr(
        "doc_id",
        "substring(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '')), 1, 12) AS blk",
        "array_distinct(split(lower(text), ' ')) AS w")
      .where(length(col("blk")) > 0)
    val oversized = docs.groupBy("blk").agg(count(lit(1)).as("n"))
      .where(col("n") > MaxBlockSide).select("blk")
    docs.join(broadcast(oversized), Seq("blk"), "left_anti")
  }

  /** Within-block candidate pairs (a_id < b_id) with both word sets and
    * the exact intersection size — the [[qD10]]/[[qD14]] candidate
    * generator, restructured in the round-19 optimization pass from a
    * blk-keyed SELF-JOIN (two exchanges of the word-set-bearing frame +
    * a sort-merge sort per side) to ONE exchange: group the capped blocks
    * (collect_list is bounded by [[MaxBlockSide]] members per row, the
    * cap the anti-join above enforces BEFORE anything shuffles) and
    * explode the member list twice to enumerate ordered pairs in-row.
    * Same candidate set, same verification arithmetic, half the shuffled
    * bytes and one less sort (guide §2.4 "remove shuffles outright").
    * |A∪B| is derived as |A|+|B|−|A∩B| (both sides are array_distinct),
    * which drops the second O(n·m) array walk per pair. */
  private def blockPairs(s: SparkSession, dir: String): DataFrame =
    blockedDocs(s, dir)
      .groupBy("blk").agg(collect_list(struct(col("doc_id"), col("w"))).as("m"))
      .where(size(col("m")) >= 2)
      .select(explode(col("m")).as("x"), col("m"))
      .select(col("x.doc_id").as("a_id"), col("x.w").as("wa"),
        explode(col("m")).as("y"))
      .where(col("a_id") < col("y.doc_id"))
      .select(col("a_id"), col("y.doc_id").as("b_id"), col("wa"),
        col("y.w").as("wb"))
      .withColumn("inter", expr("size(array_intersect(wa, wb))"))

  /** Q-D10 — BLOCKING-KEY dedup, the third candidate-generation technique
    * next to MinHash-LSH (qD4) and SimHash bands (qD6): the block key is
    * the first 12 characters of the normalized text, candidates are pairs
    * sharing a block, verification is exact word-set Jaccard. Classic
    * record-linkage blocking — cheaper than LSH (no signature pass; one
    * narrow key projection) but blind to edits inside the prefix, which is
    * why an engine carries BOTH. Scale: the candidate generator shuffles
    * once on the block key ([[blockPairs]]) — work is Σ per-block C(n,2)
    * with blocks capped at [[MaxBlockSide]] (supersized blocks skipped —
    * see the cap's scaladoc), so candidates are ≤ docs × cap / 2: linear
    * in corpus, never corpus². */
  def qD10(s: SparkSession, dir: String): DataFrame =
    blockPairs(s, dir)
      .withColumn("jac",
        expr("CAST(inter AS DOUBLE) / (size(wa) + size(wb) - inter)"))
      .where(col("jac") >= 0.9)
      .selectExpr("a_id", "b_id", "ROUND(jac, 4) AS jac")
      .orderBy("a_id", "b_id")

  /** SimHash-32 per document: majority vote per bit over the md5-hashes of
    * the token stream (duplicates count — frequency weights the vote), via
    * the fused [[graft.functions.Simhash32]] kernel: tokenize + hash + the
    * 32 bit votes in ONE codegen'd pass per document — a map-only
    * projection, no explode, no aggregation shuffle (the previous shape
    * shuffled (doc_id, 33 longs) per document through a partial agg). */
  private[graft] def simhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "simhash32(text) AS simhash")
      .where(col("simhash").isNotNull)
  }

  /** SimHash signature query (oracle-checked form of the signature math). */
  def qD5(s: SparkSession, dir: String): DataFrame =
    simhash(s, dir).orderBy("doc_id")

  /** SimHash near-dup pairs: Hamming distance <= 2 on the 32-bit signature.
    *
    * EXACT and sub-quadratic by pigeonhole: the 32 bits split into 3 bands
    * (11+11+10); a pair at distance <= 2 differs in at most 2 bands, so it
    * shares at least one band — the band-bucket join is a COMPLETE candidate
    * set, and candidates are then verified with the exact bit_count. Same
    * shape as the MinHash LSH join (qD4) but with zero recall loss. At scale
    * the shuffle key is (band, value): cardinality 3×2^11 here, widened by
    * taking more/wider bands as the corpus grows; AQE splits hot buckets. */
  def qD6(s: SparkSession, dir: String): DataFrame =
    pairsOfSigs(simhash(s, dir))

  /** The [[qD6]] band join over ANY (doc_id, simhash) frame — factored so
    * [[DupClusters]] can mine pairs from a persisted signature frame (build:
    * one corpus pass feeds both the stored sigs and the pair mining) and
    * from signature DELTAS on append. Semantics identical to qD6. */
  private[graft] def pairsOfSigs(sigs: DataFrame): DataFrame = {
    val sh = sigs.selectExpr("doc_id", "simhash",
      "simhash & 2047 AS v0", "(simhash >> 11) & 2047 AS v1",
      "(simhash >> 22) & 1023 AS v2")
    val bands = sh.selectExpr("doc_id", "simhash",
      "stack(3, 0, v0, 1, v1, 2, v2) AS (band, bv)")
    val a = bands.selectExpr("doc_id AS a_id", "simhash AS sa", "band", "bv")
    val b = bands.selectExpr("doc_id AS b_id", "simhash AS sb",
      "band AS band_b", "bv AS bv_b")
    a.hint("merge").join(b, col("band") === col("band_b") && col("bv") === col("bv_b") &&
        col("a_id") < col("b_id"))
      // verify BEFORE deduplicating candidates: bit_count is a per-row
      // codegen'd op, so filtering first shrinks the distinct's shuffle to
      // surviving pairs only (a pair colliding in >1 band is verified once
      // per collision — 3 cheap popcounts at most — instead of shipping
      // every band-collision pair through the exchange)
      .withColumn("ham", expr("bit_count(sa ^ sb)"))
      .where(col("ham") <= 2)
      .selectExpr("a_id", "b_id", "CAST(ham AS INT) AS ham")
      .distinct() // pairs sharing >1 band
      .orderBy("a_id", "b_id")
  }

  /** Q-D11 — EDIT-DISTANCE verified near-dups: the SimHash pigeonhole
    * candidates ([[qD6]], complete for Hamming <= 2) re-verified with true
    * Levenshtein distance on the raw text — the character-level verifier a
    * plagiarism/near-dup pipeline runs where token-set Jaccard is too
    * coarse (it is blind to word-internal edits and to ordering).
    * Same forward-flow shape as qD4's verify: the bare candidate pairs
    * broadcast into `documents`, the text-bearing sides meet in a
    * candidate-bounded equi-join, and the O(len²) edit-distance kernel
    * runs ONLY on matched pairs — never corpus². */
  def qD11(s: SparkSession, dir: String): DataFrame = {
    // candidates come from the durable [[DupClusters]] artifact — warm runs
    // skip the signature + band-join mining entirely and pay only the two
    // candidate-bounded text joins below
    val cand = DupClusters.build(s, dir).pairs.select("a_id", "b_id")
    val docs = Tables.documents(s, dir)
    // CHAINED text fetch, not two independent doc⋈cand joins: the candidate
    // frame broadcasts into documents for side-a text, and that (still
    // candidate-bounded) result broadcasts into documents again for side-b —
    // so the qD6 candidate pipeline (simhash + band join) appears ONCE in
    // the plan instead of once per reference, and documents is only ever
    // the streamed side of a map-only broadcast join. Candidate generation
    // is the dominant stage at scale; this halves it.
    val withA = docs.join(broadcast(cand), col("doc_id") === col("a_id"))
      .selectExpr("a_id", "b_id", "text AS ta")
    docs.join(broadcast(withA), col("doc_id") === col("b_id"))
      .selectExpr("a_id", "b_id", "ta", "text AS tb")
      // two-stage verify, both exact: |len(a)−len(b)| lower-bounds the edit
      // distance (each length unit needs >= 1 edit), so the O(1) length
      // gate discards most candidates before the DP; the survivors run the
      // THRESHOLD form of levenshtein, whose banded DP costs O(len × 30)
      // instead of O(len²) and returns the exact distance whenever it is
      // <= 30 (the only rows kept) — measured ~13x on the sf0.1 candidates
      .where(abs(length(col("ta")) - length(col("tb"))) <= 30)
      .withColumn("dist", levenshtein(col("ta"), col("tb"), 30))
      .where(col("dist") >= 0 && col("dist") <= 30)
      .selectExpr("a_id", "b_id", "CAST(dist AS BIGINT) AS dist")
      .orderBy("a_id", "b_id")
  }

  /** q_d12 — chunk-level EXACT dedup profile (the Dolma/FineWeb
    * "paragraph dedup" pass, over fixed windows since the corpus carries no
    * paragraph breaks): per document, how many of its 200-char chunks occur
    * verbatim anywhere else in the corpus. Doc-level exact dedup (qD1)
    * misses boilerplate REUSE inside otherwise-distinct documents; this is
    * the standard sub-document complement, and its dup fraction is a
    * curation signal (drop or rewrite high-dup docs before training).
    *
    * Scale: chunks project to (doc_id, md5) BEFORE any exchange, so the
    * hash-partitioned occurrence count shuffles ~48-byte rows, never text;
    * the per-doc rollup is the second and last exchange. Full-width md5
    * (not a 32-bit fold) keeps collisions negligible at 100 TB chunk
    * counts. Both stages partial-aggregate map-side. */
  def qD12(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    Tables.documents(s, dir)
      .selectExpr("doc_id", "text",
        "explode(sequence(1, greatest(length(text), 1), 200)) AS st")
      .selectExpr("doc_id", "md5(substring(text, st, 200)) AS h")
      .withColumn("c", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1L, 1L).otherwise(0L)).as("dup_chunks"))
      .orderBy("doc_id")
  }

  /** Q-D14 — CONTAINMENT-verified near-dups: [[qD10]]'s blocking-key
    * candidates re-verified with the ASYMMETRIC overlap
    * |A∩B| / min(|A|,|B|) instead of Jaccard. Jaccard is blind to
    * length-mismatched duplication — a document wholly quoted inside one
    * 3× its size scores jac ≈ 1/3 and survives every symmetric threshold —
    * while containment scores it ~1.0; this is the Broder containment
    * variant a curation pipeline runs to catch quote-expansion and
    * boilerplate-wrapping dups. Emits candidate pairs with containment
    * ≥ 0.9 alongside their Jaccard, both as integer-DIV e4 fixed-point
    * (engine-exact, no float); the rows where cont_e4 is high and jac_e4
    * low are exactly the dups qD10's own threshold misses.
    *
    * Scale: identical shape to qD10 — [[blockPairs]]' one block-key
    * exchange, per-block-squares work, never corpus²; the containment
    * arithmetic is per-matched-row codegen. */
  def qD14(s: SparkSession, dir: String): DataFrame =
    blockPairs(s, dir)
      .withColumn("cont_e4",
        expr("(inter * 10000) DIV least(size(wa), size(wb))"))
      .where(col("cont_e4") >= 9000)
      .selectExpr("a_id", "b_id", "CAST(cont_e4 AS BIGINT) AS cont_e4",
        "CAST((inter * 10000) DIV (size(wa) + size(wb) - inter) AS BIGINT) AS jac_e4")
      .orderBy("a_id", "b_id")

  /** Q-G1 — degree histogram of the SimHash near-dup graph ([[qD6]]):
    * (degree, node count) rows — the first diagnostic a dedup-graph run
    * reads (a heavy-tailed degree histogram means a hub document, usually
    * boilerplate, about to glue unrelated clusters together). One shuffle
    * to count degrees, one metadata-sized shuffle to histogram them. */
  def qG1(s: SparkSession, dir: String): DataFrame = {
    val e = DupClusters.build(s, dir).pairs
    e.select(col("a_id").as("id")).unionAll(e.select(col("b_id").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  // (The former withPersistedEdges helper is gone: every qG* diagnostic now
  // reads the qD6 graph from the durable [[DupClusters]] artifact, whose
  // pair frame is persisted + materialized once per session — the
  // multi-branch reuse those queries needed is the artifact's contract,
  // and candidate generation runs once per CORPUS STATE, not per query.)

  /** Q-G2 — TRIANGLE COUNT of the SimHash near-dup graph: each triangle
    * a<b<c found once by joining its canonically-oriented edges
    * (ab ⋈ bc on the shared middle node, closed by ac) — the standard
    * edge-join formulation, shuffling edge-sized frames on single node
    * keys. Triangle density distinguishes genuine dup CLUSTERS (cliques →
    * many triangles) from chain-shaped false-positive paths (none), the
    * cheap structural check before trusting components (qD9). */
  def qG2(s: SparkSession, dir: String): DataFrame = {
    val e = DupClusters.build(s, dir).pairs
      .select(col("a_id").as("u"), col("b_id").as("v"))
    val ab = e.selectExpr("u AS a", "v AS b")
    val bc = e.selectExpr("u AS b2", "v AS c")
    val ac = e.selectExpr("u AS a3", "v AS c3")
    ab.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** Q-G5 — GLOBAL CLUSTERING COEFFICIENT of the dup graph:
    * 3·triangles / open-triads, in integer e4 fixed point. The one-number
    * answer to [[qG2]]'s question — near 1.0 the candidate graph is
    * clique-shaped (true duplicate families, safe to keep-one-per-
    * cluster), near 0 it is chain/star-shaped (transitive false positives
    * stitching unrelated docs, where collapsing a component would destroy
    * data). Triads reduce from the degree frame (Σ deg·(deg−1)/2, node-
    * sized); triangles reuse the canonical edge-join; both are metadata-
    * sized aggs over edge-sized shuffles — nothing new materializes at
    * 100 TB beyond what qG1/qG2 already pay. */
  def qG5(s: SparkSession, dir: String): DataFrame = {
    val e = DupClusters.build(s, dir).pairs
      .select(col("a_id").as("u"), col("b_id").as("v"))
    val deg = e.selectExpr("u AS id").unionAll(e.selectExpr("v AS id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val triads = deg.agg(
      sum(expr("deg * (deg - 1)")).as("t2")) // 2×triads, avoids the /2
    val ab = e.selectExpr("u AS a", "v AS b")
    val bc = e.selectExpr("u AS b2", "v AS c")
    val ac = e.selectExpr("u AS a3", "v AS c3")
    val tri = ab.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("triangles"))
    tri.crossJoin(broadcast(triads))
      .selectExpr("triangles",
        "CAST(t2 DIV 2 AS BIGINT) AS triads",
        // 3T/triads in e4: (6T·10000) DIV (2·triads) keeps it integral
        "CASE WHEN t2 = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (triangles * 6 * 10000) DIV t2 END AS coeff_e4")
  }

  /** Q-G3 — component SIZE histogram over the dup clusters ([[qD9]]):
    * (cluster size, cluster count) rows — the distribution a dedup run
    * reports ("mostly pairs, a few 30-doc boilerplate families"), and the
    * number that decides keep-one-per-cluster savings. Two metadata-sized
    * aggregations over the component map. */
  def qG3(s: SparkSession, dir: String): DataFrame =
    qD9(s, dir)
      .groupBy("component").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_components"))
      .orderBy("csize")

  /** Lineage truncation for the iterative BSP loops ([[pageRank]],
    * [[labelProp]], [[qG7]]'s peel, [[starComponents]],
    * [[labelComponents]]) — THE FAULT-TOLERANCE TRADE, made explicit:
    *
    *  - Default: eager `localCheckpoint` — blocks live UNREPLICATED on the
    *    executors that computed them. Fastest (no extra write), and
    *    correct lineage truncation — but on a real cluster an executor
    *    loss mid-iteration FAILS THE JOB (the truncated lineage cannot
    *    recompute the lost blocks). Fine on local[n] and for short loops;
    *    at 100 TB with hours-long iterations it is a availability bet.
    *  - `spark.graft.checkpointDir=<fault-tolerant URI>` (session conf):
    *    each round writes a RELIABLE checkpoint to that store instead —
    *    an executor loss recomputes from the checkpoint files, the job
    *    survives. Costs one distributed write per round, and checkpoint
    *    files outlive `unpersist()` (they are files, not blocks): they are
    *    reclaimed at context stop, or per-reference when
    *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
    *
    * The SparkContext checkpoint dir is process-global and set on first
    * use; `Dataset.checkpoint` requires it. */
  private[graft] def truncate(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }

  /** Delete the RELIABLE checkpoint files behind a [[truncate]]d frame
    * (ADVICE r10: unlike localCheckpoint BLOCKS, reliable checkpoints are
    * FILES — `unpersist` never reclaims them, and without
    * `spark.cleaner.referenceTracking.cleanCheckpoints` they accumulate
    * one `rdd-*` directory per round per loop until context stop). The
    * BSP loops call this on round i's frame once round i+1 has
    * materialized — mirroring the `prevCkpt.unpersist` discipline — so a
    * long-lived session iterating many corpus states holds at most the
    * live round's files per loop. No-op in localCheckpoint mode
    * (`getCheckpointFile` is None for local checkpoints). Failures are
    * stderr-visible, never fatal: leaking a directory beats failing a
    * converging loop. */
  private[graft] def dropCheckpointFiles(df: DataFrame): Unit = {
    val files = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile
    }.flatten
    if (files.nonEmpty) {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      files.foreach { f =>
        try {
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).delete(p, true); ()
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"checkpoint cleanup: failed to delete $f: $e") }
      }
    }
  }

  /** PageRank damping split and per-node starting mass for [[qG4]], in
    * integer micro-units: rank(0) = 1e6; rank(i+1) = (1−d)·1e6 + d·Σ
    * contributions, with d = 85/100 applied as integer `DIV` — every
    * operation is exact integer arithmetic, so the oracle replays it
    * bit-for-bit (transcendental-free, the qT9 idf lesson). */
  val PageRankIters = 3

  /** Q-G4 — PAGERANK CENTRALITY over the SimHash near-dup graph ([[qD6]]):
    * which documents does duplication structurally concentrate on? Degree
    * (qG1) counts direct copies; PageRank also weights WHO the copiers
    * are, surfacing the template/boilerplate ancestors that glue clusters
    * — the ranking a curation run uses to pick the canonical survivor per
    * family. Fixed [[PageRankIters]] synchronous iterations of the
    * power method in integer micro-units (floor-div contributions), the
    * deterministic form of the float recurrence.
    *
    * Scale: the edge frame persists once (MEMORY_AND_DISK — at 100 TB the
    * iteration input must not recompute the signature+band join per
    * round); each iteration is one edge-sized equi-join on the source key
    * plus one node-sized hash agg on the destination — the canonical BSP
    * step, O(iters × |E|) total with no driver-side data movement. The
    * symmetric dup graph has no dangling nodes (every node has in- and
    * out-edges by construction), so no dangling-mass redistribution term
    * is needed. */
  def qG4(s: SparkSession, dir: String): DataFrame =
    // the ranks ARE the artifact: clusters/ stores the [[pageRank]]
    // recurrence's result per graph node, so a warm run is one graph-sized
    // parquet read — the recurrence runs once per corpus state, in the
    // [[DupClusters]] build
    DupClusters.build(s, dir).clusters
      .selectExpr("id AS doc_id", "rank_e6").orderBy("doc_id")

  /** Bounded limit-collect of a canonical 2-column pair frame: Some(edges)
    * iff it holds ≤ maxPairs rows — the [[componentsOfPairs]] declared-bound
    * discipline shared by every driver fast path in this file. The collect
    * can never be corpus-sized (limit+1 rows max); 0 disables the fast
    * path, which specs use to pin the distributed loops EQUAL. */
  private def boundedEdges(pairGraph: DataFrame,
                           maxPairs: Int): Option[Array[(Long, Long)]] = {
    if (maxPairs <= 0) None
    else {
      val head = pairGraph.limit(maxPairs + 1).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      if (head.length <= maxPairs) Some(head) else None
    }
  }

  /** The iteration core of [[qG4]] over any canonical (a, b) pair frame —
    * symmetrizes the edges and runs `iters` rounds of the integer
    * recurrence. HYBRID by declared bound like [[componentsOfPairs]]:
    * under [[MaxDriverPairs]] edges the recurrence replays on the driver
    * in microseconds (every operation is exact integer arithmetic, so the
    * two paths are bit-equal — spec-pinned); above it, the distributed
    * BSP loop (persisted edge/degree frames, one edge-sized join + one
    * node-sized agg per round). Spec-testable on synthetic graphs. */
  def pageRank(pairGraph: DataFrame, iters: Int,
               maxDriverPairs: Int = MaxDriverPairs): DataFrame = {
    val a = pairGraph.columns(0); val b = pairGraph.columns(1)
    // the pair frame feeds the bound check AND both symmetrization
    // branches — persist it first or the candidate generation upstream
    // (the simhash band join, for qG4) is computed once per reader. Same
    // borrow discipline as [[componentsOfPairs]]: a frame the caller
    // persisted stays theirs.
    val borrowed = pairGraph.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val pairs =
      if (borrowed) pairGraph
      else pairGraph.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    boundedEdges(pairs.select(a, b), maxDriverPairs) match {
      case Some(es) =>
        try driverPageRank(pairs.sparkSession, es, iters)
        finally { if (!borrowed) { pairs.unpersist() }; () }
      case None => distributedPageRank(pairs, a, b, iters, borrowed)
    }
  }

  /** Driver replay of the [[pageRank]] recurrence over a bounded edge list
    * — same integer ops in the same structure (floor-div contributions per
    * source, damped sum per destination), so results are bit-equal to the
    * distributed loop. */
  private def driverPageRank(s: SparkSession, es: Array[(Long, Long)],
                             iters: Int): DataFrame = {
    import scala.collection.mutable
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    def add(u: Long, v: Long): Unit = {
      adj.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v; ()
    }
    es.foreach { case (u, v) => add(u, v); add(v, u) }
    var r = mutable.LongMap.empty[Long]
    adj.foreachKey(k => r(k) = 1000000L)
    for (_ <- 1 to iters) {
      val nxt = mutable.LongMap.empty[Long]
      adj.foreach { case (src, dsts) =>
        val c = r(src) / dsts.length
        dsts.foreach(d => nxt(d) = nxt.getOrElse(d, 0L) + c)
      }
      val damped = mutable.LongMap.empty[Long]
      nxt.foreach { case (k, v) => damped(k) = 150000L + (85L * v) / 100L }
      r = damped
    }
    import s.implicits._
    r.toSeq.sortBy(_._1).toDF("id", "r")
  }

  private def distributedPageRank(pairs: DataFrame, a: String, b: String,
                                  iters: Int, borrowed: Boolean): DataFrame = {
    val edges = pairs.selectExpr(s"$a AS src", s"$b AS dst")
      .unionAll(pairs.selectExpr(s"$b AS src", s"$a AS dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deg joins into EVERY iteration — persisted, or each round re-runs
    // the degree aggregation over the edge blocks (10× at iters=10)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = deg.selectExpr("src AS id", "CAST(1000000 AS BIGINT) AS r")
      for (_ <- 1 to iters) {
        val contrib = ranks.join(deg, ranks("id") === deg("src"))
          .selectExpr("id", "r DIV deg AS c")
        ranks = edges.join(contrib, edges("src") === contrib("id"))
          .groupBy(col("dst"))
          .agg(expr("150000 + (85 * sum(c)) DIV 100").as("r"))
          .selectExpr("dst AS id", "r")
      }
      // materialize before unpersist: an action on the returned frame would
      // otherwise recompute the whole iteration chain off dropped blocks
      truncate(ranks)
    } finally {
      edges.unpersist(); deg.unpersist()
      if (!borrowed) { pairs.unpersist(); () }
    }
  }

  /** Synchronous rounds of [[qG6]]'s label-propagation recurrence — fixed so
    * the DuckDB oracle can replay them as chained CTEs (the [[PageRankIters]]
    * pattern: determinism over convergence detection). */
  val LabelPropIters = 3

  /** Q-G6 — LABEL-PROPAGATION COMMUNITIES over the SimHash near-dup graph:
    * the structure detector BETWEEN [[qG1]]'s degrees and [[qD9]]'s connected
    * components. Components answer "what is reachable" — but one spurious
    * bridge edge (a boilerplate hub, exactly what qG1 exists to flag) welds
    * two unrelated duplicate families into one component, and
    * keep-one-per-cluster would then destroy a whole family. LPA answers
    * "what is DENSELY connected": each node repeatedly adopts the label most
    * common among its neighbors, so labels flood plausibly within cliques but
    * cannot colonize across a single bridge edge against a denser majority —
    * per-mode community structure at component-detection cost.
    *
    * Determinism (the synchronous form): label(0) = own id; label(i+1) =
    * the neighbor label maximizing (count, −label) — frequency first, min
    * label on ties — for a FIXED [[LabelPropIters]] rounds. Both orders are
    * total and integer, so the oracle replays the recurrence exactly;
    * asynchronous/randomized LPA variants trade that reproducibility away.
    *
    * Scale: the edge frame comes from the durable [[DupClusters]] artifact
    * (persisted once per session — no per-query re-mining);
    * each round is one edge-sized equi-join on the label frame plus one
    * (node, label)-keyed count and a node-partitioned arg-max window — the
    * same O(iters × |E|) BSP shape as [[pageRank]], no driver data movement.
    * The window partitions by node over ≤ degree rows, never globally. */
  def qG6(s: SparkSession, dir: String): DataFrame =
    labelProp(DupClusters.build(s, dir).pairs.select("a_id", "b_id"),
        LabelPropIters)
      .selectExpr("id AS doc_id", "lbl AS community").orderBy("doc_id")

  /** The iteration core of [[qG6]] over any canonical (a, b) pair frame —
    * symmetrizes, persists the edge frame, runs `iters` synchronous rounds.
    * Spec-testable on synthetic graphs (bridge vs clique behavior). */
  def labelProp(pairGraph: DataFrame, iters: Int,
                maxDriverPairs: Int = MaxDriverPairs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = pairGraph.columns(0); val b = pairGraph.columns(1)
    val borrowed = pairGraph.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val pairs =
      if (borrowed) pairGraph
      else pairGraph.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // HYBRID by declared bound ([[componentsOfPairs]]' discipline): the
    // synchronous (count desc, min label) arg-max is a total integer order,
    // so the driver replay is bit-equal to the distributed rounds —
    // spec-pinned via the maxDriverPairs=0 forced-distributed variant
    boundedEdges(pairs.select(a, b), maxDriverPairs) match {
      case Some(es) =>
        try driverLabelProp(pairs.sparkSession, es, iters)
        finally { if (!borrowed) { pairs.unpersist() }; () }
      case None => try {
        val edges = pairs.selectExpr(s"$a AS src", s"$b AS dst")
          .unionAll(pairs.selectExpr(s"$b AS src", s"$a AS dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          var lbls = edges.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("lbl"))
          val byNode = Window.partitionBy("nid")
            .orderBy(col("c").desc, col("nlbl"))
          for (_ <- 1 to iters) {
            val votes = edges.join(lbls, edges("dst") === lbls("id"))
              .select(edges("src").as("nid"), lbls("lbl").as("nlbl"))
              .groupBy("nid", "nlbl").agg(count(lit(1)).as("c"))
            lbls = votes.withColumn("rn", row_number().over(byNode))
              .where(col("rn") === 1)
              .select(col("nid").as("id"), col("nlbl").as("lbl"))
          }
          truncate(lbls)
        } finally { edges.unpersist(); () }
      } finally {
        if (!borrowed) { pairs.unpersist(); () }
      }
    }
  }

  /** Driver replay of the synchronous LPA recurrence — per round, every
    * node adopts the label maximizing (neighbor-vote count, −label) over
    * the PREVIOUS round's labels; multiplicity counts, exactly like the
    * distributed unionAll edges. */
  private def driverLabelProp(s: SparkSession, es: Array[(Long, Long)],
                              iters: Int): DataFrame = {
    import scala.collection.mutable
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    def add(u: Long, v: Long): Unit = {
      adj.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v; ()
    }
    es.foreach { case (u, v) => add(u, v); add(v, u) }
    var lbl = mutable.LongMap.empty[Long]
    adj.foreachKey(k => lbl(k) = k)
    for (_ <- 1 to iters) {
      val nxt = mutable.LongMap.empty[Long]
      adj.foreach { case (node, nbrs) =>
        val votes = mutable.LongMap.empty[Long]
        nbrs.foreach { n =>
          val l = lbl(n); votes(l) = votes.getOrElse(l, 0L) + 1L
        }
        var bestL = Long.MaxValue; var bestC = 0L
        votes.foreach { case (l, c) =>
          if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
        }
        nxt(node) = bestL
      }
      lbl = nxt
    }
    import s.implicits._
    lbl.toSeq.sortBy(_._1).toDF("id", "lbl")
  }

  /** Synchronous peel rounds of [[qG7]] — fixed so the DuckDB oracle can
    * replay them as chained CTEs (the [[PageRankIters]] pattern: determinism
    * over convergence detection; the peel is idempotent once converged, so
    * extra rounds never change the answer, only certify it). */
  val KCoreIters = 3

  /** Q-G7 — 2-CORE decomposition of the SimHash near-dup graph: iteratively
    * peel degree-1 nodes (and the edges they carry) until only nodes with
    * ≥ 2 surviving neighbors remain, reporting (iteration, nodes, edges)
    * after each of [[KCoreIters]] synchronous rounds. The k-core is the
    * third structural lens after [[qG2]]'s triangles and [[qG6]]'s
    * communities: dup FAMILIES (cliques) sit entirely inside the 2-core,
    * while chain/star false-positive filaments — transitive SimHash matches
    * stitching unrelated docs — peel away completely. The per-round deltas
    * are the diagnostic: a graph whose edge count collapses under peeling
    * is filament-shaped, and keep-one-per-component ([[qT19]]) would be
    * destroying singletons glued by noise, not duplicates.
    *
    * Scale: the edge frame comes from the durable [[DupClusters]] artifact
    * (persisted once per session — no per-query re-mining);
    * each round is ONE map-combined degree shuffle plus two semi-joins of
    * the edge frame against the surviving-node set — O(iters × |E|) BSP,
    * the [[pageRank]]/[[labelProp]] shape. The degree frame is computed
    * ONCE per round and shared between the round's (nodes, edges) stats
    * and the `deg >= 2` keep-set (stats are Σdeg/2 and count over that
    * frame — no second explode/countDistinct shuffle of the edges; that
    * duplicate stat job was the suite's most expensive query's main fat).
    * Each round's checkpointed frame is explicitly `unpersist`ed once its
    * successor materializes — the chain is shrink-only, so peak block
    * footprint is ≤ 2 edge frames by construction, not by GC timing. The
    * reported rows are metadata-sized aggregates; nothing corpus-scaled
    * reaches the driver. */
  def qG7(s: SparkSession, dir: String): DataFrame =
    kcorePeel(s, DupClusters.build(s, dir).pairs
      .select(col("a_id").as("u"), col("b_id").as("v")), KCoreIters,
      MaxDriverPairs)

  /** Q-G8 — the k = 3 peel of the same graph (same recurrence, stricter
    * survival bound: a node needs ≥ 3 surviving neighbors each round).
    * Where the 2-core separates filaments from families, the 3-core
    * isolates the DENSE families only — a clique of 4+ near-dups survives,
    * a triangle glued by one transitive match does not. Shares [[qG7]]'s
    * artifact-served edge frame, per-round degree shuffle, and chained-CTE
    * oracle replay (`c >= 3`). */
  def qG8(s: SparkSession, dir: String): DataFrame =
    kcorePeel(s, DupClusters.build(s, dir).pairs
      .select(col("a_id").as("u"), col("b_id").as("v")), KCoreIters,
      MaxDriverPairs, k = 3)

  /** Q-G9 — 3-TRUSS decomposition: iteratively remove every EDGE
    * supported by fewer than one triangle (k-truss support ≥ k−2), fixed
    * synchronous rounds, per-round (nodes, edges). The truss is the
    * EDGE-level sibling of [[qG8]]'s 3-core and strictly stronger: a
    * node-level core keeps any node with 3 neighbors even when those
    * neighbors are unrelated (a hub stitching three separate families
    * survives the 3-core), but an edge survives the 3-truss only if its
    * endpoints share a common neighbor — cohesion, not popularity. On a
    * dup graph that difference is exactly "boilerplate hub" vs "duplicate
    * family": hub spokes carry no triangles and peel in round 1, cliques
    * are all-triangles and never peel. The per-round edge-count collapse
    * is therefore the cleanest noise-vs-families verdict in the g-family.
    *
    * Scale: each round is the [[qG2]] triangle-enumeration shape — the
    * edge frame joins the symmetrized adjacency twice (both equi-joins,
    * O(Σ deg²) candidate rows), reduces to per-edge support with
    * map-side combine, and peels with one left-semi join; rounds truncate
    * lineage like the other BSP loops (shrink-only, peak ≤ 2 edge
    * frames). HYBRID by declared bound: under [[MaxDriverPairs]] edges
    * the peel replays on the driver with hash-set intersections,
    * spec-pinned bit-equal to the distributed path. */
  def qG9(s: SparkSession, dir: String): DataFrame =
    ktrussPeel(s, DupClusters.build(s, dir).pairs
      .select(col("a_id").as("u"), col("b_id").as("v")), KCoreIters,
      MaxDriverPairs, k = 3)

  /** Q-G10 — DUP-CLUSTER COHESION AUDIT: per near-dup family (component
    * of the durable [[DupClusters]] graph), the TRIAGE numbers a dedup
    * operator reads before trusting keep-one-per-cluster on it — member /
    * edge counts, edge DENSITY in per-mille (2·E·1000 DIV n·(n−1)), the
    * mean verified simhash Hamming distance in centi (Σham·100 DIV E),
    * and the exact-duplicate edge count (ham = 0). A dense ham-0 family
    * is exact reposts (keep-one is safe); a sparse high-ham family is a
    * CHAIN of pairwise near-dups whose endpoints may be unrelated — the
    * transitive-closure artifact every banded-dedup pipeline must audit
    * before dropping (the reason Lee et al. 2022 report cluster
    * diameters). Completes the q_g battery: sizes (q_g3) say how big,
    * this says how TIGHT.
    *
    * Scale: artifact-served — every frame is graph-sized (the cached
    * pairs and clusters lanes), zero corpus passes warm; the oracle
    * replays pairs, components (recursive CTE), and the per-component
    * Hamming stats arithmetically. */
  def qG10(s: SparkSession, dir: String): DataFrame = {
    val idx = DupClusters.build(s, dir)
    val comp = idx.clusters.select(col("id").as("a_id"), col("component"))
    val members = idx.clusters.groupBy("component")
      .agg(count(lit(1)).as("n_members"))
    idx.pairs.join(comp, "a_id") // an edge's endpoints share a component
      .groupBy("component")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("ham").cast("long")).as("hs"),
        sum(when(col("ham") === 0, 1L).otherwise(0L)).as("exact_edges"))
      .join(members, "component")
      .select(col("component"), col("n_members"), col("n_edges"),
        col("exact_edges"),
        expr("(2 * n_edges * 1000) DIV (n_members * (n_members - 1))")
          .as("density_pm"),
        expr("(hs * 100) DIV n_edges").as("mean_ham_c"))
      .orderBy("component")
  }

  /** Collapse gate for [[gatedKeepMembers]]: a component may be collapsed
    * to ONE survivor only when its verified-edge density is at least this
    * per-mille of the complete graph. 500 pm admits any pair (always
    * 1000), a 2-of-3-edge triangle (666) and a path-of-4 (500, the
    * boundary), and rejects every longer chain — the q_g10 audit's
    * 3226-member density-3 pm transitive-closure artifact fails by two
    * orders of magnitude. */
  val SafeDensityPm = 500L

  /** Collapse gate, Hamming axis: mean verified simhash Hamming distance
    * (centi-bits, [[qG10]]'s `mean_ham_c`) must not exceed this. With the
    * banded miner's ham ≤ 2 verification bound the axis is non-binding on
    * edges it emits (max possible = 200) — it is declared so a looser
    * future miner (or caller-supplied pair frame) cannot silently collapse
    * high-distance families. */
  val SafeMeanHamC = 200L

  /** The COHESION-GATED keeper core shared by [[graft.operators
    * .TextAnalysis.qT39]] (survivors) and [[graft.operators.TextAnalysis
    * .qT26]] (the drop set): every dup-family member with its collapse
    * group and the in-group pick order. Components passing the [[qG10]]
    * cohesion gate (density ≥ [[SafeDensityPm]] AND mean Hamming ≤
    * [[SafeMeanHamC]]) collapse per COMPONENT exactly as [[graft.operators
    * .TextAnalysis.qT19]] always did; failing components — the
    * transitive-closure chains whose endpoints are likely NOT mutual
    * duplicates (Lee et al. 2022's cluster-diameter caveat, the round-14
    * q_g10 finding) — are routed through their [[labelProp]] communities,
    * so keep-one operates per DENSE sub-family and a bridge-welded pair of
    * cliques keeps TWO survivors (RecallSpec pins that fixture).
    *
    * Since round 16 the production callers ([[graft.operators.TextAnalysis
    * .qT39]] / [[graft.operators.TextAnalysis.qT26]]) feed this the
    * SEVERED graph — [[DupClusters]]' surviving pairs and `severed/`
    * components ([[qG12]]), where refuted weld edges are already dropped —
    * so the community-routing leg is the fallback for chains the
    * edit-distance severing could NOT refute, and fires strictly less
    * often than on the raw graph (DupClustersSpec measures that on the
    * corpus). Severed singletons (every edge refuted) pass the gate
    * trivially and keep themselves.
    *
    * Emits one row per clustered member: (id, component, rank_e6, mode
    * 'component'|'community', group_id, rn) where rn is the deterministic
    * pick order within (component, group_id) — max [[pageRank]] centrality,
    * tiebreak min id, both total orders. rn = 1 is the survivor.
    *
    * Scale: every frame is GRAPH-sized — cohesion stats reduce the pairs
    * lane, the safe-set is component-count-sized and broadcast, LPA is the
    * [[labelProp]] O(iters×|E|) BSP loop, and the final window partitions
    * by (component, group_id) over ≤ family-size rows. Zero corpus passes
    * when served from the [[DupClusters]] artifact. */
  private[graft] def gatedKeepMembers(s: SparkSession, pairs: DataFrame,
                                      clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = clusters.select(col("id").as("a_id"), col("component"))
    val members = clusters.groupBy("component")
      .agg(count(lit(1)).as("n_members"))
    val edgeStats = pairs.join(comp, "a_id")
      .groupBy("component")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("ham").cast("long")).as("hs"))
    // a SINGLETON component — a node the severing isolated (every edge
    // refuted) — is trivially safe: its collapse group is itself, so
    // keep-one keeps it. Raw dup graphs have no singletons (components
    // are mined from edges), so this clause only fires on severed input.
    val safe = members.join(edgeStats, Seq("component"), "left")
      .where(col("n_members") === 1 ||
        (expr("(2 * n_edges * 1000) DIV (n_members * (n_members - 1))")
          >= SafeDensityPm &&
         expr("(hs * 100) DIV n_edges") <= SafeMeanHamC))
      .select(col("component"), lit(1L).as("is_safe"))
    val lpa = labelProp(pairs.select("a_id", "b_id"), LabelPropIters)
      .selectExpr("id", "lbl AS community")
    val gw = Window.partitionBy("component", "group_id")
    clusters
      .join(broadcast(safe), Seq("component"), "left")
      .join(lpa, Seq("id"), "left") // every clustered node has >= 1 edge,
      // so the left join is total; coalesce guards caller-supplied frames
      .select(col("id"), col("component"), col("rank_e6"),
        when(col("is_safe").isNotNull, lit("component"))
          .otherwise(lit("community")).as("mode"),
        when(col("is_safe").isNotNull, col("component"))
          .otherwise(coalesce(col("community"), col("id"))).as("group_id"))
      .withColumn("rn", row_number().over(
        gw.orderBy(desc("rank_e6"), col("id"))))
  }

  /** The [[qG9]] peel over any canonical (u < v) edge frame — k-truss
    * with survival bound support ≥ k−2, k ≥ 3 (k = 2 never peels). */
  private[graft] def ktrussPeel(s: SparkSession, e0: DataFrame, iters: Int,
                                maxDriverPairs: Int, k: Int = 3): DataFrame = {
    import s.implicits._
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    boundedEdges(e0, maxDriverPairs) match {
      case Some(es0) =>
        import scala.collection.mutable
        def statOf(es: Array[(Long, Long)]): (Long, Long) = {
          val nodes = mutable.LongMap.empty[Boolean]
          es.foreach { case (u, v) => nodes(u) = true; nodes(v) = true }
          (nodes.size.toLong, es.length.toLong)
        }
        var es = es0
        val rounds = mutable.ArrayBuffer[(Long, Long, Long)]()
        val (n0, m0) = statOf(es); rounds += ((0L, n0, m0))
        for (i <- 1 to iters) {
          val adj = mutable.LongMap.empty[mutable.HashSet[Long]]
          es.foreach { case (u, v) =>
            adj.getOrElseUpdate(u, mutable.HashSet.empty[Long]) += v
            adj.getOrElseUpdate(v, mutable.HashSet.empty[Long]) += u
          }
          es = es.filter { case (u, v) =>
            val (a, b) = (adj(u), adj(v))
            val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
            small.count(large.contains) >= k - 2
          }
          val (n, m) = statOf(es); rounds += ((i.toLong, n, m))
        }
        rounds.toSeq.toDF("iter", "n_nodes", "n_edges").orderBy("iter")
      case None => distributedKtruss(s, e0, iters, k)
    }
  }

  private def distributedKtruss(s: SparkSession, e0: DataFrame,
                                iters: Int, k: Int): DataFrame = {
    import s.implicits._
    def edFrame(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    def statOf(e: DataFrame): (Long, Long) = {
      val r = edFrame(e)
        .agg(countDistinct(col("u")).as("n"), count(lit(1)).as("m2"))
        .collect()(0)
      (r.getLong(0), r.getLong(1) / 2)
    }
    var e = e0
    var prevCkpt: DataFrame = null
    val rounds = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val (n0, m0) = statOf(e); rounds += ((0L, n0, m0))
    for (i <- 1 to iters) {
      val ed = edFrame(e)
      // per-edge triangle support: common neighbors w of (u, v) — two
      // equi-joins against the symmetrized adjacency, map-combined count
      val sup = e.join(ed.select(col("u"), col("v").as("w")), "u")
        .where(col("w") =!= col("v"))
        .join(ed.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
        .groupBy("u", "v").agg(count(lit(1)).as("sup"))
      val next = truncate(e.join(
        sup.where(col("sup") >= k - 2).select("u", "v"),
        Seq("u", "v"), "left_semi"))
      if (prevCkpt ne null) {
        prevCkpt.unpersist(); dropCheckpointFiles(prevCkpt); ()
      }
      prevCkpt = if (e ne e0) e else null
      e = next
      val (n, m) = statOf(e); rounds += ((i.toLong, n, m))
    }
    if (prevCkpt ne null) {
      prevCkpt.unpersist(); dropCheckpointFiles(prevCkpt); ()
    }
    if (e ne e0) { e.unpersist(); dropCheckpointFiles(e); () }
    rounds.toSeq.toDF("iter", "n_nodes", "n_edges").orderBy("iter")
  }

  /** The [[qG7]]/[[qG8]] peel over any (u, v) edge frame, generalized to
    * k-core(k) (survival bound `deg >= k`, default the 2-core) — HYBRID by
    * declared bound ([[componentsOfPairs]]' discipline): under
    * [[MaxDriverPairs]] edges the peel replays on the driver (pure integer
    * set operations, so the paths are bit-equal — spec-pinned via the
    * forced-distributed variant); above it, the BSP loop below. e0 should
    * be a projection of a persisted frame — round 1's readers re-project
    * from cached blocks. */
  private[graft] def kcorePeel(s: SparkSession, e0: DataFrame, iters: Int,
                               maxDriverPairs: Int, k: Int = 2): DataFrame = {
    import s.implicits._
    require(k >= 1, s"k-core needs k >= 1, got $k")
    boundedEdges(e0, maxDriverPairs) match {
      case Some(es0) =>
        import scala.collection.mutable
        def statOf(es: Array[(Long, Long)]): (Long, Long) = {
          val nodes = mutable.LongMap.empty[Boolean]
          es.foreach { case (u, v) => nodes(u) = true; nodes(v) = true }
          (nodes.size.toLong, es.length.toLong)
        }
        var es = es0
        val rounds = mutable.ArrayBuffer[(Long, Long, Long)]()
        val (n0, m0) = statOf(es); rounds += ((0L, n0, m0))
        for (i <- 1 to iters) {
          val deg = mutable.LongMap.empty[Long]
          es.foreach { case (u, v) =>
            deg(u) = deg.getOrElse(u, 0L) + 1L
            deg(v) = deg.getOrElse(v, 0L) + 1L
          }
          es = es.filter { case (u, v) => deg(u) >= k.toLong && deg(v) >= k.toLong }
          val (n, m) = statOf(es); rounds += ((i.toLong, n, m))
        }
        rounds.toSeq.toDF("iter", "n_nodes", "n_edges").orderBy("iter")
      case None => distributedKcore(s, e0, iters, k)
    }
  }

  private def distributedKcore(s: SparkSession, e0: DataFrame,
                               iters: Int, k: Int): DataFrame = {
    import s.implicits._
    {
      // each round TRUNCATES LINEAGE (eager localCheckpoint): the peel
      // references its input three times per round (degree + two semi
      // joins), so a chained logical plan holds 3^i copies of the
      // candidate-join subtree by round i — DRIVER-side analysis/
      // canonicalization blows up exponentially (measured: round-3 stats
      // 6.5 s with fully-warm caches, pure planning). Checkpointing each
      // round's edge frame makes every plan round-sized and the blocks
      // back the next round's three readers — the reason pageRank/qG6
      // checkpoint their results. The per-round stats are 2 scalars ×
      // (iters+1) BY CONSTRUCTION — bounded driver traffic, never
      // graph-sized.
      // ONE degree shuffle per round, shared by stats AND the keep-set:
      // each edge contributes both endpoints, so over the degree frame
      // count(*) = nodes and sum(deg) = 2·edges — the stats collect is
      // the action that materializes the persisted degree frame, and the
      // keep semi-joins then read the same blocks. No second
      // explode/countDistinct pass over the edges exists.
      def degreesOf(e: DataFrame): DataFrame =
        e.select(col("u").as("id"))
          .unionAll(e.select(col("v").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def statOf(deg: DataFrame): (Long, Long) = {
        val r = deg.agg(count(lit(1)).as("n"), sum("deg").as("m2")).collect()(0)
        (r.getLong(0), r.getLong(1) / 2)
      }
      var e = e0
      var prevCkpt: DataFrame = null // round i-1's checkpoint, freed at i+1
      val rounds = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var deg = degreesOf(e)
      val (n0, m0) = statOf(deg); rounds += ((0L, n0, m0))
      for (i <- 1 to iters) {
        val keep = deg.where(col("deg") >= k).select("id")
        val next = truncate(e
          .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
          .select("u", "v"))
        // successor is materialized: the previous round's checkpoint
        // blocks (and its degree frame) are dead — free them NOW, not at
        // ContextCleaner GC time, so peak footprint stays <= 2 frames;
        // in reliable mode the round's checkpoint FILES go with it
        deg.unpersist()
        if (prevCkpt ne null) {
          prevCkpt.unpersist(); dropCheckpointFiles(prevCkpt); ()
        }
        prevCkpt = if (e ne e0) e else null
        e = next
        deg = degreesOf(e)
        val (n, m) = statOf(deg); rounds += ((i.toLong, n, m))
      }
      deg.unpersist()
      if (prevCkpt ne null) {
        prevCkpt.unpersist(); dropCheckpointFiles(prevCkpt); ()
      }
      // the result is driver-local scalars — the last round's checkpoint
      // is dead too (e0 projects from the artifact's frame, not ours)
      if (e ne e0) { e.unpersist(); dropCheckpointFiles(e); () }
      rounds.toSeq.toDF("iter", "n_nodes", "n_edges").orderBy("iter")
    }
  }

  /** Embedding-cosine near-dup pairs (exact, bounded): cosine >= 0.4 via the
    * codegen'd [[graft.functions.CosineSimilarity]] expression, with a
    * DECLARED key bound (`a_id < 200`) like its siblings qD2/qX2.
    *
    * Why bounded rather than LSH-bucketed: the threshold sits in the tail of
    * the background similarity distribution of this corpus (qualifying pairs
    * measured at 0.40–0.51, continuous with the sub-threshold mass at
    * 0.35–0.40; in angular terms θ(0.4)=66.4° vs θ(0.35)=69.5°). No
    * sign-LSH banding can separate 66° from 69° with recall 1 — the P=8
    * full-signature bucketing of [[Similarity.qSim2]] catches 1 of 59
    * qualifying pairs at sf0.01 — so an EXACT threshold-0.4 result is
    * inherently Ω(n²) and the exact form stays declared-bounded. The plan is
    * the [[Similarity.qSim1]] shape: broadcast the bounded side, stream the
    * corpus — map-only, zero shuffle, linear in corpus size at any scale.
    * The full-corpus sub-quadratic route is [[qD8]], whose banded-LSH
    * candidate contract (recall traded for boundedness) is declared and
    * oracle-mirrored. */
  def qD7(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.selectExpr("vec_id AS a_id", "embedding AS ea").where(col("a_id") < 200)
    val b = e.selectExpr("vec_id AS b_id", "embedding AS eb")
    broadcast(a).join(b, col("a_id") < col("b_id"))
      .withColumn("sim", expr("cosine_sim(ea, eb)"))
      .where(col("sim") >= 0.4)
      .selectExpr("a_id", "b_id", "ROUND(sim, 4) AS sim")
      .orderBy("a_id", "b_id")
  }

  /** Banded sign-LSH near-dup pairs over the FULL corpus — the sub-quadratic
    * scale path next to the bounded exact baseline [[qD7]].
    *
    * [[LshBands]] bands × [[LshBandBits]] random-hyperplane bits each; a pair
    * becomes a candidate iff it collides in at least one band, and candidates
    * are scored EXACTLY with the codegen'd cosine kernel (precision 1.0 by
    * construction). The DuckDB oracle recomputes the identical planes/bands
    * (deterministic md5-seeded signs, [[Similarity.planeSign]]), so the
    * declared contract — LSH candidates, not all pairs — is hash-checked
    * exactly.
    *
    * Recall at the threshold is the declared tradeoff: for a pair at cosine
    * s, P(collision) = 1-(1-p^r)^b with p = 1-θ(s)/π. At this corpus's
    * threshold (0.4, the background tail — see [[qD7]]) that is ~0.25;
    * at real near-dup thresholds (0.9+, p≈0.86) it is ~0.95 and rises with
    * more bands. Cost side: background pairs (s≈0, p≈0.5) collide w.p.
    * b·2^-r ≈ 1/16, so candidates are ~6% of n² — tune r up / b up to trade
    * shuffle volume vs recall as the corpus grows.
    *
    * Plan shape: signatures are one map-only corpus pass (no shuffle); the
    * ONLY shuffles are the (band, value)-keyed candidate equi-join — never a
    * nested-loop pair join — and the verified-survivor distinct (the qD6
    * lesson: rescore + threshold BEFORE distinct so the exchange carries
    * surviving pairs only). */
  def qD8(s: SparkSession, dir: String): DataFrame =
    bandedPairs(s, dir, LshBands, LshBandBits)

  /** [[qD8]] with a configurable (bands, bits) setting — the tuning surface
    * the recall model describes. Band `k` covers planes
    * `[bits·k, bits·(k+1))` of the fixed md5-seeded family, so for a given
    * `bits` a larger `bands` strictly ADDS bands: every pair found at
    * `bands = b` is found at any `bands > b` (recall is monotone in band
    * count; RecallSpec measures it against the exact baseline). */
  def bandedPairs(s: SparkSession, dir: String, bands: Int, bits: Int): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    // each band's bits in one fused codegen'd pass (see
    // [[graft.functions.LshBandSignature]] — the HOF formulation ran
    // interpreted lambdas per element per plane)
    val bandCols = (0 until bands).map { k =>
      expr(s"lsh_band_sig(embedding, ${bits * k}, $bits)").as(s"bk$k")
    }
    val sigs = e.select(col("vec_id") +: col("embedding") +: bandCols: _*)
    val banded = sigs.selectExpr("vec_id", "embedding",
      s"stack($bands, ${(0 until bands).map(k => s"$k, bk$k").mkString(", ")}) AS (band, bv)")
    val a = banded.selectExpr("vec_id AS a_id", "embedding AS ea", "band", "bv")
    val b = banded.selectExpr("vec_id AS b_id", "embedding AS eb",
      "band AS band_b", "bv AS bv_b")
    a.hint("merge").join(b, col("band") === col("band_b") && col("bv") === col("bv_b") &&
        col("a_id") < col("b_id"))
      .withColumn("sim_raw", expr("cosine_sim(ea, eb)"))
      .where(col("sim_raw") >= 0.4)
      .selectExpr("a_id", "b_id", "ROUND(sim_raw, 4) AS sim")
      .distinct() // pairs colliding in >1 band, after the cheap exact verify
      .orderBy("a_id", "b_id")
  }

  /** qD8 banding: 4 bands × 6 planes (24 hyperplanes total). */
  val LshBands = 4
  val LshBandBits = 6

  /** Q-D9 — near-duplicate CLUSTERS: connected components over the qD8
    * pair graph, labeling every vector with the minimum id reachable from
    * it. Pairs are what LSH finds; components are what a curation pipeline
    * consumes (keep one representative per cluster, drop the rest) —
    * without this step, transitive duplicates (A≈B, B≈C, A̸≈C) survive
    * pairwise dedup.
    *
    * Algorithm: HYBRID by declared bound — when the pair graph fits
    * [[MaxDriverPairs]] (checked via a bounded limit-collect, never an
    * open-ended one), union-find runs on the driver in milliseconds;
    * above the bound, [[starComponents]] — alternating large-star /
    * small-star rounds (Kiveris et al., "Connected Components in MapReduce
    * and Beyond"), O(log n) rounds on ANY graph shape, each round two
    * join+min-agg steps with the edge frame localCheckpointed (truncates
    * the iterative lineage). [[labelComponents]] (plain min-label
    * propagation, diameter rounds — fine for near-clique dup clusters,
    * wrong for chain-shaped graphs) is kept as an independent
    * implementation and spec-pinned equal. Oracle: DuckDB recursive CTE
    * computing min reachable id — an independent algorithm. */
  def qD9(s: SparkSession, dir: String): DataFrame =
    components(s, dir, MaxDriverPairs)

  /** Pair-graph size under which [[components]] takes the BOUNDED-collect
    * fast path: union-find on the driver over at most this many edges (a
    * few MB), skipping per-round Spark jobs entirely. The bound is
    * explicit and checked — above it the distributed label-propagation
    * loop runs, so the collect can never be corpus-sized. */
  val MaxDriverPairs = 100000

  /** [[qD9]] with a configurable fast-path threshold (0 forces the
    * distributed loop — spec-pinned equal to the driver path). */
  def components(s: SparkSession, dir: String, maxDriverPairs: Int): DataFrame =
    componentsOfPairs(s, qD8(s, dir).select("a_id", "b_id"), maxDriverPairs)

  /** The [[components]] hybrid (driver union-find under the declared edge
    * bound, [[starComponents]] above it) over ANY canonical (a, b) pair
    * frame — the reusable clustering core ([[qD9]] feeds it the embedding
    * near-dup graph; [[graft.operators.TextAnalysis.qT18]] the simhash
    * text graph). */
  def componentsOfPairs(s: SparkSession, pairGraph: DataFrame,
                        maxDriverPairs: Int): DataFrame = {
    import s.implicits._
    // persist BEFORE the bound check: the distributed path must not pay the
    // full LSH candidate pipeline twice (once for the check, once for edges).
    // A frame the CALLER already persisted is borrowed, not owned — qT18/
    // qT19 keep consuming it after this returns, so the finally below must
    // not drop their blocks (that would silently recompute the candidate
    // join once per downstream consumer).
    val borrowed = pairGraph.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val pairs =
      if (borrowed) pairGraph
      else pairGraph.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist on EVERY exit (including a non-converged failure) — both
    // result paths are driver-local or localCheckpointed, so nothing
    // returned below still reads the persisted blocks
    try {
      val head = pairs.limit(maxDriverPairs + 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      if (head.length <= maxDriverPairs) {
        // driver union-find (path-halving), then one tiny parallelize — the
        // whole graph fits by the declared bound
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) {
            val p = parent.getOrElse(r, r)
            parent(r) = parent.getOrElse(p, p)
            r = parent(r)
          }
          r
        }
        head.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val nodes = head.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        nodes.map(n => (n, find(n))).toSeq
          .toDF("id", "component").orderBy("id")
      } else starComponents(s, pairs)
    } finally { if (!borrowed) { pairs.unpersist(); () } }
  }

  /** Distributed connected components via alternating LARGE-STAR /
    * SMALL-STAR (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): the edge set is rewritten each round so every node links
    * toward the smallest id in its neighborhood — large-star hangs each
    * node's LARGER neighbors off its local min, small-star folds the
    * smaller ones — until the graph is a union of stars whose centers are
    * the component minima. Converges in O(log n) rounds on ANY graph shape
    * (a chain of length n needs ~log n rounds here vs n rounds of plain
    * label propagation), each round two join + min-agg steps — the same
    * shuffle primitives as the rest of the engine, nothing driver-sized.
    * The edge frame is localCheckpointed per round (truncates iterative
    * lineage); convergence is checked with a count+checksum fingerprint
    * that rides the same materialized blocks. */
  def starComponents(s: SparkSession, pairGraph: DataFrame): DataFrame = {
    val u = col("u"); val v = col("v")
    // every node mentioned by the pair graph — including one that appears
    // ONLY in a (a,a) self-pair — must come back as a component member, or
    // this path would disagree with the driver union-find (which keeps such
    // nodes as singletons) and maxDriverPairs would change RESULTS
    val allNodes = pairGraph
      .select(col(pairGraph.columns(0)).as("id"))
      .unionAll(pairGraph.select(col(pairGraph.columns(1)).as("id")))
      .distinct()
    var edges = pairGraph
      .select(col(pairGraph.columns(0)).as("u"), col(pairGraph.columns(1)).as("v"))
      .where(u =!= v).distinct()
      .transform(truncate)
    var fp = (-1L, -1L)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 50) {
      val prev = edges // freed (files included) once `next` materializes
      // LARGE-STAR: per node, attach every strictly-larger neighbor to
      // min(neighborhood ∪ self). Edges where the neighbor is smaller are
      // preserved from the other endpoint's reduce (the graph is
      // symmetrized first), so no connectivity is lost.
      val nbrs = edges.unionAll(edges.select(v.as("u"), u.as("v")))
      val mins = nbrs.groupBy("u").agg(least(min(v), u).as("m"))
      val large = nbrs.join(mins, "u").where(v > u)
        .select(v.as("u"), col("m").as("v")).distinct()
      // SMALL-STAR: orient every edge large→small, then per node fold self
      // and all (smaller) neighbors onto the neighborhood min.
      val oriented = large
        .select(greatest(u, v).as("u"), least(u, v).as("v"))
        .where(u =!= v)
      val smins = oriented.groupBy("u").agg(min(v).as("m"))
      val next = oriented.join(smins, "u").where(v =!= col("m"))
        .select(v.as("u"), col("m").as("v"))
        .unionAll(smins.select(u, col("m").as("v")))
        .distinct().transform(truncate)
      // fixpoint check off the checkpointed blocks: star rounds are
      // deterministic edge-set rewrites, so (count, order-free checksum)
      // equality means the edge set stopped moving
      val row = next.agg(count(lit(1)), sum(hash(u, v).cast("long"))).head()
      val nfp = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      converged = nfp == fp
      fp = nfp
      edges = next
      // `next` is materialized (eager truncate + the fingerprint action):
      // round i-1's checkpoint is dead — blocks and, in reliable mode,
      // files. The final round's frame stays (the caller consumes it).
      prev.unpersist(); dropCheckpointFiles(prev)
      rounds += 1
    }
    // the cap is a runaway backstop, not a result: a non-converged graph
    // must fail loudly, never return partial components
    require(converged,
      s"star components did not converge in $rounds rounds")
    // final form: (member → component-min) stars; centers map to themselves;
    // nodes the star rounds never saw (self-pair-only) are singletons
    val centers = edges.select(v.as("id")).distinct()
      .select(col("id"), col("id").as("component"))
    val mapped = edges.select(u.as("id"), v.as("component"))
      .unionAll(centers)
      .distinct()
    allNodes.join(mapped, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
      .orderBy("id")
  }

  /** Plain distributed min-label propagation — each round every node takes
    * min(own label, neighbors' labels): one edge⋈label join + one
    * min-aggregate, labels localCheckpointed per round. Rounds needed =
    * graph DIAMETER: fine for near-clique dup clusters (measured 3 rounds
    * here), quadratic-work on 100 TB chain-shaped graphs — which is why
    * [[starComponents]] is the scale path and this one is kept as an
    * independent algorithm for spec cross-checks. */
  def labelComponents(s: SparkSession, pairGraph: DataFrame): DataFrame = {
    val pairs = pairGraph
      .select(col(pairGraph.columns(0)).as("a_id"), col(pairGraph.columns(1)).as("b_id"))
    val edges = pairs.unionAll(
        pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    var labels = edges.select(col("a_id").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .transform(truncate)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b_id"), "b_id")
        .groupBy(col("a_id").as("id")).agg(min("lbl").as("nlbl"))
      // the changed flag rides the SAME job as the label update (checked
      // off the checkpointed blocks) — no extra per-round join
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nlbl2"),
          col("lbl").as("old"))
        .select(col("id"), col("nlbl2").as("lbl"),
          (col("nlbl2") =!= col("old")).as("chg"))
        .transform(truncate)
      changed = next.where(col("chg")).count()
      labels = next.select("id", "lbl")
      rounds += 1
    }
    // the cap is a runaway backstop, not a result: a graph whose diameter
    // exceeds it must fail loudly, never return partial components
    require(changed == 0,
      s"component propagation did not converge in $rounds rounds — " +
        "diameter exceeds the cap; use starComponents")
    labels.select(col("id"), col("lbl").as("component")).orderBy("id")
  }

  /** Q-D15 — SEMANTIC dedup, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with a k-means coarse
    * quantizer, then prune near-duplicates WITHIN each cluster only — the
    * third embedding-dedup posture next to the declared-bounded exact
    * baseline [[qD7]] and the banded sign-LSH [[qD8]]. Where LSH bands
    * gate on random projections, SemDeDup gates on the learned cluster
    * structure: candidate generation is Σ|cell|², never n², and the cells
    * ARE the [[Similarity.IvfIndex]] cells — the durable, seeded,
    * oracle-checkable quantizer qSim3 serves ANN from, so the dedup pass
    * reuses the index's cell-partitioned assignment with ZERO extra corpus
    * passes (build is memoized + durable; a warm session reads nothing).
    *
    * Prune rule (deterministic keep-first): within a cell, a vector is
    * pruned iff some LOWER-id member of the same cell is cosine-≥-0.4
    * similar to it — every dup family keeps exactly its minimum id, and
    * the verdict is engine-exact (the oracle replays seeds → assignment →
    * in-cell pairs). Declared tradeoff vs [[qD7]]: pairs split across a
    * cell boundary are not candidates (the SemDeDup contract; recall rises
    * with fewer/larger cells, cost with more).
    *
    * Output: per-cell corpus accounting — members, qualifying in-cell dup
    * pairs, pruned count, and kept per-mille in integer DIV — the numbers
    * a curation run reports before dropping the pruned ids.
    *
    * Scale shape: assignment is the index's cached cell-partitioned frame;
    * the in-cell self-join shuffles on `cell` (the SMJ sides are the same
    * cached subtree), K grows ~√N with the corpus so cells stay bounded;
    * the stats are one agg each over cell-sized frames. */
  def qD15(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val idx = Similarity.IvfIndex.build(s, dir, lloydIters = 0)
    val a = idx.assigned.selectExpr("cell", "vec_id AS a_id", "embedding AS ea")
    val b = idx.assigned.selectExpr("cell AS b_cell", "vec_id AS b_id",
      "embedding AS eb")
    val dupPairs = a.hint("merge")
      .join(b, col("cell") === col("b_cell") && col("a_id") < col("b_id"))
      .where(expr("cosine_sim(ea, eb)") >= 0.4)
      .select("cell", "a_id", "b_id")
    // one agg computes both counters: pair count + distinct pruned ids
    // (b_id is the higher id of each pair = the pruned side of keep-first)
    val pstats = dupPairs.groupBy("cell")
      .agg(count(lit(1)).as("np"), countDistinct("b_id").as("npr"))
    idx.assigned.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      .join(pstats, Seq("cell"), "left")
      .select(col("cell"), col("n_vecs"),
        coalesce(col("np"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("npr"), lit(0L)).as("n_pruned"),
        expr("((n_vecs - coalesce(npr, 0L)) * 1000) DIV n_vecs").as("keep_pm"))
      .orderBy("cell")
  }

  /** Fraction pruned by [[qD21]], in integer fifths: rank ≤ n DIV 5 —
    * the top 20 % most-prototypical members of each cell. Declared here so
    * the engine, the oracle comment, and the scaladoc quote one number. */
  val ProtoPruneDiv = 5L

  /** Q-D21 — PROTOTYPE PRUNING (D4 / SSL-prototypes): within each
    * embedding cluster, rank members by cosine similarity TO THEIR OWN
    * CENTROID and mark the top 20 % most-prototypical for pruning — the
    * diversification half of the D4 recipe (Tirumala et al. 2023,
    * arXiv:2308.12284; the pruning metric of Sorscher et al. 2022,
    * arXiv:2206.14486). The complement of [[qD15]]: SemDeDup removes
    * members too close to EACH OTHER, prototype pruning removes members
    * too close to the CLUSTER CENTER — the most redundant, least
    * informative examples for training once the cluster is represented.
    * Both passes share the [[Similarity.IvfIndex]] cells (lloydIters = 0:
    * the centroids ARE the [[Similarity.IvfCells]] lowest-id seed vectors,
    * so the oracle replays assignment + scoring arithmetically).
    *
    * The per-member score is exactly the assignment's own argmax cosine
    * (a member's similarity to its assigned seed), recomputed here against
    * a 16-row broadcast of the seed vectors — double-precision sums over
    * float inputs, the q_sim1 ordering-parity kernel. Rank ties break by
    * vec_id; pruned ⇔ rank ≤ n_vecs DIV [[ProtoPruneDiv]], so a cell keeps
    * at least 80 % and a 4-member cell keeps everything (integer DIV).
    *
    * Scale: one broadcast join of the cached cell-partitioned assignment
    * against a K-row seed frame, then a rank window PARTITIONED BY cell —
    * partitions are IVF cells (corpus/K, K ~ √N), the same in-cell
    * bounding [[qD15]] declares, and strictly cheaper than its in-cell
    * self-join (sort vs Σ|cell|² pairs). Per-member verdicts are written,
    * never collected. */
  def qD21(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    val idx = Similarity.IvfIndex.build(s, dir, lloydIters = 0)
    // lloydIters = 0 ⇒ cell ids are the seed vec_ids and the centroid of
    // cell c is literally embeddings[vec_id = c] — a K-row pushed read
    // (float-exact, vs re-casting the index's double centroid copies)
    val seeds = Tables.embeddings(s, dir)
      .where(col("vec_id") < Similarity.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val cw = Window.partitionBy("cell")
    val rw = cw.orderBy(col("sim_raw").desc, col("vec_id"))
    idx.assigned.join(broadcast(seeds), "cell")
      .select(col("vec_id"), col("cell"),
        expr("cosine_sim(embedding, ce)").as("sim_raw"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .withColumn("n_vecs", count(lit(1)).over(cw))
      .select(col("vec_id"), col("cell"), round(col("sim_raw"), 4).as("sim"),
        col("rank"), col("n_vecs"),
        expr(s"CAST(rank <= n_vecs DIV $ProtoPruneDiv AS BIGINT)")
          .as("pruned"))
      .orderBy("cell", "rank")
  }

  /** Q-D22 — the full D4 CURATION VERDICT (Tirumala et al. 2023's
    * pipeline composed): per embedding, SemDeDup first ([[qD15]]'s
    * keep-first prune — dropped iff a lower-id cell-mate is cosine-≥-0.4
    * similar), then prototype pruning ([[qD21]]'s rule) RE-RANKED OVER
    * THE SURVIVORS — the paper's actual order, and materially different
    * from running q_d21 standalone: removing near-dup clumps first means
    * the prototype ranks are computed on the deduplicated cell, so a
    * clump near the centroid costs ONE proto slot, not many. Emits one
    * row per vector: (vec_id, cell, verdict ∈ semdedup|proto|keep) — the
    * drop list a D4 curation run applies, with the reason attached.
    *
    * Composition exactness: both legs are the already-oracle-checked
    * integer/double kernels; the oracle replays assignment → in-cell dup
    * set → survivor re-rank → verdict precedence.
    *
    * Scale: [[qD15]]'s in-cell self-join + [[qD21]]'s in-cell rank
    * window, both over the warm index's cell-partitioned assignment —
    * nothing beyond the two component passes' declared Σ|cell|² /
    * sort-per-cell cost. */
  def qD22(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    val idx = Similarity.IvfIndex.build(s, dir, lloydIters = 0)
    val a = idx.assigned.selectExpr("cell", "vec_id AS a_id", "embedding AS ea")
    val b = idx.assigned.selectExpr("cell AS b_cell", "vec_id AS b_id",
      "embedding AS eb")
    val dupDropped = a.hint("merge")
      .join(b, col("cell") === col("b_cell") && col("a_id") < col("b_id"))
      .where(expr("cosine_sim(ea, eb)") >= 0.4)
      .select(col("b_id").as("vec_id")).distinct()
    val seeds = Tables.embeddings(s, dir)
      .where(col("vec_id") < Similarity.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val surv = idx.assigned.join(dupDropped, Seq("vec_id"), "left_anti")
    val cw = Window.partitionBy("cell")
    val rw = cw.orderBy(col("sim_raw").desc, col("vec_id"))
    val proto = surv.join(broadcast(seeds), "cell")
      .select(col("vec_id"), col("cell"),
        expr("cosine_sim(embedding, ce)").as("sim_raw"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .withColumn("n_surv", count(lit(1)).over(cw))
      .where(expr(s"rank <= n_surv DIV $ProtoPruneDiv"))
      .select("vec_id")
    idx.assigned.select("vec_id", "cell")
      .join(dupDropped.withColumn("sd", lit(1)), Seq("vec_id"), "left")
      .join(proto.withColumn("pp", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("sd") === 1, lit("semdedup"))
          .when(col("pp") === 1, lit("proto"))
          .otherwise(lit("keep")).as("verdict"))
      .orderBy("vec_id")
  }

  /** Q-G11 — WEAK LINKS: the verified near-dup edges supported by ZERO
    * triangles — no third document is a near-dup of both endpoints. In a
    * genuine duplicate family every edge is triangle-supported (near-dup
    * is near-transitive inside a clique); an unsupported edge is exactly
    * the transitive-closure glue that welds unrelated families into the
    * chain components [[qG10]] flags (its 3226-member density-3 pm
    * finding). Where q_g10 SCORES components and the gated keeper
    * ([[gatedKeepMembers]]) routes around them, this names the CUT-SET:
    * the specific pairs a curation run re-verifies (or severs) to split a
    * chain — the edge-level complement of the [[qG9]] 3-truss, whose
    * survivors are by definition every edge this query does NOT emit.
    *
    * Emits (a_id, b_id, ham, component): the unsupported edge, its
    * verified simhash Hamming distance, and the family it glues.
    *
    * Scale: artifact-served and graph-sized — one [[qG2]]-shaped triangle
    * probe (pairs ⋈ adjacency ⋈ adjacency, O(Σ deg²) candidates, map-side
    * combined) and a left-anti back to the pairs lane; zero corpus passes
    * warm. */
  def qG11(s: SparkSession, dir: String): DataFrame = {
    val idx = DupClusters.build(s, dir)
    val comp = idx.clusters.select(col("id").as("a_id"), col("component"))
    weakEdges(idx.pairs.select("a_id", "b_id", "ham"))
      .join(comp, "a_id")
      .select(col("a_id"), col("b_id"), col("ham").cast("int").as("ham"),
        col("component"))
      .orderBy("a_id", "b_id")
  }

  /** Edit-distance bound for weld-edge severing — the same threshold
    * [[qD11]] verifies near-dup candidates at: a WEAK edge ([[qG11]],
    * zero triangle support) whose endpoint texts are more than this many
    * character edits apart is REFUTED — the simhash band collision was
    * transitive-closure glue, not duplication — and the [[DupClusters]]
    * artifact severs it (VERDICT r15 task 2). */
  val SeverEditBound = 30

  /** The [[qG11]] cut-set RE-VERIFIED: weak edges whose endpoint texts
    * fail the [[qD11]] bounded edit-distance check — the exact edges the
    * [[DupClusters]] build severs before computing its `severed/`
    * components. Spending the O(len×bound) verifier ONLY on the weak set
    * is the point: triangle-supported edges are corroborated by a third
    * document and keep their banded verification, while the unsupported
    * welds (graph-edge-bounded, tiny) get the expensive character-level
    * check. Emits (a_id, b_id) for refuted edges only.
    *
    * Scale: [[weakEdges]] is the graph-sized triangle probe; the text
    * fetch is [[qD11]]'s chained broadcast (weak set into `docs` for
    * side a, that result into `docs` for side b — `docs` is only ever the
    * map-only streamed side, raw text never shuffles); the O(1) length
    * gap refutes without running the DP (a gap > bound lower-bounds the
    * edit distance past it), and survivors run the THRESHOLD Levenshtein
    * (O(len × bound) banded DP, −1 ⇔ distance > bound). */
  private[graft] def refutedWeakEdges(docs: DataFrame, pairs: DataFrame): DataFrame =
    verifyEdges(docs, weakEdges(pairs))
      .where(col("refuted")).select("a_id", "b_id")

  /** The edit-distance VERDICT for a caller-supplied edge frame: one row
    * per (a_id, b_id) with `refuted` = endpoint texts more than
    * [[SeverEditBound]] edits apart. Factored from [[refutedWeakEdges]]
    * so [[DupClusters]] can verify ONLY the not-yet-verified weak edges
    * on append (the `verdicts/` cache — edit distances are immutable, so
    * a verdict never needs re-computing) while the fixture specs and the
    * from-scratch build verify the whole weak set. Same chained-broadcast
    * qD11 text fetch; the O(1) length gap refutes without the DP. */
  private[graft] def verifyEdges(docs: DataFrame, edges: DataFrame): DataFrame = {
    val keys = edges.select("a_id", "b_id")
    val withA = docs.join(broadcast(keys), col("doc_id") === col("a_id"))
      .selectExpr("a_id", "b_id", "text AS ta")
    docs.join(broadcast(withA), col("doc_id") === col("b_id"))
      .selectExpr("a_id", "b_id", "ta", "text AS tb")
      .select(col("a_id"), col("b_id"),
        when(abs(length(col("ta")) - length(col("tb"))) > SeverEditBound,
          lit(true))
          .otherwise(levenshtein(col("ta"), col("tb"), SeverEditBound) < 0)
          .as("refuted"))
  }

  /** Q-G12 — SEVERED COMPONENTS: every clustered document with its raw
    * near-dup family AND the family AFTER the [[DupClusters]] artifact
    * severs the refuted cut-set — weak edges ([[qG11]]) that fail the
    * [[qD11]] edit-distance re-verification ([[refutedWeakEdges]]) are
    * dropped and components recompute over the surviving edge set, so a
    * bridge-welded pair of cliques SPLITS into two families while a
    * levenshtein-confirmed bridge keeps them joined (RecallSpec pins both
    * fixtures). This closes VERDICT r15 missing #1: where [[qG11]] NAMES
    * the welds and the gated keeper routes around them, the artifact now
    * FIXES them — `severed/` is what [[graft.operators.TextAnalysis
    * .qT39]] / [[graft.operators.TextAnalysis.qT26]] consume. A node
    * whose every edge was refuted becomes its own singleton family
    * (component_sev = id): no longer a duplicate of anything. The
    * reference tie-in is the A12 "safe deduplication" promise
    * (README.md:3) made structural.
    *
    * Emits (id, component, component_sev) per raw-clustered node.
    *
    * Scale: artifact-served — both lanes are graph-sized persisted
    * parquet; the severing itself ran once at build. Zero corpus passes
    * warm. */
  def qG12(s: SparkSession, dir: String): DataFrame = {
    val idx = DupClusters.build(s, dir)
    idx.clusters.select(col("id"), col("component"))
      .join(idx.severed.select(col("id"),
        col("component").as("component_sev")), "id")
      .select("id", "component", "component_sev")
      .orderBy("id")
  }

  /** [[qG13]]'s BFS cap: per-node root distances are exact up to this
    * many hops; a node further out reports exactly this value (declared
    * truncation, mirrored by the oracle's bounded recursion). 32 hops of
    * pairwise near-duplication is already far beyond any edit-chain a
    * curation decision should trust — the VALUE of depth beyond the cap
    * is not actionable, only the fact that it exceeds it. */
  val DepthCap = 32L

  /** Q-G13 — FAMILY DEPTH AUDIT, raw vs severed: per dup family, the max
    * shortest-path distance from the family's canonical (min-id = label)
    * member to any member, capped at [[DepthCap]] — the cluster-DIAMETER
    * evidence Lee et al. 2022 report and the round-15/16 severing arc's
    * closing measurement: a clique has depth 1, a transitive chain of n
    * members depth n−1, and severing refuted welds ([[qG12]]) must
    * collapse the depth distribution toward cliques. Emits one row per
    * (graph ∈ raw|severed, component): member count and depth; singleton
    * severed families report depth 0.
    *
    * Scale: artifact-served, graph-sized — both edge frames come from the
    * cached pairs/refuted lanes and the BFS is the [[labelProp]]-class
    * hybrid ([[rootDistances]]): a driver replay under [[MaxDriverPairs]]
    * edges, else ≤ [[DepthCap]] BSP rounds of edge-sized join +
    * node-sized min-agg with truncated lineage. Zero corpus passes warm. */
  def qG13(s: SparkSession, dir: String): DataFrame = {
    val idx = DupClusters.build(s, dir)
    val rawEdges = idx.pairs.select("a_id", "b_id")
    val sevEdges = rawEdges.join(idx.refuted, Seq("a_id", "b_id"), "left_anti")
    def rollup(edges: DataFrame, clusters: DataFrame,
               graph: String): DataFrame =
      rootDistances(s, edges, clusters.select("id", "component"),
        MaxDriverPairs)
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"), max("d").as("depth"))
        .select(lit(graph).as("graph"), col("component"),
          col("n_members"), col("depth"))
    rollup(rawEdges, idx.clusters, "raw")
      .unionByName(rollup(sevEdges, idx.severed, "severed"))
      .orderBy("graph", "component")
  }

  /** Min distance from each component's ROOT (the min-id member — which
    * IS the component label, [[componentsOfPairs]]' contract) to every
    * member, exact up to [[DepthCap]] hops and reported as the cap
    * beyond it. HYBRID by the declared bound: under `maxDriverPairs`
    * edges a driver BFS replays the recurrence (bit-equal, spec-pinned);
    * above it, ≤ [[DepthCap]] BSP rounds — each one edge-sized join +
    * (id)-keyed min-agg, lineage truncated per round — with an
    * early-exit when a round reaches no new node.
    *
    * VERDICT r16 #1: the driver branch collects ONLY the edge frame the
    * bound probe checked — `clusters` never reaches the driver. The BFS
    * runs over the ≤ 2·maxDriverPairs node ids present in the edge
    * array; members absent from it have no edge at all, i.e. they are
    * exactly the self-labelled singletons (`id == component` by the
    * [[componentsOfPairs]] contract) and take depth 0 through the
    * broadcast left join below. Roots need no cluster lookup either: the
    * component label IS its min member id, so scanning edge nodes in
    * ascending id order makes every not-yet-visited node a root. On a
    * chain-shaped corpus where severed edges ≈ 0 but raw membership is
    * dup-subset-sized, the driver copy stays edge-bounded. */
  private[graft] def rootDistances(s: SparkSession, edges: DataFrame,
                                   clusters: DataFrame,
                                   maxDriverPairs: Int): DataFrame = {
    import s.implicits._
    boundedEdges(edges, maxDriverPairs) match {
      case Some(es) =>
        import scala.collection.mutable
        val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
        es.foreach { case (a, b) =>
          adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
          adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
        }
        val dist = mutable.LongMap.empty[Long]
        // ascending scan: the first unvisited node of each component is
        // its min id = the root. The BFS traverses past the cap (so far
        // members are claimed by their true root, never mistaken for new
        // roots) but CLAMPS the recorded value at [[DepthCap]].
        adj.keys.toArray.sorted.foreach { root =>
          if (!dist.contains(root)) {
            var frontier = List(root)
            dist(root) = 0L
            var d = 0L
            while (frontier.nonEmpty) {
              d += 1
              frontier = frontier.flatMap(n =>
                adj(n).filter(!dist.contains(_))).distinct
              frontier.foreach(dist(_) = math.min(d, DepthCap))
            }
          }
        }
        val distDf = dist.toSeq.map { case (id, d) => (id, d) }
          .toDF("id", "d")
        clusters.select("id", "component")
          .join(broadcast(distDf), Seq("id"), "left")
          .select(col("id"), col("component"),
            coalesce(col("d"), lit(0L)).as("d"))
      case None =>
        val sym = edges
          .select(col("a_id").as("u"), col("b_id").as("v"))
          .unionAll(edges.select(col("b_id").as("u"), col("a_id").as("v")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var dist = truncate(clusters.where(col("id") === col("component"))
          .select(col("id"), col("component"), lit(0L).as("d")))
        var reached = dist.count()
        var round = 0L
        var grown = true
        try {
          while (grown && round < DepthCap) {
            round += 1
            val next = truncate(dist
              .join(sym, dist("id") === sym("u"))
              .select(col("v").as("id"), col("component"),
                (col("d") + 1L).as("d"))
              .unionByName(dist)
              .groupBy("id", "component").agg(min("d").as("d")))
            val n = next.count()
            dist.unpersist(); dropCheckpointFiles(dist)
            dist = next
            grown = n > reached
            reached = n
          }
          // beyond-cap (or cap-hit) members report exactly the cap
          clusters.join(dist.select("id", "d"), Seq("id"), "left")
            .select(col("id"), col("component"),
              coalesce(col("d"), lit(DepthCap)).as("d"))
        } finally { sym.unpersist(); () }
    }
  }

  /** [[qG11]]'s core on a caller-supplied (a_id < b_id) edge frame with a
    * `ham` column: the edges supported by zero triangles. Factored so a
    * fixture spec can pin the semantics (two cliques welded by one bridge
    * ⇒ exactly the bridge) without mining a corpus.
    *
    * HYBRID by declared bound like [[componentsOfPairs]] (round-19
    * optimization): under `maxDriverPairs` edges the triangle probe runs
    * on the driver over hash adjacency sets (O(Σ min-degree) set probes —
    * microseconds on a graph that fits the bound) and re-attaches to the
    * caller's frame by a broadcast semi-join; above the bound, the
    * distributed O(Σ deg²) probe ([[weakEdgesDistributed]], unchanged,
    * spec-pinned bit-equal on fixtures AND the mined corpus). The collect
    * is explicitly limit-checked — never corpus-sized. */
  private[graft] def weakEdges(pairs: DataFrame,
                               maxDriverPairs: Int = MaxDriverPairs): DataFrame = {
    val head = pairs.select("a_id", "b_id").limit(maxDriverPairs + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (head.length > maxDriverPairs) weakEdgesDistributed(pairs)
    else {
      val adj = scala.collection.mutable.Map.empty[Long,
        scala.collection.mutable.Set[Long]]
      head.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      // supported iff N(a) ∩ N(b) ≠ ∅ (w = a or w = b is impossible
      // without self-loops, which a canonical a < b edge frame excludes)
      val weak = head.filterNot { case (a, b) =>
        val na = adj(a); val nb = adj(b)
        val (small, big) = if (na.size <= nb.size) (na, nb) else (nb, na)
        small.exists(big.contains)
      }
      import pairs.sparkSession.implicits._
      pairs.join(broadcast(weak.toSeq.toDF("a_id", "b_id")),
        Seq("a_id", "b_id"), "left_semi")
    }
  }

  /** The distributed triangle probe — the above-bound path of
    * [[weakEdges]] and its equality oracle (the [[componentsOfPairs]]
    * hybrid discipline): symmetrize, attach a's neighbors, semi-probe
    * (b, w) against the adjacency, anti-join the supported set away. */
  private[graft] def weakEdgesDistributed(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionAll(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
    // an edge (a, b) is supported iff some w is adjacent to BOTH ends:
    // attach a's neighbors, then semi-probe (b, w) against the adjacency
    val supported = pairs.select("a_id", "b_id")
      .join(sym.select(col("u").as("a_id"), col("v").as("w")), "a_id")
      .join(sym.select(col("u").as("b_id"), col("v").as("w")),
        Seq("b_id", "w"), "left_semi")
      .select("a_id", "b_id").distinct()
    pairs.join(supported, Seq("a_id", "b_id"), "left_anti")
  }

  /** q_d16 — BOILERPLATE / TEMPLATE DETECTION: 8-token shingles shared by
    * ≥ 3 distinct documents, top-20 by document frequency (tiebreak
    * lexicographic). Cross-document repeated substrings are boilerplate —
    * navigation chrome, license headers, templated paragraphs — and the
    * C4/RefinedWeb-style cleaning pass removes THE SPAN, not the document,
    * so the detector must surface the spans themselves; whole-doc dedup
    * (q_d1) and near-dup (q_d4/q_d6) can't see a template pasted into
    * otherwise-distinct pages.
    *
    * Scale: one gram explode (the [[TextAnalysis.qT11]] kernel) with a
    * per-doc DISTINCT folded into the first hash aggregation, then a
    * gram-keyed count — work is corpus-linear in total grams, and the
    * df ≥ 3 filter drops the long singleton tail BEFORE the top-20
    * TakeOrdered (no global sort). At 100 TB the same plan runs with the
    * gram string replaced by its 128-bit hash as the GROUP KEY (carrying
    * one example string via `min(gram)` — collapsed to one row per
    * distinct gram by the map-side combine before it shuffles): flip
    * `-Dgraft.gramHashKeys=true` — [[qD16Keyed]] is that form, spec-pinned
    * bit-equal to the string-keyed plan; the sf-scale default keeps the
    * string key for oracle readability. */
  def qD16(s: SparkSession, dir: String): DataFrame =
    qD16Keyed(s, dir, gramHashKeys)

  /** 128-BIT GRAM-HASH KEYING (the q_d16/q_d17/q_d18/q_d19/q_t29 scale
    * posture, VERDICT r11 task 4): long gram strings as shuffle/group keys
    * cost hash+compare over variable-width bytes; two independent
    * `xxhash64` lanes (the second salted by an extra literal column) give
    * a 128-bit fixed-width key whose collision odds at 10¹² distinct
    * grams are ~10⁻¹³ (birthday bound) — and every keyed form is
    * spec-pinned bit-equal to its string-keyed twin on the test corpus.
    * Flip with `-Dgraft.gramHashKeys=true`. */
  private[graft] def gramHashKeys: Boolean =
    sys.props.get("graft.gramHashKeys").exists(_.toBoolean)

  /** The two 128-bit key columns for a gram column (see [[gramHashKeys]]). */
  private[operators] def gramKey(c: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] =
    Seq(xxhash64(c).as("h1"), xxhash64(c, lit(1)).as("h2"))

  private[graft] def qD16Keyed(s: SparkSession, dir: String,
                               hashKeys: Boolean): DataFrame = {
    val grams = Tables.spread(Tables.documents(s, dir))
      .select(split(lower(col("text")), " ").as("w"))
      // per-doc DISTINCT happens INSIDE the row (array_distinct before the
      // explode), so the gram stream needs no (doc_id, gram) exchange at
      // all — the only shuffle is the final gram-keyed count, map-side
      // combined. [[TextAnalysis.tokenGrams]] + .distinct() is the
      // two-exchange form; this is the same multiset.
      .select(explode(when(size(col("w")) >= 8,
          expr("array_distinct(transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' ')))"))
        .otherwise(expr("CAST(array() AS array<string>)"))).as("gram"))
    val counted =
      if (hashKeys)
        grams.groupBy(gramKey(col("gram")): _*)
          .agg(min("gram").as("gram"), count(lit(1)).as("df"))
      else grams.groupBy("gram").agg(count(lit(1)).as("df"))
    counted.select("gram", "df")
      .where(col("df") >= 3)
      .orderBy(desc("df"), col("gram"))
      .limit(20)
  }

  /** q_d17 — DUPLICATED-N-GRAM MASS: the corpus-level duplication metric
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"): of all 8-token-gram OCCURRENCES in the corpus, what
    * fraction belong to a gram that occurs more than once (`dup_pm`), and
    * what fraction to a gram seen in more than one document
    * (`cross_doc_pm`)? One row. Where q_d16 surfaces the top offending
    * SPANS, this prices the total duplicated token mass — the number that
    * says how much a substring-dedup pass (the suffix-array NearDup /
    * ExactSubstr pass at training scale) would actually remove, and the
    * health metric tracked release-over-release on a refreshed corpus.
    *
    * Exactness: pure integer counts and per-mille integer DIV.
    *
    * Scale: grams keep their multiplicity (unlike q_d16's per-doc
    * distinct), so the plan is explode → (gram, doc)-keyed count with
    * map-side combine → gram-keyed reduce of the already-collapsed
    * (gram, doc) frame → a single global sum. The second exchange carries
    * one row per DISTINCT (gram, doc), far below the token stream; at
    * 100 TB group by the gram's 128-bit hash ([[gramHashKeys]] — here the
    * gram string drops out entirely, so the shuffle rows ARE fixed-width)
    * exactly as q_d12 does for chunks; the sf-scale default keeps the
    * string key for oracle readability. */
  def qD17(s: SparkSession, dir: String): DataFrame =
    qD17Keyed(s, dir, gramHashKeys)

  private[graft] def qD17Keyed(s: SparkSession, dir: String,
                               hashKeys: Boolean): DataFrame = {
    val grams = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 8,
          expr("transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' '))"))
        .otherwise(expr("CAST(array() AS array<string>)"))).as("gram"))
    val keyed =
      if (hashKeys)
        grams.select((gramKey(col("gram")) :+ col("doc_id")): _*)
          .groupBy("h1", "h2", "doc_id").agg(count(lit(1)).as("c"))
          .groupBy("h1", "h2")
      else grams.groupBy("gram", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("gram")
    keyed.agg(sum("c").as("occ"), count(lit(1)).as("df"))
      .agg(
        sum("occ").as("total_occ"),
        count(lit(1)).as("distinct_grams"),
        sum(when(col("occ") >= 2, col("occ")).otherwise(0L)).as("dup_occ"),
        sum(when(col("df") >= 2, col("occ")).otherwise(0L)).as("cross_doc_occ"))
      .select(col("total_occ"), col("distinct_grams"), col("dup_occ"),
        col("cross_doc_occ"),
        expr("(dup_occ * 1000) DIV total_occ").as("dup_pm"),
        expr("(cross_doc_occ * 1000) DIV total_occ").as("cross_doc_pm"))
  }

  /** q_d18 — SUBSTRING-DEDUP REMOVAL ACCOUNTING, the per-document form of
    * the ExactSubstr pass of Lee et al. 2022: [[qD17]] prices the corpus-
    * wide duplicated-gram mass in one number; this computes what the
    * removal pass would actually do to EACH document — a token position is
    * removed iff it is COVERED by some duplicated 8-gram occurrence (gram
    * count ≥ 2 corpus-wide, within-doc repeats included), and the output
    * is per-doc (token count, covered count, kept per-mille). The
    * difference matters: a doc can have low duplicated-GRAM share but
    * high covered-TOKEN share (overlapping grams tile a span), and
    * kept_pm is the number a curation run thresholds on ("drop docs that
    * dedup would hollow out below 40%").
    *
    * Exactness: pure integer counts, per-mille integer DIV; coverage is a
    * distinct-position count, insensitive to how many grams tile a token.
    *
    * Scale: grams carry their start index built in-row (named_struct
    * inside the [[TextAnalysis.tokenGrams]] HOF — one explode, no token
    * table); the duplicated-gram set reduces by gram key with map-side
    * combine; marking occurrences is a gram-keyed equi-join of the two
    * gram streams — with [[gramHashKeys]] the gram string is replaced by
    * its 128-bit hash on BOTH sides (fixed-width join/shuffle rows, the
    * q_d12 discipline, spec-pinned bit-equal; AQE splits the
    * boilerplate-gram skew); coverage explodes ×8 on the DUPLICATED
    * subset only, then reduces per doc. Never all-pairs, never a window
    * over the token stream. */
  def qD18(s: SparkSession, dir: String): DataFrame =
    qD18Keyed(s, dir, gramHashKeys)

  /** The (doc, position, key...) gram frame shared by qD18/qD19: string
    * keys by default, (h1, h2) 128-bit hash keys with `hashKeys` — the
    * join key columns are whatever [[gramJoinKeys]] names. */
  private def positionedGrams(toks: DataFrame, hashKeys: Boolean): DataFrame = {
    val g = toks.select(col("doc_id"), explode(when(col("n") >= 8,
        expr("transform(sequence(1, n - 7), i -> " +
          "named_struct('i', i, 'gram', array_join(slice(w, i, 8), ' ')))"))
      .otherwise(expr("CAST(array() AS array<struct<i:int,gram:string>>)")))
      .as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.gram").as("gram"))
    if (hashKeys)
      g.select((Seq(col("doc_id"), col("i")) ++ gramKey(col("gram"))): _*)
    else g
  }

  private def gramJoinKeys(hashKeys: Boolean): Seq[String] =
    if (hashKeys) Seq("h1", "h2") else Seq("gram")

  private[graft] def qD18Keyed(s: SparkSession, dir: String,
                               hashKeys: Boolean): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
    val grams = positionedGrams(toks, hashKeys)
    val keys = gramJoinKeys(hashKeys)
    val dup = grams.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select(keys.head, keys.tail: _*)
    val covered = grams.join(dup, keys)
      .select(col("doc_id"), explode(expr("sequence(i, i + 7)")).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("cov"))
    toks.select(col("doc_id"), col("n"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        coalesce(col("cov"), lit(0L)).as("covered"),
        expr("((n - coalesce(cov, 0L)) * 1000) DIV n").as("kept_pm"))
      .orderBy("doc_id")
  }

  /** Q-D19 — SUBSTRING-DEDUP REMOVAL, APPLIED: [[qD18]] ACCOUNTS what an
    * ExactSubstr pass (Lee et al. 2022) would remove; this one RUNS it —
    * per document, the cleaned text with every token covered by a
    * duplicated 8-gram occurrence (corpus count ≥ 2) removed, plus the
    * kept-token count. The output is what actually feeds the tokenizer
    * after dedup, so boilerplate masses (license headers, navigation
    * chrome) vanish from the training stream instead of merely being
    * priced.
    *
    * Reconstruction is deterministic both engines: kept positions in
    * ascending order re-joined with single spaces (split's "" tokens
    * survive as empty segments on both sides, so the round trip of an
    * untouched doc is exact). Scale: identical gram machinery to qD18
    * (incl. the [[gramHashKeys]] fixed-width-key form) — the ×8 coverage
    * explode runs on the duplicated subset only, the per-doc
    * covered-position list is doc-sized (collected per doc, never
    * corpus-wide), and the rebuild is one map-side projection over the
    * (tokens ⨝ covered-list) doc-keyed join. */
  def qD19(s: SparkSession, dir: String): DataFrame =
    qD19Keyed(s, dir, gramHashKeys)

  private[graft] def qD19Keyed(s: SparkSession, dir: String,
                               hashKeys: Boolean): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
    val grams = positionedGrams(toks, hashKeys)
    val keys = gramJoinKeys(hashKeys)
    val dup = grams.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select(keys.head, keys.tail: _*)
    val covered = grams.join(dup, keys)
      .select(col("doc_id"), explode(expr("sequence(i, i + 7)")).as("p"))
      .distinct()
      .groupBy("doc_id").agg(collect_list("p").as("cov"))
    toks.join(covered, Seq("doc_id"), "left")
      .withColumn("cv", expr("coalesce(cov, CAST(array() AS array<int>))"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        (col("n") - size(col("cv"))).cast("long").as("n_kept"),
        expr("array_join(transform(" +
          "filter(sequence(1, n), i -> NOT array_contains(cv, i)), " +
          "i -> element_at(w, CAST(i AS INT))), ' ')").as("clean_text"))
      .orderBy("doc_id")
  }
}
