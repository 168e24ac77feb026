package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational core of the engine: scans, filters, projections, aggregates,
  * sort/limit, and set operators (SURVEY.md §2 Part B, Q-S/F/P/A/O/U/V rows).
  *
  * Derivations from the reference:
  *  - full scan + projection  <- `SELECT * FROM c` pagination
  *    (/root/reference/src/migration.py:78-90); Spark partitions the scan, so
  *    no continuation-token machinery is needed.
  *  - valid-id filter          <- /root/reference/src/migration.py:92-97
  *  - coalesce pk-injection    <- /root/reference/src/migration.py:112-114
  *  - COUNT(*) verification    <- /root/reference/src/migration.py:61-69,182-211
  *  - content-hash parity (Q-V2) fixes the count-only verification weakness
  *    (SURVEY.md §2.3 B5): an order-independent checksum (sum of per-row
  *    hashes) that distributes as a partial+final aggregate at 100 TB.
  *
  * Every query ends with a total ORDER BY and wraps float aggregates in
  * ROUND(x, 2) so results hash-match the DuckDB oracle (SURVEY §2 Part B
  * preamble). All scans are plain parquet relations: Catalyst pushes filters
  * (`PushedFilters`) and prunes columns (`ReadSchema`) into the scan, which is
  * exactly the shape that survives a 100x scale-up.
  */
object Relational {

  /** Q-S1 — parquet scan + projection; only 3 of 11 lineitem columns read. */
  def qS1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q-S2 — JSON-in-string access over the schemaless `props` column
    * (document model, SURVEY §1.4). */
  def qS2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
      .orderBy("event_id")

  /** Q-S3 — Spark 4 VARIANT path for semi-structured access (SURVEY.md §1.4
    * option c): parse once into a variant, extract typed fields without a
    * per-field JSON re-parse — the fidelity-preserving representation for
    * the schemaless document payloads of the reference's data model. */
  def qS3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr("event_id",
        "variant_get(parse_json(props), '$.k', 'int') AS kv")
      .orderBy("event_id")

  /** Q-F1 — conjunctive predicates; both land in PushedFilters. */
  def qF1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q-F2 — valid-id filter, the reference's missing-id error branch
    * (migration.py:92-97) expressed as a count. */
  def qF2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .agg(count(lit(1)).as("n"))

  /** Q-P1 — computed column via coalesce: the pk-injection projection
    * (migration.py:112-114). */
  def qP1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        coalesce(col("o_orderpriority"), lit("NONE")).as("pr"))
      .orderBy("o_orderkey")

  /** Q-A1 — COUNT(*): the reference's only aggregate (migration.py:61-69). */
  def qA1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("n"))

  /** Q-A2 — multi-measure hash aggregate (TPC-H Q1 core). Partial+final
    * aggregation is automatic; the shuffle moves one row per (flag,status). */
  def qA2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("c"),
        round(sum("l_quantity"), 2).as("sq"),
        round(avg("l_extendedprice"), 2).as("ap"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q-A3 — COUNT(DISTINCT): id-uniqueness check at scale (2-phase expand). */
  def qA3(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(countDistinct(col("o_custkey")).as("n"))

  /** Q-A4 — ROLLUP over a 3-table join (reporting extension). The nation and
    * customer dims are broadcast; only orders shuffles. */
  def qA4(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    // Alias the grouping keys before rollup: the rollup's Expand node keeps
    // both the original and the null-padded copy of each grouping attribute,
    // which makes post-agg references to the bare names ambiguous.
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name").as("g_name"), col("o_orderstatus").as("g_status"))
      .agg(count(lit(1)).as("c"))
      .select(col("g_name").as("n_name"),
        col("g_status").as("o_orderstatus"), col("c"))
      .orderBy(col("n_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first, col("c"))
  }

  /** Q-A5 — CUBE over the same 3-table join as Q-A4: all four grouping
    * combinations in ONE Expand pass over the joined rows (4× row expansion
    * before the partial agg — still a single shuffle, vs four separate
    * GROUP BY jobs re-scanning the fact table). */
  def qA5(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name").as("g_name"), col("o_orderstatus").as("g_status"))
      .agg(count(lit(1)).as("c"))
      .select(col("g_name").as("n_name"),
        col("g_status").as("o_orderstatus"), col("c"))
      .orderBy(col("n_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first, col("c"))
  }

  /** Q-V3 — sketch-based verification at scale (the A15 extension SURVEY §2
    * A15 calls out): HyperLogLog++ distinct estimate next to the exact
    * count. At 100 TB the exact COUNT(DISTINCT) is a full shuffle of the key
    * column; the sketch is a fixed-size mergeable state per partition — the
    * cheap continuous drift check between migration runs. HLL estimates are
    * implementation-specific, so the raw estimate can't hash-match a DuckDB
    * oracle; instead the query emits the exact count plus a
    * `within_bound` relative-error check (|approx−exact|/exact ≤ 5%, i.e.
    * 2.5σ at the requested 2% rsd) that the oracle asserts is `true` — a
    * drifted sketch flips the boolean and fails the hash compare. */
  def qV3(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(col("exact"),
        (abs(col("approx") - col("exact")).cast("double") / col("exact") <= 0.05)
          .as("within_bound"))

  /** Q-V5 — SKETCH percentiles next to [[qV4]]'s exact ones: at 100 TB an
    * unbounded-domain column can't afford exact percentile's
    * O(distinct-values) state, so the profile runs on `approx_percentile`
    * (Greenwald-Khanna, fixed-size mergeable sketch). Like Q-V3's HLL row,
    * the sketch value itself is engine-specific — the oracle-checked
    * contract is the exact median plus a boolean: the sketch estimate's
    * RANK ERROR stays within the configured bound (accuracy 1000 →
    * ±n/1000 ranks, checked as a value-window via the exact p49/p51). */
  def qV5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
        expr("ROUND(percentile(l_quantity, 0.5), 2)").as("p50_exact"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50_sketch"),
        expr("percentile(l_quantity, 0.49)").as("lo"),
        expr("percentile(l_quantity, 0.51)").as("hi"))
      .select(col("p50_exact"),
        (col("p50_sketch") >= col("lo") && col("p50_sketch") <= col("hi"))
          .as("within_bound"))

  /** Q-V6 — BLOOM-FILTER membership next to [[qV3]]'s HLL: the third
    * fixed-size mergeable sketch a verification plane needs (HLL answers
    * "how many", CMS "how often", bloom "is this one present"). The filter
    * is built DISTRIBUTED over the orders fact (`DataFrameStatFunctions
    * .bloomFilter` — a partial+merge aggregate, one pass, fixed bits per
    * partition) and probed driver-side over a bounded deterministic key
    * set: 200 low customer keys (members iff they ordered) and 200 keys
    * PROVABLY outside the key space — derived as max(o_custkey)+1..+200
    * rather than a fixed range, so the non-member guarantee holds at EVERY
    * scale factor (a fixed 10M range becomes real customers at SF >= ~67,
    * where "false positives" would be member hits and flip fp_ok against
    * the oracle's pinned true). The checked contract is the sketch's ONE
    * hard guarantee plus its tuned soft one: zero false negatives, and a
    * false-positive rate within 5x the configured 3% (the estimate is
    * engine-specific; the booleans are not). The three collects are
    * bounded: one max row + the 400-key probe set. */
  def qV6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val bf = orders.stat.bloomFilter(col("o_custkey"), 100000L, 0.03)
    val memberKeys = orders.select(col("o_custkey"))
      .where(col("o_custkey") <= 200).distinct()
      .collect().map(_.getLong(0)).toSet
    val maxKey = orders.agg(max(col("o_custkey"))).collect()(0).getLong(0)
    val probes = (1L to 200L) ++ ((maxKey + 1L) to (maxKey + 200L))
    val says = probes.map(k => (memberKeys.contains(k), bf.mightContain(k)))
    val falseNeg = says.count { case (m, hit) => m && !hit }
    val nonMembers = says.count(!_._1)
    val fps = says.count { case (m, hit) => !m && hit }
    Seq((memberKeys.size.toLong, falseNeg.toLong,
        fps <= math.ceil(0.15 * nonMembers)))
      .toDF("members", "false_negatives", "fp_ok")
  }

  /** Q-V7 — COUNT-MIN SKETCH frequency estimates: built distributed over
    * the lineitem return-flag column (partial+merge aggregate, fixed
    * sketch per partition) and probed driver-side for each flag value.
    * The CMS guarantee is one-sided — estimate >= exact, and over-count
    * bounded by eps*N with the configured confidence — which is exactly
    * the boolean the oracle pins next to the exact counts (the estimates
    * themselves are hash-seed-specific). Bounded collects: 3 flag rows. */
  def qV7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val eps = 0.001
    val flags = Tables.lineitem(s, d).select(col("l_returnflag"))
    val cms = flags.stat.countMinSketch(col("l_returnflag"), eps, 0.99, 42)
    val exact = flags.groupBy("l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = exact.map(_._2).sum
    exact.toSeq.sortBy(_._1).map { case (f, c) =>
      val est = cms.estimateCount(f)
      (f, c, est >= c && est <= c + (3 * eps * n).toLong)
    }.toDF("l_returnflag", "exact", "within_bound")
  }

  /** Q-V8 — JOIN-KEY SKEW PROFILE: the pre-flight diagnostic for every
    * shuffle join/agg in this inventory (q_j8 handles skew at execution
    * time; this measures it beforehand): per-key row counts of the
    * supplier key reduced to key cardinality, hottest-key mass, p90 key
    * count, and an integer-exact skew factor (max/avg × 1000). At 100 TB
    * this is ONE map-combined count per key plus a key-cardinality-sized
    * reduce — the cheap question "will AQE need to split this key?"
    * answered without running the join. Skew factor through integer DIV
    * (HALF-free) so the row hash-matches the oracle. */
  def qV8(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_c"),
        sum(col("c")).as("total"),
        expr("ROUND(percentile(c, 0.9), 2)").as("p90_c"))
      .select(col("n_keys"), col("max_c"), col("p90_c"),
        expr("(max_c * 1000 * n_keys) DIV total").as("skew_x1000"))

  /** Q-V9 — MISRA-GRIES HEAVY HITTERS over the corpus token stream: the
    * deterministic frequent-items sketch next to [[qV3]]'s HLL ("how
    * many distinct"), [[qV5]]'s GK ("what quantile"), [[qV6]]'s bloom
    * ("is it present") and [[qV7]]'s CMS ("how often is THIS one") —
    * MG answers "WHICH items are frequent" without holding the full
    * vocabulary: each partition keeps at most k-1 counters
    * (`mapPartitions`), summaries merge by a (k-1)×partitions-row
    * shuffle-sum, and the merged estimate obeys the classic bound
    * est ≤ c and c − est ≤ n/k (each decrement round retires k
    * occurrences, so rounds ≤ n_p/k per partition, summing to ≤ n/k;
    * Agarwal et al., "Mergeable Summaries", PODS'12). Any token with
    * true count > n/k therefore survives with est > 0 — zero false
    * negatives on true heavy hitters, the guarantee this query pins.
    *
    * The oracle-checked contract (same posture as qV6/qV7: exact values
    * from a SQL-replayable aggregation, booleans for the sketch's
    * guarantees): one row per TRUE heavy hitter (exact count × k > n,
    * integer-exact) with `found` (it is in the sketch's candidate set)
    * and `within_bound` (the merged-estimate error bound) — both pinned
    * true. At 100 TB the exact side is the one token-shuffle with
    * map-side partial agg; the sketch side adds a map-only pass whose
    * output is metadata-sized (≤ 31 rows per partition), joined in as a
    * broadcast — nothing driver-side at all. */
  def qV9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 32
    val toks = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .where(col("t") =!= "")
    val partials = toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m(t) = c + 1
          case None if m.size < k - 1 => m(t) = 1L
          case None =>
            // decrement-all round: retires one occurrence of every held
            // token plus the incoming one — k occurrences per round
            val dead = List.newBuilder[String]
            m.foreachEntry((kk, v) =>
              if (v == 1L) dead += kk else m(kk) = v - 1)
            dead.result().foreach(m.remove)
        }
      }
      m.iterator
    }.toDF("t", "est").groupBy("t").agg(sum("est").as("est"))
    val counts = toks.groupBy("t").agg(count(lit(1)).as("c"))
    val n = counts.agg(sum("c").as("n"))
    counts.crossJoin(broadcast(n))
      .where(col("c") * k > col("n"))
      .join(broadcast(partials), Seq("t"), "left")
      .select(col("t"), col("c"),
        col("est").isNotNull.as("found"),
        (col("est") <= col("c") &&
          (col("c") - coalesce(col("est"), lit(0L))) * k <= col("n"))
          .as("within_bound"))
      .orderBy(desc("c"), col("t"))
  }

  /** Q-V10 — DATA-QUALITY CONSTRAINT BATTERY (the "expectations" audit a
    * pipeline runs before trusting a new drop): null-key, range, and
    * sign checks on the fact table, referential integrity fact→dim, and
    * primary-key uniqueness — one row per check with its violation
    * count, all integer. The operational complement of [[qV1]]/[[qV2]]:
    * those verify SYNC fidelity (same rows on both sides), this
    * verifies the DATA itself against declared invariants.
    *
    * Scale shape: the three lineitem checks FUSE into one scan-agg (a
    * single pass emits all three sums); referential integrity is a
    * LEFT ANTI join whose dim side broadcasts; pk uniqueness is one
    * map-combined count per key reduced to a violation count. The
    * check results are 1-row frames cross-joined (driver-free,
    * broadcast literals) and stacked — nothing here exceeds
    * O(one pass per table) at any scale. */
  def qV10(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).agg(
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_ok"),
      sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("qty_oor"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_nonpos"))
    val orphans = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    val dupPk = Tables.orders(s, d)
      .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1L, 1L).otherwise(0L)).as("dup_pk"))
    li.crossJoin(broadcast(orphans)).crossJoin(broadcast(dupPk))
      .selectExpr(
        """stack(5,
          |  'lineitem_null_orderkey', null_ok,
          |  'lineitem_qty_range', qty_oor,
          |  'lineitem_price_nonpositive', price_nonpos,
          |  'orders_orphan_custkey', orphans,
          |  'orders_dup_pk', dup_pk) AS (chk, n_bad)""".stripMargin)
      .orderBy("chk")
  }

  /** Q-V11 — KMV (k-minimum-values) DISTINCT SKETCH with SET ALGEBRA:
    * estimate |clickers|, |purchasers|, |union| and |intersection| from
    * three k=16 sketches, next to the exact truth (the q_d13-style
    * estimator audit). KMV is the sketch HLL can't replace: two KMV
    * sketches support union AND intersection estimation (Beyer et al.,
    * "Distinct-value synopses for multiset operations"), which is how an
    * engine prices a join's distinct-key overlap without scanning either
    * side twice.
    *
    * Estimator (hash space M = 2^32, md5-prefix hashes, k-th minimum
    * m_k = max of the k-smallest sketch):
    *   est(S)    = (k−1)·M DIV m_k          (exact |H(S)| when under-full)
    *   kmv(A∪B)  = k smallest of kmv(A) ∪ kmv(B)   (mergeable)
    *   est(A∩B)  = ρ·est(A∪B) DIV |kmv(A∪B)|, ρ = |kmv(A∪B) ∩ kmv(A) ∩ kmv(B)|
    * The |kmv| denominator (not k) makes the under-full case collapse to
    * the exact intersection — one formula, both regimes; sf0.001 (15
    * users < k) exercises the exact branch, sf0.01+ the estimator.
    *
    * Scale: each sketch is a TakeOrdered(k) over a distinct-hash frame —
    * per-partition k-smallest then a k·P-row merge, the mergeable-summary
    * shape; everything after the sketches touches ≤ 3k rows. The exact
    * columns exist for the audit and stay feasible at any SF (two
    * distinct-aggregates); a production run would drop them. */
  def qV11(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val ev = Tables.events(s, d)
    def hs(t: String, c: String): DataFrame =
      ev.where(col("event_type") === t)
        .selectExpr(graft.functions.Hashing.md5h32("CAST(user_id AS STRING)") + s" AS $c")
        .distinct()
    def kmv(f: DataFrame, c: String): DataFrame = f.orderBy(c).limit(k)
    val ka = kmv(hs("click", "ha"), "ha")
    val kb = kmv(hs("purchase", "hb"), "hb")
    val ku = kmv(ka.select(col("ha").as("h")).union(kb.select(col("hb").as("h")))
      .distinct(), "h")
    def estOf(f: DataFrame, c: String, out: String): DataFrame =
      f.agg(count(lit(1)).as("n"), max(col(c)).as("mx"))
        .selectExpr(s"CASE WHEN n < $k THEN n ELSE " +
          s"(($k - 1) * CAST(4294967296 AS BIGINT)) DIV mx END AS $out")
    val uAgg = ku.agg(count(lit(1)).as("s_u"), max("h").as("mx_u"))
    val rho = ku.join(ka, col("h") === col("ha"), "left_semi")
      .join(kb, col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("rho"))
    def users(t: String): DataFrame =
      ev.where(col("event_type") === t).select("user_id").distinct()
    val exU = users("click").union(users("purchase")).distinct()
      .agg(count(lit(1)).as("exact_union"))
    val exI = users("click").join(users("purchase"), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_inter"))
    estOf(ka, "ha", "est_a").crossJoin(estOf(kb, "hb", "est_b"))
      .crossJoin(uAgg).crossJoin(rho).crossJoin(exU).crossJoin(exI)
      .selectExpr(s"CAST($k AS BIGINT) AS k", "est_a", "est_b",
        s"CASE WHEN s_u < $k THEN s_u ELSE " +
          s"(($k - 1) * CAST(4294967296 AS BIGINT)) DIV mx_u END AS est_union",
        "s_u", "rho", "exact_union", "exact_inter")
      .selectExpr("k", "est_a", "est_b", "est_union",
        "(rho * est_union) DIV s_u AS est_inter", "exact_union", "exact_inter")
  }

  /** Q-A7 — TPC-H Q3 shape: the canonical 3-table analytics query
    * (selective dim filter → fact join → fact join → grouped measure →
    * top-k), the "real BI query" the rest of the inventory composes into.
    *
    * Plan shape (the 100 TB story): the segment filter prunes customer to
    * ~1/5 BEFORE its join — a small filtered dim broadcast into orders (no
    * orders shuffle for that join); the date predicates push into the
    * parquet scans (`PushedFilters`); the revenue measure aggregates per
    * orderkey BELOW the orders join (valid: o_orderkey is unique in
    * orders, the qJ2 pushdown Catalyst doesn't do itself) — so lineitem
    * pays its one shuffle as a map-combined partial aggregate, ~4×
    * smaller, and the orders side joins one pre-summed row per key; and
    * before ANY of that, lineitem is SEMI-JOINED against the qualifying
    * order-key set (the star-schema filter-through-join: segment × date
    * select ~3% of orders, so ~97% of lineitem rows — and their decimal
    * multiplies, partial sums, and shuffle bytes — never leave the scan
    * stage). The semi side is left unhinted: AQE runtime-broadcasts the
    * key set when its real size allows and falls back to a shuffled
    * semi-join when it doesn't — decided on actual sizes, not estimates.
    * Final top-10 is TakeOrderedAndProject, not a global sort. Revenue
    * multiplies through DECIMAL (exact 4-decimal rationals) so ROUND-half
    * cases hash-match the oracle, as in qX1. */
  def qA7(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    val lagg = l
      .join(oc.select(col("o_orderkey").as("__ok")),
        l("l_orderkey") === col("__ok"), "left_semi")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .as("rev"))
      .groupBy("l_orderkey")
      .agg(sum("rev").as("rev_sum"))
    lagg.join(oc, lagg("l_orderkey") === oc("o_orderkey"))
      .select(col("o_orderkey"),
        round(col("rev_sum"), 2).cast("double").as("revenue"),
        col("o_orderdate").cast("date").cast("string").as("od"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** Q-A9 — CORRELATED-AGGREGATE GATE (TPC-H Q17 shape): lineitems whose
    * quantity falls below 20% of their part's own average quantity, summed —
    * the "small-order" analysis whose naive spelling is a correlated scalar
    * subquery re-aggregating lineitem PER ROW. The scale-correct plan is its
    * decorrelation, written explicitly: aggregate once per part key, join the
    * one-row-per-key frame back, gate row vs group aggregate. Catalyst
    * performs the same rewrite on the subquery spelling; spelling it as the
    * agg+join keeps the plan shape pinned rather than trusting the rewriter.
    *
    * Exactness: the 0.2·avg threshold is cross-multiplied into integers —
    * `5·q·cnt < Σq` — so no division, no float, ever; quantities are
    * integer-valued doubles cast to BIGINT; revenue sums DECIMAL(18,2).
    *
    * Scale: the brand filter prunes `part` to ~1/25 and BROADCASTS it as a
    * semi-join, so ~96% of lineitem never leaves its scan stage; the
    * per-part aggregate is a map-combined partial over the pruned stream;
    * the gate join is per-part-keyed (both sides share the l_partkey
    * shuffle — ONE exchange serves the agg and the join); output is one
    * row. */
  def qA9(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val l = Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("q"),
        col("l_extendedprice").cast("decimal(18,2)").as("ep"))
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum("q").as("sq"))
    l.join(perPart, l("l_partkey") === perPart("pk"))
      .where(lit(5) * col("q") * col("cnt") < col("sq"))
      .agg(count(lit(1)).as("n_small"),
        sum("q").cast("long").as("qty_sum"),
        round(sum("ep"), 2).cast("double").as("revenue"))
  }

  /** Q-A6 — pivot: per-user event-type counts as columns. The pivot value
    * list is DECLARED (the 5 event kinds), not discovered — at scale the
    * discovery pass is a second full scan plus a collect of the distinct
    * values to the driver, and an unbounded value set would explode the
    * schema; a declared list keeps pivot a single-scan single-shuffle agg. */
  def qA6(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Q-X6 — date/time battery over `o_orderdate` (extraction, truncation,
    * day arithmetic, month boundaries). Date outputs go out as strings —
    * both engines format ISO — so the oracle compare is representation-
    * independent; day counts are exact integers. */
  def qX6(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      quarter(col("o_orderdate")).as("q"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_trunc("month", col("o_orderdate")).as("mstart"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("dd"),
      last_day(col("o_orderdate").cast("date")).cast("string").as("ld"))
      .orderBy("o_orderkey")

  /** Q-X10 — MIX INDEPENDENCE / LIFT AUDIT: per (lang, source) cell of
    * the corpus, observed document count and the LIFT versus independence
    * in per-mille — lift_pm = (n · N · 1000) DIV (n_lang · n_source), the
    * contingency-table ratio a mix planner reads before trusting
    * per-language quotas: lift ≈ 1000 means language and source are
    * independent (a per-language quota also balances sources); a cell at
    * 1500+ means this source over-contributes that language 1.5× (its
    * removal would crater the language), one under 667 the reverse — the
    * `skew` column flags both directions at those thresholds. The
    * chi-square test's cell ratio, kept as an exact rational instead of a
    * float statistic.
    *
    * Exactness: integer end-to-end. Declared bound (worst case — one
    * dominant cell with n ≈ N): the numerator n·N·1000 crosses Int64 near
    * N ≈ 10⁸ documents (√(2⁶³/1000) ≈ 9.6·10⁷), and non-ANSI Spark would
    * wrap silently — the [[graft.operators.TextAnalysis.qT33]]
    * declared-bound convention. Beyond ~10⁸ docs widen the numerator to
    * DECIMAL(38,0) (`CAST(n AS DECIMAL(38,0)) * nn * 1000`); the plan is
    * unchanged. When no single cell dominates the safe corpus size is
    * correspondingly larger (the bound is on max(n)·N·1000).
    *
    * Scale: ONE (lang, source)-keyed count with map-side combine — the
    * corpus reduces to a langs×sources frame; both marginals re-aggregate
    * THAT frame (never the corpus) and broadcast back; the total arrives
    * by the one-row crossJoin. */
  def qX10(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val byLang = cells.groupBy("lang").agg(sum("n").as("nl"))
    val bySrc = cells.groupBy("source").agg(sum("n").as("ns"))
    val tot = cells.agg(sum("n").as("nn"))
    cells.join(broadcast(byLang), "lang").join(broadcast(bySrc), "source")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n"),
        expr("(n * nn * 1000) DIV (nl * ns)").as("lift_pm"))
      .withColumn("skew",
        when(col("lift_pm") >= 1500, 1L)
          .when(col("lift_pm") <= 667, -1L).otherwise(0L))
      .orderBy("lang", "source")
  }

  /** Q-O1 — global top-k: planned as TakeOrderedAndProject (per-partition
    * heap + single merge), not a global sort. */
  def qO1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q-O2 — DIVERSIFIED TOP-K: global top-20 documents by length with at
    * most 3 per language — the per-group cap every retrieval/serving and
    * data-selection surface needs (a plain top-k returns 20 near-identical
    * hits from the dominant group; q_t10 caps a SAMPLE, this caps a
    * RANKING). Deterministic total order: length desc, doc_id asc.
    *
    * Scale: the per-group cap is a language-PARTITIONED window (each
    * shard ranks independently — no global sort), and only the ≤ 3·|langs|
    * survivors reach the final TakeOrdered(20). The unbounded-global-
    * window trap (rank everything, then filter) never appears. */
  def qO2(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select("doc_id", "lang", "n_chars")
      .withColumn("lr", row_number().over(
        Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))))
      .where(col("lr") <= 3)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("lr").cast("long").as("lang_rank"))

  /** Q-O3 — WEIGHTED SAMPLE via PRIORITY SAMPLING (Duffield–Lund–Thorup):
    * draw 20 documents with inclusion probability increasing in weight
    * (n_chars — "sample long documents more often", the length-biased draw
    * a curation pipeline uses to eyeball where the token mass lives).
    * Priority sampling assigns each item priority q = w / u with u uniform
    * in (0,1], keeps the top-k by q — a one-pass, merge-friendly scheme
    * with near-optimal variance for weighted subset sums.
    *
    * Engine-exact form: u derives from the 32-bit md5 fragment
    * ([[graft.functions.Hashing.md5h32]]) of the doc id — u = (h+1)/2^32 —
    * so q = w·2^32 DIV (h+1) is PURE INTEGER arithmetic (max n_chars·2^32
    * ≈ 2^41, no overflow), reproducible bit-for-bit in DuckDB: no float
    * division, no ln/pow (the exponential-jump formulations need both).
    * Deterministic-by-seed is a feature here, not a compromise: the same
    * property that makes the oracle replayable makes the sample itself
    * reproducible across reruns and engines — the audit requirement for
    * any sample that feeds a training mix.
    *
    * Scale: hash + priority are map-only codegen'd projections; the top-20
    * is a TakeOrdered (per-partition heaps + driver merge of 20-row
    * partials), never a global sort. One corpus pass, zero shuffle. */
  def qO3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", "lang", "CAST(n_chars AS BIGINT) AS w",
        graft.functions.Hashing.md5h32("CAST(doc_id AS STRING)") + " AS h")
      .selectExpr("doc_id", "lang", "w",
        "(w * 4294967296) DIV (h + 1) AS priority")
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(20)

  /** Q-U1 — UNION ALL: the multi-container consolidation loop
    * (/root/reference/src/main.py:141-148) as one plan. */
  def qU1(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .unionAll(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")

  /** Q-U2 — EXCEPT: one-directional content diff (A10). */
  def qU2(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey")
      .except(Tables.orders(s, d).select("o_custkey"))
      .orderBy("c_custkey")

  /** Q-U3 — INTERSECT. */
  def qU3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_nationkey")
      .intersect(Tables.supplier(s, d).select("s_nationkey"))
      .orderBy("c_nationkey")

  /** Q-U5 — UNION DISTINCT (the dedup variant of Q-U1: one hash-agg above
    * the concatenation; at scale the distinct is the shuffle, the union is
    * free). */
  def qU5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .distinct()
      .orderBy("k")

  /** Q-U6 — EXCEPT ALL: multiset difference (bag semantics — each target
    * occurrence cancels one source occurrence), the content-diff form that
    * preserves duplicate counts where Q-U2's set form collapses them. */
  def qU6(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .exceptAll(Tables.customer(s, d).select(col("c_custkey").as("k")))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .orderBy("k")

  /** Q-A8 — GROUPING SETS: the explicit form completing the ROLLUP (Q-A4) /
    * CUBE (Q-A5) family — only the declared combinations expand, so the
    * Expand factor is |sets|, not 2^dims. */
  def qA8(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.createOrReplaceTempView("graft_a8_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(1) AS c
        |FROM graft_a8_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c""".stripMargin)
  }

  /** Q-X1 — scalar function battery: string/date/math over lineitem
    * (the reference's only scalar ops are lower() and strip();
    * sanitizer.py:49, migration.py:22). */
  def qX1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        lower(col("l_returnflag")).as("lf"),
        substring(col("l_linestatus"), 1, 1).as("s1"),
        year(col("l_shipdate")).as("y"),
        month(col("l_shipdate")).as("m"),
        // price*(1-disc) is an exact 4-decimal rational, so its double sits
        // right on x.xx5 ROUND boundaries; round via DECIMAL(18,4) so this
        // engine and the DuckDB oracle resolve halves identically
        round(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")), 2)
          .cast("double").as("net"),
        abs(col("l_quantity")).as("q"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q-X3 — JSON access + aggregation over the document-model props. */
  def qX3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type")

  /** Q-V1 — count-parity verification, the reference's verify_migration
    * (migration.py:182-211): count both sides, compare. */
  def qV1(s: SparkSession, d: String): DataFrame = {
    val src = Tables.lineitem(s, d).agg(count(lit(1)).as("n_src"))
    val tgt = Tables.lineitem(s, d).agg(count(lit(1)).as("n_tgt"))
    src.crossJoin(tgt).select((col("n_src") === col("n_tgt")).as("ok"))
  }

  /** Q-V2 — content-hash parity (fixes SURVEY §2.3 B5: equal counts don't
    * prove equal contents). Order-independent checksum = sum of per-row
    * hashes; engine-agnostic via md5-hex-prefix so DuckDB reproduces it. */
  def qV2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        count(lit(1)).as("n"),
        sum(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long")).as("h"))

  /** Q-V4 — dataset PROFILE: per-column nulls, range, exact percentiles,
    * and key-cardinality in ONE aggregation pass — the drift/quality report
    * a training-data pipeline runs per snapshot (and the verification
    * family's "did the distribution move?" check next to Q-V1/V2's "did the
    * bytes move?").
    *
    * Scale note: `percentile` here is the EXACT aggregate so the DuckDB
    * oracle (`quantile_cont`, same linear interpolation) can pin it.
    * Spark's exact percentile keeps a value→count map per partial, so its
    * state is O(distinct values) — cheap for bounded-domain measures like
    * `l_quantity` (50 distinct) at ANY row count; for unbounded-domain
    * columns at 100 TB swap in `approx_percentile` (fixed-size sketch,
    * mergeable), trading the hash-exact oracle for an error bound, as
    * Q-V3 does for distinct counts. */
  def qV4(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"),
      count(when(col("l_quantity").isNull, lit(1))).as("q_nulls"),
      round(min("l_quantity"), 2).as("q_min"),
      round(max("l_quantity"), 2).as("q_max"),
      expr("ROUND(percentile(l_quantity, 0.25), 2)").as("q_p25"),
      expr("ROUND(percentile(l_quantity, 0.5), 2)").as("q_p50"),
      expr("ROUND(percentile(l_quantity, 0.9), 2)").as("q_p90"),
      countDistinct(col("l_returnflag")).as("rf_distinct"))
}
