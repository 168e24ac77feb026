package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Join inventory (SURVEY.md §2 Part B, Q-J1..Q-J6).
  *
  * The reference's only join is the implicit per-document point-read merge
  * (/root/reference/src/migration.py:119-122): 2 serial HTTPS round-trips per
  * document. Re-expressed relationally, the point-read is a join against a
  * target snapshot — the insert branch is a LEFT ANTI join, the existence
  * probe a LEFT SEMI, the bidirectional diff a FULL OUTER.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - dimension joins (Q-J1, Q-J4-ish shapes) broadcast the small side —
  *    zero shuffle of the fact table for the join itself;
  *  - fact-fact joins (Q-J2, Q-J6) shuffle both sides on the join key once;
  *    AQE handles skewed keys (skew-join split) at runtime;
  *  - composite keys (Q-J6) mirror the reference's hierarchical partition key
  *    (migration.py:21-39): the join key is the full pk path list.
  */
object Joins {

  /** Q-J1 — broadcast hash equi-join: small dim (nation, 25 rows at any SF)
    * against customer. Explicit broadcast() hint — never shuffle a fact
    * table to join a dimension that fits in memory. */
  def qJ1(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("c"))
      .orderBy("n_name")
  }

  /** Q-J2 — fact-fact equi-join (orders x lineitem): sort-merge with a single
    * shuffle per side on the key; at scale this is the shape to co-locate via
    * bucketing on l_orderkey/o_orderkey.
    *
    * The count is aggregated BELOW the join (valid because o_orderkey is
    * unique in orders): partial aggregation then shrinks the lineitem side
    * map-side before its shuffle, and the join moves one pre-counted row per
    * key instead of every line item — an agg-pushdown Catalyst doesn't do
    * on its own. */
  def qJ2(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val lc = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("c"))
    o.select("o_orderkey").join(lc, "o_orderkey")
      .orderBy("o_orderkey")
  }

  /** Q-J3 — LEFT ANTI: the insert-branch dedup (create only when absent,
    * migration.py:140-146) as one distributed join instead of N point reads. */
  def qJ3(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val o = Tables.orders(s, d)
    e.join(o, e("user_id") === o("o_custkey"), "left_anti")
      .select("event_id")
      .orderBy("event_id")
  }

  /** Q-J4 — LEFT SEMI: existence probe (the point-read hit path,
    * migration.py:119-122). */
  def qJ4(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** Q-J5 — FULL OUTER: bidirectional diff for verification (A10/A15) —
    * rows only in target vs only in source in one pass. */
  def qJ5(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select("o_custkey").distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("k"),
        col("c_custkey").isNull.as("only_t"),
        col("o_custkey").isNull.as("only_s"))
      .orderBy("k")
  }

  /** Q-J6 — composite-key join: hierarchical partition key
    * (migration.py:21-39) as a multi-column join key. Self-join of lineitem
    * on (orderkey, linenumber).
    *
    * The `merge` hint declares the join strategy (round-19 optimization,
    * guide §3.1): both sides are the biggest fact table, so at scale
    * neither may become a broadcast build side — yet at bench SF the
    * planner's size estimate chose exactly that, collecting 600 k rows
    * into a driver-built broadcast relation (1.18 s vs 0.63 s hinted,
    * measured). With SMJ forced, the two sides are byte-identical shuffle
    * subtrees, so ReuseExchange computes the composite-key exchange ONCE —
    * one exchange + sorts, the plan a 100 TB self-join actually wants, and
    * it spills gracefully where a shuffled-hash build can OOM on a fat
    * partition. */
  def qJ6(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber")
    val r = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber")
    l.hint("merge").join(r, Seq("l_orderkey", "l_linenumber"))
      .agg(count(lit(1)).as("n"))
  }

  /** Q-J8 — MEASURED skewed-key join (SURVEY §7.3 risk 6): ~90% of the
    * events side collapses onto one derived hot key (the replayed-document /
    * hot-tenant shape), then joins a second fact side on that key. The
    * `merge` hint declares the 100 TB contract — both sides are fact-scale,
    * so neither may become a broadcast build side; with a shuffle join in
    * place, the oversized key-0 partition is exactly what AQE's runtime
    * skew-join split absorbs (PlanAuditSpec asserts the split fires with
    * cluster-scale thresholds; at bench SF the partition is legitimately
    * under the default 256 MB threshold and needs no split). One subtlety
    * this query documents: the per-key aggregate above the join REUSES the
    * join's hash partitioning, which makes AQE skip the free skew split —
    * the 100 TB posture for this shape is
    * `spark.sql.adaptive.forceOptimizeSkewedJoin=true`, trading one extra
    * key-cardinality-sized post-agg exchange for splitting the multi-GB hot
    * partition (asserted in PlanAuditSpec). */
  def qJ8(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).selectExpr(
      "CASE WHEN user_id % 10 <> 0 THEN 0L ELSE user_id END AS k", "event_id")
    val o = Tables.orders(s, d).selectExpr("o_orderkey % 1500 AS k")
    // sum over a MOD-REDUCED term, not raw ids: a hot key aggregates ~all
    // rows, and sum(event_id) exceeds int64 at large SF — where Spark and
    // DuckDB diverge (wrap/error vs HUGEINT promotion). ≤1e5 per row keeps
    // the sum exact at any realistic scale in both engines.
    e.hint("merge").join(o, "k")
      .groupBy("k")
      .agg(count(lit(1)).as("c"), sum(col("event_id") % 100003L).as("se"))
      .orderBy("k")
  }

  /** AS-OF JOIN: for each left row, the single right row with the greatest
    * time ≤ the left time on the same key — the temporal-enrichment
    * operator (event → latest prior dimension version / price / order)
    * that relational engines special-case (DuckDB `ASOF JOIN`, which is the
    * oracle here) and Spark has no native operator for.
    *
    * Spark-first formulation — NOT a range join: tag both sides, union,
    * and take `last(right_value, ignoreNulls) OVER (PARTITION BY key
    * ORDER BY (time, side) ROWS UNBOUNDED PRECEDING..CURRENT)`. Right rows
    * sort before left rows at equal time, so the match is inclusive
    * (`ts >= t`). One shuffle on the key and one sort — the same cost as a
    * plain equi-join of the two sides; a per-left-row range join would be
    * O(left × right-per-key) and a lateral LIMIT 1 per row is a
    * driver-killer. The pattern holds at 100 TB: the union partitions by
    * key like any fact-fact join (AQE skew split applies), and no
    * intermediate exceeds input + output size.
    *
    * Right side pre-aggregates to ONE row per (key, time) — max orderkey —
    * which both fixes the tie semantics (an as-of pick among same-time
    * rows is otherwise engine-arbitrary) and keeps the window's ignoreNulls
    * scan trivially correct. */
  def qJ9(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val o = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .agg(max("o_orderkey").as("ok"))
    val tagged = o
      .select(col("k"), col("t"), col("ok"),
        lit(null).cast("long").as("event_id"), lit(0).as("side"))
      .unionAll(e.select(col("k"), col("t"),
        lit(null).cast("long").as("ok"), col("event_id"), lit(1).as("side")))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("asof_orderkey", last("ok", ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("asof_orderkey"))
      .orderBy("event_id")
  }

  /** BANDED RANGE JOIN: points (`events.value`) against intervals
    * ([lo, hi) derived per order) with NO equi key — the shape Spark would
    * otherwise plan as a broadcast-nested-loop / cartesian product, which
    * is quadratic and a non-starter at fact×fact scale.
    *
    * The scale pattern: quantize the range dimension into fixed-width
    * bands wider than any interval, so an interval covers ≤ 2 bands —
    * explode intervals to their covered bands (≤ 2× row inflation), map
    * each point to its single band, EQUI-join on the band, and apply the
    * exact range predicate as a post-filter. The O(n·m) pair space
    * collapses to pairs sharing a band: one shuffle per side on a
    * uniformly-distributed integer key (AQE skew split applies if the
    * value distribution clusters), candidates ≈ points × intervals-per-
    * band-width. Band width tunes shuffle fan-out vs candidate count —
    * pick it just ABOVE the max interval span: candidates per band scale
    * with (points/band) × (intervals/band), so a band 20× wider than the
    * intervals pays ~20× the candidate volume for the same matches
    * (measured at sf0.1: width 1.0 → ~60M candidates, 1.08 s; width 0.1 →
    * ~6M, ~4× faster). The exact predicate post-filters either way — band
    * width is pure physics, invisible in the result.
    *
    * Determinism across engines: interval bounds derive from INTEGER
    * arithmetic pushed through one IEEE double division/addition
    * (`(o_orderkey % 2800) / 20.0`, `lo + 0.05`) — bit-identical in Spark
    * and DuckDB, no float rounding functions involved. The oracle runs the
    * same join as a native DuckDB IEJoin — an independent algorithm
    * validating the banded decomposition. The `merge` hint declares the
    * fact×fact contract (neither side broadcastable at scale). */
  def qJ10(s: SparkSession, d: String): DataFrame = {
    // band = floor(x * 10): width 0.1, just above the 0.05 interval span.
    // Multiplication is IEEE-monotone, so a point inside [lo, hi) can never
    // band outside [band(lo), band(hi)] — the decomposition is lossless.
    val e = Tables.events(s, d).select(col("event_id"), col("value"))
      .withColumn("band", floor(col("value") * 10.0).cast("long"))
    val iv = Tables.orders(s, d)
      .select(col("o_orderkey"),
        ((col("o_orderkey") % 2800).cast("double") / 20.0).as("lo"))
      .withColumn("hi", col("lo") + 0.05)
      .withColumn("band", explode(sequence(
        floor(col("lo") * 10.0).cast("long"), floor(col("hi") * 10.0).cast("long"))))
    // both hash terms are MOD-REDUCED before the multiply so the combined
    // value stays ≤ ~1e11 at any SF: raw event_id * 100003 overflows int64
    // at scale, where Spark and DuckDB diverge (wrap/error vs HUGEINT)
    e.hint("merge").join(iv, "band")
      .where(col("value") >= col("lo") && col("value") < col("hi"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr(
          "bit_xor((event_id % 1000003) * 100003 + (o_orderkey % 100003))"),
          lit(0L)).as("h"))
  }

  /** Q-J11 — NULL-AWARE anti join (`NOT IN (subquery)`): the exclusion
    * filter with three-valued-logic semantics — a probe row whose key is
    * NULL, or ANY null in the build side, makes the predicate UNKNOWN and
    * drops the row. This is a DIFFERENT physical operator from [[qJ3]]'s
    * plain LEFT ANTI (which KEEPS null-keyed probe rows — null never
    * equi-matches): Spark plans the single-column form as
    * `BroadcastHashJoin ... LeftAnti, BuildRight, NAAJ` — the O(1)-per-probe
    * hash form of a predicate that otherwise degenerates to a
    * BroadcastNestedLoopJoin (the null check must consult the WHOLE build
    * side). The probe key models the reference's falsy-id validation
    * (`/root/reference/src/migration.py:92-97` — documents with
    * missing/falsy ids route to an error channel, not the merge): ids
    * failing the validity rule become NULL, and NOT IN's UNKNOWN semantics
    * is exactly "an unvalidatable id asserts nothing" — those rows drop
    * rather than pass as not-matched.
    *
    * Scale: the build side is an aggregated key set (distinct custkeys of
    * 'F'-status orders), orders of magnitude below the fact table — the
    * broadcast is the right plan at 100 TB, and the probe side streams
    * map-only. PlanAuditSpec pins the NAAJ (no nested-loop fallback);
    * SmokeSpec contrasts against plain LEFT ANTI on the same key. */
  def qJ11(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("graft_j11_events")
    Tables.orders(s, d).createOrReplaceTempView("graft_j11_orders")
    s.sql(
      """SELECT event_id FROM graft_j11_events
        |WHERE (CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END) NOT IN
        |  (SELECT o_custkey FROM graft_j11_orders WHERE o_orderstatus = 'F')
        |ORDER BY event_id""".stripMargin)
  }

  /** Q-J12 — BLOOM SEMI-JOIN REDUCTION: a fact-fact equi-join against a
    * selectively-filtered dimension (urgent finished orders, ~6.7% of the
    * orders fact), with the probe side pre-filtered MAP-SIDE by a bloom
    * filter built over the dim keys — the runtime-filter pattern that
    * decides shuffle volume at 100 TB. A plain shuffle join moves ALL of
    * lineitem through the exchange and discards ~93% of it at the join;
    * the bloom probe ([[graft.functions.BloomMightContain]], codegen'd
    * into the scan's fused loop) drops non-matching rows BEFORE the
    * exchange at two-hash-per-row cost, so the shuffle carries only
    * (matches + fpp·non-matches). The exact join then removes the bloom's
    * false positives — the result is IDENTICAL to the plain join for any
    * fpp, which is why the oracle is the plain join: the sketch affects
    * bytes moved, never the answer.
    *
    * Build path: the filter is a distributed partial+merge aggregate over
    * the dim ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]],
    * the qV6 build), sized by an exact pushed-down count of the filtered
    * dim — at 1% fpp ≈ 1.2 bytes/key, a ~10M-key dim is a ~12 MB
    * broadcast-sized constant, far under the exchange volume it saves.
    * This is Spark's own `runtime.bloomFilter` injection made EXPLICIT:
    * the optimizer's version fires on heuristics (creation-side size
    * thresholds); a pipeline that knows its dim filter is selective
    * declares the reduction and keeps it under test. The `merge` hint pins
    * the fact-fact contract (neither side broadcast at scale — with a
    * broadcast join the probe would be pointless, since the same hash
    * table already filters map-side).
    *
    * Two bounded driver steps: the dim-count row (sizing) and the merged
    * filter itself; both dim-scaled, never fact-scaled.
    *
    * The filter BINDS AS BYTES, not as SQL text: the probe Column wraps
    * [[graft.functions.BloomMightContain]] directly
    * ([[org.apache.spark.sql.GraftColumn.of]]), so the bytes ride the
    * expression tree (→ `addReferenceObj` in codegen) and the PLAN TEXT is
    * O(1) in dim cardinality. The `bloom_might_contain('<hex>', k)` SQL
    * registration remains as a convenience path for small filters only —
    * at 1% fpp a 1M-key dim would be ~2.4 MB of hex inside every parsed /
    * analyzed / canonicalized plan copy. PlanAuditSpec pins the O(1) bound. */
  def qJ12(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .where(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val nKeys = math.max(dim.count(), 1L)
    val bf = dim.stat.bloomFilter(col("o_orderkey"), nKeys, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber")
      .where(org.apache.spark.sql.GraftColumn.of(
        graft.functions.BloomMightContain(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("l_orderkey"),
          bos.toByteArray)))
    // the qJ10 hash discipline: mod-reduce before multiply so the checksum
    // stays well under int64 at any SF, where Spark and DuckDB agree
    probe.hint("merge").join(dim, probe("l_orderkey") === dim("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr(
          "bit_xor((l_orderkey % 1000003) * 100003 + l_linenumber)"),
          lit(0L)).as("h"))
  }
}
