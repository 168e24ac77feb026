package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Window-function inventory (SURVEY.md §2 Part B, Q-W1..Q-W3).
  *
  * The reference has no window functions; these derive from its north-star
  * extensions: keep-latest dedup (the streaming form of the conflict-safe
  * insert, /root/reference/src/migration.py:140-146), running aggregates for
  * its rate metrics (migration.py:156-176), and lag-based session-gap
  * detection (precursor to session windows, ST-3).
  *
  * Scale: one shuffle on the PARTITION BY key per window spec; all three
  * share `(user_id)` partitioning so a multi-window plan reuses the exchange.
  * Skewed users are the risk at 100 TB — mitigation is AQE + pre-salting the
  * heavy hitters (the key set is low-cardinality per partition after hashing).
  * Ordering ties are always broken with event_id so results are total.
  */
object Windows {

  private def byUser = Window.partitionBy(col("user_id"))

  /** Q-W1 — row_number keep-latest dedup: one survivor per
    * (user_id, event_type), newest ts wins, event_id tiebreak. */
  def qW1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id")
      .orderBy("event_id")
  }

  /** Q-W2 — analytic frame: running sum per user (rate/metrics accumulation,
    * migration.py:156-176, as a distributed operator). */
  def qW2(s: SparkSession, d: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), round(sum(col("value")).over(w), 2).as("rs"))
      .orderBy("event_id")
  }

  /** Q-W3 — lag: inter-event gap in microseconds (sessionization precursor).
    * Microsecond integers (unix_micros vs DuckDB epoch_us) keep the oracle
    * comparison exact — no float epoch. */
  def qW3(s: SparkSession, d: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
      .orderBy("event_id")
  }

  /** Q-W4 — ntile quartiles + rank of order value per customer (integer
    * outputs — exact across engines; the window ORDER BY key set is unique
    * per partition so tile assignment is deterministic). Partitioned window
    * only: a global rank would move the table to one task — the
    * anti-pattern at scale. */
  def qW4(s: SparkSession, d: String): DataFrame = {
    val byCust = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        ntile(4).over(byCust).as("quartile"),
        rank().over(byCust).as("rk"))
      .orderBy("o_orderkey")
  }

  /** Q-W5 — distribution window functions completing the family:
    * percent_rank ((rank-1)/(n-1)) and cume_dist (rank-with-ties/n) per
    * customer. Both are one IEEE division of two exact small integers, so
    * the doubles are bit-identical across engines (no ROUND needed). Same
    * partitioned-window-only posture as Q-W4. */
  def qW5(s: SparkSession, d: String): DataFrame = {
    val byCust = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        percent_rank().over(byCust).as("pr"),
        cume_dist().over(byCust).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Q-W6 — INTERVAL MERGE (gaps-and-islands): per customer, union the
    * order activity intervals [orderdate, orderdate + orderkey%30 days]
    * (the deterministic synthetic interval end — this dataset carries no
    * second date column) into maximal non-overlapping spans and report
    * span count + total covered days — the classic "merge overlapping
    * intervals" operator (utilization / coverage analysis), which has no
    * direct relational primitive.
    *
    * Formulation: rows sorted by start within each customer; a row OPENS a
    * new span iff its start exceeds the running max of all earlier ends
    * (islands are well-defined under start-order regardless of tie order:
    * an equal start can never exceed a running max that already includes
    * an end >= that same date); the island id is the running count of
    * opens, and per-island coverage is max(end) − min(start) + 1 — all
    * integer DATE arithmetic, hash-exact across engines.
    *
    * Scale: both window passes partition by `o_custkey` and reuse ONE
    * exchange; the island aggregation re-uses the same partitioning, and
    * the final per-customer rollup reduces islands, not rows. No global
    * sort anywhere. */
  def qW6(s: SparkSession, d: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("st"), col("en"), col("o_orderkey"))
    val prevMaxEnd = max(col("en"))
      .over(byCust.rowsBetween(Window.unboundedPreceding, -1))
    val islands = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("st"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 30).cast("int")).as("en"))
      .withColumn("opens",
        when(prevMaxEnd.isNull || col("st") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("opens")).over(byCust.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col("o_custkey"), col("island"))
      .agg(min(col("st")).as("s0"), max(col("en")).as("e0"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_spans"),
        sum(datediff(col("e0"), col("s0")) + lit(1)).as("covered_days"))
      .orderBy("o_custkey")
  }

  /** Q-X7 — SEQUENTIAL PATTERN MINING over the event stream: the top-20
    * 3-step behavior paths (consecutive event-type trigrams per user in
    * time order) by global frequency — the funnel-discovery companion to
    * the fixed-funnel join (q_st7): that one counts a KNOWN sequence,
    * this one finds which sequences dominate.
    *
    * Scale: the trigram construction is two `lead`s over the per-user
    * window — ONE shuffle on user_id, both leads share the exchange and
    * the frame; the path count is a map-combined hash agg on a
    * low-cardinality key (|event_types|^3 ceiling); top-20 is
    * TakeOrderedAndProject. Ordering ties break on event_id so the
    * trigram stream — and therefore the counts — are total. */
  /** Q-W7 — CUMULATIVE DISTINCT USERS by day (the growth-curve /
    * "new vs returning" metric): naive running COUNT(DISTINCT) over an
    * expanding frame is O(days × users) state — the scale-correct
    * formulation reduces each user to their FIRST day (one hash agg over
    * the stream), buckets first-days into per-day new-user counts, and
    * prefix-sums the day-level series. The only window runs over
    * day-cardinality rows (thousands at any corpus size) — the unbounded
    * frame is over the calendar, never the users. */
  def qW7(s: SparkSession, d: String): DataFrame = {
    val firstDay = Tables.events(s, d)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    firstDay.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(byDay))
      .orderBy("day")
  }

  def qX7(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("path"))
      .limit(20)
  }

  /** Q-X11 — EVENT-TYPE TRANSITION MATRIX: per (event_type → next
    * event_type within the same user's timeline) pair, the transition
    * count and its per-mille share of all transitions LEAVING that source
    * type — the first-order Markov table behind funnel design, anomaly
    * detection (a transition whose share collapses release-over-release),
    * and behavioral simulation; [[qX7]] reports the top 3-step PATHS,
    * this the complete normalized 1-step matrix.
    *
    * Exactness: integer counts and per-mille integer DIV (row shares
    * re-derive from the pair frame itself, so Σshare_pm per source is
    * 1000 minus rounding).
    *
    * Scale: ONE user-keyed exchange feeds the lead() window (qX7's
    * shape — per-user partitions, never global); the pair frame then
    * reduces with map-side combine to a types² table and the per-source
    * totals re-aggregate THAT table (types-sized, broadcast back). */
  def qX11(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .where(col("e2").isNotNull)
      .groupBy(col("event_type").as("src"), col("e2").as("dst"))
      .agg(count(lit(1)).as("n"))
    pairs.join(broadcast(pairs.groupBy("src").agg(sum("n").as("ns"))), "src")
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000) DIV ns").as("share_pm"))
      .orderBy("src", "dst")
  }

  /** q_x8 — BATCH sessionization (the historical-reprocessing twin of the
    * ST-3 streaming session windows): per-user 30-minute-idle-gap sessions
    * via the classic lag → break-flag → running-sum-of-breaks assignment,
    * then a session-size histogram with total within-session duration.
    *
    * Scale: ONE exchange on `user_id` serves both window passes (lag and
    * the running sum share partitioning and ordering), the per-session
    * aggregate reuses it map-side, and the final histogram is
    * metadata-sized (distinct session lengths). Session count per user is
    * data-bounded, never collected. Gap arithmetic on floor-seconds
    * (timestamp→long truncation) so the result is integer-exact across
    * engines; ordering uses the full-precision timestamp. */
  /** q_x9 — COHORT RETENTION (the D0..D7 retention triangle): users are
    * cohorted by their first-seen day, activity is reduced to distinct
    * (user, day) pairs, and each cohort reports how many of its users were
    * active again N days after joining — the standard growth/engagement
    * analysis every event pipeline ships, and the one naive formulations
    * get quadratic (a per-day self-join of the user base).
    *
    * Scale: the event stream reduces to distinct (user, day) first (one
    * exchange, map-side combine); the cohort day is then a per-user window
    * MIN over that already-reduced frame — no self-join, no second pass
    * over raw events. The final rollup is (days × 8)-sized — metadata, not
    * data. The 0..7-day window bounds the output regardless of history
    * length; no global sort. Integer day arithmetic (DATE subtraction)
    * keeps the oracle hash-exact. */
  def qX9(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    act.withColumn("cohort_day", min(col("day")).over(byUser))
      .withColumn("offset_d", datediff(col("day"), col("cohort_day")).cast("long"))
      .where(col("offset_d").between(0, 7))
      .groupBy("cohort_day", "offset_d")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "offset_d")
  }

  def qX8(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("sec") - col("prev") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("events_n"),
        (max(col("sec")) - min(col("sec"))).as("dur"))
      .groupBy(col("events_n"))
      .agg(count(lit(1)).as("sessions"), sum(col("dur")).as("total_dur_s"))
      .orderBy(col("events_n"))
  }

  /** Q-W8 — DAY-OVER-DAY SPIKE DETECTION: per event type, flag days whose
    * event count more than doubles the previous day's — the cheapest
    * ingestion-monitoring query a pipeline runs per drop (a spike is a
    * duplicated feed or a bot; a silent halving is an outage; both show
    * here before they poison training mixes downstream). All-integer
    * comparison (c > 2·prev), no thresholds to tune cross-engine.
    *
    * Scale: one (type, day)-keyed agg with map-side partials reduces the
    * stream to calendar size; the lag window partitions by type over
    * days — metadata-sized, like [[qW7]]'s cumulative frame. The raw
    * event volume is touched exactly once. */
  def qW8(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("prev_c", lag(col("c"), 1).over(w))
      .withColumn("spike",
        col("prev_c").isNotNull && col("c") > col("prev_c") * 2)
      .orderBy("event_type", "day")
  }

  /** Q-W9 — ROBUST spike detection: [[qW8]] flags on yesterday alone, so a
    * two-day ramp or one quiet Sunday fools it; the monitoring form that
    * survives noisy feeds compares each day against the MEDIAN of its
    * trailing 7 days — one outlier day cannot move a median, so a single
    * bad reference day stops minting false alarms. A day is anomalous when
    * its count exceeds 2× that trailing median, with at least 4 days of
    * history (no verdict on a cold start).
    *
    * Exactness across engines: the trailing window is a collect→sort→pick
    * of ≤ 7 INTEGER daily counts, and "median" is the LOWER median
    * (element (n+1)/2 of the sorted list) — pure integer selection, no
    * float averaging of middle pairs, so the oracle hash-matches with zero
    * tolerance. The all-integer flag is `c > 2·med`, nothing to tune.
    *
    * Scale: identical posture to [[qW8]] — the raw stream reduces to a
    * (type, day) calendar-sized frame in one map-combined agg; the window
    * holds ≤ 7 longs per row over that metadata-sized frame, so the
    * collect_list frame is bounded BY CONSTRUCTION, never data-sized. */
  def qW9(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("hist", array_sort(collect_list(col("c")).over(w)))
      .withColumn("med",
        when(size(col("hist")) >= 4,
          expr("element_at(hist, CAST((size(hist) + 1) DIV 2 AS INT))"))
          .cast("long"))
      .withColumn("anomaly", col("med").isNotNull && col("c") > col("med") * 2)
      .select(col("event_type"), col("day"), col("c"), col("med"), col("anomaly"))
      .orderBy("event_type", "day")
  }
}
