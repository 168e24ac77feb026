package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 Part B for the declared
  * inventory. Every entry in `queries` returns a totally-ordered DataFrame
  * whose column names match the DuckDB `oracleSql` exactly (the driver's
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 core (Q-A2): multi-measure hash aggregate over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qA2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scans / sources
    "q_s1_scan_projection" -> (Relational.qS1 _),
    "q_s2_json_access"     -> (Relational.qS2 _),
    // filters
    "q_f1_conjunctive"     -> (Relational.qF1 _),
    "q_f2_valid_id"        -> (Relational.qF2 _),
    // projection
    "q_p1_coalesce_inject" -> (Relational.qP1 _),
    // joins
    "q_j1_broadcast_dim"   -> (Joins.qJ1 _),
    "q_j2_fact_fact"       -> (Joins.qJ2 _),
    "q_j3_left_anti"       -> (Joins.qJ3 _),
    "q_j4_left_semi"       -> (Joins.qJ4 _),
    "q_j5_full_outer_diff" -> (Joins.qJ5 _),
    "q_j6_composite_key"   -> (Joins.qJ6 _),
    // aggregates
    "q_a1_count"           -> (Relational.qA1 _),
    "q_a2_hash_agg"        -> (Relational.qA2 _),
    "q_a3_count_distinct"  -> (Relational.qA3 _),
    "q_a4_rollup"          -> (Relational.qA4 _),
    // windows
    "q_w1_dedup_latest"    -> (Windows.qW1 _),
    "q_w2_running_sum"     -> (Windows.qW2 _),
    "q_w3_lag_gap"         -> (Windows.qW3 _),
    // sort / limit
    "q_o1_topk"            -> (Relational.qO1 _),
    // set ops
    "q_u1_union_all"       -> (Relational.qU1 _),
    "q_u2_except"          -> (Relational.qU2 _),
    "q_u3_intersect"       -> (Relational.qU3 _),
    // scalar battery / json
    "q_x1_scalar_battery"  -> (Relational.qX1 _),
    "q_x3_json_agg"        -> (Relational.qX3 _),
    // verification
    "q_v1_count_parity"    -> (Relational.qV1 _),
    "q_v2_content_hash"    -> (Relational.qV2 _),
  )

  /** DuckDB-dialect equivalent for each key in `queries` (the driver runs
    * these on the same parquet tables at sf0.01 and hash-compares). */
  def oracleSql: Map[String, String] = Map(
    "q_s1_scan_projection" -> (
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_s2_json_access" -> (
      "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY event_id"),
    "q_f1_conjunctive" -> (
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.05 AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber"),
    "q_f2_valid_id" -> (
      "SELECT count(1) AS n FROM events WHERE user_id IS NOT NULL"),
    "q_p1_coalesce_inject" -> (
      "SELECT o_orderkey, coalesce(o_orderpriority, 'NONE') AS pr FROM orders ORDER BY o_orderkey"),
    "q_j1_broadcast_dim" -> (
      "SELECT n_name, count(1) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"),
    "q_j2_fact_fact" -> (
      "SELECT o_orderkey, count(1) AS c FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey ORDER BY o_orderkey"),
    "q_j3_left_anti" -> (
      "SELECT event_id FROM events ANTI JOIN orders ON user_id = o_custkey ORDER BY event_id"),
    "q_j4_left_semi" -> (
      "SELECT c_custkey FROM customer SEMI JOIN orders ON c_custkey = o_custkey ORDER BY c_custkey"),
    "q_j5_full_outer_diff" -> (
      "SELECT coalesce(c_custkey, o_custkey) AS k, (c_custkey IS NULL) AS only_t, (o_custkey IS NULL) AS only_s " +
        "FROM customer FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey ORDER BY k"),
    "q_j6_composite_key" -> (
      "SELECT count(1) AS n FROM lineitem l JOIN lineitem r ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber"),
    "q_a1_count" -> (
      "SELECT count(1) AS n FROM lineitem"),
    "q_a2_hash_agg" -> (
      "SELECT l_returnflag, l_linestatus, count(1) AS c, ROUND(sum(l_quantity), 2) AS sq, ROUND(avg(l_extendedprice), 2) AS ap " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q_a3_count_distinct" -> (
      "SELECT count(DISTINCT o_custkey) AS n FROM orders"),
    "q_a4_rollup" -> (
      "SELECT n_name, o_orderstatus, count(1) AS c FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY ROLLUP(n_name, o_orderstatus) " +
        "ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST, c"),
    "q_w1_dedup_latest" -> (
      "SELECT event_id FROM (SELECT event_id, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id) AS rn FROM events) t " +
        "WHERE rn = 1 ORDER BY event_id"),
    "q_w2_running_sum" -> (
      "SELECT event_id, ROUND(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rs " +
        "FROM events ORDER BY event_id"),
    "q_w3_lag_gap" -> (
      "SELECT event_id, epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us " +
        "FROM events ORDER BY event_id"),
    "q_o1_topk" -> (
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q_u1_union_all" -> (
      "SELECT k FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey AS k FROM supplier) t ORDER BY k"),
    "q_u2_except" -> (
      "SELECT c_custkey FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t ORDER BY c_custkey"),
    "q_u3_intersect" -> (
      "SELECT c_nationkey FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t ORDER BY c_nationkey"),
    "q_x1_scalar_battery" -> (
      "SELECT l_orderkey, l_linenumber, lower(l_returnflag) AS lf, substr(l_linestatus, 1, 1) AS s1, " +
        "year(l_shipdate) AS y, month(l_shipdate) AS m, " +
        "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS net, abs(l_quantity) AS q " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_x3_json_agg" -> (
      "SELECT event_type, count(1) AS c FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL GROUP BY event_type ORDER BY event_type"),
    "q_v1_count_parity" -> (
      "SELECT ((SELECT count(1) FROM lineitem) = (SELECT count(1) FROM lineitem)) AS ok"),
    "q_v2_content_hash" -> (
      "SELECT count(1) AS n, CAST(sum(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS h FROM orders"),
  )
}
