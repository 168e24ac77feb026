package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Skew-mitigation proof (SURVEY.md §7.3 item 6): the utilities in
  * [[Skew]] are correctness-tested in ExtensionsSpec; this spec demonstrates
  * the two mitigation paths actually FIRING on skewed data:
  *
  *  1. joins — AQE's runtime skew-join split (the engine's declared answer
  *     for hot join keys) marks and splits the oversized partition;
  *  2. aggregations — the salted two-phase shape spreads a hot key's rows
  *     over `buckets` reducers in phase 1 (asserted structurally: the
  *     phase-1 grouping carries the salt).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "skew-spec")

  test("AQE splits the skewed join partition at runtime") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so the hot partition (key 0: ~98% of a
      // ~200k-row side) triggers the same split a multi-GB partition would
      // on a real cluster; broadcast disabled so the join is a shuffle SMJ
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // pad must be incompressible (md5, row-unique) — shuffle partition
      // sizes are COMPRESSED bytes, and a constant pad deflates to nothing
      val hot = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 100 < 98 THEN 0L ELSE id % 1000 END AS k",
        "md5(CAST(id AS STRING)) AS pad")
      val dim = spark.range(0, 1000).selectExpr("id AS k", "repeat('y', 8) AS d")
      // global agg downstream: no output-partitioning requirement, so AQE is
      // free to split (a groupBy(k) above the join would inhibit the split
      // unless forceOptimizeSkewedJoin accepts the extra exchange)
      val q = hot.join(dim, "k").agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join split must fire on the hot key:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("AQE splits a hot merge key in RawMerge.classify (duplicated-document feed)") {
    // Scale note: the classic Cosmos hot PARTITION (one pk holding half the
    // container) does NOT skew this join — the merge key is (id ++ pk), and
    // unique ids hash a hot pk's rows uniformly across reducers. What does
    // skew it is a hot full key: the same document replayed for a large
    // fraction of a dirty source feed. That oversized (id, pk) partition is
    // what AQE's runtime skew split must absorb on the classify exchange.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      graft.functions.GraftFunctions.register(spark)
      // 100k source docs, 98% replays of d0; md5 pads keep the shuffle bytes
      // incompressible so partition sizes reflect the row counts
      val src = spark.range(0, 100000).selectExpr(
        "concat('{\"id\":\"', CASE WHEN id % 100 < 98 THEN 'd0' ELSE CAST(id AS STRING) END, " +
          "'\",\"pk\":\"p0\",\"pad\":\"', md5(CAST(id AS STRING)), '\"}') AS raw")
      val tgt = spark.range(0, 2000).selectExpr(
        "concat('{\"id\":\"', CASE WHEN id = 0 THEN 'd0' ELSE CAST(id AS STRING) END, " +
          "'\",\"pk\":\"p0\",\"pad\":\"', md5(CAST(id + 7 AS STRING)), '\"}') AS raw")
      val q = graft.operators.RawMerge.classify(spark, src, tgt, Seq("/pk"))
        .agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew split must fire on the classify exchange:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salted aggregation spreads the hot key across phase-1 reducers") {
    val hot = spark.range(0, 100000).selectExpr(
      "CASE WHEN id % 100 < 98 THEN 0L ELSE id % 1000 END AS k", "id AS v")
    val q = Skew.saltedCount(hot, "k", buckets = 16)
    // correctness: same result as the straight groupBy
    val straight = hot.groupBy("k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == straight)
    // structure: the phase-1 exchange partitions on (k, salt) — the hot
    // key's rows land on up to 16 reducers instead of one (Catalyst renames
    // the salt alias to _groupingexpression in the agg keys)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("k#") &&
        (l.contains("__salt") || l.contains("_groupingexpression"))),
      s"phase-1 exchange must partition on (k, salt):\n$plan")
  }
}
