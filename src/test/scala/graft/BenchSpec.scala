package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bench harness's noise defenses — specifically the round-11
  * baseline-aware end-of-suite re-measure pass (VERDICT r10 top fix: six
  * queries recorded 2x-13x their BASELINE.md row because the in-place retry
  * re-ran them inside the same host-contention window). These tests drive
  * `Bench.remeasure` with synthetic timers, no SparkSession needed. */
class BenchSpec extends AnyFunSuite with Matchers {

  test("baselineRows parses markdown rows exactly like check_bench.py") {
    val md =
      """# BASELINE
        |some prose | not a row |
        || Metric | Value | Config |
        || q_a1_count | 0.12 | sf0.1 | whatever |
        ||q_v1_count_parity|0.17| x |
        || q_bad | notanumber | x |
        |""".stripMargin
    val rows = Bench.baselineRows(md)
    rows shouldBe Map("q_a1_count" -> 0.12, "q_v1_count_parity" -> 0.17)
  }

  test("overBudget: only a measured min over 2x a known row qualifies") {
    Bench.overBudget(0.5, Some(0.2)) shouldBe true // 2.5x
    Bench.overBudget(0.39, Some(0.2)) shouldBe false // 1.95x
    Bench.overBudget(0.4, Some(0.2)) shouldBe false // exactly 2x is in-contract
    Bench.overBudget(5.0, None) shouldBe false // row-less: outside contract
    Bench.overBudget(-1.0, Some(0.2)) shouldBe false // error sentinel
  }

  test("re-measure pass triggers on a synthetic slow row and keeps the min") {
    // q_slow recorded 13x its row (the r10 q_v1 shape); the fresh run at
    // suite end lands back at steady state.
    val results = Seq(
      ("q_fast", 0.10, Vector(0.12, 0.10, 0.11)),
      ("q_slow", 2.27, Vector(2.27, 2.31, 2.40)))
    val rows = Map("q_fast" -> 0.09, "q_slow" -> 0.17)
    var calls = List.empty[String]
    val (updated, remeasured, _) = Bench.remeasure(results, rows, extraRuns = 3) {
      name => calls ::= name; (0.15, None)
    }
    remeasured shouldBe Seq("q_slow")
    calls shouldBe List("q_slow") // early-stop: one in-budget run suffices
    val slow = updated.find(_._1 == "q_slow").get
    slow._2 shouldBe 0.15 +- 1e-9
    slow._3 shouldBe Vector(2.27, 2.31, 2.40, 0.15) // fresh run visible in spread
    updated.find(_._1 == "q_fast").get._2 shouldBe 0.10 +- 1e-9
  }

  test("a real regression survives all extra runs and stays visible") {
    val results = Seq(("q_reg", 1.0, Vector(1.0, 1.1, 1.05)))
    var n = 0
    val (updated, remeasured, _) =
      Bench.remeasure(results, Map("q_reg" -> 0.2), extraRuns = 3) { _ =>
        n += 1; (0.95, None) // faster, but still 4.75x the row
      }
    n shouldBe 3 // exhausted the budget, never converged
    remeasured shouldBe Seq("q_reg")
    updated.head._2 shouldBe 0.95 +- 1e-9 // best real measurement, still SLOW
  }

  test("erroring re-runs never improve the recorded min") {
    val results = Seq(("q_slow", 2.0, Vector(2.0, 2.1, 2.2)))
    val (updated, _, errs) =
      Bench.remeasure(results, Map("q_slow" -> 0.1), extraRuns = 2) { _ =>
        (0.01, Some("boom")) // fast because it crashed — not a measurement
      }
    updated.head._2 shouldBe 2.0 +- 1e-9
    // the crash's elapsed must not pollute the spread (it would otherwise
    // become the spread minimum) and the error must surface in the artifact
    updated.head._3 shouldBe Vector(2.0, 2.1, 2.2)
    errs shouldBe Map("q_slow" -> "boom")
  }

  test("row-less and in-budget queries are never re-measured") {
    val results = Seq(
      ("q_norow", 9.0, Vector(9.0)),
      ("q_ok", 0.3, Vector(0.3)))
    val (updated, remeasured, _) =
      Bench.remeasure(results, Map("q_ok" -> 0.2), extraRuns = 3) { _ =>
        fail("timer must not be invoked")
      }
    remeasured shouldBe empty
    updated shouldBe results
  }

  test("the shipped BASELINE.md covers every registered query (contract gap" +
    " check the driver's check_bench.py also enforces)") {
    val md = java.nio.file.Files.readString(java.nio.file.Paths.get("BASELINE.md"))
    val rows = Bench.baselineRows(md)
    val missing = SparkEntry.queries.keySet.diff(rows.keySet)
    withClue(s"queries without a BASELINE.md row: $missing") {
      missing shouldBe empty
    }
  }

  test("the shipped SCALING_SLOPE.json covers every registered query and " +
    "nothing else (VERDICT r12 task 8: the slope-gate)") {
    // the round-12 drift this refuses: 8 new queries shipped without a
    // slope row (164 != 172) and no other artifact check noticed — the
    // scaling-slope sweep is the instrument that catches a super-linear
    // plan, so a registry entry without a row is a coverage hole
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SCALING_SLOPE.json"))
    val slopeNames = """"(q_\w+)":\{"t_small"""".r
      .findAllMatchIn(json).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    withClue(s"registry entries without a slope row: ${registry.diff(slopeNames)}") {
      registry.diff(slopeNames) shouldBe empty
    }
    withClue(s"slope rows for unregistered queries: ${slopeNames.diff(registry)}") {
      slopeNames.diff(registry) shouldBe empty
    }
    val n = """"n_queries":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
    n shouldBe Some(registry.size)
  }

  test("slope-merge refusal gate: differing AND missing config fields " +
    "both refuse (ADVICE r14: legacy artifacts must not merge)") {
    val cur = ("{\"metric\":\"scaling_slope\",\"data_ratio\":10.0," +
      "\"margin\":1.3,\"sf_small\":\"/a/sf0.01\",\"sf_large\":\"/a/sf0.1\"}")
    // identical configuration → mergeable
    BenchSlope.mergeConfigMismatches(cur, "/a/sf0.01", "/a/sf0.1",
      10.0) shouldBe empty
    // numeric spelling differences are NOT mismatches ("10" == "10.0")
    BenchSlope.mergeConfigMismatches(cur.replace("10.0,", "10,"),
      "/a/sf0.01", "/a/sf0.1", 10.0) shouldBe empty
    // a differing scale pair refuses
    BenchSlope.mergeConfigMismatches(cur, "/a/sf0.001", "/a/sf0.1", 100.0)
      .exists(_.contains("sf_small")) shouldBe true
    // a LEGACY artifact missing config fields refuses too — field() used
    // to return None and the check silently passed
    val legacy = "{\"metric\":\"scaling_slope\",\"queries\":{}}"
    val mm = BenchSlope.mergeConfigMismatches(legacy, "/a/sf0.01",
      "/a/sf0.1", 10.0)
    withClue(mm.mkString("; ")) {
      mm.count(_.contains("artifact=<absent>")) shouldBe 4
    }
  }
}
