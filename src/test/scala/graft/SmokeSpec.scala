package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.2 item 1): every declared query runs at sf0.001 and
  * returns a sane shape. Fast; correctness-vs-oracle is the driver's t2 gate
  * (and scripts/check_oracle.py locally).
  */
class SmokeSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "smoke")
  val sf = "/root/testdata/sf0.001"

  // queries whose correct result can be empty at tiny SF
  private val mayBeEmpty = Set("q_u2_except", "q_j3_left_anti")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q_t18: cluster routing leaks ZERO near-dup edges across splits") {
    val rows = graft.operators.TextAnalysis.qT18(spark, sf).collect()
    assert(rows.nonEmpty)
    // the construction's whole point, computed from the data, not assumed
    assert(rows.forall(_.getAs[Long]("cross_edges") == 0L),
      s"cluster-routed split must never separate a near-dup pair: ${rows.toSeq}")
    // shares are per-mille of the corpus and must account for every doc
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.core.Tables.documents(spark, sf).count())
  }

  test("q_t19: one survivor per dup family, member of its own component") {
    val rows = graft.operators.TextAnalysis.qT19(spark, sf).collect()
    assert(rows.nonEmpty)
    val comps = rows.map(_.getAs[Long]("component"))
    assert(comps.distinct.length == comps.length, "one row per component")
    rows.foreach { r =>
      assert(r.getAs[Long]("csize") >= 2L, "families only, no singletons")
      // the component label is its min member id, so any member >= label
      assert(r.getAs[Long]("survivor_id") >= r.getAs[Long]("component"))
    }
  }
}
