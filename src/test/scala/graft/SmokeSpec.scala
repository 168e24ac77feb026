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

  test("q_t37: intra-doc repetition — a looping doc flags, a repeat-free doc keeps, short docs zero-guard") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-t37").toString
    Seq(
      (1L, "a b a b a b", "en", "s", 11L),   // every 2-gram and 3-gram repeats
      (2L, "u v w x y z", "en", "s", 11L),   // no repetition at all
      (3L, "p q", "en", "s", 3L))            // too short for 3-grams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$root/documents.parquet")
    val r = graft.operators.TextAnalysis.qT37(spark, root).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("occ2"), x.getAs[Long]("occ3"),
          x.getAs[Long]("dup2_pm"), x.getAs[Long]("dup3_pm"),
          x.getAs[Long]("keep")))).toMap
    // "a b a b a b": 5 bigram occurrences, all of repeated grams ("a b"x3,
    // "b a"x2); 4 trigram occurrences, all repeated ("a b a"x2, "b a b"x2)
    assert(r(1L) == ((5L, 4L, 1000L, 1000L, 0L)), s"looping doc: ${r(1L)}")
    assert(r(2L) == ((5L, 4L, 0L, 0L, 1L)), s"clean doc: ${r(2L)}")
    // 1 bigram, zero trigrams: the zero guard reports 0 pm, keep stands
    assert(r(3L) == ((1L, 0L, 0L, 0L, 1L)), s"short doc: ${r(3L)}")
  }

  test("q_x10: mix lift flags both directions on a skewed fixture; independent corpus stays unflagged") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the shipped corpus is near-independent (sf0.1 lifts 683-1301, zero
    // flags) — the flag semantics need a fixture that actually skews:
    // en comes almost entirely from source A, fr entirely from B
    val root = java.nio.file.Files.createTempDirectory("graft-x10").toString
    ((1 to 10).map(i => (i.toLong, "t", "en", "A", 1L)) ++
      (11 to 20).map(i => (i.toLong, "t", "fr", "B", 1L)) ++
      Seq((21L, "t", "en", "B", 1L), (22L, "t", "en", "B", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$root/documents.parquet")
    val r = graft.operators.Relational.qX10(spark, root).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getAs[Long]("lift_pm"), x.getAs[Long]("skew")))).toMap
    // (en,A): 10*22*1000/(12*10) = 1833 -> over; (en,B): 2*22*1000/(12*12)
    // = 305 -> under; (fr,B): 10*22*1000/(10*12) = 1833 -> over
    assert(r(("en", "A")) == ((1833L, 1L)), s"en/A: ${r(("en", "A"))}")
    assert(r(("en", "B")) == ((305L, -1L)), s"en/B: ${r(("en", "B"))}")
    assert(r(("fr", "B")) == ((1833L, 1L)), s"fr/B: ${r(("fr", "B"))}")
    assert(r.size == 3, "only occupied cells emit")
  }

  test("q_j11: NOT IN is null-aware — null-keyed probe rows drop, unlike LEFT ANTI") {
    import org.apache.spark.sql.functions.{col, expr}
    val nulledKey = expr("CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END")
    val e = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), nulledKey.as("k"))
    val nullIds = e.where(col("k").isNull).collect().map(_.getLong(0)).toSet
    assert(nullIds.nonEmpty, "fixture must null some keys or the test is vacuous")
    val naaj = graft.operators.Joins.qJ11(spark, sf).collect().map(_.getLong(0)).toSet
    assert(naaj.intersect(nullIds).isEmpty,
      "NOT IN must drop null-keyed probe rows (three-valued logic)")
    // the contrast that makes this a DIFFERENT operator: plain LEFT ANTI on
    // the SAME key KEEPS the null-keyed rows (null never equi-matches)
    val f = graft.core.Tables.orders(spark, sf)
      .where(col("o_orderstatus") === "F").select("o_custkey")
    val anti = e.join(f, col("k") === col("o_custkey"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(nullIds.subsetOf(anti), "LEFT ANTI keeps null-keyed probe rows")
    assert(naaj == anti -- nullIds,
      "NAAJ differs from LEFT ANTI by exactly the null-keyed rows (no build-side nulls)")
  }

  test("q_d15: keep-first accounting — min member survives, corpus accounted") {
    val rows = graft.operators.Dedup.qD15(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_vecs"); val np = r.getAs[Long]("n_pruned")
      assert(np < nv, "a cell's minimum id is never a pair's b_id — it survives")
      assert(np <= r.getAs[Long]("n_dup_pairs"), "each pruned id has >= 1 pair")
      assert(r.getAs[Long]("keep_pm") == ((nv - np) * 1000) / nv)
    }
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      graft.core.Tables.embeddings(spark, sf).count(),
      "every vector is assigned to exactly one cell")
  }

  test("q_t20: unigram score brackets and discriminates") {
    val rows = graft.operators.TextAnalysis.qT20(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      // bits/token is in [0, 63]: per-mille score in [0, 63000]
      val pm = r.getAs[Long]("ll_pm")
      assert(pm >= 0 && pm <= 63000)
    }
    // the filter must discriminate, not emit a constant
    assert(rows.map(_.getAs[Long]("ll_pm")).distinct.length > 1,
      "scores must vary across documents")
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

  test("q_d17: duplicated-gram mass is internally consistent") {
    val r = graft.operators.Dedup.qD17(spark, sf).collect().head
    val total = r.getAs[Long]("total_occ")
    val dup = r.getAs[Long]("dup_occ")
    val cross = r.getAs[Long]("cross_doc_occ")
    assert(total >= r.getAs[Long]("distinct_grams"), "occurrences >= types")
    assert(dup <= total && cross <= total)
    // a gram in 2+ docs necessarily occurs 2+ times, never the converse
    assert(cross <= dup, "cross-doc mass is a subset of duplicated mass")
    assert(r.getAs[Long]("dup_pm") >= r.getAs[Long]("cross_doc_pm"))
  }

  test("q_o2: at most 3 per language, globally ordered") {
    val rows = graft.operators.Relational.qO2(spark, sf).collect()
    assert(rows.length <= 20)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, g) =>
      assert(g.length <= 3, s"language $l exceeds the diversity cap")
    }
    val lens = rows.map(_.getAs[Long]("n_chars"))
    assert(lens.zip(lens.tail).forall { case (a, b) => a >= b }, "ranked by length desc")
  }

  test("q_t25: spectrum masses account for every token") {
    val rows = graft.operators.TextAnalysis.qT25(spark, sf).collect()
    assert(rows.nonEmpty)
    val tokens = graft.core.Tables.documents(spark, sf)
      .selectExpr("explode(split(lower(text), ' ')) AS w").where("w <> ''").count()
    assert(rows.map(_.getAs[Long]("occ_mass")).sum == tokens, "mass conservation")
    // every type with frequency f >= 2^bin sits in a well-formed bin
    rows.foreach { r =>
      assert(r.getAs[Long]("bin") >= 0)
      assert(r.getAs[Long]("occ_mass") >= r.getAs[Long]("n_types"), "occ >= types per bin")
    }
  }
}
