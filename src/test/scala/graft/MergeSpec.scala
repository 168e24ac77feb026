package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Canonical, PartitionKeys}
import graft.operators.Merge

/** Merge-engine unit tests (SURVEY.md §5.2 items 3 and 5): canonicalizer
  * depth coverage (kills the reference's B2 bug class), pk traversal,
  * classification branches, and merge idempotence. Fixtures follow
  * FIXTURES.md §2 document shapes.
  */
class MergeSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "merge-spec")
  import spark.implicits._

  private def docs(jsons: String*) =
    spark.read.json(spark.createDataset(jsons))

  test("canonicalizer strips system fields at top level") {
    val df = docs("""{"id":"a","x":1,"_etag":"e","_rid":"r","_self":"s","_ts":1}""")
    assert(Canonical.strip(df).columns.toSet == Set("id", "x"))
  }

  test("canonicalizer strips system fields inside nested structs") {
    val df = docs("""{"id":"a","nest":{"y":2,"_etag":"e"}}""")
    val out = Canonical.strip(df)
    assert(out.schema("nest").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet == Set("y"))
  }

  test("canonicalizer strips system fields inside structs inside arrays (B2 fix)") {
    // the reference misses this case: migration.py:224-226 never iterates
    // list elements (SURVEY.md §2.3 B2)
    val a = docs("""{"id":"a","items":[{"v":1,"_etag":"x"}]}""")
    val b = docs("""{"id":"a","items":[{"v":1,"_etag":"y"}]}""")
    val ca = Canonical.strip(a).select(to_json(struct(col("*")))).head.getString(0)
    val cb = Canonical.strip(b).select(to_json(struct(col("*")))).head.getString(0)
    assert(ca == cb, "docs identical up to a nested-in-array _etag must canonicalize equal")
    assert(!ca.contains("_etag"))
  }

  test("canonicalizer is idempotent and preserves null structs") {
    val df = docs(
      """{"id":"a","nest":{"y":2,"_etag":"e"},"items":[{"v":1}]}""",
      """{"id":"b","nest":null,"items":null}""")
    val once = Canonical.strip(df)
    val twice = Canonical.strip(once)
    val j1 = once.orderBy("id").select(to_json(struct(col("*")))).collect().toSeq
    val j2 = twice.orderBy("id").select(to_json(struct(col("*")))).collect().toSeq
    assert(j1 == j2)
    assert(once.filter(col("id") === "b").head.isNullAt(once.columns.indexOf("nest")))
  }

  test("pk extraction walks nested paths and null-short-circuits") {
    // FIXTURES.md §2.2: nested pk path /owner/region (migration.py:30-34)
    val df = docs(
      """{"id":"1","owner":{"region":"emea"}}""",
      """{"id":"2","owner":null}""")
    val got = df.select(col("id"), PartitionKeys.extract("owner/region").as("pk"))
      .orderBy("id").collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(got == Seq(("1", Some("emea")), ("2", None)))
  }

  test("classification hits all four branches") {
    val src = Seq(
      ("1", "p", "same"),     // skip
      ("2", "p", "changed"),  // update
      ("3", "p", "new"),      // insert
      (null, "p", "noid"),    // error: missing id
      ("5", "", "nopk")       // error: empty pk
    ).toDF("id", "pk", "text")
    val tgt = Seq(
      ("1", "p", "same"),
      ("2", "p", "old"),
      ("9", "p", "target-only")).toDF("id", "pk", "text")
    val got = Merge.classify(src, tgt, "id", Seq("pk"), Seq("text"))
      .groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("skip" -> 1L, "update" -> 1L, "insert" -> 1L, "error" -> 2L))
  }

  test("merged state keeps target-only rows and a re-run is all skips") {
    val src = Seq(("1", "p", "same"), ("2", "p", "changed"), ("3", "p", "new"))
      .toDF("id", "pk", "text")
    val tgt = Seq(("1", "p", "same"), ("2", "p", "old"), ("9", "p", "keep"))
      .toDF("id", "pk", "text")
    val after = Merge.merged(src, tgt, "id", Seq("pk"), Seq("text"))
    assert(after.count() == 4)
    assert(after.filter(col("id") === "9" && col("text") === "keep").count() == 1)
    // idempotence (FIXTURES.md §2.4): second run writes nothing
    val rerun = Merge.classify(src, after, "id", Seq("pk"), Seq("text"))
      .groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rerun == Map("skip" -> 3L))
  }

  test("observe metrics surface via QueryExecutionListener (A23)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var captured: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("merge").foreach(r => captured = Some(r))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val src = Seq(("1", "p", "a"), ("2", "p", "b"), ("3", "p", "c"),
        (null, "p", "x")).toDF("id", "pk", "text")
      val tgt = Seq(("1", "p", "a"), ("2", "p", "OLD")).toDF("id", "pk", "text")
      Merge.withMetrics(
        Merge.classify(src, tgt, "id", Seq("pk"), Seq("text"))).collect()
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = captured.getOrElse(fail("no 'merge' observed metrics delivered"))
      val got = Map("insert" -> m.getAs[Long]("insert"),
        "update" -> m.getAs[Long]("update"),
        "skip" -> m.getAs[Long]("skip"), "error" -> m.getAs[Long]("error"))
      assert(got == Map("insert" -> 1L, "update" -> 1L, "skip" -> 1L, "error" -> 1L),
        s"counters: $got")
    } finally spark.listenerManager.unregister(listener)
  }

  test("end-to-end file-backed merge is idempotent (FIXTURES.md §2.4)") {
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "merge-e2e").toString
    val src = Seq(
      ("emp-1", "eng", "alice", 1), ("emp-2", "eng", "bob", 2),
      ("emp-3", "ops", "carol", 3)).toDF("id", "pk", "name", "v")
    val tgt0 = Seq(
      ("emp-1", "eng", "alice", 1),          // identical → skip
      ("emp-2", "eng", "stale-bob", 1),      // mutated  → update
      ("emp-9", "ops", "target-only", 9))    // kept
      .toDF("id", "pk", "name", "v")
    src.write.mode("overwrite").json(s"$tmp/source")
    tgt0.write.mode("overwrite").json(s"$tmp/target0")

    def run(tgtPath: String, outPath: String): Map[String, Long] = {
      val s = spark.read.json(s"$tmp/source")
      val t = spark.read.json(tgtPath)
      val acts = Merge.classify(s, t, "id", Seq("pk"), Seq("name", "v"))
        .groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      Merge.merged(s, t, "id", Seq("pk"), Seq("name", "v"))
        .write.mode("overwrite").json(outPath)
      acts
    }
    val first = run(s"$tmp/target0", s"$tmp/target1")
    assert(first == Map("skip" -> 1L, "update" -> 1L, "insert" -> 1L))
    val second = run(s"$tmp/target1", s"$tmp/target2")
    assert(second == Map("skip" -> 3L))
  }
}
