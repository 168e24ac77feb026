package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ContainerProps, FileAccount}

/** Container snapshots + time travel: `CALL graft.system.snapshot` publishes
  * an immutable copy of the container state (data tree, layout metadata,
  * count sidecar), `SELECT ... VERSION AS OF 'tag'` / `TIMESTAMP AS OF`
  * read it through the full batch scan stack, and `CALL
  * graft.system.restore` returns the live container to snapshot state via
  * the same copy-then-swap discipline as re-bucketing. SURVEY §9 addendum
  * records the copy-vs-manifest trade. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "snapshot-spec")

  private def newAccount(prefix: String): FileAccount = {
    val root = Files.createTempDirectory(Paths.get("target"), prefix)
    FileAccount(root.toString)
  }

  private def upsert(acc: FileAccount, db: String, c: String,
                     docs: Seq[String], parts: Int = 4): Unit = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val keyed = graft.operators.RawMerge
      .srcKeyed(spark, docs.toDF("raw").repartition(parts), Seq("/id"))
      .select(col("raw"), col("__id"), col("__pk0"))
    acc.upsertRaw(spark, db, c, keyed, Seq("__id", "__pk0"), Seq("/id"))
    ()
  }

  private def register(name: String, acc: FileAccount): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.core.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", acc.root)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.selectExpr("get_json_object(raw, '$.id')").collect()
      .map(_.getString(0)).toSet

  test("snapshot publishes, VERSION AS OF reads it while the live table moves on") {
    val acc = newAccount("snap")
    register("graftsn", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsn.db")
    spark.sql("CREATE TABLE graftsn.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", (1 to 20).map(i => s"""{"id":"d$i","v":$i}"""))

    val r = spark.sql(
      "CALL graftsn.system.snapshot(db => 'db', container => 'c', tag => 'v1')").head()
    assert(r.getAs[String]("tag") == "v1")
    assert(r.getAs[Long]("files") > 0L && r.getAs[Long]("bytes") > 0L)

    // live moves on: update d1, insert d21, delete d2
    upsert(acc, "db", "c", Seq("""{"id":"d1","v":100}""", """{"id":"d21","v":21}"""))
    spark.sql("DELETE FROM graftsn.db.c WHERE _id = 'd2'")

    val live = spark.sql("SELECT raw FROM graftsn.db.c")
    val snap = spark.sql("SELECT raw FROM graftsn.db.c VERSION AS OF 'v1'")
    assert(ids(live) == ((1 to 21).map("d" + _).toSet - "d2"))
    assert(ids(snap) == (1 to 20).map("d" + _).toSet, "snapshot must hold v1 state")
    // the updated doc reads old value through the snapshot, new live
    assert(snap.where("get_json_object(raw, '$.id') = 'd1'")
      .selectExpr("get_json_object(raw, '$.v')").head().getString(0) == "1")
    assert(live.where("get_json_object(raw, '$.id') = 'd1'")
      .selectExpr("get_json_object(raw, '$.v')").head().getString(0) == "100")

    // the full scan stack works against the snapshot subtree: point reads
    // prune (metadata _key), and COUNT(*) answers from the snapshot's own
    // copied sidecar without opening a data file
    assert(spark.sql(
      "SELECT raw FROM graftsn.db.c VERSION AS OF 'v1' WHERE _key = 'd3d3'")
      .count() == 1)
    val cnt = spark.sql("SELECT count(*) FROM graftsn.db.c VERSION AS OF 'v1'")
    assert(cnt.head().getLong(0) == 20L)
    val desc = cnt.queryExecution.executedPlan.toString
    assert(desc.contains("COUNT(*) from count sidecars"),
      s"snapshot count must answer from the copied sidecar:\n$desc")

    // snapshots are immutable: same tag refused until dropped
    val dup = intercept[Exception](spark.sql(
      "CALL graftsn.system.snapshot('db', 'c', 'v1')")).getMessage
    assert(dup.contains("already exists"))

    // unknown tag is a missing table, not a silent empty read
    val missing = intercept[Exception](spark.sql(
      "SELECT raw FROM graftsn.db.c VERSION AS OF 'nope'").collect()).getMessage
    assert(missing.toLowerCase.contains("table"))
  }

  test("restore returns the container to snapshot state, including layout after a rebucket") {
    val acc = newAccount("snaprestore")
    register("graftsr", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsr.db")
    spark.sql("CREATE TABLE graftsr.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", (1 to 16).map(i => s"""{"id":"d$i","v":$i}"""))
    spark.sql("CALL graftsr.system.snapshot('db', 'c', 's1')")

    // mutate AND change the physical layout underneath
    upsert(acc, "db", "c", Seq("""{"id":"zz","v":0}"""))
    spark.sql("CALL graftsr.system.rebucket('db', 'c', 4)")
    assert(acc.containerProperties("db", "c").buckets == 4)
    assert(ids(spark.sql("SELECT raw FROM graftsr.db.c")).contains("zz"))

    val res = spark.sql("CALL graftsr.system.restore('db', 'c', 's1')").head()
    assert(res.getAs[Long]("files_restored") > 0L)
    // contents, layout, and sidecar all back to snapshot state
    assert(ids(spark.sql("SELECT raw FROM graftsr.db.c")) ==
      (1 to 16).map("d" + _).toSet)
    assert(acc.containerProperties("db", "c").buckets == 2,
      "restore must bring back the snapshot's bucket count with its data")
    assert(acc.countRows(spark, "db", "c") == 16)
    // point read through the restored 2-bucket layout
    assert(spark.sql("SELECT raw FROM graftsr.db.c WHERE _id = 'd7'").count() == 1)
    // restore is repeatable (the snapshot outlives it)
    spark.sql("CALL graftsr.system.restore('db', 'c', 's1')")
    assert(ids(spark.sql("SELECT raw FROM graftsr.db.c")) ==
      (1 to 16).map("d" + _).toSet)
  }

  test("snapshots list/drop, TIMESTAMP AS OF picks the latest at-or-before") {
    val acc = newAccount("snaplist")
    register("graftsl", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsl.db")
    spark.sql("CREATE TABLE graftsl.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", Seq("""{"id":"a","v":1}"""))
    // pinned creation times (driver API): t1 < t2
    acc.snapshotContainer("db", "c", "t1", nowMs = 1700000000000L)
    upsert(acc, "db", "c", Seq("""{"id":"b","v":2}"""))
    acc.snapshotContainer("db", "c", "t2", nowMs = 1800000000000L)

    val listed = spark.sql("CALL graftsl.system.snapshots('db', 'c')").collect()
    assert(listed.map(_.getAs[String]("tag")).toSeq == Seq("t1", "t2"))
    assert(listed.map(_.getAs[Long]("created_ms")).toSeq ==
      Seq(1700000000000L, 1800000000000L))

    // 2023-11-20 ~ 1700438400000 ms: after t1, before t2 → reads t1
    val asOf = spark.sql(
      "SELECT raw FROM graftsl.db.c TIMESTAMP AS OF '2023-11-20 00:00:00'")
    assert(ids(asOf) == Set("a"))
    // after t2 (1800000000000 ms = 2027-01-15) → reads t2
    assert(ids(spark.sql(
      "SELECT raw FROM graftsl.db.c TIMESTAMP AS OF '2027-06-01 00:00:00'")) ==
      Set("a", "b"))
    // before every snapshot → no snapshot to serve
    intercept[Exception](spark.sql(
      "SELECT raw FROM graftsl.db.c TIMESTAMP AS OF '2001-01-01 00:00:00'").collect())

    val d = spark.sql("CALL graftsl.system.drop_snapshot('db', 'c', 't1')").head()
    assert(d.getAs[Boolean]("dropped"))
    assert(spark.sql("CALL graftsl.system.snapshots('db', 'c')").count() == 1)
    intercept[Exception](spark.sql(
      "SELECT raw FROM graftsl.db.c VERSION AS OF 't1'").collect())

    // malformed tags refused before touching storage
    intercept[Exception](acc.snapshotContainer("db", "c", "../evil"))
    intercept[Exception](acc.snapshotContainer("db", "c", "_tmp-x"))
  }

  test("diff between snapshots (and vs live): canonical-diff change counts") {
    val acc = newAccount("snapdiff")
    register("graftdf", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftdf.db")
    spark.sql("CREATE TABLE graftdf.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", Seq(
      """{"id":"a","v":1}""", """{"id":"b","v":2}""", """{"id":"c","v":3}"""))
    spark.sql("CALL graftdf.system.snapshot('db', 'c', 's1')")

    upsert(acc, "db", "c", Seq(
      """{"id":"b","v":20}""", """{"id":"d","v":4}"""))
    spark.sql("DELETE FROM graftdf.db.c WHERE _id = 'c'")
    spark.sql("CALL graftdf.system.snapshot('db', 'c', 's2')")

    def diffMap(sql: String): Map[String, Long] =
      spark.sql(sql).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d12 = diffMap("CALL graftdf.system.diff('db', 'c', 's1', 's2')")
    assert(d12 == Map("inserted" -> 1L, "updated" -> 1L,
      "unchanged" -> 1L, "deleted" -> 1L), s"got $d12")
    // omitted to_tag = live state (identical to s2 here)
    assert(diffMap("CALL graftdf.system.diff('db', 'c', 's1')") == d12)
    // self-diff: everything unchanged
    assert(diffMap("CALL graftdf.system.diff('db', 'c', 's2', 's2')") ==
      Map("unchanged" -> 3L))
    // a snapshot-vs-live diff straddling a REBUCKET still compares content
    // (raw reads + key join are layout-independent)
    spark.sql("CALL graftdf.system.rebucket('db', 'c', 4)")
    assert(diffMap("CALL graftdf.system.diff('db', 'c', 's1')") == d12)
    intercept[Exception](
      spark.sql("CALL graftdf.system.diff('db', 'c', 'missing')").collect())
  }

  test("row-level CDC between snapshots is a plain time-travel query") {
    val acc = newAccount("snapcdc")
    register("graftcdc", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcdc.db")
    spark.sql("CREATE TABLE graftcdc.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", Seq(
      """{"id":"a","v":1}""", """{"id":"b","v":2}""", """{"id":"c","v":3}"""))
    spark.sql("CALL graftcdc.system.snapshot('db', 'c', 's1')")
    upsert(acc, "db", "c", Seq(
      """{"id":"b","v":20}""", """{"id":"d","v":4}"""))
    spark.sql("DELETE FROM graftcdc.db.c WHERE _id = 'c'")
    spark.sql("CALL graftcdc.system.snapshot('db', 'c', 's2')")

    // The Spark-first answer to "give me the CHANGED ROWS between two
    // versions": time-travel reads are ordinary relations, so row-level
    // CDC is a full-outer join on the merge key + the same canonical-diff
    // kernel the engine classifies with (A10) — no bespoke procedure, no
    // driver materialization, and the join distributes like any other.
    // `graft.system.diff` stays the COUNT surface over the same kernel.
    graft.functions.GraftFunctions.register(spark)
    val changes = spark.sql(
      """SELECT coalesce(n._id, o._id) AS id,
        |  CASE WHEN o._id IS NULL THEN 'inserted'
        |       WHEN n._id IS NULL THEN 'deleted'
        |       WHEN canonical_json(n.raw) = canonical_json(o.raw) THEN 'unchanged'
        |       ELSE 'updated' END AS change,
        |  o.raw AS before, n.raw AS after
        |FROM graftcdc.db.`c@s1` o
        |FULL OUTER JOIN graftcdc.db.`c@s2` n ON o._id = n._id""".stripMargin)
    val byChange = changes.collect()
      .groupBy(_.getAs[String]("change"))
      .map { case (k, rs) => k -> rs.map(_.getAs[String]("id")).toSet }
    assert(byChange == Map(
      "inserted" -> Set("d"), "deleted" -> Set("c"),
      "updated" -> Set("b"), "unchanged" -> Set("a")), s"got $byChange")
    // the row-level query and the count procedure agree by construction
    val counts = spark.sql("CALL graftcdc.system.diff('db', 'c', 's1', 's2')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange.map { case (k, v) => k -> v.size.toLong } == counts)
    // before/after carry the actual document bodies (the CDC payload)
    val upd = changes.where("change = 'updated'").head()
    assert(upd.getAs[String]("before").contains("\"v\":2"))
    assert(upd.getAs[String]("after").contains("\"v\":20"))
  }

  test("c@tag identifier: batch + FROZEN streaming replay of a snapshot") {
    val acc = newAccount("snapstream")
    register("graftss", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftss.db")
    spark.sql("CREATE TABLE graftss.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", (1 to 12).map(i => s"""{"id":"d$i","v":$i}"""))
    spark.sql("CALL graftss.system.snapshot('db', 'c', 'epoch1')")
    upsert(acc, "db", "c", Seq("""{"id":"d99","v":99}"""))

    // identifier spelling = VERSION AS OF: same frozen rows
    assert(ids(spark.sql("SELECT raw FROM graftss.db.`c@epoch1`")) ==
      (1 to 12).map("d" + _).toSet)
    assert(spark.sql("SELECT raw FROM graftss.db.`c@epoch1`").collect().toSet ==
      spark.sql("SELECT raw FROM graftss.db.c VERSION AS OF 'epoch1'")
        .collect().toSet)
    // '@' refused in real table names (it would shadow snapshot reads)
    intercept[Exception](spark.sql("CREATE TABLE graftss.db.`x@y` (raw STRING)"))

    // streaming replay: the snapshot drains once, and live writes after it
    // NEVER reach the stream — the reproducible-epoch contract
    val cp = Files.createTempDirectory(Paths.get("target"), "snapcp").toString
    val got = scala.collection.mutable.Set.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.table("graftss.db.`c@epoch1`")
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.synchronized { got += r.getString(0) }); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); ()
    }
    drain()
    assert(got.map(r => "\"id\":\"d(\\d+)\"".r.findFirstMatchIn(r).get.group(1).toInt)
      .toSet == (1 to 12).toSet)
    // live container moves again; a checkpoint-resumed drain sees NOTHING new
    upsert(acc, "db", "c", Seq("""{"id":"d100","v":100}"""))
    got.clear()
    drain()
    assert(got.isEmpty, s"frozen replay must not emit live writes: $got")
  }

  test("maintenance isolation: compaction and vacuum never touch snapshots") {
    val acc = newAccount("snapiso")
    register("graftsi", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsi.db")
    spark.sql("CREATE TABLE graftsi.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", (1 to 32).map(i => s"""{"id":"d$i","v":$i}"""), parts = 8)
    spark.sql("CALL graftsi.system.snapshot('db', 'c', 'keep')")
    val snapTree = Paths.get(acc.root, "db", "c", "_snapshots", "keep")
    def snapState(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(snapTree).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => snapTree.relativize(p).toString -> Files.size(p)).toMap
    }
    val before = snapState()

    // compaction rewrites live buckets; vacuum at ttl 0 sweeps staging —
    // the snapshot tree must be byte-count-identical through both
    spark.sql("CALL graftsi.system.compact('db', 'c')")
    spark.sql("CALL graftsi.system.vacuum('db', 'c', 0)")
    assert(snapState() == before, "maintenance must not touch _snapshots")
    assert(ids(spark.sql("SELECT raw FROM graftsi.db.c VERSION AS OF 'keep'")) ==
      (1 to 32).map("d" + _).toSet)

    // an abandoned _restore tree is swept only while live data exists
    val restoreTree = Paths.get(acc.root, "db", "c", "_restore")
    Files.createDirectories(restoreTree)
    Files.writeString(restoreTree.resolve("junk.txt"), "x\n")
    val v = spark.sql("CALL graftsi.system.vacuum('db', 'c', 0)").head()
    assert(v.getAs[Int]("staging_trees_removed") == 1)
    assert(!Files.exists(restoreTree))
  }

  test("expire_snapshots: keep_last_n / older_than_ms retention sweep") {
    val acc = newAccount("snapexp")
    register("graftex", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftex.db")
    spark.sql("CREATE TABLE graftex.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", Seq("""{"id":"a","v":1}"""))
    // five epochs with pinned, increasing creation times
    (1 to 5).foreach(i =>
      acc.snapshotContainer("db", "c", s"e$i", nowMs = 1700000000000L + i * 1000L))

    // at least one bound is REQUIRED — an unbounded sweep is refused
    intercept[Exception](
      spark.sql("CALL graftex.system.expire_snapshots('db', 'c')").collect())
    assert(acc.listSnapshots("db", "c").size == 5)

    // keep_last_n alone keeps exactly the newest N
    val d1 = spark.sql(
      "CALL graftex.system.expire_snapshots(db => 'db', container => 'c', " +
        "keep_last_n => 3)").collect()
    assert(d1.map(_.getAs[String]("tag")).toSeq == Seq("e1", "e2"))
    assert(acc.listSnapshots("db", "c").map(_.tag) == Seq("e3", "e4", "e5"))

    // older_than_ms alone drops strictly-older; both bounds = intersection
    // (e3 is old enough but protected by keep_last_n => 2)
    val d2 = spark.sql(
      "CALL graftex.system.expire_snapshots(db => 'db', container => 'c', " +
        s"keep_last_n => 2, older_than_ms => ${1700000000000L + 4500L})").collect()
    assert(d2.map(_.getAs[String]("tag")).toSeq == Seq("e3"))
    assert(acc.listSnapshots("db", "c").map(_.tag) == Seq("e4", "e5"))

    // age bound alone: nothing is younger than the floor → full drop of
    // eligible tags requires the explicit keep_last_n => 0 spelling
    val d3 = acc.expireSnapshots("db", "c", keepLastN = Some(0),
      olderThanMs = None)
    assert(d3.map(_.tag) == Seq("e4", "e5"))
    assert(acc.listSnapshots("db", "c").isEmpty)

    // expiration never touches the live tree
    assert(ids(spark.sql("SELECT raw FROM graftex.db.c")) == Set("a"))

    // documented reader contract: an expired tag fails fresh reads as
    // table-not-found (no half-dead snapshot states)
    intercept[Exception](spark.sql(
      "SELECT raw FROM graftex.db.c VERSION AS OF 'e4'").collect())
  }

  test("version tags cannot traverse out of _snapshots (VERSION AS OF, c@tag)") {
    val acc = newAccount("snaptrav")
    register("grafttv", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grafttv.db")
    spark.sql("CREATE TABLE grafttv.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", Seq("""{"id":"live","v":1}"""))
    spark.sql("CREATE TABLE grafttv.db.other (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "other", Seq("""{"id":"secret","v":2}"""))

    // '..' resolves to an EXISTING directory (c/ itself, or db/, or the
    // sibling container) — before validation these read as "snapshots".
    // Every spelling must fail as table-not-found, not alias the live
    // tree or a sibling container.
    for (tag <- Seq("..", "../..", "../../other", "../_snapshots")) {
      val e1 = intercept[Exception](
        spark.sql(s"SELECT raw FROM grafttv.db.c VERSION AS OF '$tag'").collect())
      assert(e1.getMessage.toLowerCase.contains("cannot be found") ||
        e1.getMessage.toLowerCase.contains("table or view"),
        s"VERSION AS OF '$tag' must be table-not-found, got: ${e1.getMessage}")
      val e2 = intercept[Exception](
        spark.sql(s"SELECT raw FROM grafttv.db.`c@$tag`").collect())
      assert(e2.getMessage.toLowerCase.contains("cannot be found") ||
        e2.getMessage.toLowerCase.contains("table or view"),
        s"`c@$tag` must be table-not-found, got: ${e2.getMessage}")
    }
    // a real snapshot still resolves after the rejections
    spark.sql("CALL grafttv.system.snapshot('db', 'c', 'ok')")
    assert(ids(spark.sql("SELECT raw FROM grafttv.db.c VERSION AS OF 'ok'")) ==
      Set("live"))
  }

  test("REPLACE TABLE AS SELECT preserves snapshots and the error channel") {
    val acc = newAccount("snaprtas")
    register("graftrs", acc)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftrs.db")
    spark.sql("CREATE TABLE graftrs.db.c (raw STRING) " +
      "TBLPROPERTIES ('pk'='/id', 'buckets'='2')")
    upsert(acc, "db", "c", (1 to 8).map(i => s"""{"id":"old$i","v":$i}"""))
    spark.sql("CALL graftrs.system.snapshot('db', 'c', 'pre')")
    // a dead-letter channel with one rejected doc — container-lifetime
    // state, like snapshots
    val errDir = Paths.get(acc.root, "db", "c", "_errors")
    Files.createDirectories(errDir)
    Files.writeString(errDir.resolve("part-0.jsonl"), """{"bad":1}""" + "\n")

    spark.sql("REPLACE TABLE graftrs.db.c TBLPROPERTIES ('pk'='/id', 'buckets'='4') " +
      """AS SELECT '{"id":"new1","v":100}' AS raw""")

    // live data replaced...
    assert(ids(spark.sql("SELECT raw FROM graftrs.db.c")) == Set("new1"))
    // ...but history and the error channel survive the swap
    assert(ids(spark.sql("SELECT raw FROM graftrs.db.c VERSION AS OF 'pre'")) ==
      (1 to 8).map("old" + _).toSet,
      "RTAS must not erase published snapshots")
    assert(Files.exists(errDir.resolve("part-0.jsonl")),
      "RTAS must not erase the dead-letter channel")
    // and restore can still cross the replace boundary
    spark.sql("CALL graftrs.system.restore('db', 'c', 'pre')")
    assert(ids(spark.sql("SELECT raw FROM graftrs.db.c")) ==
      (1 to 8).map("old" + _).toSet)

    // a replace whose AS SELECT itself dead-letters: the staged _errors
    // and the container's pre-existing _errors MERGE (both survive)
    spark.sql("REPLACE TABLE graftrs.db.c TBLPROPERTIES ('pk'='/id') " +
      """AS SELECT raw FROM (VALUES ('{"id":"ok1","v":1}'), ('not-json')) AS t(raw)""")
    assert(ids(spark.sql("SELECT raw FROM graftrs.db.c")) == Set("ok1"))
    import scala.jdk.CollectionConverters._
    val errTexts = Files.walk(errDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith("."))
      .flatMap(p => Files.readString(p).linesIterator)
      .toSeq
    assert(errTexts.exists(_.contains("\"bad\"")),
      s"pre-replace dead letters must survive the swap: $errTexts")
    assert(errTexts.exists(_.contains("not-json")),
      s"the replace's own dead letters must survive the swap: $errTexts")
  }
}
