package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ContainerProps, FileAccount}

/** A RawLocalFileSystem under a NON-DEFAULT scheme: resolving it requires
  * going through the Hadoop `fs.<scheme>.impl` registry of the session's
  * configuration — exactly the boundary a cluster deployment crosses for
  * `hdfs://`/`s3a://`. If any account code still touched `java.nio.file`
  * directly, every call against `graftfs:` URIs would fail. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** A scheme whose connector advertises SERVER-SIDE COPY — the object-store
  * deployment shape ([[graft.core.ServerSideCopy]]): `copyFile` must route
  * byte movement through the connector (S3 CopyObject analog), not stream
  * through the JVM. Copies are counted so the spec can prove the snapshot/
  * restore path actually took the fast path. */
class GraftCopyFs extends org.apache.hadoop.fs.RawLocalFileSystem
    with graft.core.ServerSideCopy {
  override def getUri: java.net.URI = java.net.URI.create("graftcp:///")
  override def getScheme: String = "graftcp"
  override def copyInStore(src: org.apache.hadoop.fs.Path,
                           dst: org.apache.hadoop.fs.Path): Long = {
    GraftCopyFs.copies.incrementAndGet()
    mkdirs(dst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      /*deleteSource=*/ false, /*overwrite=*/ true, getConf)
    getFileStatus(dst).getLen
  }
}
object GraftCopyFs {
  val copies = new java.util.concurrent.atomic.AtomicLong(0)
}

/** Proof of the [[graft.core.Storage]] boundary (SURVEY §2 A-storage /
  * round-5 port): the whole account surface — catalog, bucketed upsert,
  * sidecar counts, signatures, stray absorption — runs against a filesystem
  * known only to the Hadoop configuration. */
class StorageSpec extends AnyFunSuite {
  lazy val spark = {
    val s = graft.core.Sessions.local(4, "storage-spec")
    // register the scheme the way a deployment does: in the Hadoop
    // configuration every reader/writer (and Storage) resolves against
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    s
  }

  private def newAccount(): (FileAccount, java.nio.file.Path) = {
    spark // force init (registers the scheme before any Storage call)
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graftfs-acct")
    (FileAccount("graftfs:" + tmp.toAbsolutePath), tmp)
  }

  test("catalog surface works on a custom-scheme FileSystem") {
    val (acct, local) = newAccount()
    assert(acct.testConnection())
    assert(acct.listDatabases().isEmpty)
    acct.createDatabaseIfAbsent("db")
    acct.createContainerIfAbsent("db", "c",
      ContainerProps(Seq("/pk"), buckets = 4))
    assert(acct.listDatabases() == Seq("db"))
    assert(acct.listContainers("db") == Seq("c"))
    val props = acct.containerProperties("db", "c")
    assert(props.pkPaths == Seq("/pk") && props.buckets == 4)
    // the bytes really landed on the backing store the scheme maps to
    assert(java.nio.file.Files.exists(local.resolve("db/c/_meta.json")),
      "metadata must reach the scheme's backing filesystem")
  }

  test("bucketed upsert + sidecar counts + pruned reads work on graftfs://") {
    import spark.implicits._
    val (acct, local) = newAccount()
    graft.functions.GraftFunctions.register(spark)
    acct.createDatabaseIfAbsent("db")
    acct.createContainerIfAbsent("db", "c",
      ContainerProps(Seq("/pk"), buckets = 4))
    val pk = Seq("/pk")
    val keyCols = Seq("__id", "__pk0")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.RawMerge.srcKeyed(spark, df, pk)
        .select(("raw" +: keyCols).map(col): _*)

    val docs = (0 until 20)
      .map(i => s"""{"id":"d$i","pk":"p${i % 3}","v":$i}""").toDF("raw")
    val affected = acct.upsertRaw(spark, "db", "c", keyed(docs), keyCols, pk)
    assert(affected.nonEmpty)
    assert(acct.countRows(spark, "db", "c") == 20)
    assert(acct.readRaw(spark, "db", "c").count() == 20)
    assert(acct.dataBytes("db", "c") > 0)
    assert(java.nio.file.Files.isDirectory(local.resolve("db/c/data")),
      "bucket layout must land on the backing filesystem")

    // incremental second upsert: one changed doc rewrites only its bucket
    val sigsBefore = acct.bucketSignatures("db", "c")
    val delta = Seq("""{"id":"d1","pk":"p1","v":99}""").toDF("raw")
    val affected2 = acct.upsertRaw(spark, "db", "c", keyed(delta), keyCols, pk)
    assert(affected2.size == 1)
    val sigsAfter = acct.bucketSignatures("db", "c")
    val untouched = sigsBefore.keySet -- affected2
    assert(untouched.forall(b => sigsBefore(b) == sigsAfter(b)),
      "unaffected buckets must keep their listing signatures")
    assert(acct.countRows(spark, "db", "c") == 20)
    // pruned read covers the rewritten bucket
    val pruned = acct.readRawBuckets(spark, "db", "c", affected2)
    assert(pruned.filter(col("raw").contains("\"v\":99")).count() == 1)
  }

  test("full migration between two custom-scheme accounts (the reference's actual job)") {
    import java.nio.file.{Files => JF}
    val (src, srcLocal) = newAccount()
    val (tgt, _) = newAccount()
    src.createDatabaseIfAbsent("db")
    src.createContainerIfAbsent("db", "c",
      ContainerProps(Seq("/pk"), buckets = 4))
    val data = srcLocal.resolve("db/c/data")
    JF.createDirectories(data)
    JF.writeString(data.resolve("f1.json"), (0 until 30)
      .map(i => s"""{"id":"d$i","pk":"p${i % 3}","v":$i}""").mkString("\n"))

    // initial full migration src -> tgt, both behind graftfs://
    val r1 = Orchestrator.migrateContainer(spark, src, tgt, "db", "c",
      Orchestrator.Config())
    assert(r1.verified && r1.verifyMode == "full" &&
      r1.inserted == 30 && r1.targetCount == 30, r1.toString)

    // delta run: 2 updates + 1 insert — auto-incremental (source bytes much
    // smaller than target), bucket-pruned verify, all through the scheme
    JF.writeString(data.resolve("f1.json"),
      Seq("""{"id":"d1","pk":"p1","v":100}""",
        """{"id":"d2","pk":"p2","v":200}""",
        """{"id":"d99","pk":"p0","v":99}""").mkString("\n"))
    val r2 = Orchestrator.migrateContainer(spark, src, tgt, "db", "c",
      Orchestrator.Config())
    assert(r2.verified && r2.verifyMode == "incremental" &&
      r2.inserted == 1 && r2.updated == 2 && r2.targetCount == 31, r2.toString)

    // the summary sink also writes through the scheme
    val sumPath = "graftfs:" + srcLocal.toAbsolutePath.resolve("summary.json")
    Orchestrator.writeSummary(
      Orchestrator.Summary(Seq(r1, r2), durationSec = 1.0), sumPath)
    assert(JF.readString(srcLocal.resolve("summary.json")).contains("\"verified\": true"))
  }

  test("stray files on the custom scheme are absorbed into the layout") {
    import spark.implicits._
    val (acct, local) = newAccount()
    graft.functions.GraftFunctions.register(spark)
    acct.createDatabaseIfAbsent("db")
    acct.createContainerIfAbsent("db", "c",
      ContainerProps(Seq("/pk"), buckets = 4))
    val pk = Seq("/pk")
    val keyCols = Seq("__id", "__pk0")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.RawMerge.srcKeyed(spark, df, pk)
        .select(("raw" +: keyCols).map(col): _*)
    acct.upsertRaw(spark, "db", "c",
      keyed(Seq("""{"id":"a","pk":"p","v":1}""").toDF("raw")), keyCols, pk)
    // external writer drops a file at the data/ root (via plain local IO —
    // the account must SEE it through the graftfs lens)
    java.nio.file.Files.writeString(local.resolve("db/c/data/external.txt"),
      """{"id":"x","pk":"p","v":7}""" + "\n")
    assert(acct.countRows(spark, "db", "c") == 2)
    acct.upsertRaw(spark, "db", "c",
      keyed(Seq("""{"id":"b","pk":"p","v":2}""").toDF("raw")), keyCols, pk)
    assert(!java.nio.file.Files.exists(local.resolve("db/c/data/external.txt")),
      "stray must be absorbed into the bucket layout")
    assert(acct.countRows(spark, "db", "c") == 3)
    assert(acct.readRaw(spark, "db", "c")
      .filter(col("raw").contains("\"id\":\"x\"")).count() == 1)
  }

  test("snapshot/restore route file copies through the connector's server-side copy") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcp.impl", classOf[GraftCopyFs].getName)
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graftcp-acct")
    val acct = FileAccount("graftcp:" + tmp.toAbsolutePath)
    graft.functions.GraftFunctions.register(spark)
    acct.createDatabaseIfAbsent("db")
    acct.createContainerIfAbsent("db", "c", ContainerProps(Seq("/id"), buckets = 2))
    val keyCols = Seq("__id", "__pk0")
    val docs = (1 to 12).map(i => s"""{"id":"d$i","v":$i}""").toDF("raw")
    val keyed = graft.operators.RawMerge.srcKeyed(spark, docs, Seq("/id"))
      .select(("raw" +: keyCols).map(col): _*)
    acct.upsertRaw(spark, "db", "c", keyed, keyCols, Seq("/id"))

    GraftCopyFs.copies.set(0)
    val info = acct.snapshotContainer("db", "c", "fast")
    assert(info.files > 0)
    assert(GraftCopyFs.copies.get() >= info.files,
      "every snapshot data-file copy must take the server-side fast path")
    // the fast-path copy produced a faithful, readable snapshot
    assert(acct.readRaw(spark, "db", s"c/_snapshots/fast").count() == 12)

    val before = GraftCopyFs.copies.get()
    assert(acct.restoreSnapshot("db", "c", "fast") > 0)
    assert(GraftCopyFs.copies.get() > before,
      "restore must route through the same server-side copy hook")
    assert(acct.countRows(spark, "db", "c") == 12)

    // stream-path contract on the DEFAULT store: copyFile overwrites and
    // leaves no dot-prefixed staging leftovers at the destination
    val store = graft.core.Storage.hadoop
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "copyfile")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "hello")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "stale-longer-content")
    assert(store.copyFile(s"$dir/a.txt", s"$dir/b.txt") == 5L)
    assert(java.nio.file.Files.readString(dir.resolve("b.txt")) == "hello")
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("._copy-")).toSeq
    assert(leftovers.isEmpty, s"staging names must be renamed away: $leftovers")
  }

  test("object-store roots REFUSE IVF coordination without the single-writer opt-in") {
    spark // force init
    val store = graft.core.Storage.hadoop
    // the probe answers from the scheme, without loading a connector jar
    assert(!store.supportsAtomicRename("s3a://bucket/ivf"))
    assert(!store.supportsExclusiveCreate("s3a://bucket/ivf"))
    assert(!store.supportsAtomicRename("gs://bucket/ivf"))
    // local, default-scheme, and custom registered schemes stay capable
    assert(store.supportsAtomicRename("target/ivf-index"))
    assert(store.supportsExclusiveCreate("graftfs:/tmp/x"))
    // the deployment can extend the denylist for its own connector
    sys.props("graft.storage.nonAtomicSchemes") = "mystore"
    try assert(!store.supportsAtomicRename("mystore://x/y"))
    finally sys.props.remove("graft.storage.nonAtomicSchemes")

    // the refusal gate itself — the first statement of withIndexLock, which
    // EVERY index mutation (build miss-path, append) acquires: pointed at an
    // object-store root it fails fast with deployment guidance, before any
    // lock/publish IO
    val oldRoot = sys.props.get("graft.ivf.root")
    sys.props("graft.ivf.root") = "s3a://bucket/ivf"
    try {
      val ex = intercept[IllegalArgumentException] {
        graft.operators.Similarity.IvfIndex
          .requireCoordinationCapable("s3a://bucket/ivf/idx.lock")
      }
      assert(ex.getMessage.contains("atomic rename"))
      assert(ex.getMessage.contains("graft.ivf.singleWriter"))
      // the explicit opt-in accepts the same root (caller owns exclusivity)
      sys.props("graft.ivf.singleWriter") = "true"
      graft.operators.Similarity.IvfIndex
        .requireCoordinationCapable("s3a://bucket/ivf/idx.lock")
    } finally {
      sys.props.remove("graft.ivf.singleWriter")
      oldRoot match {
        case Some(v) => sys.props("graft.ivf.root") = v
        case None    => sys.props.remove("graft.ivf.root")
      }
    }
  }
}
