package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Container metadata the engine acts on (A20). The reference also carries
  * indexing policy and dedicated throughput (containers.py:16-24); those are
  * Cosmos provisioning concerns declared out of scope (SURVEY.md §2 Part B
  * non-goals) — only the partition-key path list affects semantics here. */
case class ContainerProps(pkPaths: Seq[String] = Seq("/id"))

/** File-backed account: the catalog surface of the reference
  * (/root/reference/src/clients.py, containers.py) over a directory tree
  * `root/<database>/<container>/{_meta.json, data/<part>.json}`.
  *
  * The reference's "account" is a Cosmos endpoint; here it is any storage a
  * Spark reader can scan. Data is JSON-lines (the reference's document
  * model, schema inferred per container); metadata is a tiny `_meta.json`
  * the driver reads once per container — catalog calls are driver-side and
  * out of the data path, exactly like the reference's management-plane
  * calls vs its document loop.
  */
case class FileAccount(root: String) {
  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  private def listDirs(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filterNot(_.startsWith("_")).toSeq.sorted

  /** A22: liveness probe — the reference calls list_databases on both
    * accounts before starting (clients.py:13-22). */
  def testConnection(): Boolean = Files.isDirectory(Paths.get(root))

  /** A17. */
  def listDatabases(): Seq[String] = listDirs(Paths.get(root))

  /** A18: idempotent create (clients.py:40-49). */
  def createDatabaseIfAbsent(db: String): Unit = Files.createDirectories(p(db))

  /** A19 (containers.py:78-89). */
  def listContainers(db: String): Seq[String] = listDirs(p(db))

  /** A20 with the reference's graceful fallback to pk `/id`
    * (containers.py:38-44). */
  def containerProperties(db: String, container: String): ContainerProps = {
    val meta = p(db, container, "_meta.json")
    if (!Files.exists(meta)) ContainerProps()
    else {
      // one line of driver-side JSON: {"pk": ["/a/b", ...]}
      val s = Files.readString(meta)
      val pks = "\"(/[^\"]*)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq
      if (pks.isEmpty) ContainerProps() else ContainerProps(pks)
    }
  }

  /** A21: recreate with matching pk metadata (containers.py:46-76). */
  def createContainerIfAbsent(db: String, container: String,
                              props: ContainerProps): Unit = {
    val dir = p(db, container)
    Files.createDirectories(dir)
    val meta = dir.resolve("_meta.json")
    if (!Files.exists(meta))
      Files.writeString(meta,
        props.pkPaths.map(q => s""""$q"""").mkString("""{"pk": [""", ", ", "]}"))
  }

  def hasData(db: String, container: String): Boolean =
    Files.isDirectory(p(db, container, "data"))

  /** A1: full container scan. Schema inferred per container — the document
    * model is schemaless (SURVEY.md §1.3). */
  def read(spark: SparkSession, db: String, container: String): DataFrame =
    spark.read.json(p(db, container, "data").toString)

  /** A11/A12 sink. With `pkCols` the frame is hash-repartitioned on the
    * partition key before landing — the file-sink analogue of Cosmos's
    * physical pk partitioning (each output file holds one pk-hash bucket),
    * so a downstream pk-keyed read/join starts co-located instead of
    * re-shuffling the whole container. Values stay in the data files
    * (no `partitionBy` directory encoding: schemaless pk values round-trip
    * byte-exactly, and inference can't retype them). */
  def write(df: DataFrame, db: String, container: String,
            pkCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val aligned =
      if (pkCols.nonEmpty && pkCols.forall(df.columns.contains))
        df.repartition(pkCols.map(col): _*)
      else df
    aligned.write.mode(SaveMode.Overwrite).json(p(db, container, "data").toString)
  }
}
