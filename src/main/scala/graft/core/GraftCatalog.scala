package graft.core

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Spark-SQL (DataSource V2) facade over [[FileAccount]] — the reference's
  * management plane (A17–A21: /root/reference/src/clients.py:28-49,
  * containers.py:7-89) exposed to SQL-first users, so
  * `spark.sql("CREATE NAMESPACE ...")`, `SHOW NAMESPACES`, `SHOW TABLES`,
  * `CREATE TABLE`, and `spark.table(...)` drive the SAME `_meta.json` /
  * directory metadata the bespoke Scala API ([[FileAccount]]) and the merge
  * engine act on. Register like any catalog plugin:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "hdfs://...")
  * spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  * spark.sql("CREATE TABLE graft.db.c (raw STRING) TBLPROPERTIES ('pk'='/pk', 'buckets'='16')")
  * spark.table("graft.db.c")   // reads the container's raw JSON lines
  * }}}
  *
  * Namespace = database directory; table = container; table properties map
  * onto [[ContainerProps]] (`pk` = comma-joined pk paths, `buckets` =
  * bucket count; anything else in `_meta.json` is carried verbatim in the
  * `raw_meta` property — same copy-what-you-don't-interpret posture as the
  * document path). Reads scan the container's raw JSON lines distributed,
  * one input partition per data file (the bucket layout keeps file counts
  * proportional to buckets, not corpus size). WRITES stay on the merge
  * engine (`FileAccount.upsertRaw` / `Orchestrator`): a plain SQL INSERT
  * cannot maintain the bucket layout, count sidecars, and pk invariants,
  * so the table intentionally does not advertise write capability.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var account: FileAccount = _
  private def store: Storage = Storage.hadoop

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val root = options.get("root")
    require(root != null && root.nonEmpty,
      s"spark.sql.catalog.$name.root must point at a FileAccount root")
    account = FileAccount(root)
  }

  override def name(): String = catalogName

  // ---- namespaces (databases: A17/A18) ----

  private def db(ns: Array[String]): String = {
    if (ns.length != 1) throw new NoSuchNamespaceException(ns)
    ns(0)
  }

  override def listNamespaces(): Array[Array[String]] =
    account.listDatabases().map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level tree
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && account.listDatabases().contains(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    account.createDatabaseIfAbsent(db(namespace))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val d = db(namespace)
    if (!namespaceExists(namespace)) false
    else if (account.listContainers(d).nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace $d is not empty (use CASCADE)")
    else store.deleteRecursive(new HPath(account.root, d).toString)
  }

  // ---- tables (containers: A19/A20/A21) ----

  private def split(ident: Identifier): (String, String) =
    (db(ident.namespace()), ident.name())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    account.listContainers(db(namespace))
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean = {
    val (d, c) = split(ident)
    account.listDatabases().contains(d) && account.listContainers(d).contains(c)
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val (d, c) = split(ident)
    new ContainerTable(account, d, c, account.containerProperties(d, c))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft containers partition by pk-hash buckets ('buckets' property), not PARTITIONED BY")
    require(schema.isEmpty ||
        (schema.length == 1 && schema.head.dataType == StringType),
      s"graft containers hold raw JSON lines: declare (raw STRING), got $schema")
    val (d, c) = split(ident)
    val props = ContainerProps(
      pkPaths = Option(properties.get("pk"))
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("/id")),
      buckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(16),
      raw = Option(properties.get("raw_meta")))
    account.createDatabaseIfAbsent(d)
    account.createContainerIfAbsent(d, c, props)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "container properties are fixed at creation (reference parity: containers.py:46-76)")

  override def dropTable(ident: Identifier): Boolean = {
    val (d, c) = split(ident)
    tableExists(ident) &&
      store.deleteRecursive(new HPath(new HPath(account.root, d), c).toString)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    val (od, oc) = split(oldIdent); val (nd, nc) = split(newIdent)
    val src = new HPath(new HPath(account.root, od), oc).toString
    val dst = new HPath(new HPath(account.root, nd), nc).toString
    if (!store.rename(src, dst))
      throw new IllegalStateException(s"rename $src -> $dst failed")
  }
}

/** One container as a readable V2 table: schema is the engine's document
  * contract (one `raw` JSON-line string per document), reads are
  * distributed one-partition-per-data-file. */
final class ContainerTable(account: FileAccount, db: String, container: String,
                           props: ContainerProps)
    extends Table with SupportsRead {

  override def name(): String = s"$db.$container"

  override def schema(): StructType =
    StructType(Seq(StructField("raw", StringType, nullable = false)))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("pk", props.pkPaths.mkString(","))
    m.put("buckets", props.buckets.toString)
    m.put("location", account.dataPath(db, container))
    props.raw.foreach(m.put("raw_meta", _))
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        // driver-side listing through the Storage boundary; the executor
        // side gets (file path, serialized Hadoop conf) and nothing else
        val files =
          if (!account.hasData(db, container)) Seq.empty[String]
          else Storage.hadoop.walk(account.dataPath(db, container))
            // same hidden-file convention as Spark's own readers: local-FS
            // `.crc` sidecars and `_`-prefixed markers are not data
            .filter { f =>
              val base = f.relPath.substring(f.relPath.lastIndexOf('/') + 1)
              !base.startsWith(".") && !base.startsWith("_")
            }
            .map(f => new HPath(account.dataPath(db, container), f.relPath).toString)
        new ContainerScan(name(), files,
          new SerializableHadoopConf(Storage.sessionHadoopConf()))
      }
    }
}

final case class ContainerFileSlice(path: String) extends InputPartition

final class ContainerScan(table: String, files: Seq[String],
                          conf: SerializableHadoopConf)
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType =
    StructType(Seq(StructField("raw", StringType, nullable = false)))

  override def description(): String = s"graft container $table (${files.size} files)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map(ContainerFileSlice(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(conf)
}

final class ContainerReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = new HPath(partition.asInstanceOf[ContainerFileSlice].path)
    val in = path.getFileSystem(conf.value).open(path)
    val lines = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    new PartitionReader[InternalRow] {
      private var line: String = _
      override def next(): Boolean = { line = lines.readLine(); line != null }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line))
      override def close(): Unit = lines.close()
    }
  }
}

/** Minimal serializable Hadoop-conf carrier (the engine avoids Spark's
  * private[spark] SerializableConfiguration): writes the fully-resolved
  * entry set, rebuilds a defaults-free Configuration on the executor. */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val entries = conf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    out.writeObject(entries)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val entries = in.readObject().asInstanceOf[Array[(String, String)]]
    conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
  }
}
