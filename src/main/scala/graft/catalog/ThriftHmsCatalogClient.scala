package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.api.{
  Database, FieldSchema, NoSuchObjectException, Partition, SerDeInfo,
  StorageDescriptor, Table, ThriftHiveMetastore}
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.TSocket

import graft.model.{ColumnMeta, PartitionMeta, PartitionName, TableMeta}

/**
 * Thrift Hive-metastore [[CatalogClient]] — the deployment-grade
 * implementation behind the same trait the in-memory, session-catalog,
 * and JDBC clients use. Mirrors the surface of the reference's
 * `utils/common/ThriftHiveMetastoreClient.java:97-312` (get/create/
 * alter/drop for tables and partitions, name-keyed partition access,
 * `rename_partition`), re-expressed over the Hive 2.3 Thrift bindings
 * that ship with Spark.
 *
 * The engine's narrow [[TableMeta]]/[[PartitionMeta]] model maps onto
 * the Thrift objects' comparable surface (location, input format,
 * schema columns, partition keys, parameters); fields outside that
 * surface are filled with serviceable defaults on write and ignored on
 * read — replication only acts on the comparable surface (SURVEY.md
 * §1.1, P9 strips the rest anyway).
 *
 * One client = one socket; NOT thread-safe (Thrift clients never are) —
 * the [[ThriftHmsCatalogConnector]] opens one per task partition,
 * exactly like the JDBC connector.
 */
final class ThriftHmsCatalogClient private (
    transport: TSocket,
    client: ThriftHiveMetastore.Iface)
    extends CatalogClient with java.io.Closeable {

  import ThriftHmsCatalogClient._

  def listDatabases(): Seq[String] =
    client.get_all_databases().asScala.toSeq.sorted

  def createDatabase(db: String): Unit =
    try client.create_database(
      new Database(db, "", null, new java.util.HashMap[String, String]()))
    catch {
      // idempotent like the reference's createDatabase
      case _: org.apache.hadoop.hive.metastore.api.AlreadyExistsException => ()
    }

  def listTables(db: String): Seq[String] =
    client.get_all_tables(db).asScala.toSeq.sorted

  def getTable(db: String, table: String): Option[TableMeta] =
    try Some(fromThriftTable(client.get_table(db, table)))
    catch { case _: NoSuchObjectException => None }

  def createTable(t: TableMeta): Unit = {
    createDatabase(t.db)
    client.create_table(toThriftTable(t))
  }

  def alterTable(db: String, table: String, t: TableMeta): Unit =
    client.alter_table(db, table, toThriftTable(t))

  /** deleteData = false: file effects are the copy/commit layer's job
    * (S9/S10), never a metastore side effect. */
  def dropTable(db: String, table: String): Unit =
    client.drop_table(db, table, false)

  def listPartitionNames(db: String, table: String): Seq[String] =
    client.get_partition_names(db, table, -1).asScala.toSeq.sorted

  def getPartition(db: String, table: String,
      partName: String): Option[PartitionMeta] =
    try Some(fromThriftPartition(
      client.get_partition_by_name(db, table, partName), partName))
    catch { case _: NoSuchObjectException => None }

  def addPartition(p: PartitionMeta): Unit =
    client.add_partition(toThriftPartition(p))

  def alterPartition(p: PartitionMeta): Unit =
    client.alter_partition(p.db, p.table, toThriftPartition(p))

  def dropPartition(db: String, table: String, partName: String): Unit =
    client.drop_partition_by_name(db, table, partName, false)

  def renamePartition(db: String, table: String, from: String,
      to: PartitionMeta): Unit =
    client.rename_partition(db, table,
      PartitionName.values(from).asJava, toThriftPartition(to))

  def close(): Unit = if (transport != null) transport.close()
}

object ThriftHmsCatalogClient {

  def open(host: String, port: Int,
      timeoutMs: Int = 60000): ThriftHmsCatalogClient = {
    val sock = new TSocket(host, port, timeoutMs)
    sock.open()
    new ThriftHmsCatalogClient(sock,
      new ThriftHiveMetastore.Client(new TBinaryProtocol(sock)))
  }

  /** Wrap an already-connected Iface (tests hand in an in-process one);
    * close() is a no-op for the null transport. */
  def wrap(iface: ThriftHiveMetastore.Iface): ThriftHmsCatalogClient =
    new ThriftHmsCatalogClient(null, iface)

  // ---- model ⇄ thrift -----------------------------------------------------

  private def fieldSchemas(cols: Seq[ColumnMeta]): java.util.List[FieldSchema] =
    cols.map(c => new FieldSchema(c.name, c.dataType, "")).asJava

  private def sd(location: String, inputFormat: String,
      cols: Seq[ColumnMeta]): StorageDescriptor = {
    val s = new StorageDescriptor()
    s.setCols(fieldSchemas(cols))
    s.setLocation(location)
    s.setInputFormat(inputFormat)
    s.setOutputFormat(inputFormat)
    s.setSerdeInfo(new SerDeInfo("",
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe",
      new java.util.HashMap[String, String]()))
    s.setBucketCols(new java.util.ArrayList[String]())
    s
  }

  def toThriftTable(t: TableMeta): Table = {
    val tt = new Table()
    tt.setDbName(t.db)
    tt.setTableName(t.table)
    tt.setSd(sd(t.location, t.inputFormat, t.cols))
    tt.setPartitionKeys(fieldSchemas(t.partitionKeys))
    tt.setParameters(t.parameters.asJava)
    tt.setTableType("EXTERNAL_TABLE")
    tt
  }

  def fromThriftTable(t: Table): TableMeta = {
    def colsOf(fs: java.util.List[FieldSchema]): Seq[ColumnMeta] =
      Option(fs).map(_.asScala.toSeq).getOrElse(Seq.empty)
        .map(f => ColumnMeta(f.getName, f.getType))
    TableMeta(
      db = t.getDbName,
      table = t.getTableName,
      location = Option(t.getSd).map(_.getLocation).orNull,
      inputFormat = Option(t.getSd).map(_.getInputFormat).orNull,
      cols = colsOf(Option(t.getSd).map(_.getCols).orNull),
      partitionKeys = colsOf(t.getPartitionKeys),
      parameters = Option(t.getParameters)
        .map(_.asScala.toMap).getOrElse(Map.empty))
  }

  def toThriftPartition(p: PartitionMeta): Partition = {
    val tp = new Partition()
    tp.setDbName(p.db)
    tp.setTableName(p.table)
    tp.setValues(p.values.asJava)
    tp.setSd(sd(p.location, "", Seq.empty))
    tp.setParameters(p.parameters.asJava)
    tp
  }

  def fromThriftPartition(p: Partition, partName: String): PartitionMeta =
    PartitionMeta(
      db = p.getDbName,
      table = p.getTableName,
      partName = partName,
      location = Option(p.getSd).map(_.getLocation).orNull,
      parameters = Option(p.getParameters)
        .map(_.asScala.toMap).getOrElse(Map.empty))
}

/**
 * Serializable per-task connector (the `ClusterFactory` shape): every
 * `connect()` opens its own socket, so executor partitions never share
 * a Thrift client across threads.
 */
final case class ThriftHmsCatalogConnector(host: String, port: Int,
    timeoutMs: Int = 60000) extends CatalogConnector {
  def connect(): CatalogClient =
    ThriftHmsCatalogClient.open(host, port, timeoutMs)
}
