package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.model.{ColumnMeta, PartitionMeta, PartitionName, TableMeta}

/**
 * CatalogClient backed by Spark's own `ExternalCatalog` (S11 — the
 * metastore write sink, `utils/common/ThriftHiveMetastoreClient.java:97-312`
 * re-expressed through Spark's catalog API instead of raw Thrift).
 *
 * With `spark.sql.catalogImplementation=hive` this talks to a real Hive
 * metastore; with the default in-memory implementation it backs tests.
 * Locations are stored in table/partition properties as well, so the
 * replication engine's location rewriting survives the round-trip.
 */
final class SparkCatalogClient(spark: SparkSession) extends CatalogClient {

  private def ext: ExternalCatalog = spark.sharedState.externalCatalog

  private def toCatalogTable(t: TableMeta): CatalogTable = {
    val schema = StructType(
      t.cols.map(c => StructField(c.name, DataType.fromDDL(c.dataType))) ++
      t.partitionKeys.map(c => StructField(c.name, DataType.fromDDL(c.dataType))))
    CatalogTable(
      identifier = TableIdentifier(t.table, Some(t.db)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(java.net.URI.create(t.location)),
        inputFormat = Some(t.inputFormat)),
      schema = schema,
      partitionColumnNames = t.partitionKeys.map(_.name),
      properties = t.parameters)
  }

  private def fromCatalogTable(c: CatalogTable): TableMeta = {
    val partCols = c.partitionColumnNames.toSet
    TableMeta(
      db = c.identifier.database.getOrElse(""),
      table = c.identifier.table,
      location = c.storage.locationUri.map(_.toString).getOrElse(""),
      inputFormat = c.storage.inputFormat.getOrElse("parquet"),
      cols = c.schema.fields.filterNot(f => partCols.contains(f.name))
        .map(f => ColumnMeta(f.name, f.dataType.simpleString)).toSeq,
      partitionKeys = c.partitionColumnNames
        .map(n => ColumnMeta(n,
          c.schema.fields.find(_.name == n)
            .map(_.dataType.simpleString).getOrElse("string"))).toSeq,
      parameters = c.properties)
  }

  def listDatabases(): Seq[String] =
    ext.listDatabases().filterNot(_ == "default")
  def createDatabase(db: String): Unit =
    if (!ext.databaseExists(db)) {
      ext.createDatabase(CatalogDatabase(db, "",
        java.net.URI.create(s"file:///tmp/graft-wh/$db"), Map.empty),
        ignoreIfExists = true)
    }
  def listTables(db: String): Seq[String] =
    if (ext.databaseExists(db)) ext.listTables(db).sorted else Seq.empty
  def getTable(db: String, table: String): Option[TableMeta] =
    if (ext.tableExists(db, table)) Some(fromCatalogTable(ext.getTable(db, table)))
    else None
  def createTable(t: TableMeta): Unit = {
    createDatabase(t.db)
    ext.createTable(toCatalogTable(t), ignoreIfExists = false)
  }
  def alterTable(db: String, table: String, t: TableMeta): Unit =
    if (db == t.db && table == t.table) ext.alterTable(toCatalogTable(t))
    else {
      // rename: ExternalCatalog.renameTable keeps partitions attached
      ext.renameTable(db, table, t.table)
      ext.alterTable(toCatalogTable(t))
    }
  def dropTable(db: String, table: String): Unit =
    ext.dropTable(db, table, ignoreIfNotExists = true, purge = false)

  def listPartitionNames(db: String, table: String): Seq[String] =
    if (ext.tableExists(db, table)) {
      ext.listPartitions(db, table)
        .map(p => renderSpec(db, table, p.spec)).sorted
    } else Seq.empty

  private def renderSpec(db: String, table: String,
      spec: Map[String, String]): String = {
    val keys = ext.getTable(db, table).partitionColumnNames
    PartitionName.render(keys.map(k => (k, spec(k))))
  }

  private def toSpec(db: String, table: String,
      partName: String): Map[String, String] =
    PartitionName.toMap(partName)

  def getPartition(db: String, table: String, partName: String): Option[PartitionMeta] = {
    if (!ext.tableExists(db, table)) return None
    val spec = toSpec(db, table, partName)
    ext.listPartitions(db, table, Some(spec)).headOption.map { p =>
      PartitionMeta(db, table, partName,
        p.storage.locationUri.map(_.toString).getOrElse(""), p.parameters)
    }
  }
  def addPartition(p: PartitionMeta): Unit =
    ext.createPartitions(p.db, p.table, Seq(CatalogTablePartition(
      toSpec(p.db, p.table, p.partName),
      CatalogStorageFormat.empty.copy(
        locationUri = Some(java.net.URI.create(p.location))),
      p.parameters)), ignoreIfExists = true)
  def alterPartition(p: PartitionMeta): Unit =
    ext.alterPartitions(p.db, p.table, Seq(CatalogTablePartition(
      toSpec(p.db, p.table, p.partName),
      CatalogStorageFormat.empty.copy(
        locationUri = Some(java.net.URI.create(p.location))),
      p.parameters)))
  def dropPartition(db: String, table: String, partName: String): Unit =
    if (ext.tableExists(db, table)) {
      ext.dropPartitions(db, table, Seq(toSpec(db, table, partName)),
        ignoreIfNotExists = true, purge = false, retainData = true)
    }
  def renamePartition(db: String, table: String, from: String,
      to: PartitionMeta): Unit = {
    ext.renamePartitions(db, table, Seq(toSpec(db, table, from)),
      Seq(toSpec(db, table, to.partName)))
    alterPartition(to)
  }
}

/** Connector for [[SparkCatalogClient]]: resolves the running session's
  * shared external catalog at connect time (never serializes a live
  * client — the `ClusterFactory` pattern). With
  * `spark.sql.catalogImplementation=hive` this is a real Hive metastore;
  * the default in-memory implementation backs tests.
  *
  * NOT executor-safe: `SparkSession.active` exists only on the driver (and
  * in local mode) — cluster deployments that need executor-side catalog
  * access plug in a Thrift-style connector instead; callers fall back to
  * driver-side execution for this one ([[CatalogConnector.executorSafe]]). */
final case class SparkCatalogConnector() extends CatalogConnector {
  def connect(): CatalogClient =
    new SparkCatalogClient(SparkSession.active)
  override def executorSafe: Boolean = false
}
