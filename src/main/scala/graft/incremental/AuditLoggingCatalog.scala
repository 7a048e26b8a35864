package graft.incremental

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import graft.catalog.CatalogClient
import graft.model.{AuditObject, MetaJson, PartitionMeta, TableMeta}

/**
 * The audit-hook analog (reference `hive-hooks/`: CliAuditLogHook +
 * MetastoreAuditLogListener write CDC rows on every DDL/DML): a
 * CatalogClient decorator that emits one JSON audit entry per mutation
 * into a directory the incremental server tails ([[IncrementalServer.start]]).
 *
 * Entries are written file-per-entry (atomic create) in the
 * `AuditLogEntry` JSON schema, so src-side catalog mutations stream
 * straight into replication jobs — the full hooks → audit log → server
 * loop of the reference, with the file directory standing in for the
 * MySQL audit table.
 */
final class AuditLoggingCatalog(underlying: CatalogClient, auditDir: String,
    startId: Long = 0L) extends CatalogClient {

  private val nextId = new AtomicLong(startId)
  // Jackson ships with Spark — a real JSON writer, so names containing
  // quotes/backslashes escape correctly instead of corrupting the entry
  // (which the streaming reader would silently drop in PERMISSIVE mode).
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def emit(commandType: String, outputTables: Seq[String] = Seq.empty,
      outputPartitions: Seq[String] = Seq.empty,
      renameFrom: Option[String] = None,
      objects: Seq[AuditObject] = Seq.empty): Unit = {
    val id = nextId.incrementAndGet()
    val node = mapper.createObjectNode()
    node.put("id", id)
    // ISO-8601 with 'T' in UTC: the streaming reader parses in the session
    // time zone (forced UTC); a default-zone stamp would skew the lag
    // metric by the host's UTC offset
    node.put("createTime",
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC).format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")))
    node.put("commandType", commandType)
    node.put("command", commandType)
    val ot = node.putArray("outputTables"); outputTables.foreach(ot.add)
    val op = node.putArray("outputPartitions"); outputPartitions.foreach(op.add)
    renameFrom.foreach(r => node.put("renameFrom", r))
    node.putArray("referenceTables")
    // F6: full object metadata rides along so replication can replay
    // without re-fetching from the (possibly already-mutated) source
    val objArr = node.putArray("objects")
    objects.foreach { o =>
      val on = objArr.addObject()
      on.put("category", o.category)
      on.put("objectType", o.objectType)
      on.put("name", o.name)
      on.put("serialized", o.serialized)
    }
    val dir = Paths.get(java.net.URI.create(
      if (auditDir.contains(":/")) auditDir else s"file://$auditDir"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"audit-$id%012d.json"),
      (mapper.writeValueAsString(node) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
  }

  // ---- mutations emit audit entries --------------------------------------
  def createDatabase(db: String): Unit = {
    underlying.createDatabase(db)
    emit("CREATEDATABASE")
  }
  private def tableObj(t: TableMeta): AuditObject =
    AuditObject("OUTPUT", "TABLE", s"${t.db}.${t.table}", MetaJson.writeTable(t))
  private def partObj(p: PartitionMeta): AuditObject =
    AuditObject("OUTPUT", "PARTITION", s"${p.db}.${p.table}/${p.partName}",
      MetaJson.writePartition(p))

  def createTable(t: TableMeta): Unit = {
    underlying.createTable(t)
    emit("CREATETABLE", outputTables = Seq(s"${t.db}.${t.table}"),
      objects = Seq(tableObj(t)))
  }
  def alterTable(db: String, table: String, t: TableMeta): Unit = {
    underlying.alterTable(db, table, t)
    if (db != t.db || table != t.table) {
      emit("ALTERTABLE_RENAME", outputTables = Seq(s"${t.db}.${t.table}"),
        renameFrom = Some(s"$db.$table"), objects = Seq(tableObj(t)))
    } else {
      emit("ALTERTABLE_PROPERTIES", outputTables = Seq(s"$db.$table"),
        objects = Seq(tableObj(t)))
    }
  }
  def dropTable(db: String, table: String): Unit = {
    underlying.dropTable(db, table)
    emit("DROPTABLE", outputTables = Seq(s"$db.$table"))
  }
  def addPartition(p: PartitionMeta): Unit = {
    underlying.addPartition(p)
    emit("QUERY", outputPartitions = Seq(s"${p.db}.${p.table}/${p.partName}"),
      objects = Seq(partObj(p)))
  }
  def alterPartition(p: PartitionMeta): Unit = {
    underlying.alterPartition(p)
    emit("QUERY", outputPartitions = Seq(s"${p.db}.${p.table}/${p.partName}"),
      objects = Seq(partObj(p)))
  }
  def dropPartition(db: String, table: String, partName: String): Unit = {
    underlying.dropPartition(db, table, partName)
    emit("ALTERTABLE_DROPPARTS",
      outputPartitions = Seq(s"$db.$table/$partName"))
  }
  def renamePartition(db: String, table: String, from: String,
      to: PartitionMeta): Unit = {
    underlying.renamePartition(db, table, from, to)
    emit("ALTERTABLE_RENAMEPART",
      outputPartitions = Seq(s"$db.$table/${to.partName}"),
      renameFrom = Some(s"$db.$table/$from"),
      objects = Seq(partObj(to)))
  }

  // ---- reads pass through -------------------------------------------------
  def listDatabases(): Seq[String] = underlying.listDatabases()
  def listTables(db: String): Seq[String] = underlying.listTables(db)
  def getTable(db: String, table: String): Option[TableMeta] =
    underlying.getTable(db, table)
  def listPartitionNames(db: String, table: String): Seq[String] =
    underlying.listPartitionNames(db, table)
  def getPartition(db: String, table: String, partName: String): Option[PartitionMeta] =
    underlying.getPartition(db, table, partName)
}
