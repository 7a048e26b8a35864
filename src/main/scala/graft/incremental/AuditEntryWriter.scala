package graft.incremental

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import graft.model.{AuditObject, MetaJson, PartitionMeta, TableMeta}

/**
 * The shared audit-entry emitter behind both hook shapes: the CLI-hook
 * decorator ([[AuditLoggingCatalog]], reference `hive-hooks/.../
 * CliAuditLogHook.java`) and the metastore-listener
 * ([[graft.hooks.MetastoreAuditListener]], reference `hive-hooks/.../
 * MetastoreAuditLogListener.java`). One JSON entry per mutation,
 * file-per-entry (atomic create) in the `AuditLogEntry` schema the
 * incremental server tails — the file directory stands in for the
 * reference's MySQL audit table.
 *
 * Id allocation must survive what MySQL auto-increment gives the
 * reference for free: process restarts against a populated directory
 * and CONCURRENT writers (the server-side listener plus a CLI-hook
 * catalog audit the same warehouse). Ids therefore start past the
 * highest entry already on disk, and a lost CREATE_NEW race simply
 * advances and retries — the filesystem's atomic create is the
 * serialization point, so every emit lands exactly once under a
 * unique id and no mutation's audit row is ever dropped.
 */
final class AuditEntryWriter(auditDir: String, startId: Long = 0L) {

  private val EntryName = raw"audit-(\d{12})\.json".r

  private def maxOnDisk(): Long = {
    val dir = graft.fs.LocalDirs.resolve(auditDir)
    if (!Files.isDirectory(dir)) 0L
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.foldLeft(0L) { (m, p) =>
        p.getFileName.toString match {
          case EntryName(n) => math.max(m, n.toLong)
          case _ => m
        }
      } finally s.close()
    }
  }

  private val nextId = new AtomicLong(math.max(startId, maxOnDisk()))
  // Jackson ships with Spark — a real JSON writer, so names containing
  // quotes/backslashes escape correctly instead of corrupting the entry
  // (which the streaming reader would silently drop in PERMISSIVE mode).
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def emit(commandType: String, outputTables: Seq[String] = Seq.empty,
      outputPartitions: Seq[String] = Seq.empty,
      renameFrom: Option[String] = None,
      objects: Seq[AuditObject] = Seq.empty,
      command: Option[String] = None,
      referenceTables: Seq[String] = Seq.empty): Unit = {
    var id = nextId.incrementAndGet()
    val node = mapper.createObjectNode()
    node.put("id", id)
    // ISO-8601 with 'T' in UTC: the streaming reader parses in the session
    // time zone (forced UTC); a default-zone stamp would skew the lag
    // metric by the host's UTC offset
    node.put("createTime",
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC).format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")))
    node.put("commandType", commandType)
    // the executed command text, like the reference's CliAuditLogHook —
    // commands whose entries carry no outputs (HIVE-12865 exchange) are
    // only replicable from this SQL, so it must be the real text
    node.put("command", command.getOrElse(commandType))
    val ot = node.putArray("outputTables"); outputTables.foreach(ot.add)
    val op = node.putArray("outputPartitions"); outputPartitions.foreach(op.add)
    renameFrom.foreach(r => node.put("renameFrom", r))
    val rt = node.putArray("referenceTables"); referenceTables.foreach(rt.add)
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
    val dir = graft.fs.LocalDirs.resolve(auditDir)
    Files.createDirectories(dir)
    // CREATE_NEW is the serialization point: a concurrent writer that
    // claimed this id makes the create fail, so take the next one and
    // re-stamp — the auto-increment race loop, with the filesystem as
    // the arbiter instead of MySQL
    var written = false
    while (!written) {
      try {
        Files.write(dir.resolve(f"audit-$id%012d.json"),
          (mapper.writeValueAsString(node) + "\n")
            .getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        written = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          id = nextId.updateAndGet(n => math.max(n, id) + 1)
          node.put("id", id)
      }
    }
  }
}

object AuditEntryWriter {

  /** `THRIFT_API` sentinel the reference listener writes as the command
    * (`MetastoreAuditLogListener.java:311`) — there is no SQL to log. */
  val ThriftCommand = "THRIFT_API"

  def tableObj(t: TableMeta): AuditObject =
    AuditObject("OUTPUT", "TABLE", s"${t.db}.${t.table}", MetaJson.writeTable(t))

  def partObj(p: PartitionMeta): AuditObject =
    AuditObject("OUTPUT", "PARTITION", s"${p.db}.${p.table}/${p.partName}",
      MetaJson.writePartition(p))
}
