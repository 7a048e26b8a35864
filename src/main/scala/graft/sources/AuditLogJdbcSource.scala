package graft.sources

import java.sql.DriverManager
import java.util

import scala.collection.JavaConverters._
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.{AuditLogEntry, AuditObject}

/**
 * ST1 as a native Structured Streaming source: a DataSource-v2
 * `MicroBatchStream` over the JDBC audit log, with the monotonically
 * increasing entry `id` as the stream offset — exactly the shape SURVEY
 * §2.9 maps the reference's poll loop onto.
 *
 * Reference semantics carried over (`incremental/auditlog/AuditLogReader
 * .java:199-254`, `ReplicationServer.java:443-457`):
 *  - offsets are ids; a restart resumes from the checkpointed id (ST2 —
 *    Spark's commit log replaces the hand-rolled `last_persisted_id` KV);
 *  - SHOW-type/no-op command types are filtered in the pushed-down WHERE;
 *  - admission control caps ids per trigger (the reference's batch cap);
 *  - the 1:N `audit_objects` join is assembled per id range inside each
 *    partition reader (S7/A6), including serialized payloads (F6) when
 *    the table carries them.
 *
 * Scale shape: `planInputPartitions` splits each micro-batch's id range
 * into page-sized slices, one reader per slice, each with its own JDBC
 * connection on the executor — rows never funnel through the driver.
 *
 * Usage:
 * {{{
 *   spark.readStream.format("graft-audit-jdbc")
 *     .option("url", jdbcUrl).load().as[AuditLogEntry]
 * }}}
 */
class AuditLogJdbcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit-jdbc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AuditLogJdbc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditLogJdbcTable(properties.asScala.toMap)
}

object AuditLogJdbc {
  val schema: StructType = ExpressionEncoder[AuditLogEntry]().schema

  final case class Options(
      url: String,
      auditTable: String,
      objectsTable: String,
      startId: Long,
      pageSize: Int,
      rowsPerTrigger: Long,
      dropCommandTypes: Seq[String],
      // MySQL-only read consistency (`lockInShareMode=true`): page reads
      // append LOCK IN SHARE MODE so a half-committed hook transaction's
      // rows are waited for instead of skipped past — the reference's
      // AuditLogReader does the same (`auditlog/AuditLogReader.java:199-254`).
      // Off by default: Derby/Postgres don't accept the syntax, and the
      // file/embedded deployments don't need it (hooks write objects
      // before the log row).
      lockInShareMode: Boolean)

  // table names are spliced into SQL text (JDBC can't parameterize
  // identifiers) — restrict them to plain possibly-qualified identifiers
  // so a quote in an option value can't break out of the statement
  private val IdentPattern = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*".r
  private def validIdent(name: String, opt: String): String =
    if (IdentPattern.pattern.matcher(name).matches()) name
    else throw new IllegalArgumentException(
      s"graft-audit-jdbc: option '$opt' must be a plain identifier, got '$name'")

  def options(raw: Map[String, String]): Options = {
    // normalize: getTable receives the ORIGINAL-case option map
    // (CaseInsensitiveStringMap.asCaseSensitiveMap), so `.option("startId",
    // ...)` arrives camelCase — lowercase-only lookups silently miss it
    val m = raw.map { case (k, v) => k.toLowerCase -> v }
    Options(
      url = m.getOrElse("url",
        throw new IllegalArgumentException("graft-audit-jdbc requires 'url'")),
      auditTable = validIdent(m.getOrElse("audittable", "audit_log"), "auditTable"),
      objectsTable = validIdent(m.getOrElse("objectstable", "audit_objects"), "objectsTable"),
      startId = m.getOrElse("startid", "0").toLong,
      pageSize = m.getOrElse("pagesize", "200").toInt,
      rowsPerTrigger = m.getOrElse("rowspertrigger", "200").toLong,
      dropCommandTypes = m.getOrElse("dropcommandtypes",
        "SHOWTABLES,SHOWPARTITIONS,SWITCHDATABASE").split(',').toSeq,
      lockInShareMode = m.getOrElse("lockinsharemode", "false").toBoolean)
  }

  def maxId(opts: Options): Long = {
    val conn = DriverManager.getConnection(opts.url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT MAX(id) FROM ${opts.auditTable}")
      if (rs.next()) math.max(rs.getLong(1), 0L) else 0L
    } finally conn.close()
  }

  /** Fetch + assemble entries in (lo, hi]; runs inside a partition reader. */
  def fetchRange(opts: Options, lo: Long, hi: Long): Seq[AuditLogEntry] = {
    val conn = DriverManager.getConnection(opts.url)
    try {
      // command types come from an option value — bind them as parameters
      // rather than splicing quoted literals (table names are validated
      // identifiers; id bounds are longs, bound anyway for uniformity)
      val drops = opts.dropCommandTypes.filter(_.nonEmpty)
      val notIn =
        if (drops.isEmpty) ""
        else s" AND command_type NOT IN (${Seq.fill(drops.size)("?").mkString(", ")})"
      val lock = if (opts.lockInShareMode) "\nLOCK IN SHARE MODE" else ""
      val logPs = conn.prepareStatement(
        s"""SELECT id, create_time, command_type, command
           |FROM ${opts.auditTable}
           |WHERE id > ? AND id <= ?$notIn
           |ORDER BY id""".stripMargin + lock)
      logPs.setLong(1, lo)
      logPs.setLong(2, hi)
      drops.zipWithIndex.foreach { case (t, i) => logPs.setString(3 + i, t) }
      val logRs = logPs.executeQuery()
      val entries = mutable.LinkedHashMap.empty[Long, AuditLogEntry]
      while (logRs.next()) {
        entries.put(logRs.getLong(1), AuditLogEntry(
          id = logRs.getLong(1),
          createTime = logRs.getTimestamp(2),
          commandType = logRs.getString(3),
          command = logRs.getString(4),
          outputTables = Seq.empty, outputPartitions = Seq.empty,
          renameFrom = None, referenceTables = Seq.empty))
      }
      if (entries.isEmpty) return Seq.empty
      // cheap, dialect-portable probe (getColumns with null filters would
      // scan the whole catalog every page): an empty-result SELECT either
      // parses or throws on the missing column. Runs BEFORE the objects
      // query — autocommit drivers (Derby) close other statements' open
      // ResultSets when a new statement executes.
      val hasSerialized =
        try {
          conn.createStatement().executeQuery(
            s"SELECT serialized FROM ${opts.objectsTable} WHERE 1 = 0")
          true
        } catch { case _: java.sql.SQLException => false }
      val serCol = if (hasSerialized) ", serialized" else ""
      val objPs = conn.prepareStatement(
        s"""SELECT audit_log_id, category, object_type, name$serCol
           |FROM ${opts.objectsTable}
           |WHERE audit_log_id > ? AND audit_log_id <= ?""".stripMargin)
      objPs.setLong(1, lo)
      objPs.setLong(2, hi)
      val objRs = objPs.executeQuery()
      while (objRs.next()) {
        val id = objRs.getLong(1)
        entries.get(id).foreach { e =>
          val (cat, typ, name) =
            (objRs.getString(2), objRs.getString(3), objRs.getString(4))
          val serialized =
            if (hasSerialized) Option(objRs.getString(5)).getOrElse("") else ""
          val obj = AuditObject(cat, typ, name, serialized)
          val updated = (cat, typ) match {
            case ("OUTPUT", "TABLE") =>
              e.copy(outputTables = (e.outputTables :+ name).sorted)
            case ("OUTPUT", "PARTITION") =>
              e.copy(outputPartitions = (e.outputPartitions :+ name).sorted)
            case ("RENAME_FROM", _) => e.copy(renameFrom = Some(name))
            case ("REFERENCE_TABLE", _) =>
              e.copy(referenceTables = (e.referenceTables :+ name).sorted)
            case _ => e
          }
          entries.put(id, updated.copy(objects = updated.objectsOrEmpty :+ obj))
        }
      }
      entries.values.toSeq
    } finally conn.close()
  }
}

final class AuditLogJdbcTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-audit-jdbc:${props.getOrElse("url", "?")}"
  override def schema(): StructType = AuditLogJdbc.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = AuditLogJdbc.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new AuditLogMicroBatchStream(AuditLogJdbc.options(props))
      }
    }
}

/** Stream offset = highest audit id admitted so far. */
final case class IdOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class AuditLogMicroBatchStream(opts: AuditLogJdbc.Options)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = IdOffset(opts.startId)
  override def deserializeOffset(json: String): Offset = IdOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.rowsPerTrigger)

  /** Admission control over id ranges: ids are dense-enough that capping
    * the id span approximates the row cap (the reference caps entries per
    * poll the same way, `ReplicationServer.java:203-204`). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[IdOffset].id
    val max = AuditLogJdbc.maxId(opts)
    val capped = limit match {
      case rl: ReadMaxRows => math.min(max, from + rl.maxRows())
      case _ => max
    }
    IdOffset(math.max(capped, from))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset = IdOffset(AuditLogJdbc.maxId(opts))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[IdOffset].id
    val hi = end.asInstanceOf[IdOffset].id
    if (hi <= lo) return Array.empty
    (lo until hi by opts.pageSize.toLong)
      .map(p => IdRangePartition(p, math.min(p + opts.pageSize, hi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AuditRangeReaderFactory(opts)
}

final case class IdRangePartition(lo: Long, hi: Long) extends InputPartition

final class AuditRangeReaderFactory(opts: AuditLogJdbc.Options)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[IdRangePartition]
    new PartitionReader[InternalRow] {
      private val serializer =
        ExpressionEncoder[AuditLogEntry]().resolveAndBind().createSerializer()
      private val it = AuditLogJdbc.fetchRange(opts, range.lo, range.hi).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = serializer(it.next()).copy(); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
