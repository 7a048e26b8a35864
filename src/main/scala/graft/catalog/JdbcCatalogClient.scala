package graft.catalog

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet, SQLException}

import graft.model.{MetaJson, PartitionMeta, TableMeta}

/**
 * Executor-safe JDBC-backed catalog: a metastore-subset schema
 * (`graft_dbs` / `graft_tbls` / `graft_parts`) over any JDBC database —
 * embedded Derby in tests, MySQL/Postgres in a deployment.
 *
 * This is the engine's analog of the reference's per-mapper metastore
 * connections (`batch/hive/Stage3CommitChangeMapper.java:72-168` opens one
 * `ThriftHiveMetastoreClient` per commit mapper,
 * `utils/common/ThriftHiveMetastoreClient.java:97-312`): the connector is
 * a small serializable value, every executor task calls `connect()` for
 * its own connection, and the distributed snapshot scans
 * ([[CatalogSnapshot]]) and the distributed stage-3 commit
 * ([[graft.batch.BatchReplication.commit]]) run without funneling catalog
 * traffic through the driver.
 *
 * Object metadata rides as a [[MetaJson]] payload beside the lookup-key
 * columns — the same JSON codec the audit entries carry (F6), so the
 * comparable subset round-trips exactly and schema evolution stays in one
 * place. Writes are last-writer-wins upserts, matching the in-memory
 * catalog and the metastore's own alter semantics.
 *
 * Embedded Derby is single-JVM (fine under local[*]); a multi-executor
 * cluster points the same client at a networked database, exactly like
 * the reference's shared MySQL-backed metastore.
 */
final case class JdbcCatalogConnector(url: String) extends CatalogConnector {
  def connect(): CatalogClient = new JdbcCatalogClient(url)
}

object JdbcCatalogClient {

  /** Create the schema if absent (idempotent). Key sizes stay within
    * Derby's index-key limit; `meta` is a CLOB so wide schemas fit. */
  def initSchema(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val ddl = Seq(
        """CREATE TABLE graft_dbs (
          |  db_name VARCHAR(128) PRIMARY KEY)""".stripMargin,
        """CREATE TABLE graft_tbls (
          |  db_name VARCHAR(128) NOT NULL,
          |  tbl_name VARCHAR(256) NOT NULL,
          |  meta CLOB NOT NULL,
          |  PRIMARY KEY (db_name, tbl_name))""".stripMargin,
        """CREATE TABLE graft_parts (
          |  db_name VARCHAR(128) NOT NULL,
          |  tbl_name VARCHAR(256) NOT NULL,
          |  part_name VARCHAR(512) NOT NULL,
          |  meta CLOB NOT NULL,
          |  PRIMARY KEY (db_name, tbl_name, part_name))""".stripMargin)
      ddl.foreach { sql =>
        try { val st = conn.createStatement(); st.executeUpdate(sql); st.close() }
        catch { case e: SQLException if tableExists(e) => () }
      }
    } finally conn.close()
  }

  // ONLY the dialect-specific "object already exists" signals mean init
  // already ran: Derby X0Y32, Postgres 42P07, MySQL error 1050. Anything
  // else (wrong search_path, dead connection, syntax) must propagate —
  // a message-text match on "exist" would swallow e.g. Postgres's
  // 'schema "x" does not exist' and leave a half-initialized catalog.
  private def tableExists(e: SQLException): Boolean =
    e.getSQLState == "X0Y32" || e.getSQLState == "42P07" || e.getErrorCode == 1050

  /** SQLState class 23 = integrity-constraint violation (covers drivers
    * that don't subclass SQLIntegrityConstraintViolationException). */
  private[catalog] def isDuplicateKey(e: SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23"))
}

final class JdbcCatalogClient(url: String) extends CatalogClient with AutoCloseable {

  // one connection per client; connect() is per task/thread (see
  // CatalogConnector), so the connection is never shared across threads
  private lazy val conn: Connection = DriverManager.getConnection(url)
  override def close(): Unit = conn.close()

  private def update(sql: String)(bind: PreparedStatement => Unit): Int = {
    val ps = conn.prepareStatement(sql)
    try { bind(ps); ps.executeUpdate() } finally ps.close()
  }

  /** Fully materializes before returning — Derby autocommit closes other
    * statements' open ResultSets when a new statement executes. */
  private def query[A](sql: String)(bind: PreparedStatement => Unit)(
      read: ResultSet => A): Seq[A] = {
    val ps = conn.prepareStatement(sql)
    try {
      bind(ps)
      val rs = ps.executeQuery()
      val buf = Seq.newBuilder[A]
      while (rs.next()) buf += read(rs)
      rs.close()
      buf.result()
    } finally ps.close()
  }

  /** Last-writer-wins upsert without MERGE (dialect-portable): UPDATE
    * first, INSERT on miss, re-UPDATE if a concurrent INSERT won the
    * race. Only a duplicate-key violation means "lost the race" — other
    * SQLExceptions (connection loss, constraint on another column) must
    * propagate, not silently degrade to a second UPDATE. */
  private def upsert(updateSql: String, insertSql: String)(
      bindUpdate: PreparedStatement => Unit)(
      bindInsert: PreparedStatement => Unit): Unit = {
    if (update(updateSql)(bindUpdate) == 0) {
      try update(insertSql)(bindInsert)
      catch {
        case e: SQLException if JdbcCatalogClient.isDuplicateKey(e) =>
          update(updateSql)(bindUpdate)
      }
    }
    ()
  }

  def listDatabases(): Seq[String] =
    query("SELECT db_name FROM graft_dbs ORDER BY db_name")(_ => ())(_.getString(1))

  def createDatabase(db: String): Unit = {
    // duplicate key = already present (fine); anything else propagates
    try update("INSERT INTO graft_dbs (db_name) VALUES (?)")(_.setString(1, db))
    catch { case e: SQLException if JdbcCatalogClient.isDuplicateKey(e) => () }
    ()
  }

  def listTables(db: String): Seq[String] =
    query("SELECT tbl_name FROM graft_tbls WHERE db_name = ? ORDER BY tbl_name")(
      _.setString(1, db))(_.getString(1))

  def getTable(db: String, table: String): Option[TableMeta] =
    query("SELECT meta FROM graft_tbls WHERE db_name = ? AND tbl_name = ?") {
      ps => ps.setString(1, db); ps.setString(2, table)
    }(_.getString(1)).headOption.map(MetaJson.readTable)

  def createTable(t: TableMeta): Unit = {
    createDatabase(t.db)
    upsert(
      "UPDATE graft_tbls SET meta = ? WHERE db_name = ? AND tbl_name = ?",
      "INSERT INTO graft_tbls (meta, db_name, tbl_name) VALUES (?, ?, ?)") {
      ps =>
        ps.setString(1, MetaJson.writeTable(t))
        ps.setString(2, t.db); ps.setString(3, t.table)
    } { ps =>
      ps.setString(1, MetaJson.writeTable(t))
      ps.setString(2, t.db); ps.setString(3, t.table)
    }
  }

  def alterTable(db: String, table: String, t: TableMeta): Unit = {
    createTable(t)
    if (db != t.db || table != t.table) {
      // rename carries partitions along (reference renameTable semantics):
      // read the old rows fully first (Derby closes open ResultSets on the
      // next statement), rewrite their embedded db/table, move, drop old
      val moved = query(
        "SELECT meta FROM graft_parts WHERE db_name = ? AND tbl_name = ?") {
        ps => ps.setString(1, db); ps.setString(2, table)
      }(_.getString(1))
      moved.foreach { metaJson =>
        addPartition(
          MetaJson.readPartition(metaJson).copy(db = t.db, table = t.table))
      }
      update("DELETE FROM graft_parts WHERE db_name = ? AND tbl_name = ?") {
        ps => ps.setString(1, db); ps.setString(2, table)
      }
      update("DELETE FROM graft_tbls WHERE db_name = ? AND tbl_name = ?") {
        ps => ps.setString(1, db); ps.setString(2, table)
      }
    }
  }

  def dropTable(db: String, table: String): Unit = {
    update("DELETE FROM graft_parts WHERE db_name = ? AND tbl_name = ?") {
      ps => ps.setString(1, db); ps.setString(2, table)
    }
    update("DELETE FROM graft_tbls WHERE db_name = ? AND tbl_name = ?") {
      ps => ps.setString(1, db); ps.setString(2, table)
    }
  }

  def listPartitionNames(db: String, table: String): Seq[String] =
    query(
      """SELECT part_name FROM graft_parts
        |WHERE db_name = ? AND tbl_name = ? ORDER BY part_name""".stripMargin) {
      ps => ps.setString(1, db); ps.setString(2, table)
    }(_.getString(1))

  def getPartition(db: String, table: String, partName: String): Option[PartitionMeta] =
    query(
      """SELECT meta FROM graft_parts
        |WHERE db_name = ? AND tbl_name = ? AND part_name = ?""".stripMargin) {
      ps => ps.setString(1, db); ps.setString(2, table); ps.setString(3, partName)
    }(_.getString(1)).headOption.map(MetaJson.readPartition)

  def addPartition(p: PartitionMeta): Unit =
    upsert(
      """UPDATE graft_parts SET meta = ?
        |WHERE db_name = ? AND tbl_name = ? AND part_name = ?""".stripMargin,
      """INSERT INTO graft_parts (meta, db_name, tbl_name, part_name)
        |VALUES (?, ?, ?, ?)""".stripMargin) { ps =>
      ps.setString(1, MetaJson.writePartition(p))
      ps.setString(2, p.db); ps.setString(3, p.table); ps.setString(4, p.partName)
    } { ps =>
      ps.setString(1, MetaJson.writePartition(p))
      ps.setString(2, p.db); ps.setString(3, p.table); ps.setString(4, p.partName)
    }

  def alterPartition(p: PartitionMeta): Unit = addPartition(p)

  def dropPartition(db: String, table: String, partName: String): Unit =
    update(
      """DELETE FROM graft_parts
        |WHERE db_name = ? AND tbl_name = ? AND part_name = ?""".stripMargin) {
      ps => ps.setString(1, db); ps.setString(2, table); ps.setString(3, partName)
    }

  def renamePartition(db: String, table: String, from: String, to: PartitionMeta): Unit = {
    dropPartition(db, table, from)
    addPartition(to)
  }
}
