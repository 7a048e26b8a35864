package graft

import graft.batch.{BatchConfig, BatchReplication}
import graft.catalog.{CatalogSnapshot, JdbcCatalogClient, JdbcCatalogConnector}
import graft.fs.CopyExec
import graft.model._

/**
 * The executor-safe JDBC catalog (Derby embedded here; a networked
 * database in a deployment) and the distributed paths it unlocks: the
 * `CatalogSnapshot` mapPartitions scans and `BatchReplication.commit`'s
 * stage-3 executor-side commit — the plans that previously only the
 * in-memory test connector could take.
 */
class JdbcCatalogSpec extends TestBase {

  private def freshJdbc(name: String): JdbcCatalogConnector = {
    val dir = tmpDir(s"jdbc-cat-$name").resolve("db")
    val url = s"jdbc:derby:$dir;create=true"
    JdbcCatalogClient.initSchema(url)
    JdbcCatalogConnector(url)
  }

  test("JDBC catalog round-trips tables and partitions; rename carries partitions") {
    val conn = freshJdbc("crud")
    val c = conn.connect()
    val wh = tmpDir("jdbc-crud-wh")
    val t = partitionedTable("db1", "t1", wh)
    c.createTable(t)
    assert(c.listDatabases() == Seq("db1"))
    assert(c.listTables("db1") == Seq("t1"))
    assert(c.getTable("db1", "t1").contains(t))
    assert(c.getTable("db1", "missing").isEmpty)

    val p = partition(t, "ds=1/hr=1")
    c.addPartition(p)
    assert(c.listPartitionNames("db1", "t1") == Seq("ds=1/hr=1"))
    assert(c.getPartition("db1", "t1", "ds=1/hr=1").contains(p))

    // upsert semantics: alter overwrites in place
    val t2 = t.copy(parameters = t.parameters + ("k" -> "v"))
    c.alterTable("db1", "t1", t2)
    assert(c.getTable("db1", "t1").contains(t2))

    // rename moves the partitions along, rewriting their embedded table
    val renamed = t2.copy(table = "t1_renamed")
    c.alterTable("db1", "t1", renamed)
    assert(c.getTable("db1", "t1").isEmpty)
    assert(c.getTable("db1", "t1_renamed").contains(renamed))
    assert(c.listPartitionNames("db1", "t1_renamed") == Seq("ds=1/hr=1"))
    assert(c.getPartition("db1", "t1_renamed", "ds=1/hr=1").get.table == "t1_renamed")

    // renamePartition and drops
    val p2 = p.copy(table = "t1_renamed", partName = "ds=1/hr=9")
    c.renamePartition("db1", "t1_renamed", "ds=1/hr=1", p2)
    assert(c.listPartitionNames("db1", "t1_renamed") == Seq("ds=1/hr=9"))
    c.dropPartition("db1", "t1_renamed", "ds=1/hr=9")
    assert(c.listPartitionNames("db1", "t1_renamed").isEmpty)
    c.dropTable("db1", "t1_renamed")
    assert(c.listTables("db1").isEmpty)
  }

  test("distributed snapshot + stage-3 commit run through the JDBC catalog") {
    val srcConn = freshJdbc("batch-src")
    val destConn = freshJdbc("batch-dest")
    // executorSafe is what routes BatchReplication.commit and the
    // CatalogSnapshot scans onto their distributed branches
    assert(srcConn.executorSafe && destConn.executorSafe)
    val srcWh = tmpDir("jdbc-src-wh")
    val destWh = tmpDir("jdbc-dest-wh")
    val src = srcConn.connect()
    val unp = unpartitionedTable("test_db", "unp_table", srcWh)
    val part = partitionedTable("test_db", "part_table", srcWh)
    src.createTable(unp)
    src.createTable(part)
    Seq("ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3")
      .foreach(p => src.addPartition(partition(part, p)))

    // distributed S1/S3 snapshots: one JDBC connection per task partition
    val snap = CatalogSnapshot.tables(spark, srcConn).collect()
    assert(snap.map(_.table).sorted.toSeq == Seq("part_table", "unp_table"))
    val parts = CatalogSnapshot.partitions(spark, srcConn).collect()
    assert(parts.map(_.partName).sorted.toSeq ==
      Seq("ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3"))

    val cfg = BatchConfig(srcConn, destConn,
      srcFsRoot = srcWh.toUri.toString.stripSuffix("/"),
      destFsRoot = destWh.toUri.toString.stripSuffix("/"),
      planDir = tmpDir("jdbc-plan").toUri.toString + "plan",
      copyParallelism = 4)
    val actions = BatchReplication.plan(spark, cfg).collect()
    assert(actions.length == 5, s"plan was: ${actions.mkString("\n")}")

    val copied = BatchReplication.copyData(spark, cfg)
    assert(copied == 8, s"expected 8 files copied, got $copied")
    // stage 3 takes the mapPartitions branch: commits happen on executor
    // threads, each with its own JDBC connection
    val stats = BatchReplication.commit(spark, cfg)
    assert(stats.commitFailures == 0 && stats.planned == 5, s"stats: $stats")

    val dest = destConn.connect()
    val destUnp = dest.getTable("test_db", "unp_table")
    assert(destUnp.isDefined)
    assert(dest.listPartitionNames("test_db", "part_table").size == 3)
    assert(destUnp.get.parameters(TableMeta.SrcCluster) == "src")
    assert(CopyExec.equalDirs(spark, unp.location, destUnp.get.location))

    // convergence: a re-plan over the JDBC-backed snapshots is empty
    assert(BatchReplication.plan(spark, cfg).collect().isEmpty)
  }
}
