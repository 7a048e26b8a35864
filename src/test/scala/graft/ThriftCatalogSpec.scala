package graft

import graft.batch.{BatchConfig, BatchReplication}
import graft.catalog.{CatalogSnapshot, InMemoryCatalog, ThriftHmsCatalogConnector}
import graft.fs.CopyExec
import graft.model._

/**
 * The Thrift HMS catalog client over a real socket + TBinaryProtocol
 * round-trip against the in-process mock metastore — the
 * JdbcCatalogSpec suite shape, run through the wire protocol a real
 * Hive deployment speaks (reference
 * `utils/common/ThriftHiveMetastoreClient.java:97-312`).
 */
class ThriftCatalogSpec extends TestBase {

  // servers run on daemon threads and die with the test JVM; each test
  // uses its own ephemeral port + catalog id
  private def freshThrift(name: String): (MockHmsServer, ThriftHmsCatalogConnector) = {
    val srv = new MockHmsServer(InMemoryCatalog.get(s"thrift-$name"))
    (srv, ThriftHmsCatalogConnector("127.0.0.1", srv.port))
  }

  test("Thrift catalog round-trips tables and partitions over the wire") {
    val (_, conn) = freshThrift("crud")
    val c = conn.connect()
    val wh = tmpDir("thrift-crud-wh")
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
    assert(c.getPartition("db1", "t1", "ds=9/hr=9").isEmpty)

    val t2 = t.copy(parameters = t.parameters + ("k" -> "v"))
    c.alterTable("db1", "t1", t2)
    assert(c.getTable("db1", "t1").contains(t2))

    // rename carries partitions along (mock preserves InMemoryCatalog
    // semantics; a real HMS does this server-side)
    val renamed = t2.copy(table = "t1_renamed")
    c.alterTable("db1", "t1", renamed)
    assert(c.getTable("db1", "t1").isEmpty)
    assert(c.getTable("db1", "t1_renamed").contains(renamed))
    assert(c.listPartitionNames("db1", "t1_renamed") == Seq("ds=1/hr=1"))

    val p2 = p.copy(table = "t1_renamed", partName = "ds=1/hr=9")
    c.renamePartition("db1", "t1_renamed", "ds=1/hr=1", p2)
    assert(c.listPartitionNames("db1", "t1_renamed") == Seq("ds=1/hr=9"))
    c.dropPartition("db1", "t1_renamed", "ds=1/hr=9")
    assert(c.listPartitionNames("db1", "t1_renamed").isEmpty)
    c.dropTable("db1", "t1_renamed")
    assert(c.listTables("db1").isEmpty)
  }

  test("distributed snapshot + full batch replication run through Thrift") {
    val (_, srcConn) = freshThrift("batch-src")
    val (_, destConn) = freshThrift("batch-dest")
    assert(srcConn.executorSafe && destConn.executorSafe)
    val srcWh = tmpDir("thrift-src-wh")
    val destWh = tmpDir("thrift-dest-wh")
    val src = srcConn.connect()
    val unp = unpartitionedTable("test_db", "unp_table", srcWh)
    val part = partitionedTable("test_db", "part_table", srcWh)
    src.createTable(unp)
    src.createTable(part)
    Seq("ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3")
      .foreach(p => src.addPartition(partition(part, p)))

    // executor-side scans: each task partition opens its own socket
    val snap = CatalogSnapshot.tables(spark, srcConn).collect()
    assert(snap.map(_.table).sorted.toSeq == Seq("part_table", "unp_table"))
    val parts = CatalogSnapshot.partitions(spark, srcConn).collect()
    assert(parts.map(_.partName).sorted.toSeq ==
      Seq("ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3"))

    val cfg = BatchConfig(srcConn, destConn,
      srcFsRoot = srcWh.toUri.toString.stripSuffix("/"),
      destFsRoot = destWh.toUri.toString.stripSuffix("/"),
      planDir = tmpDir("thrift-plan").toUri.toString + "plan",
      copyParallelism = 4)
    val actions = BatchReplication.plan(spark, cfg).collect()
    assert(actions.length == 5, s"plan was: ${actions.mkString("\n")}")
    val copied = BatchReplication.copyData(spark, cfg)
    assert(copied == 8, s"expected 8 files copied, got $copied")
    val stats = BatchReplication.commit(spark, cfg)
    assert(stats.commitFailures == 0 && stats.planned == 5, s"stats: $stats")

    val dest = destConn.connect()
    val destUnp = dest.getTable("test_db", "unp_table")
    assert(destUnp.isDefined)
    assert(dest.listPartitionNames("test_db", "part_table").size == 3)
    assert(CopyExec.equalDirs(spark, unp.location, destUnp.get.location))
    // convergence
    assert(BatchReplication.plan(spark, cfg).collect().isEmpty)
  }
}
