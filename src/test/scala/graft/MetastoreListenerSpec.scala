package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.hive.metastore.events._

import graft.catalog.{InMemoryCatalog, ThriftHmsCatalogClient, ThriftHmsCatalogConnector}
import graft.hooks.MetastoreAuditListener
import graft.incremental.{IncrementalConfig, IncrementalServer}

/**
 * The server-side metastore listener (reference `hive-hooks/.../
 * MetastoreAuditLogListenerTest.java`): events constructed directly map
 * to the expected audit entries, and DDL arriving over the REAL Thrift
 * wire is audited by the mock metastore's listener dispatch and replayed
 * by the incremental server into the dest warehouse.
 */
class MetastoreListenerSpec extends TestBase {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def newListener(name: String): (MetastoreAuditListener, java.nio.file.Path) = {
    val auditDir = tmpDir(s"$name-audit")
    val conf = new Configuration(false)
    conf.set(MetastoreAuditListener.DirKey, auditDir.toString)
    (new MetastoreAuditListener(conf), auditDir)
  }

  private def entries(dir: java.nio.file.Path) =
    java.nio.file.Files.list(dir).toArray.map(_.toString).sorted
      .map(f => mapper.readTree(new java.io.File(f)))

  test("events map to the reference listener's audit rows") {
    val (listener, auditDir) = newListener("mls-unit")
    val wh = tmpDir("mls-unit-wh")
    val t = partitionedTable("db8", "t_ev", wh)
    val tt = ThriftHmsCatalogClient.toThriftTable(t)

    // a failed operation must not audit (2.x HMS only dispatches on
    // success; the flag is honored for directly-constructed events)
    listener.onCreateTable(new CreateTableEvent(tt, false, null))
    assert(entries(auditDir).isEmpty)

    listener.onCreateTable(new CreateTableEvent(tt, true, null))
    // bulk add: ONE audit row whose write set is every added partition
    val p1 = ThriftHmsCatalogClient.toThriftPartition(partition(t, "ds=1/hr=1"))
    val p2 = ThriftHmsCatalogClient.toThriftPartition(partition(t, "ds=1/hr=2"))
    listener.onAddPartition(new AddPartitionEvent(tt, Seq(p1, p2).asJava, true, null))
    // partition rename arrives as alter-partition with old != new
    val p3 = ThriftHmsCatalogClient.toThriftPartition(partition(t, "ds=1/hr=3"))
    listener.onAlterPartition(new AlterPartitionEvent(p1, p3, tt, true, null))
    listener.onDropPartition(new DropPartitionEvent(tt, p3, true, false, null))
    // table rename: old name != new name
    val renamed = ThriftHmsCatalogClient.toThriftTable(t.copy(table = "t_ev2"))
    listener.onAlterTable(new AlterTableEvent(tt, renamed, true, null))
    listener.onDropTable(new DropTableEvent(renamed, true, false, null))

    val ns = entries(auditDir)
    assert(ns.map(_.get("commandType").asText).toSeq == Seq(
      "THRIFT_CREATE_TABLE", "THRIFT_ADD_PARTITION", "THRIFT_ALTER_PARTITION",
      "THRIFT_DROP_PARTITION", "THRIFT_ALTER_TABLE", "THRIFT_DROP_TABLE"))
    ns.foreach(n => assert(n.get("command").asText == "THRIFT_API", n))

    val create = ns(0)
    assert(create.get("outputTables").get(0).asText == "db8.t_ev")
    assert(create.get("objects").get(0).get("objectType").asText == "TABLE")

    val add = ns(1)
    assert(add.get("outputPartitions").size == 2)
    assert(add.get("outputPartitions").get(0).asText == "db8.t_ev/ds=1/hr=1")
    assert(add.get("objects").size == 2)

    val alterP = ns(2)
    assert(alterP.get("renameFrom").asText == "db8.t_ev/ds=1/hr=1")
    assert(alterP.get("outputPartitions").get(0).asText == "db8.t_ev/ds=1/hr=3")

    assert(ns(3).get("outputPartitions").get(0).asText == "db8.t_ev/ds=1/hr=3")

    val alterT = ns(4)
    assert(alterT.get("renameFrom").asText == "db8.t_ev")
    assert(alterT.get("outputTables").get(0).asText == "db8.t_ev2")

    assert(ns(5).get("outputTables").get(0).asText == "db8.t_ev2")
  }

  test("wire DDL -> listener audit -> incremental replay converges the dest") {
    val srcCat = InMemoryCatalog.get("mls-e2e-src")
    val (listener, auditDir) = newListener("mls-e2e")
    val hms = new MockHmsServer(srcCat, Seq(listener))
    val srcConn = ThriftHmsCatalogConnector("127.0.0.1", hms.port)
    val destConn = freshCatalog("mls-e2e-dest")
    val srcWh = tmpDir("mls-e2e-src-wh")
    val destWh = tmpDir("mls-e2e-dest-wh")
    val stateDir = tmpDir("mls-e2e-state")
    val ckpt = tmpDir("mls-e2e-ckpt")
    val server = new IncrementalServer(spark, IncrementalConfig(
      srcConn, destConn,
      srcWh.toUri.toString.stripSuffix("/"), destWh.toUri.toString.stripSuffix("/"),
      stateDir.toUri.toString + "jobs", stateDir.toUri.toString + "watermark",
      workers = 2))

    // DDL over the real Thrift socket — the listener (not the client)
    // writes the audit entries, so ANY client is audited; the server
    // tails near-real-time (mutations replicate before the source
    // drifts past them, as in production)
    val c = srcConn.connect()
    val t = partitionedTable("db9", "t_wire", srcWh)
    val q = server.start(auditDir.toUri.toString, ckpt.toUri.toString)
    try {
      c.createTable(t)
      c.addPartition(partition(t, "ds=1/hr=1"))
      q.processAllAvailable()
      val dest = destConn.connect()
      assert(dest.listPartitionNames("db9", "t_wire") == Seq("ds=1/hr=1"))

      c.renamePartition("db9", "t_wire", "ds=1/hr=1", partition(t, "ds=1/hr=2"))
      c.alterTable("db9", "t_wire", t.copy(table = "t_wire2"))
      q.processAllAvailable()
      assert(dest.getTable("db9", "t_wire").isEmpty)
      assert(dest.getTable("db9", "t_wire2").isDefined)
      assert(dest.listPartitionNames("db9", "t_wire2") == Seq("ds=1/hr=2"))
    } finally q.stop()

    // the client's createTable ensures the database first — the listener
    // audits that implicit create_database RPC too
    val ns = entries(auditDir)
    assert(ns.map(_.get("commandType").asText).toSeq == Seq(
      "THRIFT_CREATE_DATABASE", "THRIFT_CREATE_TABLE", "THRIFT_ADD_PARTITION",
      "THRIFT_ALTER_PARTITION", "THRIFT_ALTER_TABLE"))
    ns.foreach(n => assert(n.get("command").asText == "THRIFT_API", n))
    assert(ns(3).get("renameFrom").asText == "db9.t_wire/ds=1/hr=1")
    assert(ns(4).get("renameFrom").asText == "db9.t_wire")
  }

  test("audit ids survive writer restarts and concurrent writers") {
    import graft.incremental.AuditEntryWriter
    val dir = tmpDir("aew-ids")

    // restart against a populated dir: a fresh writer with startId=0 must
    // continue past the highest entry on disk, like the reference's
    // MySQL auto-increment — not throw on its first emit
    val w1 = new AuditEntryWriter(dir.toString)
    (1 to 3).foreach(_ => w1.emit("CREATETABLE"))
    val w2 = new AuditEntryWriter(dir.toString)
    w2.emit("DROPTABLE")
    val afterRestart = entries(dir)
    assert(afterRestart.map(_.get("id").asLong).toSeq == Seq(1L, 2L, 3L, 4L))

    // concurrent writers sharing the dir (server-side listener + a CLI
    // hook): CREATE_NEW races resolve by advancing, no entry is lost
    val w3 = new AuditEntryWriter(dir.toString)
    val w4 = new AuditEntryWriter(dir.toString)
    val threads = Seq(w3, w4).zipWithIndex.map { case (w, i) =>
      new Thread(() => (1 to 20).foreach(n => w.emit(s"ALTERTABLE_${i}_$n")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val all = entries(dir)
    assert(all.length == 44)
    assert(all.map(_.get("id").asLong).toSeq == (1L to 44L))
    // every emit landed exactly once
    val types = all.map(_.get("commandType").asText)
    assert(types.count(_.startsWith("ALTERTABLE_0_")) == 20)
    assert(types.count(_.startsWith("ALTERTABLE_1_")) == 20)
  }
}
