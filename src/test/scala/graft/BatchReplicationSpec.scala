package graft

import graft.batch.{BatchConfig, BatchReplication}
import graft.fs.CopyExec
import graft.model._

/**
 * End-to-end batch replication — the port of the reference's
 * `BatchReplicationTest.testCopyNewTables/testDrops`
 * (`main/src/test/java/test/BatchReplicationTest.java:45-170`) and the
 * SURVEY §7.2 minimum slice: partitioned + unpartitioned table on src,
 * empty dest → plan yields exactly {COPY_UNPARTITIONED_TABLE,
 * COPY_PARTITIONED_TABLE, COPY_PARTITION×3} → execute → dest converges →
 * re-run is a no-op → src drop propagates.
 */
class BatchReplicationSpec extends TestBase {

  test("copy new tables end-to-end, converge, then drop") {
    val srcWh = tmpDir("batch-src-wh")
    val destWh = tmpDir("batch-dest-wh")
    val srcConn = freshCatalog("batch-src")
    val destConn = freshCatalog("batch-dest")
    val src = srcConn.connect()

    val unp = unpartitionedTable("test_db", "unp_table", srcWh)
    val part = partitionedTable("test_db", "part_table", srcWh)
    src.createTable(unp)
    src.createTable(part)
    Seq("ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3")
      .foreach(p => src.addPartition(partition(part, p)))

    val cfg = BatchConfig(srcConn, destConn,
      srcFsRoot = srcWh.toUri.toString.stripSuffix("/"),
      destFsRoot = destWh.toUri.toString.stripSuffix("/"),
      planDir = tmpDir("batch-plan").toUri.toString + "plan",
      copyParallelism = 4)

    // stage 1: plan
    val actions = BatchReplication.plan(spark, cfg).collect()
    val byType = actions.groupBy(_.taskType).view.mapValues(_.length).toMap
    assert(byType == Map(
      TaskType.CopyUnpartitionedTable -> 1,
      TaskType.CopyPartitionedTable -> 1,
      TaskType.CopyPartition -> 3), s"plan was: ${actions.mkString("\n")}")

    // stages 2+3
    val copied = BatchReplication.copyData(spark, cfg)
    assert(copied == 8, s"expected 8 files copied (2 + 3*2), got $copied")
    val stats = BatchReplication.commit(spark, cfg)
    assert(stats.commitFailures == 0)

    val dest = destConn.connect()
    assert(dest.getTable("test_db", "unp_table").isDefined)
    assert(dest.getTable("test_db", "part_table").isDefined)
    assert(dest.listPartitionNames("test_db", "part_table").size == 3)
    val destUnp = dest.getTable("test_db", "unp_table").get
    assert(destUnp.location.startsWith(cfg.destFsRoot))
    assert(destUnp.parameters(TableMeta.SrcCluster) == "src")
    assert(CopyExec.equalDirs(spark, unp.location, destUnp.location))
    val destPart = dest.getPartition("test_db", "part_table", "ds=1/hr=2").get
    assert(CopyExec.equalDirs(spark,
      part.location + "/ds=1/hr=2", destPart.location))

    // convergence: re-plan is empty
    val again = BatchReplication.plan(spark, cfg).collect()
    assert(again.isEmpty, s"expected converged plan, got: ${again.mkString(",")}")

    // drop on src propagates as DROP_TABLE
    src.dropTable("test_db", "unp_table")
    val planAfterDrop = BatchReplication.plan(spark, cfg).collect()
    assert(planAfterDrop.map(_.taskType).toSeq == Seq(TaskType.DropTable))
    BatchReplication.commit(spark, cfg)
    assert(dest.getTable("test_db", "unp_table").isEmpty)
  }

  test("blacklist prunes before planning") {
    val srcWh = tmpDir("bl-src-wh")
    val srcConn = freshCatalog("bl-src")
    val destConn = freshCatalog("bl-dest")
    srcConn.connect().createTable(unpartitionedTable("tmp_db", "scratch", srcWh))
    srcConn.connect().createTable(unpartitionedTable("prod_db", "keep", srcWh))
    val cfg = BatchConfig(srcConn, destConn,
      srcWh.toUri.toString.stripSuffix("/"), tmpDir("bl-dest-wh").toUri.toString,
      planDir = tmpDir("bl-plan").toUri.toString + "plan",
      blacklist = Seq(("^tmp_.*", ".*")), copyParallelism = 4)
    val actions = BatchReplication.plan(spark, cfg).collect()
    assert(actions.map(_.table).toSeq == Seq("keep"))
  }

  test("S2: table-list file restricts the plan to listed tables") {
    val srcWh = tmpDir("s2-src-wh")
    val srcConn = freshCatalog("s2-src")
    val destConn = freshCatalog("s2-dest")
    val src = srcConn.connect()
    src.createTable(unpartitionedTable("db1", "listed_a", srcWh))
    src.createTable(unpartitionedTable("db1", "listed_b", srcWh))
    src.createTable(unpartitionedTable("db1", "unlisted", srcWh))

    val listFile = tmpDir("s2-list").resolve("tables.txt")
    java.nio.file.Files.writeString(listFile,
      "db1.listed_a\n \nnot-a-spec\ndb1.listed_b\n")

    val cfg = BatchConfig(srcConn, destConn,
      srcWh.toUri.toString.stripSuffix("/"), tmpDir("s2-dest-wh").toUri.toString,
      planDir = tmpDir("s2-plan").toUri.toString + "plan",
      copyParallelism = 4, tableListPath = Some(listFile.toUri.toString))
    val actions = BatchReplication.plan(spark, cfg).collect()
    assert(actions.map(_.table).sorted.toSeq == Seq("listed_a", "listed_b"))
  }

  test("stale dest table is re-planned (TLDT comparison)") {
    val srcWh = tmpDir("tldt-src-wh")
    val destWh = tmpDir("tldt-dest-wh")
    val srcConn = freshCatalog("tldt-src")
    val destConn = freshCatalog("tldt-dest")
    val t = unpartitionedTable("db1", "t1", srcWh, tldt = 2000L)
    srcConn.connect().createTable(t)
    destConn.connect().createTable(t.copy(
      location = destWh.resolve("db1").resolve("t1").toUri.toString,
      parameters = Map(TableMeta.Tldt -> "1000")))
    val cfg = BatchConfig(srcConn, destConn,
      srcWh.toUri.toString.stripSuffix("/"), destWh.toUri.toString.stripSuffix("/"),
      planDir = tmpDir("tldt-plan").toUri.toString + "plan", copyParallelism = 4)
    val actions = BatchReplication.plan(spark, cfg).collect()
    assert(actions.map(_.taskType).toSeq == Seq(TaskType.CopyUnpartitionedTable))
  }
}
