package graft

import java.nio.file.Files

import graft.hdfs.HdfsSync

/** Multi-root HDFS sync: latest-mtime-wins across roots, add/update/delete,
  * dry-run stops after compare — mirrors `batch/hdfs/ReplicationJob`. */
class HdfsSyncSpec extends TestBase {

  test("latest root wins; add/update/delete executed") {
    val root1 = tmpDir("hsync-r1")
    val root2 = tmpDir("hsync-r2")
    val dest = tmpDir("hsync-dest")

    writeFile(root1, "both.txt", "old-version!")
    writeFile(root2, "both.txt", "newer")
    // make root2's copy strictly newer
    Files.setLastModifiedTime(root2.resolve("both.txt"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    writeFile(root1, "only1.txt", "one")
    writeFile(dest, "stale.txt", "bye")

    val (actions, stats) = HdfsSync.run(spark,
      Seq(root1.toUri.toString, root2.toUri.toString), dest.toUri.toString,
      parallelism = 4)
    val byOp = actions.collect().groupBy(_.op).view.mapValues(_.length).toMap
    assert(byOp == Map("ADD" -> 2, "DELETE" -> 1), s"got $byOp")
    assert(stats.get.added == 2 && stats.get.deleted == 1)
    assert(Files.readString(dest.resolve("both.txt")) == "newer")
    assert(Files.readString(dest.resolve("only1.txt")) == "one")
    assert(!Files.exists(dest.resolve("stale.txt")))

    // update path: change a source file's size
    writeFile(root2, "both.txt", "even-newer-content")
    Files.setLastModifiedTime(root2.resolve("both.txt"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 120000))
    val (actions2, stats2) = HdfsSync.run(spark,
      Seq(root1.toUri.toString, root2.toUri.toString), dest.toUri.toString,
      parallelism = 4)
    assert(actions2.collect().map(_.op).toSeq == Seq("UPDATE"))
    assert(stats2.get.updated == 1)
    assert(Files.readString(dest.resolve("both.txt")) == "even-newer-content")
  }

  test("dry-run plans but does not touch the dest") {
    val root = tmpDir("hdry-r")
    val dest = tmpDir("hdry-dest")
    writeFile(root, "a.txt", "x")
    val (actions, stats) = HdfsSync.run(spark, Seq(root.toUri.toString),
      dest.toUri.toString, dryRun = true, parallelism = 4)
    assert(actions.collect().map(_.op).toSeq == Seq("ADD"))
    assert(stats.isEmpty)
    assert(!Files.exists(dest.resolve("a.txt")))
  }

  test("operations filter restricts executed ops") {
    val root = tmpDir("hops-r")
    val dest = tmpDir("hops-dest")
    writeFile(root, "a.txt", "x")
    writeFile(dest, "extra.txt", "keep-me")
    val (_, stats) = HdfsSync.run(spark, Seq(root.toUri.toString),
      dest.toUri.toString, operations = Set("a"), parallelism = 4)
    assert(stats.get.added == 1 && stats.get.deleted == 0)
    assert(Files.exists(dest.resolve("extra.txt")))
  }
}
