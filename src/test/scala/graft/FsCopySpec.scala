package graft

import java.nio.file.Files

import graft.fs.{CopyExec, FsOps}

/** Filesystem layer: listing (hidden-file filter, deep trees), sync copy
  * (add/update/delete, skip-equal), equalDirs — mirroring the reference's
  * FsUtils/DistCpWrapper contracts. */
class FsCopySpec extends TestBase {

  test("listFiles returns relative paths, sizes, and skips hidden files") {
    val root = tmpDir("fs-list")
    writeFile(root, "a.txt", "aaa")
    writeFile(root.resolve("sub"), "b.txt", "bbbb")
    writeFile(root.resolve("sub").resolve("deep"), "c.txt", "c")
    writeFile(root, "_hidden.txt", "x")
    writeFile(root, ".stage", "x")
    writeFile(root.resolve("_tmpdir"), "inside.txt", "x")

    val files = FsOps.listFiles(spark, root.toUri.toString).collect()
      .map(f => (f.relPath, f.size)).sortBy(_._1)
    assert(files.toSeq == Seq(("a.txt", 3L), ("sub/b.txt", 4L), ("sub/deep/c.txt", 1L)))
  }

  test("syncDir copies adds+updates, deletes extras, skips equal") {
    val src = tmpDir("sync-src")
    val dest = tmpDir("sync-dest")
    writeFile(src, "same.txt", "unchanged")
    writeFile(src, "changed.txt", "new-content")
    writeFile(src.resolve("sub"), "added.txt", "fresh")
    writeFile(dest, "same.txt", "unchanged")
    writeFile(dest, "changed.txt", "old")
    writeFile(dest, "extra.txt", "goes-away")

    val stats = CopyExec.syncDir(spark, src.toUri.toString, dest.toUri.toString)
    assert(stats.copied == 2, s"stats: $stats")
    assert(stats.deleted == 1)
    assert(Files.readString(dest.resolve("changed.txt")) == "new-content")
    assert(Files.readString(dest.resolve("sub").resolve("added.txt")) == "fresh")
    assert(!Files.exists(dest.resolve("extra.txt")))
    assert(CopyExec.equalDirs(spark, src.toUri.toString, dest.toUri.toString))

    // idempotent: second run copies nothing
    val stats2 = CopyExec.syncDir(spark, src.toUri.toString, dest.toUri.toString)
    assert(stats2.copied == 0 && stats2.deleted == 0)
  }

  test("checksum level detects and re-copies a same-size corrupted file") {
    val src = tmpDir("ck-src")
    val dest = tmpDir("ck-dest")
    writeFile(src, "data.txt", "correct!")
    writeFile(dest, "data.txt", "corrupt!") // same length, different bytes

    // size-only sync (default) cannot see the corruption
    val s1 = CopyExec.syncDir(spark, src.toUri.toString, dest.toUri.toString)
    assert(s1.copied == 0)
    assert(Files.readString(dest.resolve("data.txt")) == "corrupt!")

    // checksum level re-copies the corrupt file, skips once converged
    val s2 = CopyExec.syncDir(spark, src.toUri.toString, dest.toUri.toString,
      verifyChecksum = true)
    assert(s2.copied == 1, s"stats: $s2")
    assert(Files.readString(dest.resolve("data.txt")) == "correct!")
    val s3 = CopyExec.syncDir(spark, src.toUri.toString, dest.toUri.toString,
      verifyChecksum = true)
    assert(s3.copied == 0 && s3.skipped == 1)
  }

  test("equalDirs detects size mismatch and missing files") {
    val a = tmpDir("eq-a")
    val b = tmpDir("eq-b")
    writeFile(a, "f.txt", "12345")
    writeFile(b, "f.txt", "12345")
    assert(CopyExec.equalDirs(spark, a.toUri.toString, b.toUri.toString))
    writeFile(b, "f.txt", "123")
    assert(!CopyExec.equalDirs(spark, a.toUri.toString, b.toUri.toString))
    writeFile(b, "f.txt", "12345")
    writeFile(b, "g.txt", "x")
    assert(!CopyExec.equalDirs(spark, a.toUri.toString, b.toUri.toString))
  }
}
