package graft.fs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.FileEntry

/**
 * Distributed filesystem scan layer (SURVEY §2.1 S4/S5).
 *
 * Reference walks directory trees with a custom MR InputFormat
 * (`batch/hdfs/DirScanInputFormat.java:40-180`) and a recursive lister
 * (`utils/common/FsUtils.java:124-153`). Here: a short breadth-first
 * expansion on the driver to get enough directories for parallelism
 * (driver holds only directory *paths*, never file rows), then fully
 * recursive listing inside `mapPartitions` — file rows are born
 * distributed and stay distributed.
 */
object FsOps {

  /** Hidden = name starts with `_` or `.`
    * (`batch/hive/Stage2DirectoryCopyMapper.java:36-41`). */
  def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Recursively list visible files under `dir` (executor-side). */
  def listFilesLocal(fs: FileSystem, dir: Path): Iterator[(String, Long, Long)] =
    listRecursive(fs, dir)

  private def listRecursive(fs: FileSystem, dir: Path): Iterator[(String, Long, Long)] = {
    val entries =
      try fs.listStatus(dir).iterator
      catch { case _: java.io.FileNotFoundException => Iterator.empty }
    entries.filterNot(st => isHidden(st.getPath.getName)).flatMap { st =>
      if (st.isDirectory) listRecursive(fs, st.getPath)
      else Iterator((st.getPath.toString, st.getLen, st.getModificationTime))
    }
  }

  /**
   * Manifest of all visible files under `root`, with paths relative to it.
   * `fanoutLevels` breadth-first levels are expanded driver-side (dir names
   * only) so the recursive phase has `>=` targetParallelism units of work —
   * the Spark analog of DirScanInputFormat's split generation.
   */
  def listFiles(spark: SparkSession, root: String,
      targetParallelism: Int = 32, fanoutLevels: Int = 3): Dataset[FileEntry] = {
    import spark.implicits._
    val rootPath = new Path(root)
    val conf = new Configuration()
    val fs = rootPath.getFileSystem(conf)

    // driver-side BFS until enough dirs (paths only; level cap like the
    // reference's max level 3)
    var dirs = Vector(rootPath)
    var files = Vector.empty[(String, Long, Long)]
    var level = 0
    while (dirs.nonEmpty && dirs.size < targetParallelism && level < fanoutLevels) {
      val (nextDirs, levelFiles) = dirs.flatMap { d =>
        try fs.listStatus(d).toSeq.filterNot(st => isHidden(st.getPath.getName))
        catch { case _: java.io.FileNotFoundException => Seq.empty }
      }.partition(_.isDirectory)
      files ++= levelFiles.map(st =>
        (st.getPath.toString, st.getLen, st.getModificationTime))
      dirs = nextDirs.map(_.getPath)
      level += 1
    }

    val rootUri = fs.makeQualified(rootPath).toUri
    def relativize(p: String): String =
      rootUri.relativize(new Path(p).toUri).getPath

    val deep: Dataset[FileEntry] =
      if (dirs.isEmpty) spark.emptyDataset[FileEntry]
      else spark.createDataset(dirs.map(_.toString))
        .repartition(math.min(targetParallelism, dirs.size))
        .mapPartitions { it =>
          val fs2 = new Path(root).getFileSystem(new Configuration())
          val rUri = fs2.makeQualified(new Path(root)).toUri
          it.flatMap { d =>
            listRecursive(fs2, new Path(d)).map { case (p, len, mtime) =>
              FileEntry(root, rUri.relativize(new Path(p).toUri).getPath, len, mtime)
            }
          }
        }

    val shallow = spark.createDataset(files.map { case (p, len, mtime) =>
      FileEntry(root, relativize(p), len, mtime)
    })
    deep.union(shallow)
  }

  /** Total size + count under a root (A1/A3 rollup). */
  def dirStats(spark: SparkSession, root: String): (Long, Long) = {
    val m = listFiles(spark, root)
    if (m.isEmpty) (0L, 0L)
    else {
      val row = m.groupBy().agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("size")).head()
      (row.getLong(0), row.getLong(1))
    }
  }
}
