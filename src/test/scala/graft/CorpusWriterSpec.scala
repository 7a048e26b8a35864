package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusWriter, TrainingPipeline}
import graft.sim.WarehouseSim

/** Output sharding: bounded file counts per leaf directory, lossless
  * round-trip, and shard membership that is a pure function of the data. */
class CorpusWriterSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.01"

  private def corpus = TrainingPipeline.buildCorpus(
    WarehouseSim.read(spark, sfDir, "documents"),
    TrainingPipeline.Config(minQuality = 0.3))

  test("writeShards bounds files per leaf and round-trips losslessly") {
    val out = tmpDir("corpus-out").toString
    val df = corpus
    CorpusWriter.writeShards(df, out, Seq("split", "source"), "doc_id",
      shardsPerLeaf = 3, sortCols = Seq("bin_id"))

    // layout: split=*/source=*/ leaf dirs with ≤ 3 parquet files each
    val leaves = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
    assert(leaves.nonEmpty, "no leaf partition dirs written")
    leaves.foreach { leaf =>
      val files = leaf.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 3,
        s"${leaf.getPath}: ${files.length} files")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    val a = df.select("doc_id", "split", "source", "bin_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val b = back.select("doc_id", "split", "source", "bin_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(a == b, "round-trip changed rows")
  }

  test("JSONL shards round-trip with the same layout guarantees") {
    val out = tmpDir("corpus-jsonl").toString
    val df = corpus
    CorpusWriter.writeShards(df, out, Seq("split"), "doc_id",
      shardsPerLeaf = 2, format = "json")
    val leaves = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      val files = leaf.listFiles().filter(_.getName.endsWith(".json"))
      assert(files.nonEmpty && files.length <= 2,
        s"${leaf.getPath}: ${files.length} files")
      // JSONL: every line of every shard parses as one JSON object
      files.foreach { f =>
        scala.io.Source.fromFile(f).getLines().foreach { line =>
          assert(line.startsWith("{") && line.endsWith("}"), line.take(80))
        }
      }
    }
    assert(spark.read.json(out).count() == df.count())
  }

  test("ORC shards round-trip with the same layout guarantees") {
    // ORC is the third interchange format (columnar like parquet, the
    // Hive-ecosystem default) — same writeShards contract, zero new code
    val out = tmpDir("corpus-orc").toString
    val df = corpus
    CorpusWriter.writeShards(df, out, Seq("split"), "doc_id",
      shardsPerLeaf = 2, format = "orc")
    val leaves = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      val files = leaf.listFiles().filter(_.getName.endsWith(".orc"))
      assert(files.nonEmpty && files.length <= 2,
        s"${leaf.getPath}: ${files.length} files")
    }
    val back = spark.read.orc(out)
    assert(back.count() == df.count())
    val a = df.select("doc_id", "split", "bin_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = back.select("doc_id", "split", "bin_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, "ORC round-trip changed rows")
  }

  test("shard membership is deterministic and partitioning-independent") {
    val df = corpus
    val s1 = df.select(col("doc_id"),
        CorpusWriter.shardId(col("doc_id"), 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = df.repartition(13).select(col("doc_id"),
        CorpusWriter.shardId(col("doc_id"), 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1.values.toSet.subsetOf((0L until 5L).toSet))
  }

  test("mortonValue interleaves bits: known values, monotone in each dim") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 0L),
      (255L, 255L)).toDF("a", "b")
    val got = df.select(CorpusWriter.mortonValue(Seq(col("a"), col("b")), 8))
      .as[Long].collect().toSeq
    // bit b of dim i -> output bit 2b+i: (1,0)->1, (0,1)->2, (1,1)->3,
    // (3,0)->0b101=5, (255,255)->65535
    assert(got === Seq(0L, 1L, 2L, 3L, 5L, 65535L))
  }

  test("writeZOrdered: disjoint per-file z-ranges, tighter per-file dim spans") {
    val docs = WarehouseSim.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        (col("doc_id") * 2654435761L % 1000).as("m")) // independent 2nd dim
    val out = tmpDir("zorder-out").toString
    CorpusWriter.writeZOrdered(docs, out, Seq("n_chars", "m"), "doc_id",
      bits = 8, numFiles = 8)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1, "expected multiple z-ordered files")

    // range partitioning on z: per-file [min,max] z intervals are disjoint
    val zRanges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("z_value"), max("z_value"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    zRanges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "overlapping z ranges")
      case _ =>
    }

    // data-skipping effectiveness: per-file n_chars spans must be far
    // tighter than a layout that ignores n_chars would give (each file
    // of a random layout spans ~the whole global range)
    val g = docs.agg(min("n_chars"), max("n_chars")).collect().head
    val globalSpan = (g.getLong(1) - g.getLong(0)).toDouble
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(min("n_chars"), max("n_chars"))
        .collect().head
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    assert(spans.sum / spans.length < 0.7 * globalSpan,
      s"mean per-file span ${spans.sum / spans.length} vs global $globalSpan")

    // lossless
    assert(spark.read.parquet(out).select("doc_id").distinct().count()
      === docs.count())
  }
}
