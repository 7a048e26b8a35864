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
}
