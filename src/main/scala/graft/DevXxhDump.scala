package graft

import java.io.PrintWriter

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.Dedup
import graft.sim.WarehouseSim

/** THROWAWAY dev tool (not part of the library): dumps ground-truth
  * xxhash64 values from Spark's own implementation so the DuckDB oracle
  * replay of the minhash fast path can be validated bit-for-bit.
  * Usage: DevXxhDump <sfDir> <outDir>
  */
object DevXxhDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("dev-xxh-dump")
    val docs = WarehouseSim.read(spark, args(0), "documents")
    val shingles = Dedup.shingled(docs)
      .select(explode(col("shingles")).as("s")).distinct()
      .collect().map(_.getString(0))
    val pw = new PrintWriter(args(1) + "/shingle_hashes.tsv")
    shingles.foreach { s =>
      val u = UTF8String.fromString(s)
      (0 until 8).foreach { seed =>
        pw.println(s"$s\t$seed\t${XXH64.hashUTF8String(u, seed.toLong)}")
      }
    }
    pw.close()

    // Band-hash fold semantics: Spark's xxhash64 over array<long> vs a
    // driver-side fold of hashLong with seed chaining from 42.
    val sig = Dedup.shingled(docs)
      .select(col("doc_id"),
        graft.functions.MinHashSig(spark, col("shingles"), 8).as("sig"))
    val withBands = sig.select(col("doc_id"), col("sig"),
      xxhash64(slice(col("sig"), 1, 4)).as("b1"),
      xxhash64(slice(col("sig"), 5, 4)).as("b2"))
      .collect()
    val pw2 = new PrintWriter(args(1) + "/band_check.tsv")
    var mismatches = 0
    withBands.foreach { r =>
      val arr = r.getSeq[Long](1)
      def fold(xs: Seq[Long]): Long =
        xs.foldLeft(42L)((acc, l) => XXH64.hashLong(l, acc))
      val f1 = fold(arr.slice(0, 4)); val f2 = fold(arr.slice(4, 8))
      if (f1 != r.getLong(2) || f2 != r.getLong(3)) mismatches += 1
      pw2.println(s"${r.getLong(0)}\t${arr.mkString(",")}\t${r.getLong(2)}\t${r.getLong(3)}\t$f1\t$f2")
    }
    pw2.close()
    println(s"shingles=${shingles.length} foldMismatches=$mismatches")
    spark.stop()
  }
}
