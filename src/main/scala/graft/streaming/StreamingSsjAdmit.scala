package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.SsjIndex

/**
 * Streaming admission into a persisted set-similarity-join index
 * ([[SsjIndex]]): a `foreachBatch` sink that admits each micro-batch
 * and lands the EXACT Jaccard ≥ τ pairs touching it under
 * `pairsDir/batch=<index batch id>` — continuous near-duplicate
 * detection on an ingest stream, the set-join twin of
 * [[StreamingIvfAdmit]].
 *
 * Exactly-once by layout, twice: the index admission overwrites its
 * own `batch=` partitions on a replayed epoch ([[SsjIndex.admit]]'s
 * contract), and the pairs output is a dynamic partition overwrite
 * scoped to the same batch id, so a crashed epoch retried by
 * Structured Streaming replaces its partial pairs instead of
 * duplicating them. The pairs directory accumulates one partition per
 * epoch; reading it whole gives every cross- and intra-batch near-dup
 * pair that ever touched an admitted batch (old×old pairs from before
 * the build are the [[graft.pipeline.Dedup.setSimilarityJoin]] batch
 * job's business, not the stream's).
 *
 * ID DERIVATION (default, `idOffset = AutoOffset`): each epoch takes
 * the index's current high-water mark + 1, and records its assignment
 * at `pairsDir/_epoch_ids/<epochId>` BEFORE admitting — so a crashed
 * epoch replayed by Structured Streaming reuses its original id (the
 * record is the source of truth; the replay overwrites its own
 * partitions and, via [[SsjIndex.admit]]'s replay screen, drops any
 * document a takedown removed in between). This makes the sink
 * self-pacing across the whole lifecycle with NO hand-computed
 * offsets: a mid-stream [[SsjIndex.delete]] burns an id and the next
 * epoch simply lands above it; a stream restarted from a FRESH
 * checkpoint (e.g. after [[SsjIndex.compact]] restarts the id
 * lifecycle) continues above whatever the mark then is — provided the
 * fresh checkpoint comes with a fresh `pairsDir` (the epoch-id record
 * is per stream generation; a reused record whose ids cannot be a
 * legitimate replay of the current mark is refused loudly).
 *
 * The explicit `idOffset` knob remains for DECLARED fixed mappings
 * (epoch N → N + offset), e.g. replaying a recorded feed into a
 * rebuilt index at known positions.
 *
 * Usage:
 * {{{
 *   docs.writeStream
 *     .foreachBatch(StreamingSsjAdmit.sink(indexDir, pairsDir))
 *     .option("checkpointLocation", ckpt).start()
 * }}}
 */
object StreamingSsjAdmit {

  /** Sentinel for [[sink]]'s `idOffset`: derive each epoch's index
    * batch id from the admission high-water mark (see object doc). */
  val AutoOffset: Long = Long.MinValue

  private def markerPath(pairsDir: String, epochId: Long) =
    new org.apache.hadoop.fs.Path(s"$pairsDir/_epoch_ids/$epochId")

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(s.nonEmpty && s.forall(_.isDigit),
      s"corrupt epoch-id record at $p: '$s'")
    s.toLong
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, v: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$p.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"could not record the epoch id at $p")
  }

  /** `idOffset = AutoOffset` (default) derives ids from the index's
    * high-water mark with a per-epoch record under `pairsDir` (see
    * object doc — survives crashes, deletions, and id-lifecycle
    * restarts with no operator arithmetic). An explicit offset maps
    * epoch N to index batch N + idOffset unconditionally. */
  def sink(dir: String, pairsDir: String, idCol: String = "doc_id",
      textCol: String = "text",
      idOffset: Long = AutoOffset): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val id =
        if (idOffset != AutoOffset) batchId + idOffset
        else {
          val mp = markerPath(pairsDir, batchId)
          val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(mp)) {
            val stored = readMarker(fs, mp)
            // a LEGITIMATE replay's id sits at the mark, one above it
            // (crash before the mark advanced), or below it only by
            // ids that deletions burned since. Anything else is a
            // stale record from a previous stream generation reusing
            // this pairsDir — admitting there would overwrite earlier
            // admissions, so refuse loudly.
            val hwm = SsjIndex.admittedHwm(spark, dir)
            val burnedSince =
              if (stored >= hwm) Set.empty[Long]
              else SsjIndex.burnedIds(spark, dir)
            // stored > hwm+1 means the mark moved DOWN since the
            // record — an id-lifecycle restart (compact/rebuild) with
            // a reused pairsDir, equally stale
            require(stored <= hwm + 1 && (stored >= hwm ||
                ((stored + 1) to hwm).forall(burnedSince.contains)),
              s"StreamingSsjAdmit: epoch $batchId's recorded index " +
                s"batch id $stored cannot be a replay at high-water " +
                s"mark $hwm — this pairsDir was used by a previous " +
                "stream generation. Use a fresh pairsDir for a fresh " +
                "checkpoint (or pass an explicit idOffset for a " +
                "declared replay).")
            stored
          } else {
            val next = SsjIndex.admittedHwm(spark, dir) + 1L
            writeMarker(fs, mp, next) // record BEFORE admitting: the
            // id assignment must survive a crash mid-admission
            next
          }
        }
      SsjIndex.admit(batch, dir, batchId = Some(id),
          allowReplay = true, idCol = idCol, textCol = textCol)
        .withColumn("batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
    }
}
