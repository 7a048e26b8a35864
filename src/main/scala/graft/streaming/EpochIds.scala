package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Shared epoch → index-batch id derivation for the persisted-index
 * streaming sinks ([[StreamingSsjAdmit]], [[StreamingLshAdmit]]): each
 * epoch takes the index's admission high-water mark + 1 and records
 * the assignment at `pairsDir/_epoch_ids/<epochId>` BEFORE admitting,
 * so a crashed epoch replayed by Structured Streaming reuses its
 * original id. A recorded id that cannot be a legitimate replay of the
 * current mark — above mark + 1, or below the mark by ids that no
 * deletion burned — is a stale record from a previous stream
 * generation reusing the pairs dir, and is refused loudly.
 */
private[streaming] object EpochIds {

  /** Sentinel: derive each epoch's id from the high-water mark. */
  val AutoOffset: Long = Long.MinValue

  private def markerPath(pairsDir: String, epochId: Long) =
    new org.apache.hadoop.fs.Path(s"$pairsDir/_epoch_ids/$epochId")

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    graft.pipeline.StoreOps.readLongSidecar(fs, p, "epoch-id record")

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, v: Long): Unit =
    graft.pipeline.StoreOps.writeLongSidecar(fs, p, v, "epoch-id record")

  /** The index batch id for `epochId`: explicit `epochId + idOffset`
    * when an offset is declared, else the recorded id (validated as a
    * legitimate replay against `hwm`/`burnedIds`) or a fresh id — the
    * first non-burned id above the mark — recorded before any
    * admission runs. `hwm` and `burnedIds` are by-name — only
    * evaluated when auto-deriving.
    *
    * BURN AWARENESS, both directions: a deletion that crashed after
    * its redo log landed leaves its burned id at `hwm + 1` with the
    * mark not yet advanced — a fresh epoch must skip past it (the
    * admission will finish the crashed delete and land above), and a
    * marker recorded that way must validate on retry even while the
    * mark still sits below it. Without the skip, the fresh epoch
    * records the burned id itself and every Structured Streaming
    * retry refuses it — the sink is stranded until an operator
    * hand-deletes the record. */
  def derive(spark: SparkSession, sinkName: String, pairsDir: String,
      epochId: Long, idOffset: Long,
      hwm: => Long, burnedIds: => Set[Long]): Long = {
    if (idOffset != AutoOffset) return epochId + idOffset
    val mp = markerPath(pairsDir, epochId)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mp)) {
      val stored = readMarker(fs, mp)
      // a LEGITIMATE replay's id sits at the mark or one above it
      // (crash before the mark advanced); below the mark only by ids
      // deletions burned since; ABOVE mark+1 only by pending burns a
      // crashed delete left between the mark and the record. Anything
      // else is a stale record from a previous stream generation
      // (e.g. a compact restarted the id lifecycle under a reused
      // pairsDir) — admitting there would overwrite earlier
      // admissions, so refuse loudly.
      val h = hwm
      val legit =
        if (stored >= h && stored <= h + 1) true
        else {
          val burned = burnedIds
          if (stored > h + 1) ((h + 1) until stored).forall(burned.contains)
          else ((stored + 1) to h).forall(burned.contains)
        }
      require(legit,
        s"$sinkName: epoch $epochId's recorded index batch id $stored " +
          s"cannot be a replay at high-water mark $h — this pairsDir " +
          "was used by a previous stream generation. Use a fresh " +
          "pairsDir for a fresh checkpoint (or pass an explicit " +
          "idOffset for a declared replay).")
      stored
    } else {
      // first non-burned id above the mark (skips a crashed delete's
      // pending burn — at most one can be pending, but the loop is
      // the simpler invariant)
      val burned = burnedIds
      var next = hwm + 1L
      while (burned.contains(next)) next += 1L
      // record BEFORE admitting: the assignment must survive a crash
      // mid-admission
      writeMarker(fs, mp, next)
      next
    }
  }
}
