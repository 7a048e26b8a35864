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

  /** The index batch id for `epochId`: explicit `epochId + idOffset`
    * when an offset is declared, else the recorded id (validated as a
    * legitimate replay against `hwm`/`burnedIds`) or a fresh
    * `hwm + 1` recorded before any admission runs. `hwm` and
    * `burnedIds` are by-name — only evaluated when auto-deriving. */
  def derive(spark: SparkSession, sinkName: String, pairsDir: String,
      epochId: Long, idOffset: Long,
      hwm: => Long, burnedIds: => Set[Long]): Long = {
    if (idOffset != AutoOffset) return epochId + idOffset
    val mp = markerPath(pairsDir, epochId)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mp)) {
      val stored = readMarker(fs, mp)
      // a LEGITIMATE replay's id sits at the mark, one above it (crash
      // before the mark advanced), or below it only by ids deletions
      // burned since. stored > hwm+1 means the mark moved DOWN since
      // the record — an id-lifecycle restart (compact) with a reused
      // pairsDir, equally stale.
      val h = hwm
      val burnedSince =
        if (stored >= h) Set.empty[Long] else burnedIds
      require(stored <= h + 1 && (stored >= h ||
          ((stored + 1) to h).forall(burnedSince.contains)),
        s"$sinkName: epoch $epochId's recorded index batch id $stored " +
          s"cannot be a replay at high-water mark $h — this pairsDir " +
          "was used by a previous stream generation. Use a fresh " +
          "pairsDir for a fresh checkpoint (or pass an explicit " +
          "idOffset for a declared replay).")
      stored
    } else {
      val next = hwm + 1L
      // record BEFORE admitting: the assignment must survive a crash
      // mid-admission
      writeMarker(fs, mp, next)
      next
    }
  }
}
