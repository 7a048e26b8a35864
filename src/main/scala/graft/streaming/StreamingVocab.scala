package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.CorpusReport

/**
 * Continuously-maintained vocabulary-growth curve: each document
 * micro-batch reduces to its mergeable vocab state
 * ([[CorpusReport.vocabState]] — per-type first position in the batch's
 * stream + batch length) and folds into the persisted state via the
 * shared [[VersionedStateFold]]; [[CorpusReport.mergeVocabState]]
 * appends each batch AFTER the accumulated stream (shift + per-type
 * min), so the maintained curve is the Heaps curve of the corpus in
 * ARRIVAL order — which is the stream's own definition of position.
 * When batches arrive in the batch pass's document order, the streamed
 * curve equals the one-shot [[CorpusReport.heapsCurve]] bit-for-bit
 * (the merge `report_heaps_incremental` hash-certifies;
 * StreamingVocabSpec pins the streaming face with crash replay).
 *
 * Scale shape: per batch one scan of the BATCH only; the state is
 * vocab-sized at any corpus size; history text is never re-read — the
 * live "is this feed still contributing novel types?" monitor.
 */
object StreamingVocab {

  def run(docs: DataFrame, stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(docs, stateDir,
      CorpusReport.vocabState(_), CorpusReport.mergeVocabState)

  /** The maintained curve right now (None before the first batch). */
  def currentCurve(spark: SparkSession, stateDir: String,
      checkpoints: Int = 20): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)
      .map(CorpusReport.renderHeaps(_, checkpoints))
}
