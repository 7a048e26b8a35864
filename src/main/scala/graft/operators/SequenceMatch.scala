package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-sequence (CEP-style funnel) matching: per key, find
 * occurrences of `steps` event types in strict time order, each
 * matched to the EARLIEST qualifying event, with the whole sequence
 * inside `withinSeconds` of its anchor. The classic "view → click →
 * purchase within an hour" detector — Spark has sessionization and
 * windows but no sequence matcher; this builds one from k−1 forward
 * as-of sweeps.
 *
 * Each step is the forward twin of [[AsOfJoin]]'s union-merge: anchors
 * and step candidates union into one frame, one per-key window sorted
 * by time DESCENDING takes the running minimum of candidate
 * timestamps, and the tie order (anchors before candidates at equal
 * time) makes the match STRICTLY later. One key-shuffle per step, no
 * range-join row explosion, no per-key collect — at any key density
 * the cost is k sorted sweeps of (anchors + candidates).
 *
 * Earliest-completion semantics: step i matches the first
 * `steps(i)`-event after step i−1's match (not "any combination"),
 * which is the standard funnel definition and keeps the output one
 * row per anchor event. Because each match is a running MIN, the
 * per-step window prune (`t_i − t_0 ≤ W`) equals a final-only filter
 * — pruning early is free.
 *
 * Output: one row per completed sequence — the key, the anchor event
 * id, and each step's epoch-micros timestamp `t0..t{k-1}` (exact
 * integers, engine-portable).
 *
 * Step types may REPEAT (`view → view → purchase`): each sweep filters
 * candidates by ITS step's type, and the strictly-later rule keeps one
 * event from filling two slots. This is the shared contract with
 * [[graft.streaming.StreamingSequenceMatch]] —
 * StreamingSequenceMatchSpec pins batch/streaming parity on a
 * repeated-type sequence.
 */
object SequenceMatch {

  def funnelMatch(events: DataFrame, steps: Seq[String],
      withinSeconds: Long, keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    require(steps.size >= 2, s"a sequence needs >= 2 steps, got $steps")
    require(withinSeconds > 0, s"withinSeconds must be positive")
    val withinUs = withinSeconds * 1000000L
    val base = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("us"), col(typeCol).as("et"),
      col(idCol).as("id0"))

    var matched: DataFrame = base.filter(col("et") === steps.head)
      .select(col("k"), col("id0"), col("us").as("t0"))
    var tsCols = Seq("t0")

    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val tPrev = s"t${i - 1}"
      val tCur = s"t$i"
      val payload = Seq("id0") ++ tsCols
      // anchors sweep at their LAST matched time; candidates at theirs
      val left = matched.select(Seq(col("k"), col(tPrev).as("sts"),
        lit(0).as("tag")) ++ payload.map(col): _*)
      val right = base.filter(col("et") === step)
        .select(Seq(col("k"), col("us").as("sts"), lit(1).as("tag")) ++
          payload.map(c => lit(null).cast("long").as(c)): _*)
      // DESC time scan: the running min of candidate times in the frame
      // is the earliest candidate at-or-after this row; anchors sort
      // BEFORE candidates at equal time, so their frame excludes ties —
      // the match is strictly later.
      val w = Window.partitionBy("k")
        .orderBy(col("sts").desc, col("tag").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      matched = left.unionAll(right)
        .withColumn(tCur,
          min(when(col("tag") === 1, col("sts"))).over(w))
        .filter(col("tag") === 0 && col(tCur).isNotNull &&
          col(tCur) - col("t0") <= withinUs)
        .select(Seq(col("k")) ++ payload.map(col) :+ col(tCur): _*)
      tsCols = tsCols :+ tCur
    }
    matched.select(Seq(col("k").as(keyCol), col("id0")) ++
      tsCols.map(col): _*)
  }
}
