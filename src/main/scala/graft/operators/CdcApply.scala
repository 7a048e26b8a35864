package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC snapshot apply: fold a change log (upserts + delete tombstones,
 * keyed + timestamped) into the current snapshot — the table a
 * replication target actually serves. [[AsOfJoin]] answers "state at
 * time T", [[Scd2]] keeps the full history; this is the third shape:
 * latest state only, tombstones honored.
 *
 * Execution: ONE max-struct aggregate per key — the latest change
 * (by ts, then tie-break) decides both presence (tombstone ⇒ key
 * absent) and payload, atomically. No window, no join, no
 * second pass: the same shuffle count as a plain groupBy, spill-safe
 * and AQE-splittable — at 100 TB this is the cheapest possible apply
 * (contrast a window row_number formulation: same shuffle but a
 * per-key sort; the aggregate's partial max folds map-side).
 */
object CdcApply {

  /**
   * Latest-wins snapshot. `opCol`'s value `deleteOp` marks tombstones;
   * every other value is an upsert. Output = keys…, payload…
   * (including `opCol` and `tsCol`, so callers see each row's last
   * change) for every key whose LATEST change is not a tombstone.
   * `tieBreak` resolves same-timestamp changes (max wins).
   */
  /**
   * Latest change per key, tombstones INCLUDED — the fold state an
   * incremental apply must keep: dropping tombstones would let a late
   * pre-delete upsert resurrect a deleted key
   * ([[graft.streaming.StreamingCdc]] folds THIS and filters only on
   * read; StreamingCdcSpec pins the resurrection case).
   */
  def latestState(changes: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String, opCol: String): DataFrame = {
    val payload = changes.columns.toSeq.filterNot(keys.contains)
    require(payload.contains(tsCol) && payload.contains(tieBreak) &&
      payload.contains(opCol),
      s"tsCol/tieBreak/opCol must be non-key columns, got $payload")
    val ordered = Seq(tsCol, tieBreak) ++
      payload.filterNot(c => c == tsCol || c == tieBreak)
    changes.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_w"))
      .select(keys.map(col) ++
        payload.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** The SERVED snapshot: [[latestState]] minus tombstoned keys. */
  def snapshot(changes: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String, opCol: String, deleteOp: String): DataFrame =
    latestState(changes, keys, tsCol, tieBreak, opCol)
      .filter(col(opCol) =!= deleteOp)
}
