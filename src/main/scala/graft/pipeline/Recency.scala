package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially time-decayed activity counts with EXACT cross-engine
 * and cross-shard algebra — the recency signal a freshness-weighted
 * training mix needs (how alive is this source/domain/user *now*),
 * kept in a form that merges, advances, and streams without a single
 * floating-point operation.
 *
 * The trick is the period grid: a row's period index is
 * `p = epoch_us div halfLifeUs`, and its weight at horizon period `P`
 * is `10⁶ div 2^(P−p)` micro-units — a staircase that halves once per
 * grid step instead of the textbook smooth `2^(−Δt/H)`. The staircase
 * is the price of determinism (libm `pow` differs per engine in the
 * last ulp; floor-shift arithmetic is identical everywhere) and buys
 * three exact properties the smooth form cannot give:
 *
 *  - **Partitioning invariance**: weights are per-row, sums are exact
 *    BIGINT sums — any shuffle, any partial-agg order.
 *  - **Exact advancement**: moving a state from horizon P₁ to P₂ is
 *    `decayed div 2^(P₂−P₁)`, and nested floor division composes
 *    exactly (`⌊⌊x/2^a⌋/2^b⌋ = ⌊x/2^(a+b)⌋`), so advance-then-advance
 *    equals advance-once equals recompute-from-rows, bit for bit.
 *    (Shifts cap at 62; exactness then needs `decayed < 2^62`, i.e.
 *    fewer than ~4.6·10¹² undecayed rows per key — at which point the
 *    true value is 0 on both paths anyway.)
 *  - **Exact merge**: two shards' states advance to the common (max)
 *    horizon and ADD. Order-free, so the streamed fold
 *    ([[graft.streaming.StreamingRecency]]) is bit-identical to the
 *    one-shot computation over everything seen.
 *
 * Period indices come from the GRID, not from "now" — `p(ref)−p(ts)`
 * is additive across re-anchoring, where `(ref−ts) div H` is not;
 * anchoring horizons off the grid would break the advancement algebra.
 *
 * Scale shape: one scan, one 1-row max (broadcast back), one grouped
 * sum — the state is keys-sized, never corpus-sized, and the full
 * history is never re-read by merges or streams.
 */
object Recency {

  private val ShiftCap = 62

  /** TRUE floor division as a SQL expr: `a div b` truncates toward
    * zero, so for a negative numerator (a pre-1970 timestamp) Spark's
    * `div` and the oracle's flooring `//` disagree by one grid period.
    * `(a - pmod(a, b)) div b` floors for b > 0 in exact integer math —
    * both engines then agree for EVERY input, not just ts >= epoch. */
  def floorDivSql(num: String, denPositive: Long): String = {
    require(denPositive > 0, s"denominator must be > 0, got $denPositive")
    s"(($num) - pmod(($num), ${denPositive}L)) div ${denPositive}L"
  }

  private def decayDiv(num: String, pd: String): String =
    s"$num div shiftleft(cast(1 as bigint), " +
      s"cast(least($pd, $ShiftCap) as int))"

  /**
   * One-shot decayed state of `df`: one row per key,
   * `(key..., horizon_p, decayed_micro, n_rows)` where `horizon_p` is
   * the corpus-wide max period index (same for every row — states are
   * constant-horizon frames by construction) and `decayed_micro` the
   * exact staircase-decayed row count in micro-units.
   */
  def decayedState(df: DataFrame, tsCol: String, keyCols: Seq[String],
      halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be > 0, got $halfLifeUs")
    require(keyCols.nonEmpty, "decayedState needs at least one key column")
    val rows = df.select(keyCols.map(col) :+
      expr(floorDivSql(s"unix_micros($tsCol)", halfLifeUs)).as("__p"): _*)
    val hor = rows.select(max(col("__p")).as("horizon_p"))
    rows.crossJoin(hor)
      .withColumn("__w", expr(decayDiv("1000000L", "horizon_p - __p")))
      .groupBy(keyCols.map(col) :+ col("horizon_p"): _*)
      .agg(sum(col("__w")).as("decayed_micro"),
        count(lit(1)).as("n_rows"))
  }

  /**
   * Advance a state frame to a LATER horizon period (time passing with
   * no new rows): every key's decayed mass floor-halves per grid step.
   * Refuses loudly (per row, executor-side) if the state is already
   * past `toP` — silently un-decaying is the corruption this family
   * never allows.
   */
  def advance(state: DataFrame, toP: Long): DataFrame = {
    val keys = state.columns
      .filterNot(Set("horizon_p", "decayed_micro", "n_rows"))
    val guarded = state.withColumn("decayed_micro",
      when(col("horizon_p") > toP, raise_error(concat(
        lit(s"Recency.advance: state horizon "), col("horizon_p"),
        lit(s" is past the requested horizon $toP — horizons only move " +
          "forward"))))
        .otherwise(expr(decayDiv("decayed_micro", s"${toP}L - horizon_p"))))
    guarded.select(keys.map(col) :+ lit(toP).as("horizon_p") :+
      col("decayed_micro") :+ col("n_rows"): _*)
  }

  /**
   * Exact merge of two state frames (same key schema): both sides
   * advance to the common max horizon, then per-key sums add. The
   * binary shape folds under
   * [[graft.streaming.VersionedStateFold]]; associativity and
   * commutativity follow from the advancement composition law, so any
   * fold order yields the identical state.
   */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns
      .filterNot(Set("horizon_p", "decayed_micro", "n_rows"))
    val both = a.unionByName(b)
    val hor = both.select(max(col("horizon_p")).as("__hp"))
    both.crossJoin(hor)
      .withColumn("__adv",
        expr(decayDiv("decayed_micro", "__hp - horizon_p")))
      .select(keys.map(col) :+ col("__hp").as("horizon_p") :+
        col("__adv") :+ col("n_rows"): _*)
      .groupBy(keys.map(col) :+ col("horizon_p"): _*)
      .agg(sum(col("__adv")).as("decayed_micro"),
        sum(col("n_rows")).as("n_rows"))
  }
}
