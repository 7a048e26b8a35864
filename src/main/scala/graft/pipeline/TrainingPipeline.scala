package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus construction — the composition the
 * individual operators exist for: quality-score filter → exact-dedup
 * keep-one → weighted source mix → train/val/test split → sequence
 * packing. One declarative plan, so Catalyst pipelines the whole chain:
 * the quality features, fingerprint, and sampling hashes are all computed
 * in the scan stage; the only shuffles are the dedup groupBy and the
 * packing window — nothing else in the chain moves data.
 *
 * Every stage decision is hash-stable (content fingerprints, id hashes),
 * so the produced corpus is reproducible bit-for-bit across runs,
 * cluster sizes, and engines (the `pipe_end_to_end` query hash-verifies
 * the full composition against DuckDB).
 */
object TrainingPipeline {

  /** @param minQuality  drop docs scoring below this
    * @param mixWeights  per-source keep rates (see [[Sampling.weightedMix]])
    * @param defaultRate keep rate for sources absent from mixWeights
    * @param splits      ordered (name, fraction) split spec
    * @param packBudget  token budget per packed bin */
  final case class Config(
      minQuality: Double = 0.5,
      mixWeights: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      packBudget: Long = 512L)

  /**
   * Output: one row per surviving document —
   * (doc_id, source, split, n_tokens, bin_id) where bin_id is the
   * document's contiguous-fill bin within its (source, split) stream.
   */
  def buildCorpus(docs: DataFrame, cfg: Config): DataFrame = {
    // stage 1: quality gate (scan-stage column math, no shuffle)
    val scored = TextAnalysis.withQuality(docs)
      .filter(col("quality_score") >= cfg.minQuality)
    // stage 2: exact dedup, min doc_id wins (one shuffle on the
    // fingerprint; min_by keeps the whole row without a sort)
    val kept = scored
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(min_by(
        struct(col("doc_id"), col("source"), col("n_tokens")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.n_tokens").cast("long").as("n_tokens"))
    // stage 3+4: weighted mix + split label (scan-stage hash filters)
    val mixed = Sampling.weightedMix(kept, "source", cfg.mixWeights,
        cfg.defaultRate)
      .withColumn("split", Sampling.assignSplit(col("doc_id"), cfg.splits))
    // stage 5: pack each (source, split) stream into token-budget bins —
    // group columns pass through as real columns (a concatenated string
    // key would corrupt a source name containing the separator)
    Packing.packContiguousBy(mixed, Seq("source", "split"),
        "doc_id", "n_tokens", cfg.packBudget)
      .select(col("doc_id"), col("source"), col("split"),
        col("n_tokens"), col("bin_id"))
  }
}
