package graft

/** Plan-quality regression guard: the declared query surface must keep the
  * plans we designed for — no accidental cartesians, broadcast on the one
  * genuinely-small side, pruned scans. Failures here mean a refactor
  * silently degraded a plan even though results still match. */
class PlanAuditSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  // the one intentional all-pairs baseline (documented O(Q*N) reference
  // point; the IVF query is the scale path), plus:
  //  - sim_recall_report: its exact baseline IS that declared brute
  //    force (the harness exists to measure the approximate paths
  //    against it — a bounded query set by protocol);
  //  - dedup_lsh_tuning: joins three SINGLE-ROW aggregate frames into
  //    the one-row report — a broadcast NLJ of 1-row inputs, constant
  //    cost at any corpus size;
  //  - report_zipf / report_embedding_health: same 1-row × 1-row shape
  //    (regression-sum frame × totals frame; count frame × quantized
  //    norm-sum frame) — the crossJoin is of two scalar aggregates.
  //  - pack_zorder: crossJoin of the broadcast 1-row global-bounds
  //    frame (the nllTiersApprox pattern) — constant cost at any size;
  //  - dedup_source_venn: the totals pair frame is #sources × #sources
  //    (an inequality join on a catalog-sized aggregate, never the
  //    corpus); the corpus-sized work is the fpr equi-join.
  //  - report_vocab_coverage: crossJoin of the broadcast |cutoffs|-row
  //    (=4) frame against the count-of-counts histogram (O(√tokens)
  //    rows) — both sides bounded, never the corpus.
  //  - report_length_drift: crossJoin of the broadcast 1-row totals
  //    frame against the distinct-values frame (the pack_zorder
  //    bounds pattern).
  //  - report_heaps_curve / report_heaps_incremental /
  //    report_quality_volume: non-equi join of a broadcast ≤21-row
  //    checkpoint/threshold grid against the vocab-sized aggregate
  //    (heaps) or the scored scan (quality_volume) — the
  //    report_vocab_coverage shape; the expansion partial-aggregates
  //    to ≤ grid-size rows per task before the only shuffle.
  private val cartesianExempt =
    Set("sim_topk_bruteforce", "sim_recall_report", "dedup_lsh_tuning",
      "report_zipf", "report_embedding_health", "pack_zorder",
      "dedup_source_venn", "report_vocab_coverage", "report_length_drift",
      "report_heaps_curve", "report_heaps_incremental",
      "report_quality_volume", "report_dedup_curve",
      // 1-row × 1-row aggregate crossJoin (the pack_zorder bounds shape)
      "report_funnel_rates",
      // graph-total aggregates: 1-row (nodes/edges/wedges) × 1-row
      // (triangles) crossJoin — the report_funnel_rates shape
      "dedup_graph_transitivity",
      // the decay horizon: keyed rows crossJoin the broadcast 1-row
      // max-period frame (the pack_zorder bounds shape) — constant
      // cost at any size
      "report_decay_activity",
      // per-nprobe hit counts crossJoin the broadcast 1-row reference
      // count (the report_funnel_rates shape) — both sides bounded
      "sim_nprobe_curve",
      // same shape on the candMult axis: per-candMult hit counts ×
      // the 1-row pass-all reference count
      "sim_candmult_curve",
      // the exact serve's bound evaluation: queries crossJoin the
      // broadcast ≤kCells radii+centroid sidecar (the probeRanksByJoin
      // shape) — per-(query, cell) skinny rows, never the corpus
      "sim_topk_indexed_exact", "sim_topk_exact_serve",
      // MMR's pool construction is brute-force retrieval (the
      // sim_topk_bruteforce exemption); the greedy itself is all
      // equi-joins over pool² skinny rows per query
      "retr_mmr",
      // skyline dominance is inherently non-equi: one NLJ FILTER scan
      // against the broadcast pruner set, then a survivor-bounded
      // self anti-join — never corpus x corpus
      "samp_skyline")

  test("no cartesian or nested-loop joins anywhere in the query surface") {
    val offenders = SparkEntry.queries.keySet.toSeq.sorted
      .filterNot(cartesianExempt)
      .flatMap { name =>
        val p = planOf(name)
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"queries planning cartesian/nested-loop joins: $offenders")
  }

  test("lookup join broadcasts its dimension side") {
    assert(planOf("j7_lookup_join").contains("BroadcastHashJoin"))
  }

  test("inventory diffs stay sort-merge (both sides large, no broadcast)") {
    // at real scale both inventories are huge; a broadcast here would OOM.
    // sf0.001 is small enough that AQE *could* broadcast, so assert on the
    // pre-AQE plan shape: a full-outer join can only be SMJ.
    val j1 = planOf("j1_table_diff")
    assert(j1.contains("SortMergeJoin") && j1.contains("FullOuter"), j1)
    val j3 = planOf("j3_manifest_diff")
    assert(j3.contains("SortMergeJoin") && j3.contains("FullOuter"), j3)
  }

  test("scans prune to referenced columns") {
    // s1 projects 5 derived columns from 2 physical ones
    val p = planOf("s1_catalog_scan")
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_size:int>"),
      s"expected pruned scan, got:\n$p")
  }

  test("similarity family executes the native vector folds") {
    assert(planOf("sim_topk_ivf").contains("vec_dot"),
      "IVF rescore regressed to the interpreted HOF fold")
    assert(planOf("sem_dedup_keep").contains("vec_dot"),
      "SemDeDup cosine regressed to the interpreted HOF fold")
    assert(planOf("sim_topk_sq8").contains("vec_dot_long"),
      "SQ8 integer pre-rank regressed to the interpreted HOF fold")
  }

  test("pairwise Jaccard verify uses the native sorted-intersect expression") {
    val p = planOf("dedup_ngram_jaccard")
    assert(p.contains("sorted_intersect_count"),
      "ngram pairs regressed to per-pair hash-set array_intersect")
    assert(!p.contains("array_intersect("), p.linesIterator
      .filter(_.contains("array_intersect")).mkString("\n"))
  }

  test("hidden-file filter evaluates one regex per row") {
    val p = planOf("p5_hidden_filter")
    assert(!p.contains("regexp_extract"),
      "p5 should use a single regexp_like, not extract+compare")
  }

  test("sampled-classifier scoring is a joinless scan-speed projection") {
    // training runs while the plan is BUILT (bounded driver model); the
    // returned frame must score with the weights as literals — one scan,
    // no join, no shuffle. A Join/Exchange here means scoring regressed
    // to the per-iteration join path, which would re-shuffle 100 TB.
    val p = planOf("t_classifier_sampled")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"scoring plan must be a pure projection, got:\n$p")
  }
}
