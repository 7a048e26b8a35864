package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Semantic, Sampling, Similarity, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-5 semantic (embedding-space) operators as oracle-checked queries:
 * deterministic k-means clustering over the embeddings table, external
 * cluster diagnostics against the ground-truth label, and SemDeDup-style
 * within-cluster cosine deduplication.
 *
 * The DuckDB twin replays the SAME algorithm — lowest-id init, two
 * Lloyd's iterations with 1e-6-quantized centroids, sequential
 * index-order distance folds — so cluster ids, distances, and the kept
 * set hash-match bit-for-bit (see [[Semantic]] for why quantization
 * makes the cross-engine float story safe).
 */
object PipelineQueries3 {

  import PipelineQueries.withC
  import PipelineQueries2.duckHash32

  private[queries] val kmK = 8
  private val dedupTau = 0.3
  private val tempAlpha = 0.5
  private val tempBudget = 20000L

  private def duckHash32Doc(salt: String): String = duckHash32(salt)

  private def deconOracleSql: String = PipelineQueries2.deconOracleSql

  /** Sequential-fold squared L2 between `a.v` and `b.v` (index order —
    * the DuckDB twin of [[Semantic]]'s `zip_with` fold). */
  private[queries] def duckSqDist(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a.v)), j -> ($a.v[j]-$b.v[j])*($a.v[j]-$b.v[j])))"

  /** Assignment CTE: nearest centroid in `cN` per vector (tie → lower
    * cid), carrying the winning distance. */
  private def duckAssign(cN: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, cid, d FROM (
       |    SELECT e.vec_id, c.cid, ${duckSqDist("e", "c")} AS d,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${duckSqDist("e", "c")}, c.cid) AS rk
       |    FROM e CROSS JOIN $cN c) WHERE rk = 1)""".stripMargin

  /** Re-center CTE: element-wise mean of each cluster's members, rounded
    * to the shared 1e-6 grid before it feeds the next iteration. */
  private def duckRecenter(aN: String, out: String): String =
    s"""${out}_m AS (
       |  SELECT a.cid, i.i, round(avg(e.v[i.i]), 6) AS m
       |  FROM $aN a JOIN e USING (vec_id)
       |  CROSS JOIN (SELECT unnest(generate_series(1,
       |    (SELECT len(v) FROM e LIMIT 1))) AS i) i
       |  GROUP BY a.cid, i.i),
       |$out AS (SELECT cid, list(m ORDER BY i) AS v FROM ${out}_m GROUP BY cid)""".stripMargin

  /** e → c0 → a1 → c1 → a2 → c2 → af: two Lloyd's iterations from the
    * lowest-id init, then the final assignment. */
  private[queries] val kmeansCtes =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $kmK)),
       |${duckAssign("c0", "a1")},
       |${duckRecenter("a1", "c1")},
       |${duckAssign("c1", "a2")},
       |${duckRecenter("a2", "c2")},
       |${duckAssign("c2", "af")}""".stripMargin

  /** [[kmeansCtes]] with training restricted to `trainPred` while
    * `eall` carries the full table, ending at the trained `c2` — the
    * persisted-index oracles train on a snapshot, then assign whatever
    * slice the query serves against those centroids. */
  private def kmeansCtesTrainOn(trainPred: String): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |      WHERE $trainPred),
       |eall AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
       |         FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $kmK)),
       |${duckAssign("c0", "a1")},
       |${duckRecenter("a1", "c1")},
       |${duckAssign("c1", "a2")},
       |${duckRecenter("a2", "c2")}""".stripMargin

  /** The incremental-admission oracle: train on the base snapshot
    * (`vec_id % 5 <> 0`), assign everyone. */
  private val kmeansCtesBase = kmeansCtesTrainOn("vec_id % 5 <> 0")

  /** Assignment of the FULL table against the trained `c2` (tie → lower
    * cid) — the oracle twin of [[Similarity.assignWithIndex]]. */
  private def duckAssignAll(out: String): String =
    s"""$out AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT x.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${duckSqDist("x", "c")}, c.cid) AS rk
       |    FROM eall x CROSS JOIN c2 c) WHERE rk = 1)""".stripMargin

  private def sparkAssign(s: org.apache.spark.sql.SparkSession, dir: String) =
    Semantic.kmeansAssign(W.read(s, dir, "embeddings"), kmK, iters = 2)

  /** The sim_topk_indexed replay — training (c2), assignment (af),
    * probe selection against the trained centroids, exact-cosine
    * rescore. SHARED with `sim_topk_indexed_serve` (PipelineQueries13):
    * the serve-only query answers against a session-standing index, so
    * its oracle is by construction the same replay. */
  private[queries] val simTopkIndexedSql: String =
    s"""WITH $kmeansCtes,
       |nrm AS (SELECT vec_id, v,
       |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0),
       |probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.vec_id AS q_id, c.cid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
       |    FROM qn q CROSS JOIN c2 c)
       |  WHERE prk <= 2),
       |cn AS (
       |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
       |  FROM af a JOIN nrm n USING (vec_id) WHERE n.nrm > 0)
       |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT p.q_id, c.vec_id AS c_id,
       |    round(list_sum(list_transform(generate_series(1, len(q.v)),
       |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
       |    row_number() OVER (PARTITION BY p.q_id
       |      ORDER BY round(list_sum(list_transform(
       |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |          / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
       |  FROM probes p JOIN cn c ON c.cell = p.cell
       |  JOIN qn q ON q.vec_id = p.q_id
       |  WHERE p.q_id <> c.vec_id)
       |WHERE rank <= 5""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("sem_kmeans_assign",
      s"""WITH $kmeansCtes
         |SELECT vec_id, cid AS cluster_id, round(d, 6) AS sq_dist FROM af""".stripMargin) {
      (s, dir) => sparkAssign(s, dir)
    },

    QueryDef("sem_kmeans_stats",
      s"""WITH $kmeansCtes
         |SELECT cluster_id, n_members, majority_label,
         |  round(CAST(label_n AS DOUBLE) / CAST(n_members AS DOUBLE), 6)
         |    AS purity
         |FROM (
         |  SELECT a.cid AS cluster_id, e.label AS majority_label,
         |    count(*) AS label_n,
         |    CAST(sum(count(*)) OVER (PARTITION BY a.cid) AS BIGINT) AS n_members,
         |    row_number() OVER (PARTITION BY a.cid
         |      ORDER BY count(*) DESC, e.label) AS rk
         |  FROM af a JOIN e USING (vec_id)
         |  GROUP BY a.cid, e.label)
         |WHERE rk = 1""".stripMargin) {
      (s, dir) =>
        Semantic.clusterStats(sparkAssign(s, dir), W.read(s, dir, "embeddings"))
    },

    QueryDef("sem_dedup_keep",
      s"""WITH $kmeansCtes,
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |av AS (SELECT f.vec_id, f.cid, n.v, n.nrm
         |  FROM af f JOIN nrm n USING (vec_id)),
         |dom AS (
         |  SELECT DISTINCT b.vec_id FROM av a JOIN av b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE round(list_sum(list_transform(generate_series(1, len(a.v)),
         |      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= $dedupTau)
         |SELECT vec_id, cid AS cluster_id FROM af
         |WHERE vec_id NOT IN (SELECT vec_id FROM dom)""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        Semantic.semanticDedup(emb, sparkAssign(s, dir), dedupTau)
      }
    },

    // ---- temperature mixing / vocab / bloom decon -------------------------

    // mT5-style temperature sampling: rates derived IN-ENGINE from the
    // same token totals on both sides, quantized to 1e-12 before the
    // threshold so pow/summation float drift cannot flip a decision.
    QueryDef("samp_temperature", {
      val alpha = tempAlpha
      val budget = tempBudget
      withC(PipelineQueries.tokDocs + ",\n" +
        s"""tot AS (
           |  SELECT source, CAST(sum(len(toks)) AS DOUBLE) AS n
           |  FROM tok_docs GROUP BY source),
           |nrm AS (SELECT sum(pow(n, $alpha)) AS z FROM tot),
           |th AS (
           |  SELECT source, CAST(round(round(least(1.0,
           |      $budget * (pow(n, $alpha) / z) / n), 12)
           |    * 4294967296.0, 0) AS BIGINT) AS t
           |  FROM tot, nrm)""".stripMargin)(
        s"""SELECT d.doc_id, d.source FROM (
           |  SELECT doc_id, source, ${duckHash32Doc("tempmix")} AS h32
           |  FROM documents) d
           |JOIN th USING (source)
           |WHERE d.h32 < th.t""".stripMargin)
    }) {
      (s, dir) =>
        Sampling.temperatureMix(
          W.read(s, dir, "documents")
            .withColumn("n_tok", size(TextAnalysis.tokens(col("text"))).cast("long")),
          "source", "n_tok", tempAlpha, tempBudget)
          .select("doc_id", "source")
    },

    // Exact per-source vocabulary size; the mergeable HLL sketch twin
    // (approx_count_distinct) is cross-checked against this in DeconSpec.
    QueryDef("t_vocab_size",
      withC(PipelineQueries.tokDocs)(
        """SELECT source,
          |  CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab,
          |  CAST(count(tok) AS BIGINT) AS n_tokens
          |FROM (SELECT source, unnest(toks) AS tok FROM tok_docs)
          |GROUP BY source""".stripMargin)) {
      (s, dir) =>
        W.read(s, dir, "documents")
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("source")
          .agg(countDistinct(col("tok")).as("n_vocab"),
            count(col("tok")).as("n_tokens"))
    },

    // Prototypicality ranking (SSL-prototypes pruning metric): each
    // cluster's members ordered by centroid distance — reuses the full
    // k-means CTE chain, so ranks are verified on top of verified
    // assignments.
    QueryDef("sem_prototypes",
      s"""WITH $kmeansCtes
         |SELECT vec_id, cid AS cluster_id, round(d, 6) AS sq_dist,
         |  CAST(row_number() OVER (PARTITION BY cid ORDER BY round(d, 6),
         |    vec_id) AS INT) AS proto_rank
         |FROM af""".stripMargin) {
      (s, dir) => Semantic.prototypeRank(sparkAssign(s, dir))
    },

    // Per-document TF-IDF informativeness: mean/max smoothed IDF of the
    // doc's distinct tokens — quality signal computed against CORPUS
    // statistics (df), not per-row features.
    QueryDef("t_tfidf",
      withC(PipelineQueries.tokDocs + ",\n" +
        """dt AS (
          |  SELECT DISTINCT doc_id, unnest(toks) AS tok FROM tok_docs),
          |nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM dt),
          |idf AS (
          |  SELECT tok, ln((nn.n + 1.0) / (CAST(count(*) AS DOUBLE) + 1.0))
          |    AS idf
          |  FROM dt, nn GROUP BY tok, nn.n)""".stripMargin)(
        """SELECT d.doc_id, round(avg(i.idf), 6) AS mean_idf,
          |  round(max(i.idf), 6) AS max_idf,
          |  CAST(count(*) AS BIGINT) AS n_distinct_tok
          |FROM dt d JOIN idf i USING (tok)
          |GROUP BY d.doc_id""".stripMargin)) {
      (s, dir) => TextAnalysis.tfidfScores(W.read(s, dir, "documents"))
    },

    // Bloom-prefiltered decontamination: result-identical to
    // decon_overlap by construction (no false negatives; fpp survivors
    // die in the exact join), so it shares the SAME oracle — the scale
    // path is hash-verified, not just spec-compared.
    QueryDef("decon_overlap_bloom", deconOracleSql) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        graft.pipeline.Decontamination.overlapsBloom(
          docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0),
          minShared = 3, maxDf = Some(100))
      }
    },

    // Persisted build-once/query-many IVF: buildIvfIndex trains the
    // kmK-cell coarse quantizer ONCE (same deterministic Lloyd's chain
    // the sem_* family certifies) and writes centroid sidecar + corpus
    // partitioned by cell; indexedTopK then serves from disk with no
    // training in the query plan (IvfIndexSpec pins no-HashAggregate,
    // partition-pruned scan, broadcast-only joins). The oracle replays
    // training (c2), assignment (af), probe selection against the
    // TRAINED centroids, and the exact-cosine rescore end-to-end.
    QueryDef("sim_topk_indexed", PipelineQueries3.simTopkIndexedSql) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        // index dir keyed by the data dir so concurrent sf0.01 verify
        // and sf0.1 bench runs never clobber each other's index
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-index-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb, idxDir, kCells = kmK, iters = 2)
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), idxDir,
            k = 5, nprobe = 2)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // Incremental index admission: train on the BASE corpus snapshot
    // (vec_id % 5 <> 0), admit the rest through extendIvfIndex (pure
    // assignment against the persisted centroids — no retraining, no
    // rewrite of existing cells), then serve the union. The oracle
    // trains Lloyd's on the base only, assigns base ∪ new against the
    // trained centroids, and replays probe + rescore — certifying that
    // admission is assignment, nothing else.
    QueryDef("sim_topk_indexed_extend",
      s"""WITH $kmeansCtesBase,
         |af2 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT x.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY ${duckSqDist("x", "c")}, c.cid) AS rk
         |    FROM eall x CROSS JOIN c2 c) WHERE rk = 1),
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM eall),
         |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0),
         |probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.vec_id AS q_id, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
         |    FROM qn q CROSS JOIN c2 c)
         |  WHERE prk <= 2),
         |cn AS (
         |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM af2 a JOIN nrm n USING (vec_id) WHERE n.nrm > 0)
         |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT p.q_id, c.vec_id AS c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY round(list_sum(list_transform(
         |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
         |          / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
         |  FROM probes p JOIN cn c ON c.cell = p.cell
         |  JOIN qn q ON q.vec_id = p.q_id
         |  WHERE p.q_id <> c.vec_id)
         |WHERE rank <= 5""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-index-ext-${Integer.toHexString(dir.hashCode)}").getPath
        // build overwrites the corpus (STATIC partition overwrite wipes
        // the path), so build-then-extend is idempotent across runs
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0),
          idxDir, kCells = kmK, iters = 2)
        Similarity.extendIvfIndex(emb.filter(col("vec_id") % 5 === 0), idxDir)
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), idxDir,
            k = 5, nprobe = 2)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // Filtered ANN (the vector-store metadata-filter shape): the index
    // carries `label` as a payload attribute and the search applies a
    // PRE-FILTER predicate (label even) before scoring — all k results
    // satisfy it and the filtered search stays exact within the probed
    // cells. The oracle replays training, assignment, probes, the
    // predicate, and the rescore.
    QueryDef("sim_topk_indexed_filtered",
      s"""WITH $kmeansCtes,
         |nrm AS (SELECT vec_id, label, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0),
         |probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.vec_id AS q_id, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
         |    FROM qn q CROSS JOIN c2 c)
         |  WHERE prk <= 2),
         |cn AS (
         |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM af a JOIN nrm n USING (vec_id)
         |  WHERE n.nrm > 0 AND n.label % 2 = 0)
         |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT p.q_id, c.vec_id AS c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY round(list_sum(list_transform(
         |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
         |          / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
         |  FROM probes p JOIN cn c ON c.cell = p.cell
         |  JOIN qn q ON q.vec_id = p.q_id
         |  WHERE p.q_id <> c.vec_id)
         |WHERE rank <= 5""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-index-attr-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb, idxDir, kCells = kmK, iters = 2,
          attrCols = Seq("label"))
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), idxDir,
            k = 5, nprobe = 2, where = Some(col("label") % 2 === 0))
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // Embedding drift between snapshots (vec_id parity split): per
    // cell, both populations, centroid L2 shift, centroid cosine —
    // the re-embed/retrain trigger. One-sided cells report counts with
    // null shift. Oracle replays the rounded per-cell means and the
    // shift/cosine arithmetic.
    QueryDef("report_embedding_drift",
      withC(PipelineQueries.embDouble + s""",
        |pos AS (SELECT unnest(generate_series(1, 64)) AS pos),
        |ca AS (
        |  SELECT cell, n_a, list(mv ORDER BY pos) AS cv FROM (
        |    SELECT e.label AS cell, p.pos, round(avg(e.v[p.pos]), 6) AS mv,
        |      count(*) AS n_a
        |    FROM e, pos p WHERE e.vec_id % 2 = 0
        |    GROUP BY e.label, p.pos)
        |  GROUP BY cell, n_a),
        |cb AS (
        |  SELECT cell, n_b, list(mv ORDER BY pos) AS cv FROM (
        |    SELECT e.label AS cell, p.pos, round(avg(e.v[p.pos]), 6) AS mv,
        |      count(*) AS n_b
        |    FROM e, pos p WHERE e.vec_id % 2 = 1
        |    GROUP BY e.label, p.pos)
        |  GROUP BY cell, n_b)""".stripMargin)(
        """SELECT coalesce(ca.cell, cb.cell) AS cell,
          |  CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
          |  CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b,
          |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL THEN
          |    round(sqrt(list_sum(list_transform(generate_series(1, 64),
          |      i -> (ca.cv[i] - cb.cv[i]) * (ca.cv[i] - cb.cv[i])))), 6)
          |  END AS l2_shift,
          |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL
          |      AND sqrt(list_sum(list_transform(ca.cv, x -> x * x))) > 0
          |      AND sqrt(list_sum(list_transform(cb.cv, x -> x * x))) > 0
          |    THEN round(list_sum(list_transform(generate_series(1, 64),
          |        i -> ca.cv[i] * cb.cv[i]))
          |      / (sqrt(list_sum(list_transform(ca.cv, x -> x * x)))
          |         * sqrt(list_sum(list_transform(cb.cv, x -> x * x)))), 6)
          |  END AS cos_centroid
          |FROM ca FULL OUTER JOIN cb ON ca.cell = cb.cell""".stripMargin)) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        Semantic.embeddingDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1))
      }
    },

    // Incremental drift: snapshot A's state is built from TWO slices
    // and MERGED (addition of micro-sums) before rendering against
    // snapshot B's state — the oracle computes the state over the whole
    // half directly, so a hash match certifies merge == whole (the
    // report_pca_incremental precedent) plus the micro-sum centroid
    // formula itself.
    QueryDef("report_drift_incremental",
      withC(PipelineQueries.embDouble + s""",
        |pos AS (SELECT unnest(generate_series(1, 64)) AS pos),
        |sa AS (
        |  SELECT e.label AS cell, p.pos,
        |    CAST(sum(CAST(round(e.v[p.pos] * 1e6) AS BIGINT)) AS BIGINT)
        |      AS sx,
        |    count(*) AS n
        |  FROM e, pos p WHERE e.vec_id % 2 = 0 GROUP BY 1, 2),
        |sb AS (
        |  SELECT e.label AS cell, p.pos,
        |    CAST(sum(CAST(round(e.v[p.pos] * 1e6) AS BIGINT)) AS BIGINT)
        |      AS sx,
        |    count(*) AS n
        |  FROM e, pos p WHERE e.vec_id % 2 = 1 GROUP BY 1, 2),
        |ca AS (
        |  SELECT cell, n AS n_a,
        |    list(round(CAST(sx AS DOUBLE) / (n * 1e6), 6) ORDER BY pos)
        |      AS cv
        |  FROM sa GROUP BY cell, n),
        |cb AS (
        |  SELECT cell, n AS n_b,
        |    list(round(CAST(sx AS DOUBLE) / (n * 1e6), 6) ORDER BY pos)
        |      AS cv
        |  FROM sb GROUP BY cell, n)""".stripMargin)(
        """SELECT coalesce(ca.cell, cb.cell) AS cell,
          |  CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
          |  CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b,
          |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL THEN
          |    round(sqrt(list_sum(list_transform(generate_series(1, 64),
          |      i -> (ca.cv[i] - cb.cv[i]) * (ca.cv[i] - cb.cv[i])))), 6)
          |  END AS l2_shift,
          |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL
          |      AND sqrt(list_sum(list_transform(ca.cv, x -> x * x))) > 0
          |      AND sqrt(list_sum(list_transform(cb.cv, x -> x * x))) > 0
          |    THEN round(list_sum(list_transform(generate_series(1, 64),
          |        i -> ca.cv[i] * cb.cv[i]))
          |      / (sqrt(list_sum(list_transform(ca.cv, x -> x * x)))
          |         * sqrt(list_sum(list_transform(cb.cv, x -> x * x)))), 6)
          |  END AS cos_centroid
          |FROM ca FULL OUTER JOIN cb ON ca.cell = cb.cell""".stripMargin)) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val a = emb.filter(col("vec_id") % 2 === 0)
        // A's state arrives in two MERGED slices — the incremental path
        val stA = Semantic.mergeCellState(
          Semantic.cellState(a.filter(col("vec_id") % 4 === 0)),
          Semantic.cellState(a.filter(col("vec_id") % 4 =!= 0)))
        Semantic.renderDrift(stA,
          Semantic.cellState(emb.filter(col("vec_id") % 2 === 1)))
      }
    },

    // nprobe tuning curve: recall of nprobe-probed top-k vs the index's
    // full-probe ranking, one row per nprobe 1..4 — the table read
    // before choosing the serve path's recall/cost knob (the
    // dedup_lsh_tuning discipline on the index). One scoring pass; each
    // point is a per-(nprobe, query) window over the cached candidates.
    QueryDef("sim_nprobe_curve",
      s"""WITH $kmeansCtes,
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0),
         |pr AS (
         |  SELECT q_id, cell, prk FROM (
         |    SELECT q.vec_id AS q_id, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
         |    FROM qn q CROSS JOIN c2 c)),
         |cn AS (
         |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM af a JOIN nrm n USING (vec_id) WHERE n.nrm > 0),
         |sc AS (
         |  SELECT p.q_id, c.vec_id AS c_id, p.prk,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |      i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim
         |  FROM pr p JOIN cn c ON c.cell = p.cell
         |  JOIN qn q ON q.vec_id = p.q_id
         |  WHERE p.q_id <> c.vec_id),
         |full_k AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, c_id) AS rk FROM sc)
         |  WHERE rk <= 5),
         |nex AS (SELECT count(*) AS n_exact FROM full_k),
         |ns AS (SELECT unnest(generate_series(1, 4)) AS nprobe),
         |scn AS (
         |  SELECT n.nprobe, s.q_id, s.c_id,
         |    row_number() OVER (PARTITION BY n.nprobe, s.q_id
         |      ORDER BY s.cos_sim DESC, s.c_id) AS rk
         |  FROM sc s JOIN ns n ON s.prk <= n.nprobe),
         |hits AS (
         |  SELECT nprobe, count(*) AS hits
         |  FROM scn JOIN full_k USING (q_id, c_id)
         |  WHERE rk <= 5 GROUP BY nprobe)
         |SELECT CAST(ns.nprobe AS INT) AS nprobe,
         |  CAST(nex.n_exact AS BIGINT) AS n_exact,
         |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE)
         |    / CAST(nex.n_exact AS DOUBLE), 6) AS recall
         |FROM ns LEFT JOIN hits h USING (nprobe) CROSS JOIN nex""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-index-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb, idxDir, kCells = kmK, iters = 2)
        Similarity.nprobeRecallCurve(s, emb.filter(col("vec_id") < 8),
          idxDir, k = 5, maxProbe = 4)
      }
    },

    // Semantic decontamination: the paraphrase screen — same-cell
    // corpus×benchmark cosine at tau, catching rewrites the n-gram
    // decon paths (decon_overlap/_bloom/_mask) structurally miss. The
    // benchmark side broadcasts; the corpus is scanned once. Oracle
    // replays the split, the cell equi-join, and the rounded cosine
    // threshold.
    QueryDef("decon_semantic",
      withC(PipelineQueries.embDouble)(
        s"""SELECT c.vec_id AS corpus_id, b.vec_id AS bench_id,
           |  round(list_sum(list_transform(generate_series(1, len(c.v)),
           |    i -> c.v[i] * b.v[i])) / (c.nrm * b.nrm), 6) AS cos_sim
           |FROM (SELECT * FROM e WHERE vec_id % 7 <> 0 AND nrm > 0) c
           |JOIN (SELECT * FROM e WHERE vec_id % 7 = 0 AND nrm > 0) b
           |  ON c.label = b.label
           |WHERE round(list_sum(list_transform(generate_series(1, len(c.v)),
           |    i -> c.v[i] * b.v[i])) / (c.nrm * b.nrm), 6) >= 0.3""".stripMargin)) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        graft.pipeline.Decontamination.semanticOverlaps(
          emb.filter(col("vec_id") % 7 =!= 0),
          emb.filter(col("vec_id") % 7 === 0), tau = 0.3)
      }
    },

    // Index health: per-cell population, file count (the compaction
    // trigger), and balance factor (count ÷ ideal equal share) over the
    // persisted index — the "retrain/compact yet?" signals read between
    // extend batches. The oracle replays training + assignment for the
    // rollup; n_files is replayable because the sharded write
    // discipline makes the layout a pure function of the data (build
    // with filesPerCell=1 ⇒ exactly one file per non-empty cell).
    QueryDef("sim_index_stats",
      s"""WITH $kmeansCtes,
         |cnt AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors
         |        FROM af GROUP BY cid),
         |cells AS (SELECT DISTINCT cid FROM c2)
         |SELECT c.cid AS cell,
         |  CAST(coalesce(t.n_vectors, 0) AS BIGINT) AS n_vectors,
         |  CAST(CASE WHEN coalesce(t.n_vectors, 0) > 0 THEN 1 ELSE 0 END
         |    AS BIGINT) AS n_files,
         |  round(CAST(coalesce(t.n_vectors, 0) AS DOUBLE)
         |      * (SELECT count(*) FROM cells)
         |      / (SELECT sum(n_vectors) FROM cnt), 6) AS balance
         |FROM cells c LEFT JOIN cnt t ON t.cid = c.cid""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-index-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb, idxDir, kCells = kmK, iters = 2)
        Similarity.ivfIndexStats(s, idxDir)
      }
    },

    // Retraction: build the full index, DELETE the vec_id % 11 == 0
    // rows (partition-targeted rewrite, no tombstones), then serve —
    // the takedown/right-to-be-forgotten path. The oracle trains on the
    // FULL corpus (deletion never retrains), keeps the full-corpus
    // probe selection, and drops the deleted rows from the candidate
    // set only — certifying that deletion touches exactly the corpus
    // membership and nothing about the trained structure.
    QueryDef("sim_topk_indexed_deleted",
      s"""WITH $kmeansCtes,
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0),
         |probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.vec_id AS q_id, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
         |    FROM qn q CROSS JOIN c2 c)
         |  WHERE prk <= 2),
         |cn AS (
         |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM af a JOIN nrm n USING (vec_id)
         |  WHERE n.nrm > 0 AND a.vec_id % 11 <> 0)
         |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT p.q_id, c.vec_id AS c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY round(list_sum(list_transform(
         |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
         |          / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
         |  FROM probes p JOIN cn c ON c.cell = p.cell
         |  JOIN qn q ON q.vec_id = p.q_id
         |  WHERE p.q_id <> c.vec_id)
         |WHERE rank <= 5""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-del-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb, idxDir, kCells = kmK, iters = 2)
        Similarity.deleteFromIvfIndex(s, idxDir,
          emb.filter(col("vec_id") % 11 === 0).select("vec_id"))
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), idxDir,
            k = 5, nprobe = 2)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // Screen-against-index decontamination: the paraphrase screen run
    // the way a production deployment runs it — the corpus side IS the
    // persisted index's cell-partitioned corpus (assigned at build
    // time), the benchmark assigns against the SAME trained sidecar
    // (assignWithIndex), no caller-supplied cell column anywhere. The
    // oracle replays training on the corpus snapshot, assignment of
    // both sides, the same-cell equi-join, and the rounded cosine
    // threshold end-to-end.
    QueryDef("decon_semantic_indexed",
      s"""WITH ${kmeansCtesTrainOn("vec_id % 7 <> 0")},
         |${duckAssignAll("af2")},
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM eall),
         |cn AS (
         |  SELECT a.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM af2 a JOIN nrm n USING (vec_id) WHERE n.nrm > 0)
         |SELECT c.vec_id AS corpus_id, b.vec_id AS bench_id,
         |  round(list_sum(list_transform(generate_series(1, len(c.v)),
         |    i -> c.v[i] * b.v[i])) / (c.nrm * b.nrm), 6) AS cos_sim
         |FROM (SELECT * FROM cn WHERE vec_id % 7 <> 0) c
         |JOIN (SELECT * FROM cn WHERE vec_id % 7 = 0) b ON c.cell = b.cell
         |WHERE round(list_sum(list_transform(generate_series(1, len(c.v)),
         |    i -> c.v[i] * b.v[i])) / (c.nrm * b.nrm), 6) >= 0.3""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-decon-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 7 =!= 0),
          idxDir, kCells = kmK, iters = 2)
        graft.pipeline.Decontamination.semanticOverlapsIndexed(
          s, idxDir, emb.filter(col("vec_id") % 7 === 0), tau = 0.3)
      }
    },

    // The index's standing retrain monitor, batch-rendered: reference =
    // the mergeable cell state of the index's OWN corpus
    // (indexCellState), live = a new snapshot assigned against the same
    // persisted sidecar — cells are the INDEX's cells on both sides,
    // nothing caller-supplied. The oracle replays training on the
    // indexed half, both assignments, the integer micro-sum states, and
    // the render formulas (the report_drift_incremental discipline over
    // index cells).
    QueryDef("report_drift_indexed",
      s"""WITH ${kmeansCtesTrainOn("vec_id % 2 = 0")},
         |${duckAssignAll("af2")},
         |pos AS (SELECT unnest(generate_series(1, 64)) AS pos),
         |sa AS (
         |  SELECT a.cid AS cell, p.pos,
         |    CAST(sum(CAST(round(x.v[p.pos] * 1e6) AS BIGINT)) AS BIGINT)
         |      AS sx,
         |    count(*) AS n
         |  FROM af2 a JOIN eall x USING (vec_id) CROSS JOIN pos p
         |  WHERE x.vec_id % 2 = 0 GROUP BY 1, 2),
         |sb AS (
         |  SELECT a.cid AS cell, p.pos,
         |    CAST(sum(CAST(round(x.v[p.pos] * 1e6) AS BIGINT)) AS BIGINT)
         |      AS sx,
         |    count(*) AS n
         |  FROM af2 a JOIN eall x USING (vec_id) CROSS JOIN pos p
         |  WHERE x.vec_id % 2 = 1 GROUP BY 1, 2),
         |ca AS (
         |  SELECT cell, n AS n_a,
         |    list(round(CAST(sx AS DOUBLE) / (n * 1e6), 6) ORDER BY pos)
         |      AS cv
         |  FROM sa GROUP BY cell, n),
         |cb AS (
         |  SELECT cell, n AS n_b,
         |    list(round(CAST(sx AS DOUBLE) / (n * 1e6), 6) ORDER BY pos)
         |      AS cv
         |  FROM sb GROUP BY cell, n)
         |SELECT coalesce(ca.cell, cb.cell) AS cell,
         |  CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
         |  CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b,
         |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL THEN
         |    round(sqrt(list_sum(list_transform(generate_series(1, 64),
         |      i -> (ca.cv[i] - cb.cv[i]) * (ca.cv[i] - cb.cv[i])))), 6)
         |  END AS l2_shift,
         |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL
         |      AND sqrt(list_sum(list_transform(ca.cv, x -> x * x))) > 0
         |      AND sqrt(list_sum(list_transform(cb.cv, x -> x * x))) > 0
         |    THEN round(list_sum(list_transform(generate_series(1, 64),
         |        i -> ca.cv[i] * cb.cv[i]))
         |      / (sqrt(list_sum(list_transform(ca.cv, x -> x * x)))
         |         * sqrt(list_sum(list_transform(cb.cv, x -> x * x)))), 6)
         |  END AS cos_centroid
         |FROM ca FULL OUTER JOIN cb ON ca.cell = cb.cell""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-drift-${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0),
          idxDir, kCells = kmK, iters = 2)
        Semantic.renderDrift(
          Similarity.indexCellState(s, idxDir),
          Semantic.cellState(
            Similarity.assignWithIndex(
              emb.filter(col("vec_id") % 2 === 1), idxDir),
            cellCol = "cell"))
      }
    }
  )
}
