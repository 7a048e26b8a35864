package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Similarity, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-13 queries: the QUANTIZED persisted IVF index
 * ([[Similarity.buildIvfIndex]] `codec = "sq8"/"pq"`) and the
 * serve-only line over a session-standing index.
 *
 * The oracle discipline is the `sim_topk_pq` one applied to the
 * persisted path: the DuckDB twin replays coarse Lloyd's training,
 * the codec encoding (symmetric-int8 quantization for sq8; the full
 * per-subspace codebook Lloyd's chain for pq), probe selection against
 * the trained centroids, the integer pre-rank within the probed cells,
 * and the exact-cosine rescore — a hash match certifies the whole
 * quantized lifecycle, quantization loss and all.
 */
object PipelineQueries13 {

  import PipelineQueries3.{kmK, kmeansCtes, duckSqDist}

  private val k = 5
  private val candMult = 4
  private val pqM = 8
  private val pqSubDim = 8 // testdata embeddings are dim 64
  private val pqKs = 16
  private val pqIters = 2

  private def idxDir(prefix: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$prefix-${Integer.toHexString(dir.hashCode)}").getPath

  /** Session-standing indexes for the serve-only line: built at most
    * once per (JVM, data dir) — the `persistInternal` discipline
    * applied to an on-disk artifact. Bench's untimed warmup run pays
    * the build; every timed iteration measures the SERVE alone, which
    * is the number a production deployment cares about (the round-12
    * verdict: build+serve totals hid serve regressions). */
  private val standing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** `nrm` and positive-norm `qn` (queries) over the [[kmeansCtes]]
    * output — the shared head of every persisted-index replay. */
  private val nrmQnCtes =
    """nrm AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |qn AS (SELECT * FROM nrm WHERE vec_id < 8 AND nrm > 0)""".stripMargin

  /** Probe selection against the trained `c2`: nprobe = 2, distance
    * rounded to 1e-6, cell id breaks ties — [[Similarity.indexedTopK]]'s
    * probe rule. */
  private val probesCte =
    s"""probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.vec_id AS q_id, c.cid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(${duckSqDist("q", "c")}, 6), c.cid) AS prk
       |    FROM qn q CROSS JOIN c2 c)
       |  WHERE prk <= 2)""".stripMargin

  /** Exact rescore of the `cand(q_id, c_id)` survivors + final top-k —
    * shared tail of both quantized replays. */
  private val rescoreSelect =
    s"""SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT cd.q_id, cd.c_id,
       |    round(list_sum(list_transform(generate_series(1, len(q.v)),
       |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
       |    row_number() OVER (PARTITION BY cd.q_id
       |      ORDER BY round(list_sum(list_transform(
       |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |          / (q.nrm * c.nrm), 6) DESC, cd.c_id) AS rank
       |  FROM cand cd JOIN qn q ON q.vec_id = cd.q_id
       |  JOIN nrm c ON c.vec_id = cd.c_id)
       |WHERE rank <= $k""".stripMargin

  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmN = 20 // per-ranking depth feeding the fusion
  private val fuseK = 10
  private val rrfC = 60
  private val termsA = Seq("spark", "hash", "stream")
  private val termsB = Seq("vector", "merge", "scan")

  /** One BM25 ranked-top-`bmN` CTE chain under prefix `p` — the
    * t_bm25_topk replay parameterized by term set (shared `bdl`/`bst`
    * emitted by the caller once). */
  private def bmChain(p: String, terms: Seq[String]): String =
    s"""${p}tf AS (
       |  SELECT x.doc_id, d.dl, x.tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok_docs) x
       |  JOIN bdl d ON d.doc_id = x.doc_id
       |  WHERE x.tok IN (${terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2, 3),
       |${p}df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
       |           FROM ${p}tf GROUP BY 1),
       |${p}rk AS (
       |  SELECT doc_id, rk FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk
       |    FROM (
       |      SELECT t.doc_id, CAST(sum(t.mic) AS BIGINT) AS score_micro
       |      FROM (
       |        SELECT f.doc_id,
       |          CAST(round(ln((CAST(s.n AS DOUBLE) - CAST(g.df AS DOUBLE)
       |              + 0.5) / (CAST(g.df AS DOUBLE) + 0.5) + 1.0)
       |            * (CAST(f.tf AS DOUBLE) * ${1.0 + bmK1})
       |            / (CAST(f.tf AS DOUBLE) + $bmK1 * (${1.0 - bmB}
       |                + $bmB * CAST(f.dl AS DOUBLE)
       |                  / (CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))))
       |            * 1000000.0) AS BIGINT) AS mic
       |        FROM ${p}tf f JOIN ${p}df g ON f.tok = g.tok
       |        CROSS JOIN bst s) t
       |      GROUP BY 1))
       |  WHERE rk <= $bmN)""".stripMargin

  /** Sequential-fold squared L2 over one PQ subspace. */
  private def pqSqd(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, $pqSubDim),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin

  private def pqAssign(cN: String, out: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT vec_id, s, cid FROM (
       |    SELECT sub.vec_id, sub.s, c.cid,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${pqSqd("sub.subv", "c.cv")}, c.cid) AS rk
       |    FROM sub JOIN $cN c USING (s)) WHERE rk = 1)""".stripMargin

  private def pqRecenter(aN: String, out: String): String =
    s"""${out}_m AS (
       |  SELECT a.s, a.cid, p.pos, round(avg(sub.subv[p.pos]), 6) AS mv
       |  FROM $aN a JOIN sub ON a.vec_id = sub.vec_id AND a.s = sub.s
       |  CROSS JOIN (SELECT unnest(generate_series(1, $pqSubDim)) AS pos) p
       |  GROUP BY a.s, a.cid, p.pos),
       |$out AS (SELECT s, cid, list(mv ORDER BY pos) AS cv
       |         FROM ${out}_m GROUP BY s, cid)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // IVF-SQ8 persisted: codes stored as int8 of the normalized vector
    // (the sim_topk_sq8 quantizer), pre-rank by the exact integer dot
    // within the probed cells, exact rescore of candMult*k survivors.
    // The replay covers training + assignment + quantization + probes +
    // pre-rank + rescore.
    QueryDef("sim_topk_indexed_sq8", PipelineQueries13.sq8IndexedSql) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val d = idxDir("graft-ivf-sq8", dir)
        Similarity.buildIvfIndex(emb, d, kCells = kmK, iters = 2,
          codec = "sq8")
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // IVF-PQ persisted: the codebook is TRAINED AT BUILD TIME and
    // persisted beside the centroids; serve is ADC (integer micro-unit
    // LUT) within the probed cells + exact rescore. The replay runs the
    // whole per-subspace Lloyd's chain, the encode, the LUT, and the
    // ADC ranking — the sim_topk_pq oracle moved onto the persisted
    // lifecycle, with the coarse routing coming from the trained IVF
    // cells (af) instead of the data's label column.
    QueryDef("sim_topk_indexed_pq", PipelineQueries13.pqIndexedSql) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val d = idxDir("graft-ivf-pqidx", dir)
        Similarity.buildIvfIndex(emb, d, kCells = kmK, iters = 2,
          codec = "pq", pqM = pqM, pqKs = pqKs, pqIters = pqIters)
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // candMult tuning curve: the codec's recall/cost knob as a table —
    // recall of the int8-preranked, candMult*k-truncated top-k against
    // the pass-all ranking (the quantized serve's own exact answer
    // within the probed cells), one row per candMult 1..4. The replay
    // covers training, quantization, probes, the pre-rank POSITIONS,
    // and both rankings.
    QueryDef("sim_candmult_curve",
      s"""WITH $kmeansCtes,
         |$nrmQnCtes,
         |eq AS (
         |  SELECT n.vec_id, a.cid AS cell, n.v, n.nrm,
         |    list_transform(n.v, x ->
         |      greatest(least(CAST(round(x / n.nrm * 127) AS BIGINT), 127),
         |        -127)) AS qv
         |  FROM nrm n JOIN af a USING (vec_id) WHERE n.nrm > 0),
         |$probesCte,
         |sc AS MATERIALIZED (
         |  SELECT q_id, c_id, crk, cos_sim FROM (
         |    SELECT p.q_id, c.vec_id AS c_id,
         |      row_number() OVER (PARTITION BY p.q_id ORDER BY
         |        list_sum(list_transform(generate_series(1, len(q.qv)),
         |          j -> q.qv[j] * c.qv[j])) DESC, c.vec_id) AS crk,
         |      round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim
         |    FROM probes p JOIN eq c ON c.cell = p.cell
         |    JOIN eq q ON q.vec_id = p.q_id
         |    WHERE p.q_id <> c.vec_id)),
         |full_k AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, c_id) AS rk FROM sc)
         |  WHERE rk <= $k),
         |nex AS (SELECT count(*) AS n_exact FROM full_k),
         |ms AS (SELECT unnest(generate_series(1, 4)) AS cand_mult),
         |scn AS (
         |  SELECT m.cand_mult, s.q_id, s.c_id,
         |    row_number() OVER (PARTITION BY m.cand_mult, s.q_id
         |      ORDER BY s.cos_sim DESC, s.c_id) AS rk
         |  FROM sc s JOIN ms m ON s.crk <= m.cand_mult * $k),
         |hits AS (
         |  SELECT cand_mult, count(*) AS hits
         |  FROM scn JOIN full_k USING (q_id, c_id)
         |  WHERE rk <= $k GROUP BY cand_mult)
         |SELECT CAST(ms.cand_mult AS INT) AS cand_mult,
         |  CAST(nex.n_exact AS BIGINT) AS n_exact,
         |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE)
         |    / CAST(nex.n_exact AS DOUBLE), 6) AS recall
         |FROM ms LEFT JOIN hits h USING (cand_mult) CROSS JOIN nex"""
        .stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val d = idxDir("graft-ivf-cmc", dir)
        Similarity.buildIvfIndex(emb, d, kCells = kmK, iters = 2,
          codec = "sq8")
        Similarity.candMultRecallCurve(s, emb.filter(col("vec_id") < 8),
          d, k = k, maxMult = 4, nprobe = 2)
      }
    },

    // SERVE-ONLY over the QUANTIZED standing index: the production
    // number for the codec path — ADC pre-rank + survivor re-rank
    // with the build (coarse + codebook training) paid once per
    // session. Shares the pq replay oracle; the result is independent
    // of WHEN the index was built.
    QueryDef("sim_topk_indexed_serve_pq", PipelineQueries13.pqIndexedSql) {
      (s, dir) => {
        val d = standing.computeIfAbsent(s"$dir#pq", _ => {
          val p = idxDir("graft-ivf-standing-pq", dir)
          Similarity.buildIvfIndex(W.read(s, dir, "embeddings"), p,
            kCells = kmK, iters = 2, codec = "pq", pqM = pqM,
            pqKs = pqKs, pqIters = pqIters)
          p
        })
        Similarity.indexedTopK(s,
            W.read(s, dir, "embeddings").filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // SERVE-ONLY line: the index is built at most once per session
    // (the standing map) and the query answers against it — Bench's
    // untimed warmup pays the build, every timed iteration measures
    // the pure serve path the IvfIndexSpec plan pins describe. Same
    // result as sim_topk_indexed by construction, so it shares that
    // oracle.
    QueryDef("sim_topk_indexed_serve", PipelineQueries3.simTopkIndexedSql) {
      (s, dir) => {
        val d = standing.computeIfAbsent(dir, _ => {
          val p = idxDir("graft-ivf-standing", dir)
          Similarity.buildIvfIndex(W.read(s, dir, "embeddings"), p,
            kCells = kmK, iters = 2)
          p
        })
        Similarity.indexedTopK(s,
            W.read(s, dir, "embeddings").filter(col("vec_id") < 8), d,
            k = k, nprobe = 2)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // RESIDUAL IVF-PQ persisted (codec=pqr — the actual Faiss IVFPQ
    // recipe): codes quantize v − centroid[cell], the serve's ADC LUT
    // is per (query, probed cell) in that cell's residual space. The
    // replay runs coarse training, residual computation, the codebook
    // Lloyd's chain OVER RESIDUALS, the per-(query, cell) residual
    // LUT, the ADC ranking, and the exact rescore over the RAW
    // vectors — the deepest oracle in the index family.
    QueryDef("sim_topk_indexed_pqr", PipelineQueries13.pqrIndexedSql) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        val d = idxDir("graft-ivf-pqr", dir)
        Similarity.buildIvfIndex(emb, d, kCells = kmK, iters = 2,
          codec = "pqr", pqM = pqM, pqKs = pqKs, pqIters = pqIters)
        Similarity.indexedTopK(s, emb.filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // SERVE-ONLY over the standing SQ8 index: the int8 pre-rank +
    // exact rescore with the build paid once per session — the codec
    // serve's production number (round-13 verdict: the build+serve
    // totals were the only sq8 signal, hiding serve regressions the
    // way round 12's unquantized line once did). Shares the sq8
    // replay oracle: serving later does not change the answer.
    QueryDef("sim_topk_indexed_serve_sq8", PipelineQueries13.sq8IndexedSql) {
      (s, dir) => {
        val d = standing.computeIfAbsent(s"$dir#sq8", _ => {
          val p = idxDir("graft-ivf-standing-sq8", dir)
          Similarity.buildIvfIndex(W.read(s, dir, "embeddings"), p,
            kCells = kmK, iters = 2, codec = "sq8")
          p
        })
        Similarity.indexedTopK(s,
            W.read(s, dir, "embeddings").filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },

    // SERVE-ONLY over the standing RESIDUAL-PQ index: per-(query, cell)
    // residual LUT + ADC + exact rescore against a session-standing
    // codec="pqr" index — the deepest codec's serve number, measured
    // apart from its (dominant) coarse+codebook training cost.
    QueryDef("sim_topk_indexed_serve_pqr", PipelineQueries13.pqrIndexedSql) {
      (s, dir) => {
        val d = standing.computeIfAbsent(s"$dir#pqr", _ => {
          val p = idxDir("graft-ivf-standing-pqr", dir)
          Similarity.buildIvfIndex(W.read(s, dir, "embeddings"), p,
            kCells = kmK, iters = 2, codec = "pqr", pqM = pqM,
            pqKs = pqKs, pqIters = pqIters)
          p
        })
        Similarity.indexedTopK(s,
            W.read(s, dir, "embeddings").filter(col("vec_id") < 8), d,
            k = k, nprobe = 2, candMult = candMult)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    },


    // Hybrid-retrieval fusion (RRF): two certified BM25 rankings over
    // disjoint term sets fused by reciprocal rank — the operator is
    // ranking-agnostic (RetrievalSpec composes it with a VECTOR
    // ranking), and fusing two replayable lexical rankings lets the
    // oracle certify the fusion arithmetic itself: both chains, the
    // full-outer rank meet, the fixed-order 1/(60+r) sum, the final
    // top-10. Rank-based fusion needs no score calibration — BM25
    // micro-units and cosines never meet.
    QueryDef("retr_rrf_fusion",
      PipelineQueries.withC(PipelineQueries.tokDocs + ",\n" +
        s"""bdl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
           |         FROM tok_docs),
           |bst AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(dl) AS BIGINT) AS sdl FROM bdl),
           |${bmChain("b1", termsA)},
           |${bmChain("b2", termsB)},
           |fused AS (
           |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           |    round(coalesce(1.0 / ($rrfC.0 + CAST(a.rk AS DOUBLE)), 0)
           |      + coalesce(1.0 / ($rrfC.0 + CAST(b.rk AS DOUBLE)), 0), 9)
           |      AS rrf_score
           |  FROM b1rk a FULL OUTER JOIN b2rk b ON a.doc_id = b.doc_id)"""
          .stripMargin)(
        s"""SELECT doc_id, rrf_score, CAST(rank AS BIGINT) AS rank FROM (
           |  SELECT doc_id, rrf_score,
           |    row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
           |  FROM fused)
           |WHERE rank <= $fuseK""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        TextAnalysis.rrfFuse(Seq(
            TextAnalysis.bm25TopK(docs, termsA, bmN, bmK1, bmB),
            TextAnalysis.bm25TopK(docs, termsB, bmN, bmK1, bmB)),
          k = fuseK, rrfK = rrfC)
      }
    },

    // Multi-word binary sketch (dim > 64 — the extension binaryTopK
    // used to refuse): vectors widened to 128 dims (v || reverse(v),
    // deterministic in both engines) pack into two 64-bit words and
    // pre-rank by the word-folded Hamming distance. The oracle scores
    // Hamming as the positional sign-disagreement count — bit-packing
    // is a bijection on sign patterns, so the counts are identical by
    // construction — and replays pre-rank + exact rescore end to end.
    QueryDef("sim_topk_binary_wide",
      s"""WITH ew AS (
         |  SELECT vec_id, label, (v || list_reverse(v)) AS v
         |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |        FROM embeddings)),
         |e2 AS (SELECT vec_id, label, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM ew),
         |ben AS (SELECT * FROM e2 WHERE nrm > 0),
         |bcand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(generate_series(1, len(q.v)),
         |          i -> CASE WHEN (q.v[i] > 0) <> (c.v[i] > 0)
         |               THEN 1 ELSE 0 END)),
         |        c.vec_id) AS crk
         |    FROM (SELECT * FROM ben WHERE vec_id < 8) q
         |    JOIN ben c ON c.label = q.label AND c.vec_id <> q.vec_id)
         |  WHERE crk <= ${8 * k})
         |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT b.q_id, b.c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY b.q_id
         |      ORDER BY round(list_sum(list_transform(
         |          generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
         |          / (q.nrm * c.nrm), 6) DESC, b.c_id) AS rank
         |  FROM bcand b JOIN ben q ON q.vec_id = b.q_id
         |               JOIN ben c ON c.vec_id = b.c_id)
         |WHERE rank <= $k""".stripMargin) {
      (s, dir) => {
        val wide = W.read(s, dir, "embeddings")
          .withColumn("embedding",
            concat(col("embedding"), reverse(col("embedding"))))
        Similarity.binaryTopK(wide.filter(col("vec_id") < 8), wide,
            k, candMult = 8)
          .select("q_id", "c_id", "cos_sim", "rank")
      }
    }
  )

  /** The persisted-PQ replay, shared by `sim_topk_indexed_pq` and the
    * standing-index `sim_topk_indexed_serve_pq` (same result by
    * construction — serving later does not change the answer). */
  // lazy: referenced by `defs` above it in initialization order
  private[queries] lazy val pqIndexedSql: String =
      s"""WITH $kmeansCtes,
         |$nrmQnCtes,
         |en AS (
         |  SELECT n.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM nrm n JOIN af a USING (vec_id) WHERE n.nrm > 0),
         |sub AS MATERIALIZED (
         |  SELECT vec_id, s,
         |    list_slice(v, s * $pqSubDim + 1, s * $pqSubDim + $pqSubDim)
         |      AS subv
         |  FROM en, range(0, $pqM) r(s)),
         |ids AS (
         |  SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
         |  FROM (SELECT vec_id FROM en ORDER BY vec_id LIMIT $pqKs)),
         |pc0 AS (SELECT sub.s, ids.cid, sub.subv AS cv
         |        FROM sub JOIN ids USING (vec_id)),
         |${pqAssign("pc0", "pa1")},
         |${pqRecenter("pa1", "pc1")},
         |${pqAssign("pc1", "pa2")},
         |${pqRecenter("pa2", "pc2")},
         |${pqAssign("pc2", "pcodes")},
         |$probesCte,
         |lut AS MATERIALIZED (
         |  SELECT qs.vec_id AS q_id, c.s, c.cid,
         |    CAST(round(${pqSqd("qs.subv", "c.cv")} * 1000000.0) AS BIGINT)
         |      AS ld
         |  FROM sub qs JOIN pc2 c ON c.s = qs.s
         |  WHERE qs.vec_id < 8),
         |adist AS MATERIALIZED (
         |  SELECT p.q_id, kk.vec_id AS c_id, sum(l.ld) AS ad
         |  FROM pcodes kk JOIN en ce ON ce.vec_id = kk.vec_id
         |  JOIN probes p ON p.cell = ce.cell AND p.q_id <> kk.vec_id
         |  JOIN lut l ON l.q_id = p.q_id AND l.s = kk.s AND l.cid = kk.cid
         |  GROUP BY p.q_id, kk.vec_id),
         |cand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY ad, c_id)
         |        AS crk
         |    FROM adist) WHERE crk <= ${candMult * k})
         |$rescoreSelect""".stripMargin

  /** The persisted-SQ8 replay, shared by `sim_topk_indexed_sq8` and the
    * standing-index `sim_topk_indexed_serve_sq8` (same result by
    * construction — serving later does not change the answer). */
  // lazy: referenced by `defs` above it in initialization order
  private[queries] lazy val sq8IndexedSql: String =
      s"""WITH $kmeansCtes,
         |$nrmQnCtes,
         |eq AS (
         |  SELECT n.vec_id, a.cid AS cell, n.v, n.nrm,
         |    list_transform(n.v, x ->
         |      greatest(least(CAST(round(x / n.nrm * 127) AS BIGINT), 127),
         |        -127)) AS qv
         |  FROM nrm n JOIN af a USING (vec_id) WHERE n.nrm > 0),
         |$probesCte,
         |cand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT p.q_id, c.vec_id AS c_id,
         |      row_number() OVER (PARTITION BY p.q_id ORDER BY
         |        list_sum(list_transform(generate_series(1, len(q.qv)),
         |          j -> q.qv[j] * c.qv[j])) DESC, c.vec_id) AS crk
         |    FROM probes p JOIN eq c ON c.cell = p.cell
         |    JOIN eq q ON q.vec_id = p.q_id
         |    WHERE p.q_id <> c.vec_id)
         |  WHERE crk <= ${candMult * k})
         |$rescoreSelect""".stripMargin

  /** The persisted residual-PQ replay, shared by `sim_topk_indexed_pqr`
    * and the standing-index `sim_topk_indexed_serve_pqr` (same result
    * by construction — serving later does not change the answer). */
  // lazy: referenced by `defs` above it in initialization order
  private[queries] lazy val pqrIndexedSql: String =
      s"""WITH $kmeansCtes,
         |$nrmQnCtes,
         |en AS (
         |  SELECT n.vec_id, a.cid AS cell, n.v, n.nrm
         |  FROM nrm n JOIN af a USING (vec_id) WHERE n.nrm > 0),
         |rsd AS (
         |  SELECT en.vec_id, en.cell,
         |    list_transform(generate_series(1, len(en.v)),
         |      i -> en.v[i] - c.v[i]) AS v
         |  FROM en JOIN c2 c ON c.cid = en.cell),
         |sub AS MATERIALIZED (
         |  SELECT vec_id, s,
         |    list_slice(v, s * $pqSubDim + 1, s * $pqSubDim + $pqSubDim)
         |      AS subv
         |  FROM rsd, range(0, $pqM) r(s)),
         |ids AS (
         |  SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
         |  FROM (SELECT vec_id FROM en ORDER BY vec_id LIMIT $pqKs)),
         |pc0 AS (SELECT sub.s, ids.cid, sub.subv AS cv
         |        FROM sub JOIN ids USING (vec_id)),
         |${pqAssign("pc0", "pa1")},
         |${pqRecenter("pa1", "pc1")},
         |${pqAssign("pc1", "pa2")},
         |${pqRecenter("pa2", "pc2")},
         |${pqAssign("pc2", "pcodes")},
         |$probesCte,
         |rqv AS (
         |  SELECT p.q_id, p.cell,
         |    list_transform(generate_series(1, len(q.v)),
         |      i -> q.v[i] - c.v[i]) AS v
         |  FROM probes p JOIN qn q ON q.vec_id = p.q_id
         |  JOIN c2 c ON c.cid = p.cell),
         |rsub AS (
         |  SELECT q_id, cell, s,
         |    list_slice(v, s * $pqSubDim + 1, s * $pqSubDim + $pqSubDim)
         |      AS subv
         |  FROM rqv, range(0, $pqM) r(s)),
         |lut AS MATERIALIZED (
         |  SELECT r.q_id, r.cell, c.s, c.cid,
         |    CAST(round(${pqSqd("r.subv", "c.cv")} * 1000000.0) AS BIGINT)
         |      AS ld
         |  FROM rsub r JOIN pc2 c ON c.s = r.s),
         |adist AS MATERIALIZED (
         |  SELECT l.q_id, kk.vec_id AS c_id, sum(l.ld) AS ad
         |  FROM pcodes kk JOIN en ce ON ce.vec_id = kk.vec_id
         |  JOIN lut l ON l.cell = ce.cell AND l.s = kk.s
         |            AND l.cid = kk.cid AND l.q_id <> kk.vec_id
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY ad, c_id)
         |        AS crk
         |    FROM adist) WHERE crk <= ${candMult * k})
         |$rescoreSelect""".stripMargin

}
