package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Classifier, Decontamination, Dedup, Sampling, Similarity}
import graft.sim.{WarehouseSim => W}
import graft.streaming.QualityMonitor

/**
 * Round-6 batch: the learned quality filter ([[Classifier]]) as
 * oracle-checked queries. The DuckDB oracle REPLAYS TRAINING — all
 * `iters` full-batch GD steps as unrolled CTEs over integer micro-unit
 * weight tables (the same discipline as the BPE-learn replay) — so the
 * hash-match certifies the training trajectory and the calibration
 * sweep, not just a final projection.
 *
 * Cross-engine float parity: logits are exact BIGINT micro-unit sums;
 * the only engine-ordered float reductions are the per-bucket gradient
 * sums, quantized to one micro-unit (`round()` half-away-from-zero in
 * both engines) before they touch the model.
 */
object PipelineQueries6 {

  private val lrDims = 256
  private val lrIters = 8
  private val lrRate = 0.02
  private val lrBeta = 0.9
  private val lrSampRate = 0.25
  private val lrSampSalt = "ctrain"
  private val lrSampThresh = Sampling.rateThreshold(lrSampRate)
  private val monEpoch = 1700000000L
  private val monSpreadS = 7200L
  // mix report shares samp_weighted_mix's config shape; thresholds are
  // computed ONCE here and inlined into both engines
  private val mixW = Map("src0" -> 0.05, "src1" -> 0.5, "src2" -> 0.9)
  private val mixDefault = 1.0
  private def mixThrSql: String =
    mixW.toSeq.sortBy(_._1).foldRight(
      Sampling.rateThreshold(mixDefault).toString) {
      case ((s, r), rest) =>
        s"CASE WHEN source = '$s' THEN ${Sampling.rateThreshold(r)} " +
          s"ELSE $rest END"
    }
  private def mixRateSql: String =
    mixW.toSeq.sortBy(_._1).foldRight(s"CAST($mixDefault AS DOUBLE)") {
      case ((s, r), rest) =>
        s"CASE WHEN stratum = '$s' THEN CAST($r AS DOUBLE) ELSE $rest END"
    }

  private val splitFracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val splitBounds = splitFracs.map(_._2).scanLeft(0.0)(_ + _).tail
    .map(Sampling.rateThreshold)
  private val deconMinShared = 3
  private val deconMaxDf = 100

  private val pqM = 8
  private val pqSubDim = 8 // testdata embeddings are dim 64
  private val pqKs = 16
  private val pqIters = 2
  private val pqK = 5
  private val pqCandMult = 4

  /** Sequential-fold squared L2 over one subspace (index order —
    * bit-identical to the Spark fold). */
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

  /** Full IVF-PQ replay: subvectors → per-subspace codebook training
    * (2 Lloyd's iterations, lowest-id init) → encode → per-query ADC
    * LUT in integer micro-units → cell-routed candidate ranking. */
  private val pqCtes =
    s"""${PipelineQueries.embDouble},
       |en AS (SELECT vec_id, label, v, nrm FROM e WHERE nrm > 0),
       |sub AS MATERIALIZED (
       |  SELECT vec_id, s,
       |    list_slice(v, s * $pqSubDim + 1, s * $pqSubDim + $pqSubDim) AS subv
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
       |lut AS MATERIALIZED (
       |  SELECT qe.vec_id AS q_id, qe.label AS q_cell, c.s, c.cid,
       |    CAST(round(${pqSqd("qs.subv", "c.cv")} * 1000000.0) AS BIGINT) AS ld
       |  FROM (SELECT vec_id, label FROM en WHERE vec_id < 8) qe
       |  JOIN sub qs ON qs.vec_id = qe.vec_id
       |  JOIN pc2 c ON c.s = qs.s),
       |adist AS MATERIALIZED (
       |  SELECT l.q_id, min(l.q_cell) AS cell, k.vec_id AS c_id,
       |    sum(l.ld) AS ad
       |  FROM pcodes k JOIN en ce ON ce.vec_id = k.vec_id
       |  JOIN lut l ON l.s = k.s AND l.cid = k.cid AND l.q_cell = ce.label
       |            AND l.q_id <> k.vec_id
       |  GROUP BY l.q_id, k.vec_id),
       |cand AS (
       |  SELECT q_id, cell, c_id FROM (
       |    SELECT q_id, cell, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY ad, c_id) AS crk
       |    FROM adist) WHERE crk <= ${pqCandMult * pqK})""".stripMargin

  /** Per-token hashed bucket rows; md5 computed once per token row, the
    * hex→int expansion referencing the alias. */
  private val tkCte =
    s"""tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, ${PipelineQueries2.duckHex32("h")} % $lrDims AS j
       |  FROM (SELECT doc_id, md5('feat:' || t) AS h FROM tok
       |        WHERE regexp_matches(t, '^[a-z0-9]+$$')))""".stripMargin

  /** The unrolled training replay ending in a `scores` CTE:
    * base → w0 (all-zeros weights AND velocities, bias at j = −1) →
    * per-iteration (wa/bb weight array, z residuals, g gradients,
    * heavy-ball velocity + weight update in micro-units). */
  private def lrCtes(iters: Int, trainPred: String = "TRUE"): String = {
    val logit = (wAlias: String) =>
      s"CAST(bb.bw + coalesce(list_sum(list_transform(js, x -> $wAlias.wa[x + 1])), 0) AS DOUBLE) / 1000000.0"
    // `trn` is the training slice (defaults to the whole corpus); the
    // final `scores` CTE always reads `base` — the sampled variant
    // trains on the slice and scores everything, like the Spark side
    val base =
      s"""$tkCte,
         |base AS MATERIALIZED (
         |  SELECT d.doc_id, CAST(d.lang = 'en' AS INT) AS y,
         |    coalesce(f.js, CAST([] AS BIGINT[])) AS js
         |  FROM documents d LEFT JOIN (
         |    SELECT doc_id, list_sort(list(j)) AS js
         |    FROM tk GROUP BY doc_id) f USING (doc_id)),
         |trn AS (SELECT * FROM base WHERE $trainPred),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM trn),
         |w0 AS (SELECT CAST(j AS BIGINT) AS j, CAST(0 AS BIGINT) AS wt,
         |         CAST(0 AS BIGINT) AS vt
         |       FROM range(-1, $lrDims) r(j))""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""wa$i AS (SELECT list(wt ORDER BY j) AS wa FROM w${i - 1} WHERE j >= 0),
         |bb$i AS (SELECT wt AS bw FROM w${i - 1} WHERE j = -1),
         |z$i AS MATERIALIZED (
         |  SELECT doc_id, y, js,
         |    1.0/(1.0 + exp(-(${logit(s"wa$i")}))) - CAST(y AS DOUBLE) AS r
         |  FROM trn, wa$i, bb$i bb),
         |g$i AS MATERIALIZED (
         |  SELECT j, sum(r) AS s FROM (
         |    SELECT unnest(list_append(js, CAST(-1 AS BIGINT))) AS j, r
         |    FROM z$i) GROUP BY j),
         |w$i AS MATERIALIZED (
         |  SELECT j, wt - CAST(round($lrRate * vtn) AS BIGINT) AS wt,
         |    CAST(vtn AS BIGINT) AS vt
         |  FROM (SELECT w.j, w.wt, round($lrBeta * w.vt
         |          + coalesce(g.s, 0.0) / (SELECT n FROM nn) * 1000000.0)
         |          AS vtn
         |        FROM w${i - 1} w LEFT JOIN g$i g USING (j)))""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$steps,
       |waF AS (SELECT list(wt ORDER BY j) AS wa FROM w$iters WHERE j >= 0),
       |bbF AS (SELECT wt AS bw FROM w$iters WHERE j = -1),
       |scores AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    round(1.0/(1.0 + exp(-(${logit("waF")}))), 6) AS score
       |  FROM base, waF, bbF bb)""".stripMargin
  }

  private def classifierSql(iters: Int): String =
    s"""WITH ${lrCtes(iters)}
       |SELECT doc_id, y AS label, score,
       |  CAST(score >= 0.5 AS INT) AS pred
       |FROM scores""".stripMargin

  private def evalSql(iters: Int): String =
    s"""WITH ${lrCtes(iters)}
       |SELECT thr, tp, fp, fn, tn, "precision", "recall",
       |  CASE WHEN "precision" IS NOT NULL AND "recall" IS NOT NULL
       |            AND "precision" + "recall" > 0
       |       THEN round(2.0 * "precision" * "recall"
       |                  / ("precision" + "recall"), 6) END AS f1
       |FROM (
       |  SELECT thr, tp, fp, fn, tn,
       |    CASE WHEN tp + fp > 0
       |         THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
       |    CASE WHEN tp + fn > 0
       |         THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS "recall"
       |  FROM (
       |    SELECT CAST(t AS DOUBLE) / 10 AS thr,
       |      CAST(sum(CASE WHEN score >= CAST(t AS DOUBLE) / 10 AND y = 1
       |        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |      CAST(sum(CASE WHEN score >= CAST(t AS DOUBLE) / 10 AND y = 0
       |        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |      CAST(sum(CASE WHEN score < CAST(t AS DOUBLE) / 10 AND y = 1
       |        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |      CAST(sum(CASE WHEN score < CAST(t AS DOUBLE) / 10 AND y = 0
       |        THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |    FROM scores, range(1, 10) r(t) GROUP BY t))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // learned quality filter: LR over hashed token features, trained by
    // replayable quantized GD — scores + 0.5-threshold verdicts
    QueryDef("t_quality_classifier", classifierSql(lrIters)) {
      (s, dir) =>
        Classifier.lrScores(W.read(s, dir, "documents"),
          dims = lrDims, iters = lrIters, lr = lrRate, beta = lrBeta)
    },

    // the 100-TB recipe: train on a hash-stable deterministic sample,
    // score the FULL corpus with the resulting weights — the oracle
    // replays the sampled trajectory (GD over the slice) and the
    // corpus-wide scoring pass end-to-end
    QueryDef("t_classifier_sampled",
      s"""WITH ${lrCtes(lrIters,
             s"${PipelineQueries2.duckHash32(lrSampSalt)} < $lrSampThresh")}
         |SELECT doc_id, y AS label, score,
         |  CAST(score >= 0.5 AS INT) AS pred
         |FROM scores""".stripMargin) {
      (s, dir) =>
        Classifier.lrScoresSampled(W.read(s, dir, "documents"),
          sampleRate = lrSampRate, dims = lrDims, iters = lrIters,
          lr = lrRate, beta = lrBeta, salt = lrSampSalt)
    },

    // calibration sweep: confusion counts + precision/recall/F1 at
    // thresholds 0.1..0.9 — the operating-point picker for the gate
    QueryDef("t_classifier_eval", evalSql(lrIters)) {
      (s, dir) =>
        Classifier.lrEval(W.read(s, dir, "documents"),
          dims = lrDims, iters = lrIters, lr = lrRate, beta = lrBeta)
    },

    // reliability buckets (calibration diagram + per-bucket ECE term):
    // per score decile, count / positives / exact-integer mean score /
    // observed rate / gap — the readout lrEval's threshold sweep can't
    // give ("is 0.8 right 80% of the time?")
    QueryDef("t_classifier_calibration",
      s"""WITH ${lrCtes(lrIters)}
         |SELECT bucket, n, pos,
         |  round(CAST(ssm AS DOUBLE) / 1000000.0 / n, 6) AS mean_score,
         |  round(CAST(pos AS DOUBLE) / n, 6) AS pos_rate,
         |  round(abs(CAST(ssm AS DOUBLE) / 1000000.0 / n
         |    - CAST(pos AS DOUBLE) / n), 6) AS gap
         |FROM (
         |  SELECT least(CAST(floor(score * 10) AS INT), 9) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS pos,
         |    CAST(sum(CAST(round(score * 1000000) AS BIGINT)) AS BIGINT)
         |      AS ssm
         |  FROM scores GROUP BY 1)""".stripMargin) {
      (s, dir) =>
        Classifier.lrCalibration(W.read(s, dir, "documents"),
          dims = lrDims, iters = lrIters, lr = lrRate, beta = lrBeta)
    },

    // windowed ingest-quality rollup, batch twin of the streaming
    // monitor (StreamingQualitySpec covers watermark/late-data); window
    // keys as epoch seconds dodge timestamp-serialization skew between
    // engines. ingest_ts derives deterministically from doc_id (spread
    // over 2 h), standing in for the feed's arrival time.
    QueryDef("st_quality_monitor",
      s"""WITH ${PipelineQueries5.gateCtes},
         |w AS (
         |  SELECT n_tokens, quality_score, fail_reason,
         |    3600 * (($monEpoch + (doc_id * 37) % $monSpreadS) // 3600)
         |      AS w_start_epoch
         |  FROM gated)
         |SELECT w_start_epoch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN fail_reason IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pass,
         |  round(1.0 - CAST(sum(CASE WHEN fail_reason IS NULL THEN 1
         |    ELSE 0 END) AS DOUBLE) / count(*), 6) AS reject_rate,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(quality_score), 6) AS avg_quality
         |FROM w GROUP BY w_start_epoch""".stripMargin) {
      (s, dir) =>
        QualityMonitor.rollup(
            W.read(s, dir, "documents").withColumn("ingest_ts",
              timestamp_seconds(
                lit(monEpoch) + (col("doc_id") * 37) % monSpreadS)))
          .select(unix_timestamp(col("w_start")).as("w_start_epoch"),
            col("n_docs"), col("n_pass"), col("reject_rate"),
            col("total_tokens"), col("avg_quality"))
    },

    // IVF-PQ: per-subspace codebooks + ADC candidate ranking + exact
    // rescore — the oracle replays codebook TRAINING, encoding, and the
    // integer-micro-unit ADC, so the hash certifies the whole index
    QueryDef("sim_topk_pq",
      s"""WITH $pqCtes
         |SELECT q_id, cell, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT c.q_id, c.cell, c.c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q.v)),
         |      i -> q.v[i] * cc.v[i])) / (q.nrm * cc.nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY c.q_id ORDER BY
         |      round(list_sum(list_transform(generate_series(1, len(q.v)),
         |        i -> q.v[i] * cc.v[i])) / (q.nrm * cc.nrm), 6) DESC, c.c_id)
         |      AS rank
         |  FROM cand c JOIN en q ON q.vec_id = c.q_id
         |  JOIN en cc ON cc.vec_id = c.c_id)
         |WHERE rank <= $pqK""".stripMargin) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        Similarity.pqTopK(emb.filter(col("vec_id") < 8), emb, pqK,
            m = pqM, ks = pqKs, iters = pqIters, candMult = pqCandMult)
          .select("q_id", "cell", "c_id", "cos_sim", "rank")
      }
    },

    // corpus snapshot diff: the replication J1 diff over two corpus
    // versions — old drops doc_id % 13 = 0 (those show as added), new
    // drops % 17 = 0 (removed) and rewrites text for % 7 = 0 (changed)
    QueryDef("dedup_corpus_diff",
      s"""WITH fpo AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      AS fp_old
         |  FROM documents WHERE doc_id % 13 <> 0),
         |fpn AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(
         |      CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)),
         |      '\\s+', ' ', 'g')) AS fp_new
         |  FROM documents WHERE doc_id % 17 <> 0)
         |SELECT coalesce(fpo.doc_id, fpn.doc_id) AS doc_id,
         |  CASE WHEN fpo.doc_id IS NULL THEN 'added'
         |       WHEN fpn.doc_id IS NULL THEN 'removed'
         |       WHEN fp_old <> fp_new THEN 'changed' END AS status
         |FROM fpo FULL OUTER JOIN fpn ON fpo.doc_id = fpn.doc_id
         |WHERE CASE WHEN fpo.doc_id IS NULL THEN 'added'
         |       WHEN fpn.doc_id IS NULL THEN 'removed'
         |       WHEN fp_old <> fp_new THEN 'changed' END IS NOT NULL"""
        .stripMargin) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        Dedup.corpusDiff(
          docs.filter(col("doc_id") % 13 =!= 0),
          docs.filter(col("doc_id") % 17 =!= 0)
            .withColumn("text", when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text"))))
      }
    },

    // incremental exact dedup: new increment (doc_id % 10 < 2, same
    // convention as dedup_minhash_incremental) admitted against the
    // standing corpus by fingerprint anti-join
    QueryDef("dedup_exact_incremental",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM documents)
         |SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
         |  CAST(count(*) AS BIGINT) AS n_dups
         |FROM fp
         |WHERE doc_id % 10 < 2 AND NOT EXISTS
         |  (SELECT 1 FROM fp c
         |   WHERE c.doc_id % 10 >= 2 AND c.fingerprint = fp.fingerprint)
         |GROUP BY fingerprint""".stripMargin) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        Dedup.exactIncremental(
          docs.filter(col("doc_id") % 10 < 2),
          docs.filter(col("doc_id") % 10 >= 2))
      }
    },

    // mix audit report: per-source volume, configured rate, and the
    // EXACT kept volume under the deterministic mix hash
    QueryDef("samp_mix_report",
      s"""WITH r AS (
         |  SELECT source AS stratum,
         |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |      AS BIGINT) AS n_toks,
         |    CASE WHEN ${PipelineQueries2.duckHash32("mix")} < $mixThrSql
         |      THEN 1 ELSE 0 END AS keep
         |  FROM documents)
         |SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(keep) AS BIGINT) AS kept_docs,
         |  CAST(sum(CASE WHEN keep = 1 THEN n_toks ELSE 0 END) AS BIGINT)
         |    AS kept_tokens,
         |  $mixRateSql AS rate,
         |  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS realized_rate
         |FROM r GROUP BY stratum""".stripMargin) {
      (s, dir) =>
        Sampling.mixReport(W.read(s, dir, "documents"), "source",
          mixW, mixDefault)
    },

    // split + decontaminate chain: assign train/val/test, strip train
    // docs leaking into the test split (rare-shingle inverted index) —
    // the hash certifies the composed eval-hygiene pipeline
    QueryDef("pipe_split_decon",
      s"""WITH ${PipelineQueries.shingled},
         |spl AS (
         |  SELECT doc_id,
         |    CASE WHEN h < ${splitBounds(0)} THEN 'train'
         |         WHEN h < ${splitBounds(1)} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, ${PipelineQueries2.duckHash32("split")} AS h
         |        FROM documents)),
         |corp AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM shingled sh
         |  JOIN spl ON sh.doc_id = spl.doc_id AND spl.split = 'train'),
         |rare AS (
         |  SELECT s FROM (SELECT s, count(*) AS df FROM corp GROUP BY s)
         |  WHERE df <= $deconMaxDf),
         |corpr AS (SELECT c.doc_id, c.s FROM corp c JOIN rare r ON c.s = r.s),
         |bench AS (
         |  SELECT sh.doc_id AS bench_id, unnest(sh.shingles) AS s
         |  FROM shingled sh
         |  JOIN spl ON sh.doc_id = spl.doc_id AND spl.split = 'test'),
         |leaks AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id, b.bench_id FROM corpr c JOIN bench b ON c.s = b.s
         |    GROUP BY c.doc_id, b.bench_id HAVING count(*) >= $deconMinShared))
         |SELECT doc_id, split FROM spl WHERE split <> 'train'
         |UNION ALL
         |SELECT doc_id, split FROM spl WHERE split = 'train'
         |  AND doc_id NOT IN (SELECT doc_id FROM leaks)""".stripMargin) {
      (s, dir) =>
        Decontamination.splitAndStrip(W.read(s, dir, "documents"),
          splitFracs, minShared = deconMinShared, maxDf = Some(deconMaxDf))
    }
  )
}
