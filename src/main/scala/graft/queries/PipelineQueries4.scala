package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, Packing, Similarity, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-5 repeated-content + sequence-prep operators as oracle-checked
 * queries: corpus-wide line-level dedup (the MassiveText/RefinedWeb
 * boilerplate rule), duplicated-span detection (the distributable
 * stand-in for suffix-array exact-substring dedup), unigram-LM document
 * scoring (the CCNet perplexity proxy), and overlapping fixed-width
 * chunking.
 *
 * The synthetic corpus has no newlines, so the line-dedup query first
 * RE-LINES each document deterministically (a '\n' every 8 tokens, pure
 * column math mirrored in the oracle) and then runs the production
 * newline-splitting operator unchanged — the operator's real code path
 * is what's verified.
 */
object PipelineQueries4 {

  import PipelineQueries.{tokDocs, withC}

  private val lineWidth = 8
  private val lineMaxOcc = 1L
  private val spanW = 8
  private val chunkSize = 32
  private val chunkStride = 24
  private val annK = 5
  private val annCandMult = 4

  /** Spark re-liner: '\n' every `lineWidth` tokens of the normalized
    * text. `toks` must be a materialized column. */
  private[queries] def relined = array_join(
    transform(
      sequence(lit(0L),
        ceil(size(col("toks")).cast("double") / lineWidth).cast("long") - 1),
      g => concat_ws(" ",
        slice(col("toks"), (g * lineWidth + 1).cast("int"), lit(lineWidth)))),
    "\n")

  /** DuckDB twin of [[relined]] over tok_docs. */
  private[queries] val duckRelined =
    s"""array_to_string(list_transform(
       |    generate_series(0, CAST(ceil(len(toks) / $lineWidth.0) AS BIGINT) - 1),
       |    g -> array_to_string(list_slice(toks, g*$lineWidth + 1, g*$lineWidth + $lineWidth), ' ')),
       |  chr(10))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- line-level corpus dedup ------------------------------------------

    QueryDef("dedup_lines", withC(tokDocs + ",\n" +
      s"""relined AS (SELECT doc_id, $duckRelined AS text2 FROM tok_docs),
         |lx AS (
         |  SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS pos
         |  FROM (SELECT doc_id, string_split(text2, chr(10)) AS ls FROM relined)),
         |lines AS (SELECT doc_id, pos, ls[pos] AS line FROM lx),
         |freq AS (SELECT md5(line) AS lh, count(*) AS c FROM lines GROUP BY 1),
         |kept AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(line, chr(10) ORDER BY pos) AS text_dedup
         |  FROM lines JOIN freq ON md5(line) = lh
         |  WHERE c <= $lineMaxOcc GROUP BY doc_id),
         |stats AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1)""".stripMargin)(
      """SELECT s.doc_id, s.n_lines,
        |  s.n_lines - coalesce(k.n_kept, 0) AS n_removed,
        |  coalesce(k.text_dedup, '') AS text_dedup
        |FROM stats s LEFT JOIN kept k USING (doc_id)""".stripMargin)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("doc_id"), relined.as("text"))
        Boilerplate.lineDedup(docs, maxOcc = lineMaxOcc)
    },

    // ---- duplicated-span detection ----------------------------------------

    QueryDef("dedup_spans", withC(tokDocs + ",\n" +
      s"""wx AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks) - ${spanW - 1})) AS i
         |  FROM tok_docs),
         |wins AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_slice(toks, i, i + ${spanW - 1}), ' ')) AS wh
         |  FROM wx),
         |freq AS (SELECT wh, count(*) AS c FROM wins GROUP BY 1),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_windows,
         |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_windows
         |  FROM wins JOIN freq USING (wh) GROUP BY doc_id)""".stripMargin)(
      """SELECT d.doc_id,
        |  coalesce(p.n_windows, 0) AS n_windows,
        |  coalesce(p.n_dup_windows, 0) AS n_dup_windows,
        |  CASE WHEN coalesce(p.n_windows, 0) > 0
        |    THEN round(CAST(p.n_dup_windows AS DOUBLE) / p.n_windows, 6)
        |    ELSE 0.0 END AS dup_frac
        |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Boilerplate.dupSpanStats(docs, w = spanW)
    },

    // ---- unigram-LM scoring (perplexity proxy) ----------------------------

    QueryDef("t_unigram_nll", withC(tokDocs + ",\n" +
      """tok AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs),
        |counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |nll AS (
        |  SELECT tok,
        |    CAST(round(-ln(CAST(c AS DOUBLE) /
        |      (SELECT CAST(sum(c) AS DOUBLE) FROM counts)) * 1e6) AS BIGINT)
        |      AS nll_micro
        |  FROM counts)""".stripMargin)(
      """SELECT doc_id, count(*) AS n_tok,
        |  CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum,
        |  round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
        |    AS mean_nll
        |FROM tok JOIN nll USING (tok) GROUP BY doc_id""".stripMargin)) {
      (s, dir) => TextAnalysis.unigramNll(W.read(s, dir, "documents"))
    },

    // ---- overlapping fixed-width chunking ---------------------------------

    QueryDef("pack_chunks", withC(tokDocs + ",\n" +
      s"""cx AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(0, greatest(
         |      CAST(floor((len(toks) - $chunkSize + ${chunkStride - 1})
         |        / $chunkStride.0) AS BIGINT), 0))) AS chunk_idx
         |  FROM tok_docs)""".stripMargin)(
      s"""SELECT doc_id, chunk_idx,
         |  least($chunkSize, len(toks) - chunk_idx * $chunkStride) AS n_tokens,
         |  array_to_string(list_slice(toks,
         |    chunk_idx * $chunkStride + 1,
         |    chunk_idx * $chunkStride + $chunkSize), ' ') AS chunk_text
         |FROM cx""".stripMargin)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Packing.chunk(docs, chunkSize = chunkSize, stride = chunkStride)
    },

    // ---- IVF + SQ8 quantized ANN ------------------------------------------

    // The oracle replays the full quantized pipeline: symmetric int8
    // quantization of the normalized vector (clamped to ±127),
    // integer-dot pre-rank to candMult*k per query, exact-cosine rescore
    // to k — quantization loss reproduced bit-for-bit.
    QueryDef("sim_topk_sq8", withC(PipelineQueries.embDouble + ",\n" +
      s"""eq AS (
         |  SELECT vec_id, label, v, nrm,
         |    list_transform(v, x ->
         |      greatest(least(CAST(round(x / nrm * 127) AS BIGINT), 127),
         |        -127)) AS qv
         |  FROM e WHERE nrm > 0),
         |cand AS (
         |  SELECT q_id, cell, c_id, q_v, q_nrm, c_v, c_nrm FROM (
         |    SELECT q.vec_id AS q_id, q.label AS cell, c.vec_id AS c_id,
         |      q.v AS q_v, q.nrm AS q_nrm, c.v AS c_v, c.nrm AS c_nrm,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(generate_series(1, len(q.qv)),
         |          j -> q.qv[j] * c.qv[j])) DESC, c.vec_id) AS crk
         |    FROM (SELECT * FROM eq WHERE vec_id < 8) q
         |    JOIN eq c ON q.label = c.label AND q.vec_id <> c.vec_id)
         |  WHERE crk <= ${annCandMult * annK})""".stripMargin)(
      s"""SELECT q_id, cell, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT q_id, cell, c_id,
         |    round(list_sum(list_transform(generate_series(1, len(q_v)),
         |      i -> q_v[i] * c_v[i])) / (q_nrm * c_nrm), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY
         |      round(list_sum(list_transform(generate_series(1, len(q_v)),
         |        i -> q_v[i] * c_v[i])) / (q_nrm * c_nrm), 6) DESC, c_id)
         |      AS rank
         |  FROM cand)
         |WHERE rank <= $annK""".stripMargin)) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        Similarity.sq8TopK(emb.filter(col("vec_id") < 8), emb, annK,
            candMult = annCandMult)
          .select("q_id", "cell", "c_id", "cos_sim", "rank")
      }
    })
}
