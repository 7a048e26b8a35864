package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Packing, Sampling, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-8 second batch: the full Gopher repetition-rule bundle (Rae et
 * al. 2021, table A1), SoftDedup duplicate down-weighting (He et al.
 * 2024), length-bucketed inference batching, and the Zipf/Heaps corpus
 * health report. Every oracle replays the complete computation — the
 * nine n-gram families, the coverage distinct-fold, the regression
 * sums — so the hash-match certifies the algorithm, not a summary.
 */
object PipelineQueries8 {

  import PipelineQueries.{tokDocs, withC}

  private val softAlpha = 1.0
  private val softSalt = "softdedup"

  private val lbBatch = 16
  private val lbShards = 8
  private val lbSalt = "lenbatch"

  private val zipfTopK = 1000

  /** DuckDB twin of the length-tier CASE over [[Packing.lengthTierBounds]]. */
  private val duckTier = {
    val whens = Packing.lengthTierBounds.zipWithIndex
      .map { case (b, i) => s"WHEN n_tokens < $b THEN $i" }
      .mkString(" ")
    s"CAST(CASE $whens ELSE ${Packing.lengthTierBounds.size} END AS INT)"
  }

  /** The five regression-sum → slope/r² assembly expressions, written
    * once and inlined into the oracle so both engines run the
    * IDENTICAL double arithmetic over the same exact integer sums. */
  private val zNum = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
  private val zDenX = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
  private val zDenY = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"

  private def gopherPassSql: String =
    (Seq(s"dup_line_frac <= ${TextAnalysis.gopherLineLimit}",
      s"dup_line_char_frac <= ${TextAnalysis.gopherLineCharLimit}") ++
      Seq(2, 3, 4).map(n =>
        s"top_${n}gram_char_frac <= ${TextAnalysis.gopherTopLimits(n)}") ++
      (5 to 10).map(n =>
        s"dup_${n}gram_char_frac <= ${TextAnalysis.gopherDupLimits(n)}"))
      .mkString("\n    AND ")

  val defs: Seq[QueryDef] = Seq(

    // ---- Gopher repetition-rule bundle ------------------------------------

    QueryDef("t_gopher_repetition", withC(tokDocs + ",\n" +
      s"""relined AS (SELECT doc_id, toks,
         |  ${PipelineQueries4.duckRelined} AS text2 FROM tok_docs),
         |lstats AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
         |      AS tok_chars,
         |    CAST(len(string_split(text2, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(string_split(text2, chr(10)))
         |      - len(list_distinct(string_split(text2, chr(10)))) AS BIGINT)
         |      AS n_dup_lines,
         |    CAST(list_sum(list_transform(string_split(text2, chr(10)),
         |      l -> length(l))) AS BIGINT) AS line_chars,
         |    CAST(list_sum(list_transform(string_split(text2, chr(10)),
         |        l -> length(l)))
         |      - list_sum(list_transform(
         |          list_distinct(string_split(text2, chr(10))),
         |          l -> length(l))) AS BIGINT) AS dup_line_chars
         |  FROM relined),
         |ns AS (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n),
         |gx AS (
         |  SELECT doc_id, n,
         |    unnest(generate_series(1, len(toks) - n + 1)) AS i, toks
         |  FROM tok_docs, ns WHERE len(toks) >= n),
         |grams AS (
         |  SELECT doc_id, n, i,
         |    array_to_string(list_slice(toks, i, i + n - 1), ' ') AS g
         |  FROM gx),
         |gc AS (
         |  SELECT doc_id, n, md5(g) AS gh, count(*) AS c,
         |    CAST(min(length(g)) - (n - 1) AS BIGINT) AS glen
         |  FROM grams GROUP BY doc_id, n, md5(g)),
         |top AS (
         |  SELECT doc_id, n, CAST(c * glen AS BIGINT) AS top_chars FROM (
         |    SELECT doc_id, n, c, glen,
         |      row_number() OVER (PARTITION BY doc_id, n
         |        ORDER BY c DESC, glen DESC, gh DESC) AS rn
         |    FROM gc WHERE n <= 4) t WHERE rn = 1),
         |topw AS (
         |  SELECT doc_id,
         |    max(CASE WHEN n = 2 THEN top_chars END) AS top2,
         |    max(CASE WHEN n = 3 THEN top_chars END) AS top3,
         |    max(CASE WHEN n = 4 THEN top_chars END) AS top4
         |  FROM top GROUP BY doc_id),
         |cov AS (
         |  SELECT DISTINCT doc_id, n, p FROM (
         |    SELECT g.doc_id, g.n,
         |      unnest(generate_series(g.i, g.i + g.n - 1)) AS p
         |    FROM grams g JOIN gc ON gc.doc_id = g.doc_id
         |      AND gc.n = g.n AND gc.gh = md5(g.g)
         |    WHERE gc.c >= 2 AND g.n >= 5) q),
         |tokc AS (
         |  SELECT doc_id, p, length(toks[p]) AS tl FROM (
         |    SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks))) AS p
         |    FROM tok_docs) q),
         |covw AS (
         |  SELECT c2.doc_id,
         |    CAST(sum(CASE WHEN c2.n = 5 THEN tk.tl END) AS BIGINT) AS cov5,
         |    CAST(sum(CASE WHEN c2.n = 6 THEN tk.tl END) AS BIGINT) AS cov6,
         |    CAST(sum(CASE WHEN c2.n = 7 THEN tk.tl END) AS BIGINT) AS cov7,
         |    CAST(sum(CASE WHEN c2.n = 8 THEN tk.tl END) AS BIGINT) AS cov8,
         |    CAST(sum(CASE WHEN c2.n = 9 THEN tk.tl END) AS BIGINT) AS cov9,
         |    CAST(sum(CASE WHEN c2.n = 10 THEN tk.tl END) AS BIGINT) AS cov10
         |  FROM cov c2 JOIN tokc tk ON tk.doc_id = c2.doc_id AND tk.p = c2.p
         |  GROUP BY c2.doc_id),
         |f AS (
         |  SELECT l.doc_id,
         |    CASE WHEN n_lines > 0
         |      THEN round(CAST(n_dup_lines AS DOUBLE) / n_lines, 6)
         |      ELSE 0.0 END AS dup_line_frac,
         |    CASE WHEN line_chars > 0
         |      THEN round(CAST(dup_line_chars AS DOUBLE) / line_chars, 6)
         |      ELSE 0.0 END AS dup_line_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(top2, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS top_2gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(top3, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS top_3gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(top4, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS top_4gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov5, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_5gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov6, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_6gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov7, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_7gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov8, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_8gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov9, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_9gram_char_frac,
         |    CASE WHEN tok_chars > 0
         |      THEN round(CAST(coalesce(cov10, 0) AS DOUBLE) / tok_chars, 6)
         |      ELSE 0.0 END AS dup_10gram_char_frac
         |  FROM lstats l
         |  LEFT JOIN topw USING (doc_id)
         |  LEFT JOIN covw USING (doc_id))""".stripMargin)(
      s"""SELECT f.*, ($gopherPassSql) AS gopher_pass
         |FROM f""".stripMargin)) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), PipelineQueries4.relined.as("text"),
          col("toks"))
      TextAnalysis.gopherRepetition(docs)
    },

    // ---- SoftDedup duplicate down-weighting -------------------------------

    QueryDef("samp_soft_dedup",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fpr
         |  FROM documents),
         |counts AS (
         |  SELECT fpr, CAST(count(*) AS BIGINT) AS dup_count
         |  FROM fp GROUP BY 1),
         |j AS (
         |  SELECT doc_id, dup_count,
         |    round(power(dup_count, -$softAlpha), 6) AS weight
         |  FROM fp JOIN counts USING (fpr))
         |SELECT doc_id, dup_count, weight FROM j
         |WHERE ${PipelineQueries2.duckHash32(softSalt)}
         |  < CAST(round(weight * 4294967296.0) AS BIGINT)""".stripMargin) {
      (s, dir) =>
        Sampling.softDedupSample(W.read(s, dir, "documents"),
          alpha = softAlpha, salt = softSalt)
    },

    // ---- length-bucketed inference batching -------------------------------

    QueryDef("pack_length_buckets", withC(tokDocs + ",\n" +
      s"""tl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
         |  FROM tok_docs),
         |assigned AS (
         |  SELECT doc_id, n_tokens, $duckTier AS tier,
         |    CAST(${PipelineQueries2.duckHash32(lbSalt)} % $lbShards AS INT)
         |      AS shard
         |  FROM tl),
         |rn AS (
         |  SELECT tier, shard, n_tokens,
         |    row_number() OVER (PARTITION BY tier, shard
         |      ORDER BY n_tokens DESC, doc_id) AS r
         |  FROM assigned),
         |b AS (SELECT tier, shard, CAST((r - 1) // $lbBatch AS BIGINT)
         |  AS batch_id, n_tokens FROM rn)""".stripMargin)(
      s"""SELECT tier, shard, batch_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(n_tokens) AS BIGINT) AS max_len,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_len,
         |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
         |    AS pad_tokens,
         |  CASE WHEN count(*) * max(n_tokens) > 0
         |    THEN round(CAST(count(*) * max(n_tokens) - sum(n_tokens)
         |      AS DOUBLE) / (count(*) * max(n_tokens)), 6)
         |    ELSE 0.0 END AS pad_frac
         |FROM b GROUP BY 1, 2, 3""".stripMargin)) { (s, dir) =>
      Packing.lengthBuckets(
        W.read(s, dir, "documents").select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tokens")),
        batchSize = lbBatch, shards = lbShards, salt = lbSalt)
    },

    // ---- Zipf/Heaps corpus health report ----------------------------------

    QueryDef("report_zipf",
      s"""WITH toks AS (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |    AS tok FROM documents),
         |counts AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |totals AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens_total,
         |    CAST(count(*) AS BIGINT) AS vocab FROM counts),
         |top AS (
         |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, tok)
         |    AS BIGINT) AS rank
         |  FROM counts ORDER BY c DESC, tok LIMIT $zipfTopK),
         |pts AS (
         |  SELECT CAST(round(ln(rank) * 1e6) AS BIGINT) AS x,
         |    CAST(round(ln(c) * 1e6) AS BIGINT) AS y FROM top),
         |sums AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM pts)
         |SELECT t.n_tokens_total, t.vocab, s.n AS top_k,
         |  round($zNum / $zDenX, 6) AS zipf_slope,
         |  round(($zNum * $zNum) / ($zDenX * $zDenY), 6) AS zipf_r2,
         |  round(ln(CAST(t.vocab AS DOUBLE))
         |    / ln(CAST(t.n_tokens_total AS DOUBLE)), 6) AS heaps_beta
         |FROM sums s, totals t""".stripMargin) { (s, dir) =>
      CorpusReport.zipfReport(W.read(s, dir, "documents"), topK = zipfTopK)
    })
}
