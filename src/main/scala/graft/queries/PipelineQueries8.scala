package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Dedup, Packing, Sampling, Semantic, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-8 second batch: the full Gopher repetition-rule bundle (Rae et
 * al. 2021, table A1), SoftDedup duplicate down-weighting (He et al.
 * 2024), length-bucketed inference batching, the Zipf/Heaps corpus
 * health report, incremental SemDeDup admission, the composed
 * gopher→soft-dedup curation funnel, and the tokenizer fertility
 * report. Every oracle replays the complete computation — the nine
 * n-gram families, the coverage distinct-fold, the corpus-trained
 * Lloyd iterations, the regression sums — so the hash-match certifies
 * the algorithm, not a summary.
 */
object PipelineQueries8 {

  import PipelineQueries.{tokDocs, withC}

  private val softAlpha = 1.0
  private val softSalt = "softdedup"

  private val lbBatch = 16
  private val lbShards = 8
  private val lbSalt = "lenbatch"

  private val zipfTopK = 1000

  private val funSalt = "funnel"

  private val hvDim = 16
  private val hvCells = 8
  private val hvK = 5
  private val hvSalt = "feathash"

  private val heavyMin = 20L

  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmK = 20
  private val bmTerms = Seq("spark", "hash", "stream")
  private val bbitTau = 0.5

  /** DuckDB twin of the length-tier CASE over [[Packing.lengthTierBounds]]. */
  private val duckTier = {
    val whens = Packing.lengthTierBounds.zipWithIndex
      .map { case (b, i) => s"WHEN n_tokens < $b THEN $i" }
      .mkString(" ")
    s"CAST(CASE $whens ELSE ${Packing.lengthTierBounds.size} END AS INT)"
  }

  /** The regression-sum → slope/r² assembly expressions, written once
    * and inlined into the oracle so both engines run the IDENTICAL
    * double arithmetic over the same exact integer sums. */
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

  /** The Gopher oracle CTE chain ending in per-doc fraction frame `f` —
    * shared by `t_gopher_repetition` and the curation funnel. */
  private val gopherCtes =
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
       |  LEFT JOIN covw USING (doc_id))""".stripMargin

  // ---- incremental SemDeDup constants / CTE builders ----------------------

  private val siK = 8
  private val siIters = 2
  private val siTau = 0.3

  /** Sequential-fold squared L2 / dot over `$a.v`,`$b.v` — index order,
    * bit-identical to the Spark zip_with folds (the PQ3 discipline). */
  private def dSqd(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a.v)), j -> ($a.v[j]-$b.v[j])*($a.v[j]-$b.v[j])))"
  private def dDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a.v)), j -> $a.v[j]*$b.v[j]))"

  /** Nearest-centroid assignment CTE of `$src` against centroids `$cN`
    * (ties to the lowest cid — the array_min struct order). */
  private def dAssign(src: String, cN: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dSqd("e", "c")}, c.cid) AS rk
       |    FROM $src e CROSS JOIN $cN c) q WHERE rk = 1)""".stripMargin

  /** Re-center CTE over `$src` members, 1e-6-quantized per component. */
  private def dRecenter(aN: String, src: String, out: String): String =
    s"""${out}_m AS (
       |  SELECT a.cid, i.i, round(avg(e.v[i.i]), 6) AS m
       |  FROM $aN a JOIN $src e USING (vec_id)
       |  CROSS JOIN (SELECT unnest(generate_series(1,
       |    (SELECT len(v) FROM $src LIMIT 1))) AS i) i
       |  GROUP BY a.cid, i.i),
       |$out AS (SELECT cid, list(m ORDER BY i) AS v FROM ${out}_m GROUP BY cid)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- Gopher repetition-rule bundle ------------------------------------

    QueryDef("t_gopher_repetition", withC(tokDocs + ",\n" + gopherCtes)(
      s"""SELECT f.*, ($gopherPassSql) AS gopher_pass
         |FROM f""".stripMargin)) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), PipelineQueries4.relined.as("text"),
          col("toks"))
      TextAnalysis.gopherRepetition(docs)
    },

    // Zero-shuffle inline twin: same oracle (same answer, different
    // execution shape — a pure projection, streaming-append-legal).
    QueryDef("t_gopher_inline", withC(tokDocs + ",\n" + gopherCtes)(
      s"""SELECT f.*, ($gopherPassSql) AS gopher_pass
         |FROM f""".stripMargin)) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), PipelineQueries4.relined.as("text"),
          col("toks"))
      TextAnalysis.gopherRepetitionInline(docs)
    },

    // The native-Expression shape of the same bundle (one codegen'd JVM
    // pass per row, functions/GopherStats) — same oracle as its two
    // siblings, so the driver gate certifies the custom expression's
    // arithmetic end to end; CrossCheckSpec separately pins three-way
    // bit-equality.
    QueryDef("t_gopher_native", withC(tokDocs + ",\n" + gopherCtes)(
      s"""SELECT f.*, ($gopherPassSql) AS gopher_pass
         |FROM f""".stripMargin)) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), PipelineQueries4.relined.as("text"),
          col("toks"))
      TextAnalysis.gopherRepetitionNative(docs)
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
    },

    // ---- incremental SemDeDup admission -----------------------------------

    // Corpus = even vec_ids (the standing, already-admitted index), new
    // = odd vec_ids. The oracle retrains the corpus-side Lloyd
    // iterations from scratch and replays both dominance joins, so the
    // hash-match certifies centroid reuse + the old×old-free admission.
    QueryDef("sem_dedup_incremental",
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |ce AS (SELECT * FROM e WHERE vec_id % 2 = 0),
         |ne AS (SELECT * FROM e WHERE vec_id % 2 = 1),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
         |    AS cid, v
         |  FROM (SELECT vec_id, v FROM ce ORDER BY vec_id LIMIT $siK)),
         |${dAssign("ce", "c0", "a1")},
         |${dRecenter("a1", "ce", "c1")},
         |${dAssign("ce", "c1", "a2")},
         |${dRecenter("a2", "ce", "c2")},
         |${dAssign("ce", "c2", "caf")},
         |${dAssign("ne", "c2", "naf")},
         |nrm AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |cav AS (SELECT f.vec_id, f.cid, n.v, n.nrm
         |  FROM caf f JOIN nrm n USING (vec_id)),
         |nav AS (SELECT f.vec_id, f.cid, n.v, n.nrm
         |  FROM naf f JOIN nrm n USING (vec_id)),
         |domc AS (
         |  SELECT DISTINCT b.vec_id FROM cav a JOIN nav b ON a.cid = b.cid
         |  WHERE round(${dDot("a", "b")} / (a.nrm * b.nrm), 6) >= $siTau),
         |domn AS (
         |  SELECT DISTINCT b.vec_id FROM nav a JOIN nav b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE round(${dDot("a", "b")} / (a.nrm * b.nrm), 6) >= $siTau)
         |SELECT vec_id, cid AS cluster_id FROM naf
         |WHERE vec_id NOT IN (SELECT vec_id FROM domc
         |  UNION SELECT vec_id FROM domn)""".stripMargin) { (s, dir) =>
      val emb = W.read(s, dir, "embeddings")
      Semantic.semanticDedupIncremental(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        k = siK, iters = siIters, tau = siTau)
    },

    // ---- composed curation funnel (gopher gate → soft dedup) --------------

    // Stage 2's duplicate counts are computed over stage 1's SURVIVORS
    // (dedup after quality filtering, the production order) — the
    // oracle replays both stages end-to-end, so the hash certifies the
    // composition, not just the parts.
    QueryDef("report_curation_funnel", withC(tokDocs + ",\n" + gopherCtes +
      ",\n" +
      s"""surv AS (SELECT doc_id FROM f WHERE $gopherPassSql),
         |fp2 AS (
         |  SELECT d.doc_id,
         |    md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'))
         |      AS fpr
         |  FROM documents d JOIN surv USING (doc_id)),
         |cnt2 AS (SELECT fpr, count(*) AS c FROM fp2 GROUP BY 1),
         |keep AS (
         |  SELECT doc_id FROM (
         |    SELECT f2.doc_id, round(power(c, -$softAlpha), 6) AS wt
         |    FROM fp2 f2 JOIN cnt2 USING (fpr)) q
         |  WHERE ${PipelineQueries2.duckHash32(funSalt)}
         |    < CAST(round(wt * 4294967296.0) AS BIGINT))""".stripMargin)(
      s"""SELECT d.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN s.doc_id IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_gopher_fail,
         |  CAST(sum(CASE WHEN s.doc_id IS NOT NULL AND k.doc_id IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup_out,
         |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN len(t.toks)
         |    ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM documents d
         |JOIN tok_docs t USING (doc_id)
         |LEFT JOIN surv s USING (doc_id)
         |LEFT JOIN keep k USING (doc_id)
         |GROUP BY d.source""".stripMargin)) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
      val gdocs = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), PipelineQueries4.relined.as("text"),
          col("toks"))
      val g = TextAnalysis.gopherRepetition(gdocs)
        .select(col("doc_id"), col("gopher_pass"))
      val surv = docs.join(g, "doc_id").filter(col("gopher_pass"))
      val dec = Sampling.softDedupWeights(surv, alpha = softAlpha,
        salt = funSalt).select(col("doc_id"), col("kept"))
      docs.join(g, "doc_id").join(dec, Seq("doc_id"), "left_outer")
        .select(col("source"), col("gopher_pass"),
          coalesce(col("kept"), lit(false)).as("kept"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("gopher_pass"), 1L).otherwise(0L))
            .as("n_gopher_fail"),
          sum(when(col("gopher_pass") && !col("kept"), 1L).otherwise(0L))
            .as("n_dedup_out"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L))
            .as("tokens_kept"))
    },

    // ---- hashed-vector dense retrieval (text → certified ANN) -------------

    // Feature-hash the documents into 16-dim vectors, k-means them with
    // the corpus-trained centroids, and answer top-5 cosine queries via
    // the certified IVF path — dense lexical retrieval end-to-end with
    // no model and no embeddings table. The oracle replays feature
    // hashing, normalization, both Lloyd iterations, cell assignment,
    // and the in-cell ranking.
    QueryDef("pipe_text_ann", {
      val dim = hvDim
      val hvec0Cols = (0 until dim).map(i =>
        s"CAST(sum(CASE WHEN b = $i THEN c ELSE 0 END) AS DOUBLE) AS r$i")
        .mkString(",\n    ")
      val nrmSum = (0 until dim).map(i => s"r$i*r$i").mkString(" + ")
      val vList = (0 until dim).map(i => s"round(r$i / nrm, 6)")
        .mkString(", ")
      s"""WITH ht AS (
         |  SELECT doc_id AS vec_id,
         |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
         |  FROM documents),
         |hb AS (
         |  SELECT vec_id,
         |    CAST(${PipelineQueries2.duckHex32(
                s"md5('$hvSalt:' || tok)")} % $dim AS INT) AS b,
         |    count(*) AS c
         |  FROM ht GROUP BY 1, 2),
         |hvec0 AS (
         |  SELECT vec_id,
         |    $hvec0Cols
         |  FROM hb GROUP BY vec_id),
         |hn AS (SELECT vec_id, sqrt($nrmSum) AS nrm, * FROM hvec0),
         |e2 AS (SELECT vec_id, [$vList] AS v FROM hn WHERE nrm > 0),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
         |    AS cid, v
         |  FROM (SELECT vec_id, v FROM e2 ORDER BY vec_id LIMIT $hvCells)),
         |${dAssign("e2", "c0", "a1")},
         |${dRecenter("a1", "e2", "c1")},
         |${dAssign("e2", "c1", "a2")},
         |${dRecenter("a2", "e2", "c2")},
         |${dAssign("e2", "c2", "af")},
         |nrm2 AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e2),
         |qv AS (
         |  SELECT a.vec_id AS q_id, a.cid AS cell, n.v AS q_v,
         |    n.nrm AS q_nrm
         |  FROM af a JOIN nrm2 n USING (vec_id) WHERE vec_id % 100 = 7),
         |cv AS (
         |  SELECT a.vec_id AS c_id, a.cid AS cell, n.v AS c_v,
         |    n.nrm AS c_nrm
         |  FROM af a JOIN nrm2 n USING (vec_id)),
         |scored AS (
         |  SELECT q.q_id, q.cell, c.c_id,
         |    round(list_sum(list_transform(generate_series(1, $dim),
         |      j -> q.q_v[j] * c.c_v[j])) / (q.q_nrm * c.c_nrm), 6)
         |      AS cos_sim
         |  FROM qv q JOIN cv c ON q.cell = c.cell AND q.q_id <> c.c_id)
         |SELECT q_id, cell, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, c_id) AS rank
         |  FROM scored) WHERE rank <= $hvK""".stripMargin
    }) { (s, dir) =>
      // checkpointed: the hashed-vector frame feeds the 2-iteration
      // training collects, the assignment, AND both ivfTopK sides —
      // uncut, the tokenize+hash pipeline re-ran once per consumer
      val hv = graft.pipeline.Lineage.cut(
        TextAnalysis.hashedVectors(W.read(s, dir, "documents"),
          dim = hvDim, salt = hvSalt))
      val cents = Semantic.kmeansCentroids(hv, k = hvCells, iters = 2)
      val vecs = hv.join(
        Semantic.assignTo(hv, cents)
          .select(col("vec_id"), col("cluster_id").as("label")), "vec_id")
      graft.pipeline.Similarity.ivfTopK(
        vecs.filter(col("vec_id") % 100 === 7), vecs, k = hvK)
    },

    // ---- embedding health report ------------------------------------------

    // The pre-ANN sanity table: ragged dims, zero norms, and NaN/Inf
    // components each silently poison cosine math downstream; the avg
    // norm rides on 1e6-quantized per-row values so the sum is exact in
    // any partition order.
    QueryDef("report_embedding_health",
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT vec_id, len(v) AS dim,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         |    len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0 AS bad
         |  FROM e)
         |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(min(dim) AS BIGINT) AS min_dim,
         |  CAST(max(dim) AS BIGINT) AS max_dim,
         |  CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_zero_norm,
         |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nonfinite,
         |  round(min(nrm), 6) AS min_norm,
         |  round(max(nrm), 6) AS max_norm,
         |  round(CAST(sum(CAST(round(nrm * 1e6) AS BIGINT)) AS DOUBLE)
         |    / (count(*) * 1e6), 6) AS avg_norm
         |FROM s""".stripMargin) { (s, dir) =>
      val e = W.read(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val stats = e.select(
        size(col("v")).as("dim"),
        graft.pipeline.Similarity.norm(col("v")).as("nrm"),
        exists(col("v"), x =>
          isnan(x) || abs(x) === lit(Double.PositiveInfinity)).as("bad"))
      stats.agg(
        count(lit(1)).as("n_vecs"),
        min(col("dim")).cast("long").as("min_dim"),
        max(col("dim")).cast("long").as("max_dim"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero_norm"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
        .crossJoin(stats.agg(
          round(sum(round(col("nrm") * 1e6).cast("long")).cast("double") /
            (count(lit(1)) * 1e6), 6).as("avg_norm")))
    },

    // ---- exact-dedup provenance manifest ----------------------------------

    // The audit artifact a release review reads next to the dedup rate:
    // per content group, WHICH doc survives and which ids it absorbed.
    // dropped_ids is a sorted comma-joined string, so the whole manifest
    // stays one row per group and hash-comparable across engines.
    QueryDef("dedup_manifest",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM documents)
         |SELECT fingerprint, keeper_id, n_dropped,
         |  coalesce(array_to_string(list_transform(list_slice(ids, 2,
         |    len(ids)), x -> CAST(x AS VARCHAR)), ','), '') AS dropped_ids
         |FROM (
         |  SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS keeper_id,
         |    CAST(count(*) - 1 AS BIGINT) AS n_dropped,
         |    list_sort(list(doc_id)) AS ids
         |  FROM fp GROUP BY fingerprint) g""".stripMargin) { (s, dir) =>
      W.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(min(col("doc_id")).as("keeper_id"),
          (count(lit(1)) - 1).as("n_dropped"),
          array_sort(collect_list(col("doc_id"))).as("ids"))
        .select(col("fingerprint"), col("keeper_id"), col("n_dropped"),
          array_join(transform(
            slice(col("ids"), lit(2), greatest(size(col("ids")) - 1,
              lit(0))), x => x.cast("string")), ",").as("dropped_ids"))
    },

    // ---- tokenizer fertility report ---------------------------------------

    QueryDef("report_fertility",
      s"""SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
         |    AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(regexp_extract_all(lower(text),
         |    '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(len(regexp_extract_all(lower(text),
         |      '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS DOUBLE)
         |    / sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))),
         |    6) AS fertility,
         |  round(CAST(sum(length(text)) AS DOUBLE)
         |    / sum(len(regexp_extract_all(lower(text),
         |        '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 6) AS chars_per_bpe
         |FROM documents
         |GROUP BY lang""".stripMargin) { (s, dir) =>
      W.read(s, dir, "documents")
        .select(col("lang"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("ws"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe"),
          length(col("text")).cast("long").as("chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
          sum(col("bpe")).as("bpe_tokens"), sum(col("chars")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"),
          col("bpe_tokens"), col("n_chars"),
          round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6)
            .as("fertility"),
          round(col("n_chars").cast("double") / col("bpe_tokens"), 6)
            .as("chars_per_bpe"))
    },

    // Exact heavy bigrams with a Count-Min-sketch map-side pre-prune
    // (TextAnalysis.heavyGramsCms + functions/CmsProbe). The sketch only
    // PRUNES (its one-sided bound proves pruned grams can't reach the
    // HAVING threshold), so the result is bit-equal to the plain exact
    // aggregation — which is exactly what the oracle replays; the CMS
    // never needs a SQL twin. CmsProbeSpec separately pins equality vs
    // the unpruned path and the filter's pre-Exchange position.
    QueryDef("t_heavy_grams_cms",
      withC(tokDocs)(
        s"""SELECT gram, n FROM (
           |  SELECT gram, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(list_transform(
           |      generate_series(1, greatest(len(toks) - 1, 0)),
           |      i -> toks[i] || ' ' || toks[i+1])) AS gram
           |    FROM tok_docs)
           |  GROUP BY 1)
           |WHERE n >= $heavyMin""".stripMargin)) { (s, dir) =>
      TextAnalysis.heavyGramsCms(W.read(s, dir, "documents"), heavyMin)
    },

    // BM25 top-k retrieval for a literal term set: per-(doc, term)
    // contributions quantized to integer micro-units in one fixed IEEE op
    // order (the NLL-tier discipline), so the DuckDB replay — same idf,
    // same tf saturation, same length normalization — hash-matches the
    // long sums exactly. Constants interpolate via Double.toString, which
    // round-trips to the identical double in DuckDB's parser.
    QueryDef("t_bm25_topk",
      withC(tokDocs + ",\n" +
        s"""bdl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok_docs),
           |bst AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(dl) AS BIGINT) AS sdl FROM bdl),
           |btf AS (
           |  SELECT x.doc_id, d.dl, x.tok, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok_docs) x
           |  JOIN bdl d ON d.doc_id = x.doc_id
           |  WHERE x.tok IN (${bmTerms.map(t => s"'$t'").mkString(", ")})
           |  GROUP BY 1, 2, 3),
           |bdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM btf GROUP BY 1)""".stripMargin)(
        s"""SELECT doc_id, score_micro, CAST(rk AS BIGINT) AS rank FROM (
           |  SELECT doc_id, score_micro,
           |    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk
           |  FROM (
           |    SELECT t.doc_id, CAST(sum(t.mic) AS BIGINT) AS score_micro
           |    FROM (
           |      SELECT f.doc_id,
           |        CAST(round(ln((CAST(s.n AS DOUBLE) - CAST(g.df AS DOUBLE) + 0.5)
           |            / (CAST(g.df AS DOUBLE) + 0.5) + 1.0)
           |          * (CAST(f.tf AS DOUBLE) * ${1.0 + bmK1})
           |          / (CAST(f.tf AS DOUBLE) + $bmK1 * (${1.0 - bmB}
           |              + $bmB * CAST(f.dl AS DOUBLE)
           |                / (CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))))
           |          * 1000000.0) AS BIGINT) AS mic
           |      FROM btf f JOIN bdf g ON f.tok = g.tok CROSS JOIN bst s) t
           |    GROUP BY 1))
           |WHERE rk <= $bmK""".stripMargin)) { (s, dir) =>
      TextAnalysis.bm25TopK(W.read(s, dir, "documents"), bmTerms, bmK,
        bmK1, bmB)
    },

    // b-bit MinHash verification (Li & König 2010): banding identical to
    // dedup_minhash_fast (lanes 0..7 — the oracle reuses the certified
    // XXH64 band-fold replay), verification from the 64-lane low-bit
    // sketch. The oracle computes bit agreement per seed — mathematically
    // identical to Spark's popcount over the packed long — so the
    // estimate column hash-matches on the real hash family.
    QueryDef("dedup_minhash_bbit", {
      val ubMh = XxhSql.toUnsigned("mh")
      val parts = Seq(
        """xtok AS (
          |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents)""".stripMargin,
        """xsh AS (
          |  SELECT doc_id, list_distinct(list_transform(
          |    generate_series(1, greatest(len(toks) - 2, 0)),
          |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
          |  FROM xtok)""".stripMargin,
        """inp AS MATERIALIZED (
          |  SELECT s, CAST(seed AS HUGEINT) AS seed
          |  FROM (SELECT DISTINCT unnest(shingles) AS s FROM xsh),
          |       (SELECT unnest(generate_series(0, 63)) AS seed))""".stripMargin,
        XxhSql.strHashChain("x"),
        s"""sigrows AS MATERIALIZED (
           |  SELECT d.doc_id, x.seed, min(${XxhSql.toSigned("x.hf")}) AS mh
           |  FROM (SELECT doc_id, unnest(shingles) AS s FROM xsh) d
           |  JOIN xf x ON d.s = x.s
           |  GROUP BY d.doc_id, x.seed)""".stripMargin,
        s"""bandin AS MATERIALIZED (
           |  SELECT doc_id, CAST(seed // 4 AS INT) AS band_idx,
           |    max(CASE WHEN seed % 4 = 0 THEN $ubMh END) AS v1,
           |    max(CASE WHEN seed % 4 = 1 THEN $ubMh END) AS v2,
           |    max(CASE WHEN seed % 4 = 2 THEN $ubMh END) AS v3,
           |    max(CASE WHEN seed % 4 = 3 THEN $ubMh END) AS v4
           |  FROM sigrows WHERE seed < 8 GROUP BY 1, 2)""".stripMargin,
        XxhSql.longFoldChain("bf", "bandin", Seq("doc_id", "band_idx"), 4),
        """cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bff a JOIN bff b
          |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          |       AND a.doc_id < b.doc_id)""".stripMargin,
        """agree AS (
          |  SELECT c.doc_a, c.doc_b,
          |    CAST(sum(CASE WHEN (sa.mh & 1) = (sb.mh & 1)
          |      THEN 1 ELSE 0 END) AS BIGINT) AS m
          |  FROM cand c
          |  JOIN sigrows sa ON sa.doc_id = c.doc_a
          |  JOIN sigrows sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
          |  GROUP BY 1, 2)""".stripMargin)
      withC(parts.mkString(",\n"))(
        s"""SELECT doc_a, doc_b, m AS n_agree,
           |  round(2.0 * CAST(m AS DOUBLE) / 64.0 - 1.0, 6) AS est_sim
           |FROM agree
           |WHERE round(2.0 * CAST(m AS DOUBLE) / 64.0 - 1.0, 6) >= $bbitTau""".stripMargin)
    }) { (s, dir) =>
      Dedup.minhashBbitPairs(W.read(s, dir, "documents"), tau = bbitTau)
    },

    // Damped power-iteration centrality over the certified simhash pair
    // graph (PageRank, 3 iterations, d=0.85), all-BIGINT micro-unit
    // arithmetic: BASE = 1e6 // N, contrib = r // deg,
    // r' = (15·BASE) // 100 + (85·Σ) // 100. The oracle unrolls the
    // identical three iterations over the same pairs CTE the CC family
    // rides, so the hash-match certifies every iteration's integer fold.
    QueryDef("dedup_graph_rank",
      withC(PipelineQueries.simhashPairsCte + ",\n" +
        """gedges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM pairs
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM pairs),
          |gdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
          |  FROM gedges GROUP BY 1),
          |gn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM gedges),
          |r0 AS (SELECT DISTINCT src AS doc_id,
          |  (SELECT 1000000 // n FROM gn) AS r FROM gedges),
          |s1 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r0 r JOIN gedges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r1 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s1),
          |s2 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r1 r JOIN gedges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r2 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s2),
          |s3 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r2 r JOIN gedges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r3 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s3)""".stripMargin)(
        "SELECT doc_id, r AS rank_micro FROM r3")) { (s, dir) =>
      Dedup.graphRank(Standing.simhashPairs(s, dir))
    },

    // Centrality keeper per cluster: the recursive-CTE CC closure joined
    // to the unrolled integer PageRank, one keeper per cluster (max rank,
    // id tie-break). Composes the two certified paths end to end — the
    // hash-match certifies the composition, not just the parts.
    QueryDef("dedup_rank_keepers",
      "WITH RECURSIVE " + PipelineQueries.ccCtes + ",\n" +
        """gdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
          |  FROM edges GROUP BY 1),
          |gn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM edges),
          |r0 AS (SELECT DISTINCT src AS doc_id,
          |  (SELECT 1000000 // n FROM gn) AS r FROM edges),
          |s1 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r0 r JOIN edges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r1 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s1),
          |s2 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r1 r JOIN edges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r2 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s2),
          |s3 AS (SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
          |  FROM r2 r JOIN edges e ON e.src = r.doc_id
          |  JOIN gdeg d ON d.src = r.doc_id GROUP BY 1),
          |r3 AS (SELECT dst AS doc_id,
          |  (SELECT (15 * (1000000 // n)) // 100 FROM gn)
          |    + (85 * s) // 100 AS r FROM s3),
          |clus AS (SELECT id AS doc_id, least(id, min(other)) AS cluster_id
          |  FROM reach GROUP BY id)
          |SELECT cluster_id, doc_id AS keeper_id, r AS rank_micro,
          |  CAST(n_members AS BIGINT) AS n_members
          |FROM (
          |  SELECT c.cluster_id, r3.doc_id, r3.r,
          |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
          |    row_number() OVER (PARTITION BY c.cluster_id
          |      ORDER BY r3.r DESC, r3.doc_id) AS rn
          |  FROM r3 JOIN clus c USING (doc_id))
          |WHERE rn = 1""".stripMargin) { (s, dir) =>
      // standing pair frame + standing cluster state: the line measures
      // the rank iterations and the keeper window — production reads
      // the persisted labeling rather than re-running CC per decision
      Dedup.rankKeepersFromLabels(Standing.simhashPairs(s, dir),
        Standing.ccLabels(s, dir))
    })
}
