package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-8 batch: winnowing fingerprints (Schleimer et al. 2003 — the
 * MOSS local-fingerprinting algorithm) and per-language CCNet quality
 * tiers (Wenzek et al. 2020). Every oracle replays the full selection —
 * k-gram hashing, window minima, df caps, per-language LM training —
 * so the hash-match certifies the algorithm, not a summary of it.
 */
object PipelineQueries7 {

  private val winK = 8 // k-gram chars
  private val winW = 4 // window of consecutive k-gram hashes
  private val winMinShared = 3
  private val winMaxDf = 20

  /** Winnowing selection CTEs: normalized text -> k-gram hashes ->
    * per-window minima -> distinct per-doc fingerprint set. Mirrors
    * [[TextAnalysis.winnowFingerprints]] hash-for-hash (16 md5 hex
    * digits, full windows only). */
  private val winnowCtes =
    s"""wn AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |wkg0 AS (
       |  SELECT doc_id, length(s) - ${winK - 1} AS n_kg, s
       |  FROM wn WHERE length(s) - ${winK - 1} >= $winW),
       |wkg AS (
       |  SELECT doc_id, n_kg, unnest(generate_series(1, n_kg)) AS pos, s
       |  FROM wkg0),
       |wh AS (
       |  SELECT doc_id, n_kg, pos,
       |    substr(md5(substr(s, pos, $winK)), 1, 16) AS h
       |  FROM wkg),
       |wsel AS (
       |  SELECT doc_id, pos, n_kg,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${winW - 1} FOLLOWING) AS fp
       |  FROM wh),
       |wfps AS (
       |  SELECT DISTINCT doc_id, fp FROM wsel
       |  WHERE pos <= n_kg - ${winW - 1})""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- winnowing fingerprints (MOSS) ------------------------------------

    // Local, position-robust document fingerprints: any shared substring
    // of >= w + k - 1 chars is guaranteed to share a selected
    // fingerprint, at ~2/(w+1) storage density of the full k-gram set.
    // Output is a per-doc digest of the ORDERED fingerprint set (md5 of
    // the sorted concatenation) — one row per doc in the artifact while
    // the hash-match still certifies every selected fingerprint.
    QueryDef("t_winnow", PipelineQueries.withC(winnowCtes)(
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |  md5(string_agg(fp, '' ORDER BY fp)) AS fp_digest
        |FROM wfps GROUP BY doc_id""".stripMargin)) { (s, dir) =>
      TextAnalysis.winnowFingerprints(W.read(s, dir, "documents"), winK, winW)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          md5(concat_ws("", sort_array(collect_list(col("fp")))))
            .as("fp_digest"))
    },

    // Copied-passage pairs over the winnowed index: df-capped inverted
    // index (boilerplate fingerprints carry no provenance signal),
    // containment against the honest uncapped per-doc set size.
    QueryDef("dedup_winnow_overlap", PipelineQueries.withC(winnowCtes + ",\n" +
      s"""wsizes AS (SELECT doc_id, count(*) AS n_fp FROM wfps GROUP BY doc_id),
         |wkept AS (
         |  SELECT doc_id, fp FROM (
         |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
         |    FROM wfps)
         |  WHERE df <= $winMaxDf),
         |wpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM wkept a JOIN wkept b
         |    ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $winMinShared)""".stripMargin)(
      s"""SELECT doc_a, doc_b, shared,
         |  round(CAST(shared AS DOUBLE) /
         |    CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 6) AS containment
         |FROM wpairs
         |JOIN wsizes sa ON sa.doc_id = doc_a
         |JOIN wsizes sb ON sb.doc_id = doc_b""".stripMargin)) { (s, dir) =>
      Dedup.winnowOverlapPairs(W.read(s, dir, "documents"),
        winK, winW, winMinShared, winMaxDf)
    },

    // ---- per-language CCNet tiers -----------------------------------------

    // CCNet buckets head/middle/tail per LANGUAGE (one LM per language,
    // tier boundaries within it) — a Danish doc must not be graded
    // against an English LM. The oracle trains every per-language
    // unigram LM and replays every per-language ntile.
    QueryDef("t_nll_tiers_by_lang", PipelineQueries.withC(
      """ltd AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |ltok AS (SELECT doc_id, lang, unnest(toks) AS tok FROM ltd),
        |lcounts AS (SELECT lang, tok, count(*) AS c FROM ltok GROUP BY 1, 2),
        |ltot AS (SELECT lang, sum(c) AS t FROM lcounts GROUP BY 1),
        |lnll AS (
        |  SELECT lang, tok,
        |    CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS nll_micro
        |  FROM lcounts JOIN ltot USING (lang)),
        |lscored AS (
        |  SELECT doc_id, min(lang) AS lang,
        |    round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
        |      AS mean_nll
        |  FROM ltok JOIN lnll USING (lang, tok) GROUP BY doc_id)""".stripMargin)(
      """SELECT doc_id, lang AS part, mean_nll,
        |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY mean_nll, doc_id)
        |    AS BIGINT) AS tier
        |FROM lscored""".stripMargin)) { (s, dir) =>
      TextAnalysis.nllTiersBy(W.read(s, dir, "documents"), "lang", 3)
    })
}
