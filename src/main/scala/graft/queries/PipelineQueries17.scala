package graft.queries

import graft.pipeline.Dedup
import graft.sim.{WarehouseSim => W}

/**
 * Round-15 queries: cluster-state retraction (the incremental CC
 * family's delete path), the oracle-certified REAL audio codec line,
 * and the set-join index's certified health report.
 */
object PipelineQueries17 {

  val defs: Seq[QueryDef] = Seq(

    // Cluster-state RETRACTION: the takedown path of the incremental
    // CC family. Victims can SPLIT a cluster — inexpressible in the
    // label state alone — so the surviving pairs of ONLY the victims'
    // clusters re-run CC (touched-cluster sized, never the corpus)
    // while untouched clusters pass through verbatim; the result is
    // bit-identical to a full recompute over all surviving pairs,
    // which is exactly what the oracle replays (recursive transitive
    // closure over the old-split pair graph minus victim endpoints).
    QueryDef("dedup_clusters_retract",
      "WITH RECURSIVE " + PipelineQueries.simhashPairsCte + ",\n" +
        """rp AS (
          |  SELECT doc_a, doc_b FROM pairs
          |  WHERE doc_a % 10 >= 2 AND doc_b % 10 >= 2
          |    AND doc_a % 17 <> 5 AND doc_b % 17 <> 5),
          |edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM rp
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM rp),
          |reach(id, other) AS (
          |  SELECT src, dst FROM edges
          |  UNION
          |  SELECT r.id, e.dst FROM reach r JOIN edges e ON r.other = e.src)
          |SELECT id AS doc_id, least(id, min(other)) AS cluster_id
          |FROM reach GROUP BY id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      // the old labeling is session-standing STATE; the measured cost
      // is the RETRACTION — victim-label lookup, touched-cluster
      // member/pair filtering, CC over the touched subgraph only
      Dedup.connectedComponentsRetract(
        Standing.ccOldLabels(s, dir),
        Standing.simhashPairs(s, dir)
          .filter(col("doc_a") % 10 >= 2 && col("doc_b") % 10 >= 2),
        W.read(s, dir, "documents")
          .filter(col("doc_id") % 17 === 5).select("doc_id"))
    },

    // The REAL audio codec, hash-certified end to end: deterministic
    // 16-bit PCM WAV payloads are generated from a known integer
    // sample table (amplitude and length keyed off doc_id, a third of
    // the docs quiet enough to trip the silence gate), decoded by the
    // PRODUCTION WavDecoder (javax.sound.sampled — the same code path
    // real payloads take), and chunked by audioChunksReal; the oracle
    // replays the acoustics from the same arithmetic sample table. A
    // hash match proves encode → JDK decode → chunk is bit-exact —
    // the real-codec certification the text-stand-in mm_audio_chunks
    // line cannot give.
    QueryDef("mm_audio_real",
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 256 ELSE 65536 END AS m,
        |    200 + (doc_id % 7) * 50 AS n
        |  FROM documents),
        |smp AS (
        |  SELECT doc_id, j // 256 AS chunk_idx,
        |    (doc_id * 31 + j * 17) % m - m // 2 AS s
        |  FROM (SELECT doc_id, m,
        |          unnest(generate_series(0, n - 1)) AS j
        |        FROM p))
        |SELECT doc_id, chunk_idx,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  CAST(CASE WHEN sum(s * s) // count(*) < 2683044
        |    THEN 1 ELSE 0 END AS INT) AS is_silence
        |FROM smp GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = W.read(s, dir, "documents")
        .select("doc_id").as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val m = if (d % 3 == 0) 256L else 65536L
            val n = (200L + (d % 7L) * 50L).toInt
            val samples = Array.tabulate(n)(j =>
              (((d * 31L + j * 17L) % m) - m / 2L).toInt)
            (d, graft.pipeline.Multimodal.WavDecoder.encode16(samples, 8000))
          }
        }.toDF("doc_id", "media_bytes")
      graft.pipeline.Multimodal.audioChunksReal(s, payloads)
    },

    // The set-join index's certified HEALTH REPORT: per-batch store
    // shape (docs, prefix rows) plus the order-drift signal that
    // triggers rebuildPrefixes — the sim_index_stats analog, measured
    // on a standing index with one admitted batch (the steady state
    // the report exists to monitor). The oracle replays everything:
    // the canon split counts, both batches' prefix-length arithmetic
    // under the FROZEN old-split order (admitted-batch tokens unseen
    // at build rank with tf = 0), and the symmetric 2× mass-drift
    // fraction between the frozen and running counts.
    QueryDef("ssj_index_stats",
      PipelineQueries.withC(
        """tok_all AS (
          |  SELECT doc_id, regexp_split_to_array(lower(trim(text)),
          |    '\s+') AS toks
          |  FROM documents),
          |tok_docs AS (
          |  SELECT doc_id, toks FROM (
          |    SELECT doc_id, toks, row_number() OVER (
          |      PARTITION BY md5(array_to_string(
          |        list_sort(list_distinct(toks)), ' '))
          |      ORDER BY doc_id) AS crk
          |    FROM tok_all)
          |  WHERE crk = 1),
          |t AS (
          |  SELECT doc_id, unnest(list_distinct(toks)) AS tok
          |  FROM tok_docs),
          |fo AS (SELECT tok, count(*) AS tf FROM t
          |       WHERE doc_id % 10 >= 2 GROUP BY tok),
          |cum AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok),
          |r AS (
          |  SELECT t.doc_id,
          |    row_number() OVER (PARTITION BY t.doc_id
          |      ORDER BY coalesce(fo.tf, 0), t.tok) AS pos,
          |    count(*) OVER (PARTITION BY t.doc_id) AS len
          |  FROM t LEFT JOIN fo USING (tok)),
          |p AS (
          |  SELECT doc_id FROM r
          |  WHERE pos <= len - (700 * len + 999) // 1000 + 1),
          |b AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 10 >= 2 THEN 0 ELSE 1 END AS batch
          |  FROM tok_docs),
          |nd AS (SELECT batch, count(*) AS n_docs FROM b GROUP BY 1),
          |np AS (SELECT b.batch, count(*) AS n_prefix_rows
          |       FROM p JOIN b USING (doc_id) GROUP BY 1),
          |dr AS (
          |  SELECT sum(w) AS m,
          |    sum(CASE WHEN 2 * l <= w THEN w ELSE 0 END) AS s
          |  FROM (
          |    SELECT greatest(coalesce(c.tf, 0), coalesce(f.tf, 0)) AS w,
          |      least(coalesce(c.tf, 0), coalesce(f.tf, 0)) AS l
          |    FROM cum c FULL OUTER JOIN fo f USING (tok)))""".stripMargin)(
        """SELECT CAST(nd.batch AS BIGINT) AS batch,
          |  CAST(nd.n_docs AS BIGINT) AS n_docs,
          |  CAST(np.n_prefix_rows AS BIGINT) AS n_prefix_rows,
          |  CAST(CASE WHEN nd.batch = 0
          |    THEN (SELECT s * 1000 // m FROM dr) ELSE NULL END
          |    AS BIGINT) AS drift_milli
          |FROM nd JOIN np USING (batch)""".stripMargin)) { (s, dir) =>
      val idx = Standing.ssjAdmittedIndex(s, dir,
        PipelineQueries15.ssjCanon, "stats")
      graft.pipeline.SsjIndex.stats(s, idx)
    })
}
