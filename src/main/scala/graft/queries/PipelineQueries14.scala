package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CardSketch, Dedup, Sampling, Similarity}
import graft.sim.{WarehouseSim => W}

/**
 * Round-13 (cont.) queries: the radius-bounded EXACT serve over the
 * persisted IVF index ([[Similarity.exactIndexedTopK]]).
 *
 * The oracle discipline here is the strongest in the suite: because the
 * serve is certified exact (triangle-inequality pruning in normalized
 * space — cells that cannot beat the seed-probe kth-best bound are
 * never read), its DuckDB twin is PLAIN BRUTE FORCE. No replay of
 * centroids, probes, or bounds — a hash match certifies that the
 * pruning machinery changed nothing about the answer, only about the
 * cells read.
 */
object PipelineQueries14 {

  private val k = 5

  private def idxDir(prefix: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$prefix-${Integer.toHexString(dir.hashCode)}").getPath

  /** Session-standing index for the serve-only line (the
    * [[PipelineQueries13]] discipline): built at most once per
    * (JVM, data dir); Bench's untimed warmup pays the build. */
  private val standing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cos(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a.v)),
       |    i -> $a.v[i] * $b.v[i])) / ($a.nrm * $b.nrm)""".stripMargin

  /** Brute-force cosine top-k over the positive-norm corpus, self
    * excluded — the EXACT answer the radius-bounded serve must match. */
  private val bruteSql =
    s"""WITH e AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
       |p AS (SELECT * FROM e WHERE nrm > 0)
       |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    round(${cos("q", "c")}, 6) AS cos_sim,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(${cos("q", "c")}, 6) DESC, c.vec_id) AS rank
       |  FROM (SELECT * FROM p WHERE vec_id < 8) q
       |  JOIN p c ON q.vec_id <> c.vec_id)
       |WHERE rank <= $k""".stripMargin

  // ---- MMR diversified re-rank -------------------------------------------

  private val mmrK = 4
  private val mmrPool = 12
  private val mmrLambda = 0.7
  // EXACT double literals: Spark computes lit(1.0 - 0.7) =
  // 0.30000000000000004; the oracle must multiply by the identical
  // double, so both factors are emitted via Double.toString
  private val lamS = mmrLambda.toString
  private val lamCS = (1.0 - mmrLambda).toString

  /** One greedy MMR step as SQL: pick the argmax of
    * λ·rel − (1−λ)·max-sim-to-`res` among candidates not yet in `res`. */
  /** Selection orders by the RAW score double (identical IEEE value in
    * both engines); the reported score is micro-units via floor — see
    * [[Similarity.mmrRerank]]'s determinism note on why round(_, 6)
    * cannot be used here. */
  private def mmrStep(i: Int, res: String): String =
    s"""sel$i AS (
       |  SELECT q_id, c_id, CAST(floor(raw * 1000000) AS BIGINT)
       |      AS mmr_micro, $i AS rank FROM (
       |    SELECT q_id, c_id, raw,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY raw DESC, c_id) AS rk
       |    FROM (
       |      SELECT c.q_id, c.c_id,
       |        $lamS * c.rel - $lamCS * coalesce(ms.ms, 0.0) AS raw
       |      FROM cv c
       |      LEFT JOIN (
       |        SELECT p.q_id, p.c_id, max(p.sim) AS ms FROM pairs p
       |        JOIN $res r ON r.q_id = p.q_id AND r.c_id = p.o_id
       |        GROUP BY p.q_id, p.c_id) ms
       |        ON ms.q_id = c.q_id AND ms.c_id = c.c_id
       |      WHERE NOT EXISTS (SELECT 1 FROM $res r
       |        WHERE r.q_id = c.q_id AND r.c_id = c.c_id)))
       |  WHERE rk = 1),
       |res$i AS (SELECT * FROM $res UNION ALL SELECT * FROM sel$i)"""
      .stripMargin

  /** The full greedy replay: brute top-`mmrPool` pools, pairwise pool
    * cosines, rank-1 pure relevance, then `mmrK − 1` unrolled steps. */
  private val mmrSql = {
    val steps = (2 to mmrK).map(i => mmrStep(i, s"res${i - 1}"))
      .mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
       |p AS (SELECT * FROM e WHERE nrm > 0),
       |cand AS (
       |  SELECT q_id, c_id, rel FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      round(${cos("q", "c")}, 6) AS rel,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(${cos("q", "c")}, 6) DESC, c.vec_id) AS rk
       |    FROM (SELECT * FROM p WHERE vec_id < 6) q
       |    JOIN p c ON q.vec_id <> c.vec_id)
       |  WHERE rk <= $mmrPool),
       |cv AS (SELECT cand.q_id, cand.c_id, cand.rel, p.v, p.nrm
       |       FROM cand JOIN p ON p.vec_id = cand.c_id),
       |pairs AS (
       |  SELECT a.q_id, a.c_id, b.c_id AS o_id,
       |    list_sum(list_transform(generate_series(1, len(a.v)),
       |      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS sim
       |  FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.c_id <> b.c_id),
       |sel1 AS (
       |  SELECT q_id, c_id, CAST(floor(raw * 1000000) AS BIGINT)
       |      AS mmr_micro, 1 AS rank FROM (
       |    SELECT q_id, c_id, raw,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY raw DESC, c_id) AS rk
       |    FROM (SELECT q_id, c_id, $lamS * rel AS raw FROM cv))
       |  WHERE rk = 1),
       |res1 AS (SELECT * FROM sel1),
       |$steps
       |SELECT q_id, c_id, mmr_micro, CAST(rank AS INT) AS rank
       |FROM res$mmrK""".stripMargin
  }

  // ---- HLL register-state oracle -------------------------------------

  private val hllP = 9
  private val hllWindow = 64 - hllP
  private val hllTwoW = BigInt(1) << hllWindow

  /** The whole-corpus register state over doc_id: shared by the state
    * oracle and (as the ground truth merged halves must equal) the
    * merge oracle. */
  private lazy val hllStateSql = {
    val rankCase = (1 to hllWindow).map(r =>
      s"WHEN w >= ${BigInt(1) << (hllWindow - r)} THEN $r")
      .mkString("\n      ") + s"\n      ELSE ${hllWindow + 1}"
    s"""WITH hin AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS v1
       |  FROM documents),
       |${XxhSql.longFoldChain("hh", "hin", Seq("doc_id"), 1)},
       |hu AS (SELECT doc_id, ${XxhSql.toUnsigned("band_hash")} AS h
       |  FROM hhf),
       |regs AS (SELECT CAST(h // $hllTwoW AS INT) AS bucket,
       |    h % $hllTwoW AS w FROM hu),
       |rk AS (SELECT bucket, CASE $rankCase END AS r FROM regs)
       |SELECT bucket, CAST(max(r) AS INT) AS m_rank
       |FROM rk GROUP BY bucket""".stripMargin
  }

  // ---- KMV / theta sketch oracle constants ----------------------------

  private val kmvK = 256
  private val kmvVocabK = 128
  private val kmvGroupK = 64
  private val sampK = 512
  private val two63 = BigInt(1) << 63
  private val two64 = BigInt(1) << 64

  val defs: Seq[QueryDef] = Seq(

    // Diversified retrieval: greedy MMR over brute-force top-12 pools.
    // The oracle replays the greedy trajectory step by step (unrolled
    // CTEs) — a hash match certifies pool construction, the pairwise
    // redundancy penalty, and every selection decision.
    QueryDef("retr_mmr", mmrSql) { (s, dir) =>
      val emb = W.read(s, dir, "embeddings")
      val cand = Similarity
        .bruteForceTopK(emb.filter(col("vec_id") < 6), emb, mmrPool)
        .select(col("q_id"), col("c_id"), col("cos_sim").as("rel"))
      Similarity.mmrRerank(cand, emb, k = mmrK, lambda = mmrLambda)
        .select("q_id", "c_id", "mmr_micro", "rank")
    },

    // Build + exact serve: the certified-exact lifecycle line. The
    // bound math, radii sidecar, seed probing, and two-phase scan all
    // sit between this query and its brute-force oracle — a hash match
    // certifies the whole pruning machinery is answer-invariant.
    QueryDef("sim_topk_indexed_exact", bruteSql) { (s, dir) =>
      val emb = W.read(s, dir, "embeddings")
      val d = idxDir("graft-ivf-exact", dir)
      Similarity.buildIvfIndex(emb, d, kCells = 8, iters = 2)
      Similarity.exactIndexedTopK(s, emb.filter(col("vec_id") < 8), d,
          k = k, seedProbe = 1)
        .select("q_id", "c_id", "cos_sim", "rank")
    },

    // Sorted-neighborhood linkage over the same names: global
    // (name, id) rank, compare each row to its 5 successors, verify
    // Levenshtein <= 3. The scalable rank (range partition +
    // zipWithIndex) must reproduce the oracle's plain row_number —
    // the unique sort key makes that exact.
    QueryDef("dedup_fuzzy_sorted",
      """WITH p AS (SELECT p_partkey AS id, p_name AS s FROM part),
        |r AS (SELECT id, s, row_number() OVER (ORDER BY s, id) AS rk
        |  FROM p)
        |SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist,
        |  round(1.0 - CAST(levenshtein(a.s, b.s) AS DOUBLE)
        |    / greatest(length(a.s), length(b.s)), 6) AS sim
        |FROM r a JOIN r b
        |  ON b.rk > a.rk AND b.rk - a.rk <= 5
        |WHERE levenshtein(a.s, b.s) <= 3""".stripMargin) { (s, dir) =>
      Dedup.fuzzyPairsSorted(W.read(s, dir, "part"), "p_partkey",
        "p_name", window = 5, maxDist = 3)
    },

    // Interval overlap join (temporal join): per-user view windows x
    // purchase windows, the bucketed-equi-join strategy vs the
    // oracle's direct non-equi join — two algorithms, one answer.
    // Windows are synthesized deterministically from the event stream
    // (1-5 h by event id) since the tables carry point timestamps.
    QueryDef("j16_interval_overlap",
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 3600000000 * (1 + event_id % 5) AS e,
        |    event_type
        |  FROM events),
        |a AS (SELECT user_id, event_id AS a_id, s AS a_s, e AS a_e
        |  FROM ev WHERE event_type = 'view'),
        |b AS (SELECT user_id, event_id AS b_id, s AS b_s, e AS b_e
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT a.user_id, a_id, b_id,
        |  least(a_e, b_e) - greatest(a_s, b_s) AS overlap
        |FROM a JOIN b ON a.user_id = b.user_id
        |  AND a_s < b_e AND b_s < a_e""".stripMargin) { (s, dir) =>
      val ev = W.read(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) +
            lit(3600000000L) * (lit(1L) + col("event_id") % 5)).as("e"),
          col("event_type"))
      def side(t: String, pfx: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(s"${pfx}_id"),
          col("s").as(s"${pfx}_s"), col("e").as(s"${pfx}_e"))
      graft.operators.IntervalJoin.overlapJoin(
        side("view", "a"), side("purchase", "b"),
        keys = Seq("user_id"), bucket = 6L * 3600000000L)
    },

    // Blocked fuzzy matching over part names: (type, first char)
    // blocking key, Levenshtein <= 3 verify. The integer metric is
    // identical in every engine — the verification needs zero float
    // discipline; sim's small-integer quotient can never hit a round
    // midpoint.
    QueryDef("dedup_fuzzy_names",
      """WITH p AS (SELECT p_partkey, p_name, p_type,
        |    substr(p_name, 1, 1) AS c1
        |  FROM part)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  round(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        |    / greatest(length(a.p_name), length(b.p_name)), 6) AS sim
        |FROM p a JOIN p b
        |  ON a.p_type = b.p_type AND a.c1 = b.c1
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin) {
      (s, dir) =>
        Dedup.fuzzyPairs(W.read(s, dir, "part"), "p_partkey", "p_name",
          Seq(col("p_type"), substring(col("p_name"), 1, 1)), maxDist = 3)
    },

    // KMV distinct estimate with the estimator ITSELF oracle-hashed:
    // bottom-256 xxhash64 values of l_orderkey, then the pure-integer
    // (k-1)*2^64 // (pos(theta)+1) division replayed in HUGEINT.
    QueryDef("card_kmv_distinct",
      s"""WITH hin AS (
         |  SELECT l_orderkey, CAST(l_orderkey AS HUGEINT) AS v1
         |  FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
         |${XxhSql.longFoldChain("kh", "hin", Seq("l_orderkey"), 1)},
         |hs AS (SELECT DISTINCT band_hash AS h FROM khf
         |  ORDER BY h LIMIT $kmvK),
         |cnt AS (SELECT count(*) AS c, max(h) AS mx FROM hs)
         |SELECT CAST(c AS BIGINT) AS n_kept,
         |  CAST(CASE WHEN c < $kmvK THEN CAST(c AS HUGEINT)
         |    ELSE (CAST(${kmvK - 1} AS HUGEINT) * $two64)
         |      // (CAST(mx AS HUGEINT) + $two63 + 1) END AS BIGINT)
         |    AS est
         |FROM cnt""".stripMargin) { (s, dir) =>
      import s.implicits._
      val st = CardSketch.kmvState(W.read(s, dir, "lineitem"),
        "l_orderkey", k = kmvK)
      Seq((st.count(), CardSketch.kmvDistinct(st, k = kmvK)))
        .toDF("n_kept", "est")
    },

    // Composed certified retrieval -> diversification: the MMR pools
    // come from the persisted index's EXACT serve instead of brute
    // force — and because exactness is certified, the oracle is the
    // IDENTICAL brute-pool replay. Different plumbing, same answer,
    // end to end through the index lifecycle.
    QueryDef("retr_mmr_indexed", mmrSql) { (s, dir) =>
      val emb = W.read(s, dir, "embeddings")
      val d = idxDir("graft-ivf-exact", dir)
      Similarity.buildIvfIndex(emb, d, kCells = 8, iters = 2)
      val cand = Similarity
        .exactIndexedTopK(s, emb.filter(col("vec_id") < 6), d, k = mmrPool)
        .select(col("q_id"), col("c_id"), col("cos_sim").as("rel"))
      Similarity.mmrRerank(cand, emb, k = mmrK, lambda = mmrLambda)
        .select("q_id", "c_id", "mmr_micro", "rank")
    },

    // Exact-moment correlation matrix: micro-scaled integer sums in
    // HUGEINT (no float summation order anywhere), closed form in
    // double from identical exact moments. One pass, 3 measures.
    QueryDef("report_corr_matrix", {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
      def mi(c: String) = s"CAST(round($c * 10000) AS HUGEINT)"
      val sums = (Seq("CAST(count(*) AS HUGEINT) AS n") ++
        cs.map(c => s"sum(${mi(c)}) AS s_$c") ++
        cs.map(c => s"sum(${mi(c)} * ${mi(c)}) AS q_$c") ++
        cs.combinations(2).map { case Seq(a, b) =>
          s"sum(${mi(a)} * ${mi(b)}) AS p_${a}_$b" }).mkString(",\n    ")
      val rows = cs.combinations(2).map { case Seq(a, b) =>
        s"""SELECT '$a' AS var_a, '$b' AS var_b,
           |  round((CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE)
           |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |    / sqrt((CAST(n AS DOUBLE) * CAST(q_$a AS DOUBLE)
           |        - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |      * (CAST(n AS DOUBLE) * CAST(q_$b AS DOUBLE)
           |        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
           |    AS corr
           |FROM s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH s AS (SELECT\n    $sums\n  FROM lineitem)\n$rows"
    }) { (s, dir) =>
      graft.pipeline.CorpusReport.corrMatrix(W.read(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), scale = 4)
    },

    // Hash-sample quantile sketch: bottom-512 rows by (hash, id) carry
    // l_extendedprice; quantiles are positional selections over the
    // sample. Sketch AND extraction replay in the oracle — no sort of
    // the corpus, no libm.
    QueryDef("card_sample_quantiles",
      s"""WITH hin AS (
         |  SELECT l_orderkey * 10 + l_linenumber AS id,
         |    CAST(l_orderkey * 10 + l_linenumber AS HUGEINT) AS v1,
         |    l_extendedprice AS v
         |  FROM lineitem),
         |${XxhSql.longFoldChain("sq", "hin", Seq("id", "v"), 1)},
         |samp AS (SELECT id, v, band_hash AS h FROM sqf
         |  ORDER BY band_hash, id LIMIT $sampK),
         |sel AS (SELECT v, row_number() OVER (ORDER BY v, id) AS r,
         |    count(*) OVER () AS n FROM samp)
         |SELECT CAST(p AS DOUBLE) AS p, v AS value FROM sel,
         |  (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99)) q(p)
         |WHERE r - 1 = CAST(floor(CAST(p AS DOUBLE) * (n - 1)) AS BIGINT)
         |ORDER BY p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = W.read(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("li_id"),
        col("l_extendedprice"))
      val st = CardSketch.sampleSketch(li, "li_id",
        Seq("l_extendedprice"), k = sampK)
      CardSketch.sampleQuantiles(st, "l_extendedprice",
          Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        .toDF("p", "value").orderBy("p")
    },

    // Grouped KMV cardinality — the data-card n_unique cell at sketch
    // cost with a TRUE oracle: per returnflag, bottom-64 partkey
    // hashes and the floored double estimator ((k-1)*2^64 is an exact
    // double; the divisor rounds identically in both engines).
    QueryDef("card_kmv_by_group",
      s"""WITH hin AS (
         |  SELECT l_returnflag, l_partkey,
         |    CAST(l_partkey AS HUGEINT) AS v1
         |  FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)),
         |${XxhSql.longFoldChain("kg", "hin",
            Seq("l_returnflag", "l_partkey"), 1)},
         |hs AS (SELECT DISTINCT l_returnflag, band_hash AS h FROM kgf),
         |rk AS (SELECT l_returnflag, h, row_number() OVER (
         |    PARTITION BY l_returnflag ORDER BY h) AS r FROM hs),
         |gp AS (SELECT l_returnflag, count(*) AS n_kept, max(h) AS mx
         |  FROM rk WHERE r <= $kmvGroupK GROUP BY l_returnflag)
         |SELECT l_returnflag, n_kept,
         |  CASE WHEN n_kept < $kmvGroupK THEN n_kept
         |    ELSE CAST(floor(${((BigInt(kmvGroupK) - 1) << 64).toDouble}
         |      / (CAST(mx AS DOUBLE) + ${(BigInt(1) << 63).toDouble}
         |        + 1.0)) AS BIGINT) END AS est
         |FROM gp""".stripMargin) { (s, dir) =>
      CardSketch.kmvByGroup(W.read(s, dir, "lineitem"),
        "l_returnflag", "l_partkey", k = kmvGroupK)
    },

    // Theta-sketch set intersection — the estimate HLL cannot give:
    // shared vocabulary between two source strata from two bottom-128
    // token sketches. The oracle replays tokenization (the certified
    // tok_docs CTE), the string-hash chain, both sketches, theta, and
    // the integer estimator.
    QueryDef("card_kmv_overlap",
      s"""WITH ${PipelineQueries.tokDocs},
         |ta AS (SELECT DISTINCT unnest(toks) AS s FROM tok_docs
         |  WHERE source = 'src0'),
         |tb AS (SELECT DISTINCT unnest(toks) AS s FROM tok_docs
         |  WHERE source = 'src1'),
         |inp AS MATERIALIZED (
         |  SELECT s, CAST(42 AS HUGEINT) AS seed
         |  FROM (SELECT s FROM ta UNION SELECT s FROM tb)),
         |${XxhSql.strHashChain("kx")},
         |ha AS (SELECT DISTINCT ${XxhSql.toSigned("x.hf")} AS h
         |  FROM ta JOIN kxf x USING (s) ORDER BY h LIMIT $kmvVocabK),
         |hb AS (SELECT DISTINCT ${XxhSql.toSigned("x.hf")} AS h
         |  FROM tb JOIN kxf x USING (s) ORDER BY h LIMIT $kmvVocabK),
         |th AS (SELECT least(
         |    (SELECT CASE WHEN count(*) < $kmvVocabK THEN $two64
         |       ELSE CAST(max(h) AS HUGEINT) + $two63 + 1 END FROM ha),
         |    (SELECT CASE WHEN count(*) < $kmvVocabK THEN $two64
         |       ELSE CAST(max(h) AS HUGEINT) + $two63 + 1 END FROM hb))
         |  AS t),
         |flt AS (SELECT count(*) AS nc FROM
         |  (SELECT h FROM ha INTERSECT SELECT h FROM hb) c, th
         |  WHERE CAST(c.h AS HUGEINT) + $two63 < th.t)
         |SELECT CAST(flt.nc AS BIGINT) AS n_common,
         |  CAST((CAST(flt.nc AS HUGEINT) * $two64) // th.t AS BIGINT)
         |    AS est_common
         |FROM flt, th""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = W.read(s, dir, "documents")
      def vocab(src: String) = CardSketch.kmvState(
        docs.filter(col("source") === src)
          .select(explode(graft.pipeline.TextAnalysis
            .tokens(col("text"))).as("tok")),
        "tok", k = kmvVocabK)
      val (nc, est) = CardSketch.kmvIntersect(
        vocab("src0"), vocab("src1"), k = kmvVocabK)
      Seq((nc, est)).toDF("n_common", "est_common")
    },

    // HLL register state, hash-certified: xxhash64 (the XxhSql chain),
    // top-p-bit bucket, comparison-cascade rank (no log2 — libm), max
    // per bucket. The sketch itself gets a real oracle, not just its
    // estimate (Spark's own HLL states are engine-private blobs).
    QueryDef("card_hll_state", hllStateSql) { (s, dir) =>
      CardSketch.hllState(W.read(s, dir, "documents"), "doc_id", p = hllP)
    },

    // Mergeability certified cross-engine: the per-bucket max of the
    // two half-corpus sketches must be BIT-IDENTICAL to the whole
    // corpus's sketch — the oracle computes the whole, Spark merges
    // the halves.
    QueryDef("card_hll_merge", hllStateSql) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
      CardSketch.hllMerge(
        CardSketch.hllState(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", p = hllP),
        CardSketch.hllState(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", p = hllP))
    },

    // Semi-supervised label propagation over the certified simhash
    // pair graph: seeds (every 7th doc, labeled by source) spread to
    // their near-dup neighborhoods in 3 clamped synchronous rounds.
    // The oracle rides the same pairs CTE the CC family uses and
    // unrolls the rounds — mode selection (count desc, label asc)
    // replayed exactly.
    QueryDef("dedup_label_prop", {
      def step(i: Int): String = {
        val prev = s"st${i - 1}"
        s"""m$i AS (
           |  SELECT d.x AS doc_id, st.label, count(*) AS cnt
           |  FROM dir d JOIN $prev st ON st.doc_id = d.y
           |  WHERE st.label IS NOT NULL GROUP BY d.x, st.label),
           |w$i AS (
           |  SELECT doc_id, label AS nl FROM (
           |    SELECT doc_id, label, row_number() OVER (
           |      PARTITION BY doc_id ORDER BY cnt DESC, label) AS rk
           |    FROM m$i) WHERE rk = 1),
           |st$i AS (
           |  SELECT st.doc_id, st.seed,
           |    coalesce(st.seed, w.nl, st.label) AS label
           |  FROM $prev st LEFT JOIN w$i w USING (doc_id))""".stripMargin
      }
      s"""WITH ${PipelineQueries.simhashPairsCte},
         |dir AS (
         |  SELECT doc_a AS x, doc_b AS y FROM pairs
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM pairs),
         |seeds AS (
         |  SELECT doc_id, source AS slabel FROM documents
         |  WHERE doc_id % 7 = 0),
         |nodes AS (
         |  SELECT DISTINCT x AS doc_id FROM dir
         |  UNION SELECT doc_id FROM seeds),
         |st0 AS (
         |  SELECT n.doc_id, s.slabel AS seed, s.slabel AS label
         |  FROM nodes n LEFT JOIN seeds s USING (doc_id)),
         |${(1 to 3).map(step).mkString(",\n")}
         |SELECT doc_id, label FROM st3""".stripMargin
    }) { (s, dir) =>
      Dedup.labelPropagation(
        Standing.simhashPairs(s, dir),
        W.read(s, dir, "documents").filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("source").as("label")),
        iters = 3)
    },

    // Fixed-size weight-proportional sampling without RNG state:
    // sequential Poisson priorities w/u from the salted id hash. The
    // oracle recomputes the identical priorities (u is exact — integer
    // numerator over a power-of-two divisor — so w/u is one IEEE
    // division with equal operands in both engines) and replays the
    // global top-n.
    QueryDef("samp_sequential_poisson",
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    CAST(n_chars AS DOUBLE) /
         |      ((${PipelineQueries2.duckHash32("sps")} + 1)
         |        / 4294967296.0) AS pri
         |  FROM documents WHERE n_chars > 0)
         |SELECT doc_id, n_chars,
         |  CAST(floor(pri * 1000) AS BIGINT) AS priority_milli,
         |  CAST(rank AS INT) AS rank
         |FROM (SELECT doc_id, n_chars, pri,
         |    row_number() OVER (ORDER BY pri DESC, doc_id) AS rank
         |  FROM d)
         |WHERE rank <= 500""".stripMargin) { (s, dir) =>
      Sampling.sequentialPoissonSample(W.read(s, dir, "documents"),
        "doc_id", "n_chars", n = 500)
    },

    // Pareto-frontier selection over two lineitem measures: the
    // distributed sample-prune skyline must return exactly the unique
    // skyline set, which the oracle computes by the O(n log n) 2-D
    // sweep (per-x max, running max over strictly-greater x) — two
    // entirely different algorithms, one answer.
    QueryDef("samp_skyline",
      """WITH l AS (SELECT l_orderkey * 10 + l_linenumber AS li_id,
        |    l_extendedprice AS x, l_discount AS y FROM lineitem),
        |g AS (SELECT x, max(y) AS gy FROM l GROUP BY x),
        |r AS (SELECT x, gy, max(gy) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
        |  FROM g)
        |SELECT li_id, x AS l_extendedprice, y AS l_discount
        |FROM l JOIN r USING (x)
        |WHERE l.y = r.gy AND (r.rm IS NULL OR r.rm < l.y)"""
        .stripMargin) { (s, dir) =>
      val li = W.read(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("li_id"),
        col("l_extendedprice"), col("l_discount"))
      Sampling.skyline(li, Seq("l_extendedprice", "l_discount"), "li_id")
    },

    // Serve-only exact line against a session-standing index: the
    // per-query cost of CERTIFIED-exact retrieval (seed scan + bound
    // evaluation + selected-cell scan), with the build paid once by
    // the warmup — comparable against sim_topk_indexed_serve to read
    // the price of exactness directly.
    QueryDef("sim_topk_exact_serve", bruteSql) { (s, dir) =>
      val emb = W.read(s, dir, "embeddings")
      val d = standing.computeIfAbsent(dir, { dd =>
        val p = idxDir("graft-ivf-exact-standing", dd)
        Similarity.buildIvfIndex(W.read(s, dd, "embeddings"), p,
          kCells = 8, iters = 2)
        p
      })
      Similarity.exactIndexedTopK(s, emb.filter(col("vec_id") < 8), d,
          k = k, seedProbe = 1)
        .select("q_id", "c_id", "cos_sim", "rank")
    })
}
