package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashSig
import graft.pipeline.Dedup

/** Native minhash_sig expression: determinism, codegen path, LSH recall on
  * a constructed near-dup corpus, SQL registration via extensions. */
class MinHashSigSpec extends TestBase {

  test("signature is deterministic, k-length, and min-stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")), // identical shingles
      (3L, Seq("x y z")),
      (4L, Seq.empty[String])).toDF("doc_id", "sh")
    val sigs = docs.select(col("doc_id"),
      MinHashSig(spark, col("sh"), 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1).length == 8)
    assert(sigs(1) == sigs(2), "identical shingle sets must hash identically")
    assert(sigs(1) != sigs(3))
    assert(sigs(4).forall(_ == Long.MaxValue), "empty set → sentinel")
    // superset can only lower each component (min-stability)
    val superset = Seq((5L, Seq("a b c", "b c d", "c d e", "zzz extra one")))
      .toDF("doc_id", "sh")
      .select(MinHashSig(spark, col("sh"), 8)).as[Seq[Long]].head()
    assert(superset.zip(sigs(1)).forall { case (sup, base) => sup <= base })
  }

  test("interpreted eval matches codegen eval") {
    import spark.implicits._
    val df = Seq((1L, Seq("p q r", "q r s"))).toDF("doc_id", "sh")
    val viaCodegen = df.select(MinHashSig(spark, col("sh"), 4)).as[Seq[Long]].head()
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("p q r", "q r s").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val interpreted = MinHashSig.compute(arr, 4).toSeq
    assert(viaCodegen == interpreted)
  }

  test("fast LSH finds constructed near-duplicates") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " altered tail"
    val unrelated = (1 to 60).map(i => s"other$i word$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairsFast(docs)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.8),
      s"expected (1,2) high-jaccard pair, got ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("robust LSH: exact pre-pass collapses clones; bucket cap bounds candidates") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    // 30 identical clones: un-capped LSH would emit 435 pairs from one
    // bucket; the pre-pass collapses them to one representative → 0 pairs
    val clones = (1 to 30).map(i => (i.toLong, text)).toDF("doc_id", "text")
    assert(Dedup.minhashLshPairsRobust(clones).count() == 0)

    // near-dups (not exact) still pair up through the capped path
    val nearDup = (1 to 19).map(i => s"tok$i").mkString(" ") + " changed"
    val mixed = clones.unionAll(Seq((100L, nearDup)).toDF("doc_id", "text"))
    val pairs = Dedup.minhashLshPairsRobust(mixed)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq.map(p => (p._1, p._2)) == Seq((1L, 100L)),
      s"got ${pairs.mkString(",")}")

    // the cap keeps only `cap` ids per (band_idx, band_hash) bucket
    val unpivoted = (1 to 10).map(i => (i.toLong, 1, 42L))
      .toDF("doc_id", "band_idx", "band_hash")
    assert(Dedup.capBuckets(unpivoted, 3).as[(Long, Int, Long)].collect()
      .map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("sorted_intersect_count matches array_intersect semantics") {
    import spark.implicits._
    import graft.functions.SortedIntersectCount
    val rows = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
      (Seq.empty[String], Seq("x")),
      (Seq("a"), Seq("a")),
      (Seq("a", "z"), Seq("b", "y")))
    val df = rows.toDF("xs", "ys")
    val got = df.select(
      SortedIntersectCount(spark, col("xs"), col("ys")).as("n"),
      size(array_intersect(col("xs"), col("ys"))).as("expected"))
      .as[(Int, Int)].collect().toSeq
    assert(got.forall { case (n, e) => n == e }, s"got $got")
    // interpreted compute() agrees with the codegen (df) results on the
    // SAME inputs
    val arr = (s: Seq[String]) =>
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        s.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    rows.zip(got).foreach { case ((xs, ys), (n, _)) =>
      assert(SortedIntersectCount.compute(arr(xs), arr(ys)) == n)
    }
    // null elements (sorted first) must not NPE and must match
    // array_intersect's null-intersects-null semantics via SQL
    SortedIntersectCount.register(spark)
    val withNulls = spark.sql(
      """SELECT sorted_intersect_count(
        |  array(CAST(NULL AS STRING), 'a', 'b'),
        |  array(CAST(NULL AS STRING), 'b', 'c')) AS n,
        |  size(array_intersect(
        |    array(CAST(NULL AS STRING), 'a', 'b'),
        |    array(CAST(NULL AS STRING), 'b', 'c'))) AS expected""".stripMargin)
      .as[(Int, Int)].head()
    assert(withNulls._1 == withNulls._2 && withNulls._1 == 2, s"$withNulls")
    // nulls AFTER non-nulls (arbitrary SQL can pass unsorted arrays) must
    // not NPE either; both-sides-null still counts once
    val midNulls = spark.sql(
      """SELECT sorted_intersect_count(
        |  array('a', CAST(NULL AS STRING), 'b'),
        |  array('b', 'c', CAST(NULL AS STRING))) AS n""".stripMargin)
      .as[Int].head()
    assert(midNulls == 2, s"mid-array nulls: got $midNulls")
    val oneSideNull = spark.sql(
      """SELECT sorted_intersect_count(
        |  array('a', CAST(NULL AS STRING)),
        |  array('a', 'b')) AS n""".stripMargin).as[Int].head()
    assert(oneSideNull == 1, s"one-side null: got $oneSideNull")
  }

  test("repeated operator calls hold at most one internal cache entry each") {
    import spark.implicits._
    Dedup.clearCaches()
    spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(false))
    def docs(salt: Int) = (1 to 20)
      .map(i => (i.toLong, s"alpha$salt tok$i beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // distinct inputs per call — each re-registration must unpersist the
    // previous call's frame instead of accruing one entry per call
    Dedup.minhashLshPairs(docs(1)).count()
    Dedup.minhashLshPairs(docs(2)).count()
    Dedup.simhashPairs(docs(1)).count()
    Dedup.simhashPairs(docs(2)).count()
    Dedup.minhashLshPairsFast(docs(1)).count()
    Dedup.minhashLshPairsFast(docs(2)).count()
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 3, s"$live cached RDDs after repeat calls (expected <=3)")
    // repeat call on the SAME input keeps the live cache (no self-evict)
    Dedup.minhashLshPairsFast(docs(2)).count()
    assert(spark.sparkContext.getPersistentRDDs.size <= 3)
    Dedup.clearCaches()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clearCaches left cached RDDs behind")
  }

  test("minhash_sig registers for SQL use") {
    MinHashSig.register(spark)
    import spark.implicits._
    val out = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d')) AS sig").as[Seq[Long]].head()
    assert(out.length == 8)
    val out4 = spark.sql(
      "SELECT minhash_sig(array('a b c'), 4) AS sig").as[Seq[Long]].head()
    assert(out4.length == 4)
  }
}
