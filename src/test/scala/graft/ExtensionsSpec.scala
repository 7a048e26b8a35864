package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule: canonical sorted-distinct intersection
  * counts rewrite to the native expression; unsound shapes don't. */
class ExtensionsSpec extends TestBase {

  // parquet-backed so ConvertToLocalRelation can't constant-fold the
  // whole query into a LocalTableScan before the plan is inspectable
  private def fixture = graft.sim.WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "documents")
    .select(split(col("text"), " ").as("a"),
      split(reverse(col("text")), " ").as("b"))

  test("canonical size(array_intersect(sorted distinct)) rewrites to the native merge") {
    GraftExtensions.install(spark)
    try {
      val df = fixture.select(
        size(array_intersect(
          sort_array(array_distinct(col("a"))),
          sort_array(array_distinct(col("b"))))).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("sorted_intersect_count"),
        s"rule did not fire:\n$plan")
      // results identical to the un-rewritten query
      GraftExtensions.uninstall(spark)
      val expected = fixture.select(
        size(array_intersect(
          sort_array(array_distinct(col("a"))),
          sort_array(array_distinct(col("b"))))).as("n"))
        .collect().map(_.getInt(0)).toSeq
      assert(!expected.isEmpty)
      GraftExtensions.install(spark)
      assert(df.collect().map(_.getInt(0)).toSeq == expected)
    } finally GraftExtensions.install(spark) // restore constructed-session state
  }

  test("unsound shapes are left alone") {
    GraftExtensions.install(spark)
    try {
      // no array_distinct → duplicates possible → merge-count would
      // disagree with array_intersect's dedup → must NOT rewrite
      val noDistinct = fixture.select(
        size(array_intersect(sort_array(col("a")), sort_array(col("b")))).as("n"))
      assert(!noDistinct.queryExecution.executedPlan.toString
        .contains("sorted_intersect_count"))
      // descending sort → not merge-compatible → must NOT rewrite
      val desc = fixture.select(
        size(array_intersect(
          sort_array(array_distinct(col("a")), asc = false),
          sort_array(array_distinct(col("b")), asc = false))).as("n"))
      assert(!desc.queryExecution.executedPlan.toString
        .contains("sorted_intersect_count"))
    } finally GraftExtensions.install(spark) // restore constructed-session state
  }

  test("blocklist rewrite: large literal alternations become multi_match, " +
      "small/unsafe patterns stay regex") {
    // parquet-backed source so ConvertToLocalRelation can't fold the
    // expression away before the plan is inspectable
    val docs = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "documents")
    def pat(ps: Seq[String]) = ps.mkString("\\b(", "|", ")\\b")
    def q(pattern: String) = docs.select(
      size(regexp_extract_all(lower(col("text")), lit(pattern), lit(1)))
        .as("n"))
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n")).collect().head.getLong(0)

    // 22 distinct prefix-free phrases (>= threshold), INCLUDING suffix
    // pairs ("slow join"/"join", "table scan"/"scan" — the shape the
    // round-8 advice showed the old matcher undercounting) -> rewritten,
    // and the rewrite must not change results
    val big = (0 until 18).map(i => s"zz$i w") ++
      Seq("table scan", "slow join", "join", "scan")
    val rewritten = q(pat(big))
    assert(rewritten.queryExecution.executedPlan.toString
      .contains("multi_match"), "expected the AC rewrite to fire")
    val acTotal = total(rewritten)
    // same query with the rule removed = the genuine regex path.
    // try/finally: an assertion failure mid-comparison must not leave the
    // shared session uninstalled and cascade into unrelated tests.
    val reTotal =
      try {
        GraftExtensions.uninstall(spark)
        val regexPath = q(pat(big))
        assert(!regexPath.queryExecution.executedPlan.toString
          .contains("multi_match"))
        total(regexPath)
      } finally GraftExtensions.install(spark)
    assert(acTotal === reTotal,
      s"rewrite changed results: ac $acTotal vs regex $reTotal")
    assert(reTotal > 0)

    // space-edged phrase -> \b semantics invert vs the scanner; must
    // never be rewritten (stays on the regex path). " scan" keeps the
    // list distinct and prefix-free so only the edge guard is tested.
    val spaceEdged = q(pat(big.dropRight(1) :+ " scan"))
    assert(!spaceEdged.queryExecution.executedPlan.toString
      .contains("multi_match"))

    // below the threshold -> stays regex
    val small = q(pat(Seq("table scan", "slow join")))
    assert(!small.queryExecution.executedPlan.toString
      .contains("multi_match"))
    assert(total(small) > 0)

    // metacharacters / prefix pairs -> never rewritten
    val meta = q(pat(big.dropRight(1) :+ "a.c"))
    assert(!meta.queryExecution.executedPlan.toString.contains("multi_match"))
    val prefixy = q(pat(big :+ "table scan extended"))
    assert(!prefixy.queryExecution.executedPlan.toString
      .contains("multi_match"))
  }

  test("withExtensions wiring registers the rule and minhash_sig at session build") {
    // the class-based path used by spark.sql.extensions deployments
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    // nothing to assert beyond "injection calls accepted" without building
    // a second SparkContext; the rule body itself is covered above
    succeed
  }
}
