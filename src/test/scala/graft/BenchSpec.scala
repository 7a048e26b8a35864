package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's baseline resolution: the stall-escape loop is
  * driven by `Bench.parseBaselines`, and a silent parse failure would
  * disable it without any visible symptom — so pin the parser against
  * both fixtures and the repo's real BASELINE.md. */
class BenchSpec extends AnyFunSuite {

  test("parseBaselines: last table line per query wins; notes ignored") {
    val f = java.nio.file.Files.createTempFile("baseline", ".md")
    java.nio.file.Files.write(f,
      """# header
        || query | sf | sec |
        ||---|---|---|
        || q_alpha | 0.1 | 0.5 |
        |prose in between
        || q_beta | 0.1 | 1.25 | with a note column |
        || q_alpha | 0.1 | 0.9 |
        || not-a-query | 0.1 | 3 |
        || q_gamma | 0.2 | 7.0 |
        |""".stripMargin.getBytes("UTF-8"))
    val m = Bench.parseBaselines(f.toString)
    assert(m("q_alpha") === 0.9, "re-record must supersede the older line")
    assert(m("q_beta") === 1.25, "note column must not break the match")
    assert(!m.contains("q_gamma"), "only sf 0.1 lines are gate baselines")
    assert(!m.contains("not-a-query"), "names are [a-z0-9_]")
    java.nio.file.Files.delete(f)
  }

  test("parseBaselines: missing file disables the loop (empty map)") {
    assert(Bench.parseBaselines("/nonexistent/BASELINE.md").isEmpty)
  }

  test("the real BASELINE.md resolves a baseline for every declared query") {
    val m = Bench.parseBaselines("BASELINE.md")
    val missing = SparkEntry.allDefs.map(_.name).filterNot(m.contains)
    assert(missing.isEmpty,
      s"queries without a recorded sf0.1 baseline: $missing")
    // round-10 re-records are live (not shadowed by older lines)
    assert(m("f3_part_name_codec") === 0.85)
    assert(m("w4_session_window") === 1.0)
    assert(m("pipe_incremental_e2e") === 1.5)
  }
}
