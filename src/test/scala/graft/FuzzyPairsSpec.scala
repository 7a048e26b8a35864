package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Blocked Levenshtein matching ([[Dedup.fuzzyPairs]]): hand-checked
  * distances, blocking recall semantics, threshold edge, and the
  * deterministic block cap. */
class FuzzyPairsSpec extends TestBase {

  import spark.implicits._

  private val rows = Seq(
    (1L, "red widget", "t"), (2L, "red widgat", "t"), // dist 1
    (3L, "red bolt", "t"),                            // dist 5 to #1
    (4L, "blue widget", "t"),                         // blocked apart ('b')
    (5L, "red widget", "u")                           // other type
  ).toDF("id", "name", "typ")

  private def pairs(maxDist: Int, cap: Option[Int] = None) =
    Dedup.fuzzyPairs(rows, "id", "name",
      Seq(col("typ"), substring(col("name"), 1, 1)), maxDist, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getDouble(3))).sortBy(p => (p._1, p._2)).toSeq

  test("hand-checked distances and normalized sim; threshold is " +
      "inclusive") {
    val got = pairs(1)
    assert(got == Seq((1L, 2L, 1, 0.9)),
      s"only the dist-1 pair under the block key, got $got")
    assert(pairs(0).isEmpty, "maxDist 0 only matches exact strings")
  }

  test("blocking is the recall trade: a first-char mismatch hides an " +
      "otherwise-close pair; a type mismatch hides an exact one") {
    val got = pairs(6).map(p => (p._1, p._2))
    assert(!got.contains((1L, 4L)),
      "'blue widget' blocks under 'b' — never compared to 'red widget'")
    assert(!got.contains((1L, 5L)),
      "same name, different type — never compared")
    assert(got.contains((1L, 3L)), "dist-5 pair inside the block appears")
  }

  test("sorted-neighborhood: equals the naive windowed definition; " +
      "pairs straddling bucket boundaries appear exactly once") {
    val data = (1L to 200L).map(i => (i, f"name ${(i * 37) % 100}%03d"))
      .toDF("id", "name")
    val got = Dedup.fuzzyPairsSorted(data, "id", "name",
        window = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_.toString).toSeq
    // naive: rank by (name, id), compare each to its 4 successors
    val ranked = (1L to 200L).map(i => (i, f"name ${(i * 37) % 100}%03d"))
      .sortBy { case (id, s) => (s, id) }.zipWithIndex
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val naive = (for {
      ((ia, sa), ra) <- ranked
      ((ib, sb), rb) <- ranked
      if rb > ra && rb - ra <= 4
      d = lev(sa, sb) if d <= 2
    } yield (math.min(ia, ib), math.max(ia, ib), d))
      .sortBy(_.toString)
    assert(got == naive)
    assert(got.size == got.distinct.size, "no pair may appear twice")
  }

  test("blockCap bounds a hot block deterministically (lowest ids kept)") {
    val hot = (1L to 100L).map(i => (i, s"name $i", "t"))
      .toDF("id", "name", "typ")
    val capped = Dedup.fuzzyPairs(hot, "id", "name",
        Seq(col("typ")), maxDist = 10, blockCap = Some(10))
      .collect()
    val ids = capped.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.forall(_ <= 10L),
      s"cap must keep the 10 lowest ids, got $ids")
    assert(capped.length <= 45)
  }
}
