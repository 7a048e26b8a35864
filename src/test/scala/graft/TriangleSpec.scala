package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Degree-oriented triangle counting ([[Dedup.triangleCounts]] /
 * [[Dedup.triangleStats]]): hand-checkable graphs, a brute-force
 * cross-check on a pseudo-random graph, input normalization
 * (duplicates / reversed pairs / self-loops), and the coefficient's
 * integer micro-unit algebra.
 */
class TriangleSpec extends TestBase {

  import spark.implicits._

  private def counts(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Dedup.triangleCounts(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a triangle plus a pendant: per-node counts and coefficients") {
    // triangle 1-2-3, pendant 3-4
    val got = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got(1L) == ((2L, 1L, 1000000L)), "deg 2, 1 tri, cc = 1")
    assert(got(2L) == ((2L, 1L, 1000000L)))
    // node 3: deg 3, 1 triangle of C(3,2)=3 possible -> 1/3 floored
    assert(got(3L) == ((3L, 1L, 333333L)))
    assert(got(4L) == ((1L, 0L, 0L)), "degree-1 node: cc pinned to 0")
  }

  test("two triangles sharing an edge count each exactly once") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    val got = counts(g)
    assert(got.values.map(_._2).sum == 2L * 3L,
      "per-node counts sum to 3 * n_triangles")
    assert(got(2L)._2 == 2L && got(3L)._2 == 2L)
    assert(got(1L)._2 == 1L && got(4L)._2 == 1L)
    val stats = Dedup.triangleStats(g.toDF("doc_a", "doc_b")).collect()(0)
    assert(stats.getLong(stats.fieldIndex("n_triangles")) == 2L)
    assert(stats.getLong(stats.fieldIndex("n_nodes")) == 4L)
    assert(stats.getLong(stats.fieldIndex("n_edges")) == 5L)
  }

  test("duplicate, reversed, and self-loop input pairs normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val got = counts(messy)
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((2L, 1L, 1000000L)))
  }

  test("triangle-free graphs report zero everywhere; star hub has cc 0") {
    // star: hub 1 with 4 leaves — many wedges, no closures
    val got = counts(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got.values.forall(_._2 == 0L))
    val stats = Dedup.triangleStats(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("doc_a", "doc_b"))
      .collect()(0)
    assert(stats.getLong(stats.fieldIndex("n_triangles")) == 0L)
    assert(stats.getLong(stats.fieldIndex("transitivity_micro")) == 0L)
    // wedges are the UNDIRECTED paths of length 2 (standard
    // transitivity denominator): the hub contributes C(4,2) = 6 —
    // orientation bounds the triangle ENUMERATION (each leaf has
    // out-degree 1, so the closing join touches 0 oriented wedges),
    // but the reported denominator stays the textbook one
    assert(stats.getLong(stats.fieldIndex("n_wedges")) == 6L)
  }

  test("matches brute-force enumeration on a pseudo-random graph") {
    // deterministic: edge (i, j) present iff xxhash-free arithmetic mix
    // lands in a band — ~200 edges over 40 nodes
    val edges = for {
      i <- 0L until 40L
      j <- (i + 1) until 40L
      if ((i * 2654435761L + j * 40503L) % 97L) < 25L
    } yield (i, j)
    val df = edges.toDF("doc_a", "doc_b")
    val got = Dedup.triangleStats(df).collect()(0)
    // brute force: all i<j<k triples with all three edges present
    val eset = edges.toSet
    def has(a: Long, b: Long) = eset.contains((a, b))
    val brute = (for {
      i <- 0L until 40L; j <- (i + 1) until 40L; k <- (j + 1) until 40L
      if has(i, j) && has(i, k) && has(j, k)
    } yield 1).size.toLong
    assert(got.getLong(got.fieldIndex("n_triangles")) == brute)
    assert(got.getLong(got.fieldIndex("n_edges")) == edges.size.toLong)
    // per-node counts triple-count the global total
    val per = Dedup.triangleCounts(df).agg(sum("tri")).collect()(0).getLong(0)
    assert(per == 3L * brute)
  }

  test("degCap drops full-degree hubs before wedges form, recomputes " +
      "subgraph degrees, and drops isolated leftovers") {
    // hub 1 over leaves 2..6 (deg 5), plus triangle {2,3,4}
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (3L, 4L), (2L, 4L))
    val uncapped = counts(g)
    assert(uncapped(1L)._2 == 3L, "hub closes 3 triangles uncapped")
    assert(uncapped.values.map(_._2).sum == 3L * 4L)
    val capped = Dedup.triangleCounts(g.toDF("doc_a", "doc_b"),
        degCap = Some(4)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(!capped.contains(1L), "over-cap hub excluded")
    assert(!capped.contains(5L) && !capped.contains(6L),
      "nodes isolated by hub removal drop out")
    assert(capped == Map(
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L)),
      4L -> ((2L, 1L, 1000000L))),
      s"subgraph degrees recomputed, got $capped")
    val stats = Dedup.triangleStats(g.toDF("doc_a", "doc_b"),
      degCap = Some(4)).collect()(0)
    assert(stats.getLong(stats.fieldIndex("n_nodes")) == 3L)
    assert(stats.getLong(stats.fieldIndex("n_edges")) == 3L)
    assert(stats.getLong(stats.fieldIndex("n_triangles")) == 1L)
    assert(stats.getLong(stats.fieldIndex("transitivity_micro"))
      == 1000000L)
  }

  test("the triangle plan is equi-join only: no cartesian product") {
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val plan = Dedup.triangleCounts(df).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"triangle counting must never degrade to a cartesian join:\n$plan")
  }
}
