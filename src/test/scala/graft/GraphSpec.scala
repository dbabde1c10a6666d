package graft

import graft.operators.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("connected components: chains, cliques, isolated vertices") {
    // components: {1,2,3,4} (path), {10,11,12} (triangle), {20} isolated
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
      (12L, 10L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val got = Graph.connectedComponents(edges, verts)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("converged labels are partition-invariant") {
    val edges = (0L until 21L).map(i => (i, (i + 1) % 21)).toDF("src", "dst")
    val verts = (0L until 21L).toDF("id")
    val a = Graph.connectedComponents(edges.repartition(1), verts.repartition(1))
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.connectedComponents(edges.repartition(5), verts.repartition(3))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a.forall(_._2 === 0L), "ring must collapse to vertex 0")
  }

  test("a 300-vertex path converges in O(log L) passes (pointer jumping)") {
    // Plain propagation needs L passes for a length-L path and would throw
    // at the default maxIters=50; with the per-pass pointer jump, reach
    // doubles each pass, so ~log2(300) + slack passes suffice. maxIters=12
    // pins the asymptotic, not just the outcome.
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until 300L).toDF("id")
    val got = Graph.connectedComponents(edges, verts, maxIters = 12)
      .as[(Long, Long)].collect()
    assert(got.length === 300)
    assert(got.forall(_._2 == 0L), "path must collapse to vertex 0")
  }

  test("empty vertex set returns an empty result, not an error") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val verts = Seq.empty[Long].toDF("id")
    assert(Graph.connectedComponents(edges, verts).count() == 0)
  }
}
