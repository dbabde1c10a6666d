package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph primitives for the dedup family. */
object Graph {

  /** Connected components by min-label propagation over an undirected edge
    * list: every vertex converges to the smallest id reachable from it —
    * the canonical document of its near-duplicate cluster.
    *
    * Each iteration is one join (current labels onto the symmetric edge
    * list) plus one groupBy-min, both shuffling on well-distributed vertex
    * ids; the driver sees only the changed-label count. Iteration count is
    * O(component diameter) — near-dup graphs are dense cliques of
    * diameter 1-2, so this converges in 2-3 passes where a path graph
    * would need its length (maxIters guards that pathology).
    * `localCheckpoint` truncates the growing lineage each pass.
    *
    * Deterministic: the fixpoint (min reachable id per vertex) is unique
    * regardless of execution schedule, so converged output is
    * partition-invariant even though intermediate labels are not.
    *
    * @param edges    (src, dst) pairs, undirected (one direction given)
    * @param vertices (id) — every vertex, including isolated ones
    * @param maxIters hard cap on passes; if the fixpoint is NOT reached
    *                 (a path-shaped component longer than maxIters) the
    *                 labels would be silently wrong, so this THROWS
    *                 instead of returning unconverged output
    * @return (id, comp) with comp = min id in the component
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
                          maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val viaNeighbors = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels.union(viaNeighbors)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp")).count()
      labels = next
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations " +
          s"($changed labels still changing) — component diameter exceeds " +
          "the cap; raise maxIters")
    labels
  }
}
