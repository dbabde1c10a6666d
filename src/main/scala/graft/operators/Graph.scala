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
    // Materialize the edge list ONCE: every iteration joins against it,
    // and without a checkpoint each pass re-executes the whole upstream
    // candidate-generation pipeline (for near-dup edges: shingling +
    // MinHash + the LSH bucket join over the full corpus).
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    // Convergence witness: min-propagation is MONOTONE — a label only ever
    // decreases, and ids are non-negative — so Σcomp strictly decreases on
    // any change and convergence ⟺ the sum is unchanged. One cheap scan of
    // the checkpointed labels per pass, instead of a labels⋈labels join.
    def labelSum(df: DataFrame): Long = // coalesce: sum of zero rows is NULL
      df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val viaNeighbors = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels.union(viaNeighbors)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations — " +
          "component diameter exceeds the cap; raise maxIters")
    labels
  }
}
