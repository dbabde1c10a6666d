package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** IVF-partitioned embedding storage — the at-rest layout for ANN search
  * at 100 TB, completing the layout trio with [[graft.argo.AtlasStore]]
  * (spatial bins) and [[DocStore]] (content fingerprint).
  *
  * The q44/q45 inverted-file queries already score only the nProbe
  * nearest cells, but from a plain store the scan still READS the whole
  * corpus before the cell filter drops it. Landing vectors partitioned
  * by their trained coarse-quantizer cell turns the cell filter into
  * partition PRUNING: a probe of nProbe cells out of k reads ~nProbe/k
  * of the files — the IVF promise applied to the storage layer, where at
  * 100 TB the scan itself is the dominant cost. (Directory partitioning,
  * not bucketing: the win is skipping bytes, not skipping a shuffle —
  * cell cardinality is low and probe joins broadcast.)
  */
object VecStore {
  /** embeddings + `cell` id from a trained coarse quantizer — delegated
    * to [[KMeans.withCell]], the same assignment the q45 oracle verifies. */
  def assign(embs: DataFrame, model: Array[Array[Double]]): DataFrame =
    KMeans.withCell(embs.drop("cell"), model, "embedding")

  /** Land `embs` under `path` partitioned by quantizer cell. Pick the
    * quantizer k so one cell's vectors fit an executor comfortably at the
    * target scale (k grows with the corpus; re-train and re-land to
    * re-balance). */
  def savePartitioned(embs: DataFrame, model: Array[Array[Double]],
                      path: String): Unit =
    assign(embs, model).write.mode("overwrite").partitionBy("cell").parquet(path)

  def load(s: SparkSession, path: String): DataFrame = s.read.parquet(path)
}
