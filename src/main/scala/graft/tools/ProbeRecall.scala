package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

// Scratch: recall@3 of the LSH (q41) and IVF (q44/q45) indexes vs the
// q40 brute-force ground truth.
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val truth = SparkEntry.queries("q40_knn_bruteforce")(spark, d)
        .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      for (q <- Seq("q41_ann_lsh", "q44_ann_ivf", "q45_ann_ivf_kmeans")) {
        val approx = SparkEntry.queries(q)(spark, d)
          .select(col("q_id"), col("n_id")).withColumn("hit", lit(1))
        val r = truth.join(approx, Seq("q_id", "n_id"), "left")
          .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("h"))
          .head()
        println(f"$d $q recall@3 = ${r.getLong(1).toDouble / r.getLong(0)}%.3f")
      }
    }
    spark.stop()
  }
}
