package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.{GraftSession, Tables}
import graft.functions.{FP, TextFns => T}

// Scratch: per-stage timing of the q97 sparse-cosine pipeline.
object ProbeQ97 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q97] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm
    spark.read.parquet(s"$d/documents.parquet").count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val tf = time("tf checkpoint") {
        Tables.documents(spark, d)
          .select(col("doc_id"), explode(T.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
          .repartition(col("doc_id"))
          .localCheckpoint()
      }
      val nDocs = Tables.documents(spark, d).agg(count(lit(1)).as("n_docs"))
      val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("dfreq"))
      val weights = tf
        .join(broadcast(dfreq), Seq("w"))
        .crossJoin(broadcast(nDocs))
        .filter(col("dfreq") * 100 <= col("n_docs") * 90)
        .select(col("doc_id"), col("w"),
          FP.micro(col("tf") * log(col("n_docs") / col("dfreq"))).as("u"))
      time("weights count")(weights.count())
      val norms = weights.groupBy(col("doc_id"))
        .agg(sum(col("u") * col("u")).as("nrm2_u"))
      time("norms count")(norms.count())
      val probes = weights.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("q_id"), col("w"), col("u").as("qu"))
      val dots = weights.join(broadcast(probes), Seq("w"))
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("qu") * col("u")).as("dot_u"))
      time("dots count")(dots.count())
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_u").desc, col("doc_id"))
      val out = dots
        .join(broadcast(norms.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"), col("nrm2_u").as("qn"))),
          Seq("q_id"))
        .join(norms, Seq("doc_id"))
        .withColumn("cos_u", FP.micro(col("dot_u").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm2_u").cast("double")))))
        .withColumn("rank", row_number().over(wRank).cast(LongType))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("doc_id").as("n_id"), col("cos_u"))
        .orderBy("q_id", "rank")
      time("full query count")(out.count())
      if (rep == 2) {
        out.count()
        println(out.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
