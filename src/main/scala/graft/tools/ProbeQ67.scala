package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}

// Scratch: stage timing of q67 on a blown-up embeddings table.
object ProbeQ67 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val dir = graft.TempDirs.create("probe67").toString
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nv = emb.agg(max("vec_id")).head.getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    emb.crossJoin(spark.range(mult).select(col("id").as("__rep")))
      .withColumn("vec_id", col("vec_id") + col("__rep") * nv)
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        i => element_at(col("embedding"),
          (pmod(i + col("__rep") * 7, lit(dim)) + 1).cast("int"))))
      .drop("__rep")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q67] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("bucket histogram") {
        val b = Tables.embeddings(spark, dir).select(
          graft.functions.VecFns.lshBucket(
            col("embedding").cast("array<double>"), 4, dim).as("bucket"))
          .groupBy("bucket").count().orderBy(desc("count")).collect()
        println(s"  buckets=${b.length} max=${b.head.getLong(1)} " +
          s"top4=${b.take(4).map(_.getLong(1)).mkString(",")}")
      }
      time("nearDupPairs count") {
        println("  pairs=" +
          graft.queries.EmbeddingQueries.nearDupPairs(spark, dir).count())
      }
      time("full q67") {
        println("  rows=" +
          SparkEntry.queries("q67_semantic_clusters")(spark, dir).count())
      }
    }
    spark.stop()
  }
}
