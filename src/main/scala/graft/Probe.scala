package graft
import org.apache.spark.sql.SparkSession

// Temporary scratch main for probing reader/plan behavior; not part of the API.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    try spark.read.parquet(s"$d/lineitem.parquet").count() catch { case _: Throwable => }
    val q71 = SparkEntry.queries("q71_argo_atlas")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      q71(spark, d).count()
      println(f"[probe] q71 rep $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
