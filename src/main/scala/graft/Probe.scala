package graft
import org.apache.spark.sql.SparkSession

// Temporary scratch main for probing reader/plan behavior; not part of the API.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("=== q02 filter+project plan (expect PushedFilters + pruned ReadSchema) ===")
    SparkEntry.queries("q02_filter_project")(spark, d).explain("formatted")
    println("=== q13 join plan (expect BroadcastHashJoin for nation) ===")
    SparkEntry.queries("q13_join_agg")(spark, d).explain("formatted")
    spark.stop()
  }
}
