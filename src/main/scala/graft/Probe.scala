package graft
import org.apache.spark.sql.SparkSession

// Temporary scratch main for probing reader/plan behavior; not part of the API.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { q =>
      println(s"=== $q plan ===")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
