package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary scratch main for probing reader/plan behavior; not part of the API.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // stage-by-stage q71 cost
    import graft.argo.{Atlas, Interpolator, SummaryBuilder}
    val qm = graft.queries.ArgoQueries
    val rawHeader = qm.getClass.getDeclaredMethods
    // replicate q71 internals
    val orders = Tables.orders(spark, d).filter(col("o_orderkey") % 10 === 0)
    println(s"profiles(raw) = ${orders.count()}")
    time("warm")(spark.read.parquet(s"$d/orders.parquet").count())
    val q70 = SparkEntry.queries("q70_argo_interp")
    time("q70 interp")(q70(spark, d).count())
    time("q70 interp again")(q70(spark, d).count())
    val q71 = SparkEntry.queries("q71_argo_atlas")
    time("q71 full uncached 1")(q71(spark, d).count())
    time("q71 full uncached 2")(q71(spark, d).count())
    // no-persist stage split
    val raw = graft.queries.ArgoQueries.rawHeaderProbe(spark, d)
    val summary = SummaryBuilder.build(spark, raw)
    val profiles = Interpolator.interpolate(
      graft.queries.ArgoQueries.samplesProbe(summary), summary)
    time("profiles count (no cache)")(profiles.count())
    val atlas = new Atlas(box = (-20.0, 50.0, -50.0, -20.0), reso = 5.0)
    time("pairs count (no cache)")(atlas.pairs(spark, profiles).count())
    val ts = atlas.climTS(spark, profiles).filter(col("CT") =!= 0.0f)
    java.nio.file.Files.writeString(java.nio.file.Path.of("/tmp/q71_plan.txt"),
      ts.queryExecution.executedPlan.treeString(true))
    time("climTS count (no cache)")(ts.count())
    time("prof forced per pair")(
      atlas.pairs(spark, profiles).select(sum(length(col("prof")))).collect())
    time("climTS + orderBy + count")(
      atlas.climTS(spark, profiles).filter(col("CT") =!= 0.0f)
        .orderBy("lon", "lat", "pres").count())
    time("climTS + orderBy again")(
      atlas.climTS(spark, profiles).filter(col("CT") =!= 0.0f)
        .orderBy("lon", "lat", "pres").count())
    spark.stop()
  }
}
