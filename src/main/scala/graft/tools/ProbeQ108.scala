package graft.tools

import graft.{GraftSession, SparkEntry}

// Scratch: where q108's wall goes — reps 2+ isolate the streaming
// machinery (the profile memo and stream-source parquet are warm), and
// the per-batch durationMs breakdown from the last StreamingQueryProgress
// attributes it (triggerExecution vs addBatch vs state commit). Backs
// the q108 trim analysis in SCALING.md.
object ProbeQ108 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    // warm the session like Bench does
    spark.read.parquet(s"$sf/orders.parquet").count()
    // per-batch attribution from the engine's own progress events
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        def onQueryStarted(e: QueryStartedEvent): Unit = ()
        def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          import scala.jdk.CollectionConverters._
          val dm = p.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[q108] batch ${p.batchId} rows=${p.numInputRows} $dm")
        }
      })
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q108_atlas_stream")(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q108] rep $i  $dt%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
