package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * All entry points (tests, Verify, Bench) go through here so plans are
  * reproducible: UTC timestamps, AQE on, shuffle parallelism sized for the
  * actual cluster (32 local threads here; on a real cluster this is set per
  * deployment, with AQE coalescing doing the fine-tuning at runtime).
  */
object GraftSession {
  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's reader
    * rejects by default; this maps it to LongType (epoch nanos). */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(NanosAsLong, "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the configs a caller-supplied session must carry (Verify/Bench
    * build their own sessions per the driver contract). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set(NanosAsLong, "true")
    spark
  }
}
