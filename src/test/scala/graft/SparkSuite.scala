package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs (one JVM-wide session —
  * Spark startup dominates test wall-time otherwise). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
}

object SparkSuite {
  lazy val session: SparkSession = {
    // local[4, 2]: maxFailures = 2, i.e. one task RETRY — bare local[N]
    // pins maxFailures to 1, under which no spec could ever exercise the
    // failure-recompute path a real cluster lives with (RecomputeSpec
    // injects a first-attempt failure and asserts bit-identical results).
    // Every kernel here is deterministic, so a genuine defect still fails
    // the suite: it fails both attempts.
    val s = GraftSession.builder(master = "local[4, 2]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
