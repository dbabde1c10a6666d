package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.HaversineArgExpr

/** Engine extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession does
  * this) or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  *  - [[SpatialJoinRewrite]] and [[BandJoinRewrite]] join the
  *    operator-optimization batch, so naive distance/band theta-joins
  *    become binned equi-joins before physical planning picks a join
  *    strategy;
  *  - `haversine_arg` becomes a SQL function, making the rewrite reachable
  *    from `spark.sql("... WHERE haversine_arg(a,b,c,d) < 0.01")` too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRewrite)
    e.injectOptimizerRule(_ => BandJoinRewrite)
    e.injectFunction(HaversineArgExpr.registryEntry)
  }
}
