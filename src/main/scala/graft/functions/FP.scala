package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-point helpers for cross-engine-deterministic aggregation.
  *
  * Floating-point sums depend on evaluation order, so a distributed sum of
  * doubles is not bit-reproducible across engines (or even across runs with
  * different partitioning). The engine's verified aggregates therefore round
  * each row's contribution to an integer number of fixed-point units first:
  * per-row double arithmetic (+,-,*,/) is IEEE-754 deterministic, and the
  * subsequent integer sum is associative, so any plan shape — map-side
  * partial aggregation, AQE re-partitioning, a different engine entirely —
  * produces the identical result.
  *
  * This matters at 100 TB: it means partial aggregation and shuffle-order
  * nondeterminism never show up as result drift.
  */
object FP {
  /** Round to integer hundredths (e.g. cents for money columns). */
  def cents(c: Column): Column = fixed(c, 1e2)

  /** Round to integer micro-units (1e-6 resolution). */
  def micro(c: Column): Column = fixed(c, 1e6)

  /** Round to integer nano-units (1e-9 resolution). */
  def nano(c: Column): Column = fixed(c, 1e9)

  /** Round `c * scale` half-away-from-zero to a long. Matches DuckDB's
    * `CAST(round(c * scale) AS BIGINT)` exactly for |c*scale| < 2^53. */
  def fixed(c: Column, scale: Double): Column =
    round(c * lit(scale)).cast(LongType)

  /** Scala-side half-away-from-zero rounding, matching SQL `round()` in
    * both Spark and DuckDB (`math.round` would round ties toward +∞ and
    * drift on negative ties). For kernels and Aggregators. */
  def roundHalfAway(d: Double): Long =
    if (d >= 0) math.floor(d + 0.5).toLong else math.ceil(d - 0.5).toLong

  /** SQL fragments for the DuckDB oracle mirroring the above. */
  def sqlCents(e: String): String = sqlFixed(e, "100")
  def sqlMicro(e: String): String = sqlFixed(e, "1e6")
  def sqlNano(e: String): String = sqlFixed(e, "1e9")
  def sqlFixed(e: String, scale: String): String =
    s"CAST(round(($e)*$scale) AS BIGINT)"
}
