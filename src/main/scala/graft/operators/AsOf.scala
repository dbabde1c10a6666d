package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-at-or-before) join.
  *
  * Generalizes the reference's value-as-of lookups (nearest bathy index,
  * `np.interp` pressure lookup — /root/reference/src/argostats/bathy/bathy.py:29-30,
  * atlas.py:187) to a distributed operator.
  *
  * Implementation: tag and union both sides, then a single window
  * `max(rightTs) over (key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)`
  * carries the latest right-side timestamp forward onto each left row.
  * One shuffle on `key`, no range/cross join, no skew amplification —
  * the union is partitioned exactly like the output. At equal timestamps
  * the right side sorts first (tag 0 < 1), giving "at-or-before" semantics.
  */
object AsOf {
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
                     key: String, leftTs: String, rightTs: String): DataFrame = {
    val leftCols = left.columns
    val rightPayload = right.columns.filterNot(c => c == key).toSeq

    val taggedLeft = rightPayload.foldLeft(
      left.withColumn("__tag", lit(1)).withColumn("__ts", col(leftTs))
    )((df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val taggedRight = leftCols.filterNot(c => c == key).foldLeft(
      right.withColumn("__tag", lit(0)).withColumn("__ts", col(rightTs))
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // last(_, ignoreNulls) over the running frame = value from the most
    // recent right-side row at or before this left row. Right rows that
    // share (key, ts) are broken by __ts ordering arbitrarily but
    // consistently within the sorted partition.
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag", "__ts")
  }
}
