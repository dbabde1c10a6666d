package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregates

class AggregatesSpec extends SparkSuite {
  import spark.implicits._

  test("productLong: QC combine truth table (reference tests/test_toctools.py:55-60)") {
    // any zero poisons the group; all-positive stays positive
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 0L), ("a", 1L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L))
      .toDF("k", "qc")
    val r = df.groupBy($"k").agg(Aggregates.productLong($"qc").as("p"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("a") === 0L)
    assert(r("b") === 120L)
  }

  test("weightedArrayMeanFP: elementwise weighted sums with trailing weight") {
    val df = Seq(
      (2L, Seq(1.0f, 2.0f)),
      (1L, Seq(4.0f, -2.0f)))
      .toDF("w", "xs")
    val out = df.agg(Aggregates.weightedArrayMeanFP(2)($"w", $"xs").as("s"))
      .selectExpr("s[0]", "s[1]", "s[2]").as[(Long, Long, Long)].head()
    // sums of w * round(x*1e9): [2*1e9 + 4e9, 2*2e9 - 2e9, 3]
    assert(out._1 === 6L * 1000000000L)
    assert(out._2 === 2L * 1000000000L)
    assert(out._3 === 3L)
  }

  test("simhash64: identical bags agree, disjoint bags differ") {
    val df = Seq(
      ("a", 0x0F0FL), ("a", 0x0F0FL), ("a", 0x00FFL),
      ("b", 0x0F0FL), ("b", 0x0F0FL), ("b", 0x00FFL),
      ("c", -1L), ("c", -1L))
      .toDF("k", "h")
    val r = df.groupBy($"k").agg(Aggregates.simhash64($"h").as("sig"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("a") === r("b"))
    assert(r("c") === -1L) // all-ones bag → all bits voted 1
    assert(r("a") !== r("c"))
  }
}
