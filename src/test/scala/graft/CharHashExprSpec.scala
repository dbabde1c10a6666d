package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharHashExpr, TextFns}

/** Native-expression correctness: the codegen'd CharHashExpr must be
  * bit-identical to the HOF specification (which also generates the
  * DuckDB oracle fragment) — including nulls, empties, and non-ASCII BMP.
  */
class CharHashExprSpec extends SparkSuite {
  import spark.implicits._

  test("CharHashExpr equals the HOF charHash on varied inputs") {
    val data = Seq("", "a", "hello world", "The quick brown fox",
      "ümlaut és ßharp", "line\nbreak\ttab", "x" * 5000,
      "0123456789" * 40).toDF("s")
    val rows = data.select(
      CharHashExpr.charHashNative(col("s")).as("native"),
      TextFns.charHash(col("s")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("CharHashExpr propagates null") {
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(CharHashExpr.charHashNative(col("s"))).collect()
    assert(out(1).isNullAt(0))
  }
}
