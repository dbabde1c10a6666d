package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("lastAtOrBefore picks the latest right row at or before each left ts") {
    val purchases = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "ts", "pid")
    val clicks = Seq((1L, 90L), (1L, 100L), (1L, 150L), (2L, 60L))
      .toDF("user_id", "cts")
    val r = AsOf.lastAtOrBefore(purchases, clicks,
      key = "user_id", leftTs = "ts", rightTs = "cts")
      .select($"pid", $"cts").as[(String, Option[Long])]
      .collect().toMap
    assert(r("p1") === Some(100L)) // tie: at-or-before includes equal ts
    assert(r("p2") === Some(150L))
    assert(r("p3") === None) // no click at or before ts=50
  }
}
