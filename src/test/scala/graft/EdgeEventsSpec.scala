package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Degenerate-EVENT robustness, completing the dirty-table trio
  * ([[EdgeDocsSpec]] documents, [[EdgeVecsSpec]] embeddings): the
  * generator's events always carry a timestamp, a user and valid JSON
  * props, so the driver gate cannot catch a kernel that only breaks on a
  * NULL ts (window assignment), a NULL user (sessionization key), broken
  * JSON (from_json), or an epoch-extreme timestamp. Every registered
  * query must RUN over a corpus planted with all four. */
class EdgeEventsSpec extends SparkSuite {
  import spark.implicits._

  /** sf0.001 with its events REPLACED by the degenerate set. */
  private lazy val dir: String = {
    val dst = graft.TempDirs.create("graft-edgeevents")
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    Files.list(src).forEach { p =>
      Files.copy(p, dst.resolve(p.getFileName.toString))
    }
    Files.delete(dst.resolve("events.parquet"))
    val base = 1700000000L * 1000L // ms
    val rows = (0 until 120).map { i =>
      val ts: Timestamp =
        if (i == 5) null
        else if (i == 9) new Timestamp(0L) // epoch
        else new Timestamp(base + i * 60000L)
      val props =
        if (i == 11) null
        else if (i == 17) "not json {"
        else s"""{"k": ${i % 90}}"""
      (i.toLong, ts,
        if (i == 23) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf(i % 7L),
        Seq("error", "signup", "purchase", "view")(i % 4),
        if (i == 31) Double.NaN else i * 1.5,
        props)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(dst.resolve("events.parquet").toString)
    dst.toString
  }

  test("sweep: every registered query survives the degenerate events") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"queries crashed on the degenerate events:\n${failures.mkString("\n")}")
  }

  test("q83 treats broken/NULL props as NULL k, not a crash") {
    val out = SparkEntry.queries("q83_json_props")(spark, dir)
      .select($"event_type", $"n").as[(String, Long)].collect().toMap
    assert(out.values.sum == 120L, "every event must still be counted")
  }
}
