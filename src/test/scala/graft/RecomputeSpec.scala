package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** Executor-loss determinism, exercised rather than argued. SCALING.md
  * claims fixed-point accumulation makes failure recompute bit-identical
  * (partial aggregation + a lost task's re-run cannot change results);
  * this spec injects an actual first-attempt task failure under the
  * atlas aggregation and asserts the result equals the clean run EXACTLY
  * — the mechanism is Spark task retry (`local[4, 2]` in [[SparkSuite]];
  * bare local mode pins maxFailures=1 and aborts instead of retrying)
  * plus the order-independent integer buffers of ProfileMeanPacked2.
  */
object RecomputeSpec {
  /** JVM-global one-shot so exactly ONE task attempt fails across every
    * job the query runs (local mode: executors share the driver JVM). */
  val fired = new AtomicBoolean(false)
}

class RecomputeSpec extends SparkSuite {
  import spark.implicits._

  test("injected task failure: the atlas recompute is bit-identical to the clean run") {
    val d = "/root/testdata/sf0.001"
    val prof = graft.queries.ArgoQueries.profilesProbe(spark, d)
    val atlas = graft.queries.ArgoQueries.ExportAtlas
    def rows(df: DataFrame) =
      df.select($"lon", $"lat", $"pres", $"CT", $"SR")
        .as[(Float, Float, Float, Float, Float)].collect().toSeq.sorted
    val want = rows(atlas.climTS(spark, prof).filter($"CT" =!= 0.0f))
    // chaos wrapper: the FIRST attempt of the first profile partition
    // this JVM schedules dies mid-scan — the shape of an executor loss
    // under the aggregation's map side. RDD round-trip is test-only
    // scaffolding (it pins where the failure lands); production plans
    // stay Tungsten end-to-end.
    RecomputeSpec.fired.set(false)
    val chaotic = spark.createDataFrame(
      prof.rdd.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 && !RecomputeSpec.fired.getAndSet(true))
          throw new RuntimeException("injected executor-loss rehearsal")
        it
      }, prof.schema)
    val got = rows(atlas.climTS(spark, chaotic).filter($"CT" =!= 0.0f))
    assert(RecomputeSpec.fired.get(), "the injected failure never fired")
    assert(got == want,
      "recompute after a task failure must be bit-identical to the clean run")
    assert(want.nonEmpty, "degenerate fixture: empty atlas")
  }

  test("injected task failure under the q38 distributed CC loop: labels are bit-identical") {
    // The iterative twin of the atlas case above: SCALING.md argues the
    // CC loop's partition-invariance from the unique fixpoint (min
    // reachable id), but until now that claim was only spec-asserted
    // under clean runs. Here the FIRST attempt of an edge-scan task dies
    // mid-loop-input — the localCheckpoint materialization retries it —
    // and the converged labels must equal the clean run exactly. Fast
    // path pinned OFF, same as q38: the distributed propagation loop is
    // the branch a 100 TB pair graph runs, so it is the branch that must
    // survive the retry.
    val d = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("q34_minhash_lsh")(spark, d)
      .select($"d1".as("src"), $"d2".as("dst"))
    val verts = graft.Tables.documents(spark, d).select($"doc_id".as("id"))
    def labels(edges: DataFrame): Seq[(Long, Long)] =
      graft.operators.Graph.connectedComponents(edges, verts,
        allowDriverFastPath = false)
        .as[(Long, Long)].collect().toSeq.sorted
    val want = labels(pairs)
    RecomputeSpec.fired.set(false)
    val chaotic = spark.createDataFrame(
      pairs.rdd.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 && !RecomputeSpec.fired.getAndSet(true))
          throw new RuntimeException("injected executor-loss rehearsal")
        it
      }, pairs.schema)
    val got = labels(chaotic)
    assert(RecomputeSpec.fired.get(), "the injected failure never fired")
    assert(got == want,
      "CC labels after a task failure must be bit-identical to the clean run")
    assert(want.count { case (id, comp) => id != comp } > 10,
      "degenerate fixture: pair graph has almost no non-trivial clusters")
  }

  test("injected task failure under the PageRank iteration: ranks are bit-identical") {
    // The weighted-SUM iterative twin of the CC case above: CC's
    // retry-safety comes from a unique fixpoint (min reachable id) that
    // forgives ANY intermediate state; PageRank has no such forgiveness
    // — its safety rests entirely on integer associativity (micro-unit
    // ranks, truncating contributions), so a retried edge-scan task
    // re-contributing in a different merge order must still produce the
    // identical rank vector. Floating-point PageRank would fail exactly
    // this test.
    val d = "/root/testdata/sf0.001"
    val pairs = graft.Tables.orders(spark, d)
      .join(graft.Tables.lineitem(spark, d),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      .distinct()
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionAll(pairs.select($"b".as("src"), $"a".as("dst")))
    def ranks(e: DataFrame): Seq[(Long, Long)] =
      // fast path pinned off: the retry-safety under test is the
      // DISTRIBUTED loop's shuffle merge order (the driver path has no
      // merge order to get wrong)
      graft.operators.Graph.pageRank(e, iters = 5,
        allowDriverFastPath = false)
        .as[(Long, Long)].collect().toSeq.sorted
    val want = ranks(edges)
    RecomputeSpec.fired.set(false)
    val chaotic = spark.createDataFrame(
      edges.rdd.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 && !RecomputeSpec.fired.getAndSet(true))
          throw new RuntimeException("injected executor-loss rehearsal")
        it
      }, edges.schema)
    val got = ranks(chaotic)
    assert(RecomputeSpec.fired.get(), "the injected failure never fired")
    assert(got == want,
      "PageRank after a task failure must be bit-identical to the clean run")
    assert(want.map(_._2).distinct.size > 10,
      "degenerate fixture: ranks collapsed to a handful of values")
  }

  test("injected task failure under the XOR manifest: checksums are bit-identical") {
    // The q115/q116 integrity claim under the one condition an integrity
    // mechanism must survive: executor loss DURING manifest computation.
    // XOR and count are order-independent monoids, so a retried
    // partition re-contributing in a different merge order must produce
    // the identical per-shard checksum — a checksum that drifted under
    // retry would report phantom corpus changes on exactly the flaky-
    // cluster runs where integrity checks matter most.
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d).select($"doc_id", $"text")
    def manifest(df: DataFrame): Seq[(Long, Long, Long)] =
      graft.streaming.DocStreams.shardManifest(df, 64L)
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val want = manifest(docs)
    RecomputeSpec.fired.set(false)
    val chaotic = spark.createDataFrame(
      docs.rdd.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 && !RecomputeSpec.fired.getAndSet(true))
          throw new RuntimeException("injected executor-loss rehearsal")
        it
      }, docs.schema)
    val got = manifest(chaotic)
    assert(RecomputeSpec.fired.get(), "the injected failure never fired")
    assert(got == want,
      "manifest checksums after a task failure must be bit-identical")
    assert(want.size > 10, "degenerate fixture: manifest nearly empty")
  }

  test("injected task failure INSIDE a streaming micro-batch: maintained state is bit-identical to batch") {
    // The batch cases above exercise Spark task retry under one-shot
    // jobs; streaming state recovery is a DIFFERENT path — a failed task
    // inside a micro-batch is retried before the state store commits,
    // and the committed state must be as if the failure never happened.
    // A pass-through chaos UDF kills the FIRST attempt of one task in
    // micro-batch 1 (the q108/q101 deployment's everyday event on a big
    // cluster); the converged manifest must equal the clean batch
    // recompute exactly — order-independent monoid state (count, XOR)
    // plus Spark's attempt isolation is the mechanism.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, udf}
    implicit val sqlCtx = spark.sqlContext
    val docsIn = (0 until 50).map(i =>
      StreamDoc(i.toLong, s"doc $i body ${(i * 13) % 11} tail"))
    val chaos = udf((t: String) => {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          !RecomputeSpec.fired.getAndSet(true))
        throw new RuntimeException("injected executor-loss rehearsal (micro-batch)")
      t
    })
    RecomputeSpec.fired.set(false)
    val mem = MemoryStream[StreamDoc]
    val sq = graft.streaming.DocStreams.shardManifest(
        mem.toDF().withColumn("text", chaos(col("text"))), 16L)
      .writeStream.format("memory").queryName("chaos_manifest")
      .outputMode("complete")
      .option("checkpointLocation",
        graft.TempDirs.create("graft-ckpt-chaos").toString)
      .start()
    try {
      mem.addData(docsIn.take(25))
      sq.processAllAvailable()
      mem.addData(docsIn.drop(25))
      sq.processAllAvailable()
      assert(RecomputeSpec.fired.get(), "the injected failure never fired")
      val streamed = spark.table("chaos_manifest")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.streaming.DocStreams.shardManifest(
        docsIn.toDF(), 16L).as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streaming state after an in-micro-batch task failure must equal batch")
      assert(batch.iterator.map(_._2).sum == 50L)
    } finally sq.stop()
  }
}
