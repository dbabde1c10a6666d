package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.operators.Sketches.CountMin

/** Count-Min properties, Spark-free: the aggregator is exercised directly
  * as (zero | reduce | merge) so the partition-invariance claim — the
  * basis of q47's golden-fixture oracle — is tested against every split of
  * the input, not just the one Spark happened to pick. */
class SketchSpec extends AnyFunSuite {
  private val Depth = 4
  private val Width = 256

  // deterministic multiset: token i appears freq(i) times
  private val freqs: Map[Long, Int] =
    (0 until 200).map(i => (i * 0x9E3779B9L + 7L, 1 + (i % 37))).toMap
  private val stream: Seq[Long] =
    freqs.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
  private val n = stream.length

  private def build(keys: Seq[Long]): Array[Long] = {
    val agg = new Sketches.CountMin(Depth, Width)
    keys.foldLeft(agg.zero)(agg.reduce)
  }

  test("estimates are one-sided: never below the true count") {
    val cms = build(stream).toIndexedSeq
    freqs.foreach { case (k, f) =>
      val est = CountMin.estimate(cms, k, Depth, Width)
      assert(est >= f, s"key $k: est $est < true $f")
    }
  }

  test("estimates respect the e·N/width error bound") {
    val cms = build(stream).toIndexedSeq
    // P(err > e·N/w) ≤ e^-depth ≈ 1.8% per key; with 200 keys allow the
    // expected handful of outliers but cap them and the excess magnitude
    val bound = math.ceil(math.E * n / Width).toLong
    val excesses = freqs.toSeq.map { case (k, f) =>
      CountMin.estimate(cms, k, Depth, Width) - f
    }
    assert(excesses.count(_ > bound) <= 8,
      s"too many estimates past e*N/w=$bound: ${excesses.sorted.reverse.take(10)}")
  }

  test("merge is partition-invariant: any split, any order, same cells") {
    val whole = build(stream)
    val agg = new Sketches.CountMin(Depth, Width)
    Seq(1, 7, 64).foreach { parts =>
      val chunks = stream.grouped(math.max(1, stream.length / parts)).toSeq
      val merged = chunks.reverse // merge in a different order too
        .map(build).reduce(agg.merge)
      assert(merged.toSeq === whole.toSeq, s"split into $parts differs")
    }
  }

  test("sketch of a shuffled stream is identical (order-free)") {
    // deterministic shuffle: sort by a cheap mixed key
    val shuffled = stream.zipWithIndex
      .sortBy { case (k, i) => (k * 2654435761L + i) ^ (k >>> 13) }.map(_._1)
    assert(build(shuffled).toSeq === build(stream).toSeq)
  }

  // ---- DdHist (q59): merge-invariance + the relative-error contract -----

  private val ddK = 50.0
  private val ddNB = 1024
  private val ddValues: Seq[Double] =
    (0 until 3000).map(i => 1000.0 + (i * 7919 % 100000) / 10.0 + (i % 13) * 0.37)

  private def ddBuild(xs: Seq[Double]): Array[Long] = {
    val agg = new Sketches.DdHist(ddK, ddNB)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("DdHist: any split of the input merges to the identical histogram") {
    val whole = ddBuild(ddValues).toSeq
    val agg = new Sketches.DdHist(ddK, ddNB)
    for (split <- Seq(1, 7, 64, 999)) {
      val merged = ddValues.grouped(split).map(ddBuild)
        .reduce((a, b) => agg.merge(a, b))
      assert(merged.toSeq == whole, s"split=$split diverged")
    }
  }

  test("DdHist: the quantile bucket brackets the exact quantile value") {
    val counts = ddBuild(ddValues).toIndexedSeq
    val sorted = ddValues.sorted
    for (qPm <- Seq(500L, 900L, 990L)) {
      val (b, cum, n) = Sketches.DdHist.quantileBucket(counts, qPm)
      assert(n == ddValues.size && cum <= n)
      // exact q-quantile at rank ceil(q*n/1000), 1-indexed
      val rank = ((qPm * n + 999) / 1000).toInt
      val exact = sorted(rank - 1)
      val lo = math.exp(b / ddK)
      val hi = math.exp((b + 1) / ddK)
      assert(exact >= lo * (1 - 1e-12) && exact < hi * (1 + 1e-12),
        s"q=$qPm: exact $exact outside bucket $b range [$lo, $hi) — " +
          "relative error would exceed e^(1/K)-1")
    }
  }
}


/** q49's promise is that the HLL++ estimate TRACKS the exact distinct
  * count — the fixture alone would happily pin a drifted estimate, so the
  * relative error is asserted here against the configured rsd. */
class HllSpec extends SparkSuite {
  import spark.implicits._

  test("q49 approx_distinct stays within 3x the configured rsd of exact") {
    val rows = SparkEntry.queries("q49_hll_distinct")(spark, "/root/testdata/sf0.001")
      .select($"source", $"approx_distinct", $"exact_distinct")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, approx, exact) =>
      assert(exact > 0, s"$src has no tokens")
      val relErr = math.abs(approx - exact).toDouble / exact
      // rsd = 0.02 in the query; 3 sigma covers every source w.h.p.
      assert(relErr <= 0.06, s"$src: approx $approx vs exact $exact (err $relErr)")
    }
  }
}

/** The Count-Min aggregator under Structured Streaming: a UDAF whose
  * merge is commutative works unchanged as an incremental streaming
  * aggregate — the micro-batch boundary is just another merge order, so
  * the streamed sketch must equal the batch sketch cell-for-cell. */
class StreamingSketchSpec extends SparkSuite {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("streamed DdHist equals the batch histogram cell-for-cell") {
    implicit val sqlCtx = spark.sqlContext
    val xs: Seq[Double] = (0 until 400).map(i => 1000.0 + (i * 7919 % 90000) / 7.0)
    val mem = MemoryStream[Double]
    val dd = graft.operators.Sketches.ddHist(50.0, 1024)
    val sq = mem.toDF().agg(dd(col("value")).as("h"))
      .writeStream.format("memory").queryName("dd_stream")
      .outputMode("complete")
      .option("checkpointLocation",
        graft.TempDirs.create("graft-dd").toString)
      .start()
    try {
      xs.grouped(90).foreach(mem.addData(_))
      sq.processAllAvailable()
      val streamed = spark.table("dd_stream").select($"h").as[Seq[Long]].head()
      val batch = xs.toDF("value").agg(dd(col("value")).as("h"))
        .select($"h").as[Seq[Long]].head()
      assert(streamed === batch)
      assert(batch.sum == xs.size)
    } finally sq.stop()
  }

  test("streamed Count-Min equals the batch sketch cell-for-cell") {
    implicit val sqlCtx = spark.sqlContext
    val keys: Seq[Long] = (0 until 500).map(i => (i % 73).toLong * 2654435761L)
    val mem = MemoryStream[Long]
    val cms = graft.operators.Sketches.countMin(4, 256)
    val sq = mem.toDF().select(col("value").as("h"))
      .agg(cms(col("h")).as("cms"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete")
      .option("checkpointLocation",
        graft.TempDirs.create("graft-cms").toString)
      .start()
    try {
      keys.grouped(100).foreach(mem.addData(_)) // 5 micro-batches
      sq.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .select($"cms").as[Seq[Long]].head()
      val batch = keys.toDF("h").agg(cms(col("h")).as("cms"))
        .select($"cms").as[Seq[Long]].head()
      assert(streamed === batch)
      assert(batch.exists(_ > 0))
    } finally sq.stop()
  }

}
