package graft

import org.apache.spark.sql.functions._

import graft.sources.BandStore

/** The (band, key)-bucketed LSH band table at rest must serve the whole
  * near-dup family — q34 pair generation, q110's per-ingest near tier,
  * q101 first-seen maintenance — with results identical to the in-session
  * construction, and must make the q34 candidate self-join exchange-free
  * on both sides (its join keys ARE the bucket keys). */
class BandStoreSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$d/documents.parquet")

  private def withStore[A](body: => A): A = {
    val tmp = graft.TempDirs.create("graft-bandstore")
    BandStore.saveBucketed(docs, "bands_bucketed", buckets = 8,
      path = Some(tmp.resolve("b").toString))
    spark.conf.set("spark.graft.bandStore", s"$d=bands_bucketed")
    try body
    finally {
      spark.conf.unset("spark.graft.bandStore")
      spark.sql("DROP TABLE IF EXISTS bands_bucketed")
    }
  }

  test("q34/q110/q101 over the store equal the in-session construction") {
    val names = Seq("q34_minhash_lsh", "q110_ingest_dedup", "q101_stream_neardup")
    val want = names.map(n => SparkEntry.queries(n)(spark, d).collect().toSeq)
    withStore {
      names.zip(want).foreach { case (n, w) =>
        val got = SparkEntry.queries(n)(spark, d).collect().toSeq
        assert(got == w, s"$n over the store differs from the cold path")
        assert(got.nonEmpty, s"$n degenerate")
      }
    }
  }

  test("q34 candidate self-join over the store is exchange-free on both sides") {
    withStore {
      val df = SparkEntry.queries("q34_minhash_lsh")(spark, d)
      df.collect() // force the final AQE plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), s"q34 must scan the bucketed store:\n$p")
      // the (band, key) join keys are exactly the bucket keys: no exchange
      // may feed the candidate join from either scan
      assert(!p.contains("Exchange hashpartitioning(band"),
        s"the candidate self-join reshuffled a bucketed side:\n$p")
      // and the whole-corpus shingle-hash projection is gone: the store
      // path must not scan the documents parquet at all (the anonymous
      // hash UDFs print as bare "UDF", so the scan source is the
      // testable witness)
      assert(!p.contains("documents.parquet"),
        s"store path still re-hashes the corpus:\n$p")
    }
  }

  test("q110 near tier: the batch Bloom probes the band-store scan before its exchange") {
    withStore {
      // the probe is ratio-gated (off at the fixture's 9:1 split) —
      // force it ON to pin its plan shape, and pin that both branches
      // are bit-equal (the no-false-negatives argument, made empirical)
      val off = SparkEntry.queries("q110_ingest_dedup")(spark, d).collect().toSeq
      spark.conf.set("spark.graft.nearBloom", "on")
      try {
        val df = SparkEntry.queries("q110_ingest_dedup")(spark, d)
        assert(df.collect().toSeq == off,
          "the Bloom-probed near tier differs from the unprobed branch")
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("bloom_might_contain"),
          s"the near tier lost its runtime band filter:\n${p.take(2000)}")
        // the probe must sit scan-side: below it, a band-store scan; no
        // exchange between them (the q128 plan discipline on the near tier)
        val lines = p.linesIterator.toSeq
        val probeIdx = lines.indexWhere(_.contains("bloom_might_contain"))
        val scanIdx = lines.indexWhere(_.contains("bands_bucketed"), probeIdx)
        assert(probeIdx >= 0 && scanIdx > probeIdx,
          s"probe is not above the band-store scan:\n${p.take(2000)}")
        assert(!lines.slice(probeIdx, scanIdx).exists(_.contains("Exchange")),
          s"an exchange sits between the band scan and its Bloom probe:\n$p")
      } finally spark.conf.unset("spark.graft.nearBloom")
    }
  }

  test("q110 near-tier Bloom gate: ratio-gated off at 9:1, forced branches agree") {
    // auto at the fixture's 9:1 corpus/batch ratio must skip the probe
    // (the sf0.1 regression the gate exists to remove) — and a LOW
    // crossover must turn it back on, so a 100 TB-shaped deployment gets
    // the prune without touching code
    val auto = SparkEntry.queries("q110_ingest_dedup")(spark, d)
    auto.collect()
    assert(!auto.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"),
      "auto gate must skip the probe at the fixture's 9:1 ratio")
    spark.conf.set("spark.graft.nearBloomMinRatio", "2")
    try {
      val low = SparkEntry.queries("q110_ingest_dedup")(spark, d)
      val rows = low.collect().toSeq
      assert(low.queryExecution.executedPlan.toString
        .contains("bloom_might_contain"),
        "a 2x crossover must engage the probe at 9:1")
      assert(rows == auto.collect().toSeq, "gated branches disagree")
    } finally spark.conf.unset("spark.graft.nearBloomMinRatio")
  }

  test("store scan parity: the landed rows ARE the verified construction") {
    withStore {
      val got = BandStore.loadBucketed(spark, "bands_bucketed")
        .select(col("doc_id"), col("band"), col("key"), hex(col("hs")))
        .collect().map(_.toSeq).toSet
      val want = BandStore.bandFrame(docs)
        .select(col("doc_id"), col("band"), col("key"), hex(col("hs")))
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    }
  }
}
