package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomProbeExpr
import graft.operators.Sketches
import graft.operators.Sketches.Bloom

/** Bloom filter properties (Spark-free: zero | reduce | merge exercised
  * directly) plus the q128 runtime-semi-join-filter contract on Spark:
  * the pruned plan must be bit-equal to the unpruned one (false positives
  * eliminated by the exact join, false negatives impossible), the prune
  * must actually discard the non-matching corpus BEFORE any exchange, and
  * the probe must sit in the scan-side filter as a codegen'd expression.
  */
class BloomSpec extends SparkSuite {
  private val M = 1 << 14 // 16384 bits
  private val K = 5

  private val members: Seq[Long] =
    (0 until 500).map(i => i * 0x9E3779B97f4A7C15L + 11L)
  private val strangers: Seq[Long] =
    (0 until 2000).map(i => i * 0xC2B2AE3D27D4EB4FL + 3L)
      .filterNot(members.toSet)

  private def build(keys: Seq[Long]): Array[Byte] = {
    val agg = new Sketches.BloomFilter(M, K)
    agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
  }

  test("no false negatives: every inserted key tests positive") {
    val bits = build(members)
    members.foreach { h =>
      assert(Bloom.mightContain(bits, h, K), s"false negative for $h")
    }
  }

  test("false-positive rate is near the analytic bound") {
    val bits = build(members)
    val fp = strangers.count(Bloom.mightContain(bits, _, K))
    // (1 - e^{-kn/m})^k at n=500, m=16384, k=5 ≈ 4.6e-5 → expect ~0 of
    // 2000; allow a loose factor for hash luck
    assert(fp <= 5, s"$fp false positives of ${strangers.size} strangers")
  }

  test("merge is OR: any split of the stream builds identical bytes") {
    val whole = build(members)
    val agg = new Sketches.BloomFilter(M, K)
    Seq(2, 7, 64).foreach { parts =>
      val chunks = members.grouped(math.max(1, members.size / parts)).toSeq
      val merged = agg.finish(chunks.reverse
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge))
      assert(java.util.Arrays.equals(merged, whole), s"split $parts differs")
    }
  }

  test("packed-byte probe agrees with the builder's word/bit numbering") {
    // single-bit filters: insert one key, check exactly its k positions
    val agg = new Sketches.BloomFilter(M, K)
    val h = 0x0123456789ABCDEFL
    val bits = agg.finish(agg.reduce(agg.zero, h))
    val set = (0 until M).filter(j => ((bits(j >>> 3) >>> (j & 7)) & 1) == 1)
    val want = (0 until K).map(i => Bloom.pos(h, i, M)).distinct.sorted
    assert(set == want, s"bit positions $set != derived $want")
  }

  test("q128: pruned result equals the unpruned exact verdict; prune bites") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q128_bloom_ingest")(spark, d)
      .as[(Long, String, Option[Long])].collect().toSeq
    // unpruned reference: plain fp equi-join, no bloom anywhere
    val fp = Tables.documents(spark, d)
      .select($"doc_id", graft.functions.TextFns.contentFingerprint($"text").as("fp"),
        ($"doc_id" % 10 === 7).as("is_batch"))
    val cmin = fp.filter(!$"is_batch").groupBy($"fp").agg(min($"doc_id").as("c_min"))
    val want = fp.filter($"is_batch").join(cmin, Seq("fp"), "left")
      .select($"doc_id",
        when($"c_min".isNotNull, "dup").otherwise("new").as("verdict"),
        $"c_min".as("match_id"))
      .orderBy("doc_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == want, "bloom-pruned verdicts differ from the exact join")
    assert(got.nonEmpty && got.exists(_._2 == "new"), s"degenerate batch: $got")

    // the prune must bite: corpus survivors ≤ true dups + fp sliver
    val bloom = fp.filter($"is_batch")
      .agg(Sketches.bloomFilter(1 << 20, 5)($"fp")).head.getAs[Array[Byte]](0)
    val corpus = fp.filter(!$"is_batch")
    val survivors = corpus
      .filter(BloomProbeExpr.bloomMightContain(lit(bloom), $"fp", 5)).count()
    val dups = got.count(_._2 == "dup").toLong
    assert(survivors <= dups + 5,
      s"prune too weak: $survivors corpus survivors for $dups dups")
    assert(survivors < corpus.count(), "prune discarded nothing")
  }

  test("probe's generated code COMPILES — no silent interpreted fallback") {
    // Janino needs a Java-visible static path; a nested Scala object has
    // none, so this regressed once (generated code referenced
    // Sketches.Bloom.mightContain, Janino failed, Spark fell back to
    // interpreted eval for the whole scan stage while results stayed
    // correct). GeneratePredicate THROWS on compile failure, so this test
    // fails loudly if the static forwarder path breaks again.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val bits = build(members)
    val expr = functions.BloomProbeExpr(
      Literal(bits, BinaryType), BoundReference(0, LongType, nullable = false), K)
    val compiled = GeneratePredicate.generate(expr) // throws if Janino rejects
    (members.take(50) ++ strangers.take(50)).foreach { h =>
      assert(compiled.eval(InternalRow(h)) == Bloom.mightContain(bits, h, K),
        s"compiled probe disagrees with interpreted for $h")
    }
  }

  test("q128 stays correct under CODEGEN_ONLY (fallback disabled)") {
    val d = "/root/testdata/sf0.001"
    val want = SparkEntry.queries("q128_bloom_ingest")(spark, d).count()
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.fallback", "false")
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val n = SparkEntry.queries("q128_bloom_ingest")(spark, d).count()
      assert(n == want && n > 0, s"q128 rows under CODEGEN_ONLY: $n != $want")
    } finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("q128 plan: probe is scan-side (before any exchange), join broadcasts") {
    val plan = SparkEntry.queries("q128_bloom_ingest")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"corpus-min not broadcast:\n$plan")
    // the probe filter must sit below the aggregate's exchange: no
    // Exchange may appear between the FileScan and the bloom filter line
    val lines = plan.linesIterator.toSeq
    val probeIdx = lines.indexWhere(_.contains("bloom_might_contain"))
    val scanIdx = lines.lastIndexWhere(_.contains("Scan parquet"))
    assert(probeIdx >= 0 && scanIdx > probeIdx,
      "probe filter is not between the corpus scan and its aggregate")
    assert(!lines.slice(probeIdx, scanIdx).exists(_.contains("Exchange")),
      s"an exchange sits between the corpus scan and the bloom probe:\n$plan")
  }
}
