package graft

import org.apache.spark.sql.functions._

/** Properties of q114 (epoch-aware upsampling) and q115 (shard-manifest
  * corpus diff) the oracle gate cannot see — the gate proves both engines
  * agree row-for-row; these tests pin that the rows mean what the
  * operators claim:
  *  - q114: integer-epoch sources replicate EXACTLY (w=1.0 → once,
  *    w=2.0 → twice — repetition is deterministic policy, not sampling
  *    noise), fractional sources realize BOTH branches (some docs get
  *    the extra epoch, some don't), and every doc's epochs are a
  *    contiguous 1..reps prefix;
  *  - q115: the changed set is EXACTLY the shards holding a mutated
  *    document (no false positives from checksum collisions across
  *    shards, no misses), the row-count delta equals the dropped-doc
  *    count, and at least one changed shard has n_a == n_b — the
  *    content-only edit that row-count manifests are blind to and the
  *    XOR checksum exists to catch.
  */
class MixManifestSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  private def up = SparkEntry.queries("q114_epoch_upsample")(spark, d)

  private def wq(source: org.apache.spark.sql.Column) =
    expr("coalesce(try_cast(substring(source, 4) as bigint), 0) % 8 + 1")

  test("q114: integer-epoch sources replicate exactly; fractional sources realize both branches") {
    val perDoc = up.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("reps"), max(col("epoch")).as("mx"),
        min(col("epoch")).as("mn"))
      .withColumn("wq", wq(col("source")))
    // epochs are a contiguous 1..reps prefix on every doc
    val gaps = perDoc.filter(col("mn") =!= 1 || col("mx") =!= col("reps"))
      .count()
    assert(gaps == 0, s"$gaps docs have non-contiguous epoch numbering")
    // integer weights: wq ∈ {4, 8} → exactly wq/4 replicas, no hash term
    val wrongInt = perDoc.filter(col("wq") % 4 === 0)
      .filter(col("reps") =!= col("wq") / 4).count()
    assert(wrongInt == 0,
      s"$wrongInt docs of integer-epoch sources have the wrong replica count")
    // fractional weights: replica count is floor or floor+1, and a
    // fractional SOURCE with enough docs realizes both branches — the
    // per-mille hash selects a strict subset of the source's documents
    // for the extra epoch. Zero-replica docs are ABSENT from the output
    // (not rows with reps=0), so the split must be measured against the
    // source's total doc count in the input table, not the output.
    val frac = perDoc.filter(col("wq") % 4 =!= 0)
      .withColumn("extra", col("reps") - expr("wq div 4"))
    val outOfRange = frac.filter(col("extra") < 0 || col("extra") > 1).count()
    assert(outOfRange == 0, s"$outOfRange docs outside floor..floor+1")
    // anchored on the INPUT table's source list, not the output's: a
    // w<4 source whose docs were all hash-unselected has zero output
    // rows, so it never reaches the frac groupBy — a left join from
    // totals with e coalesced to 0 makes that exact case flaggable
    // instead of vacuously passing
    val totals = Tables.documents(spark, d).groupBy("source")
      .agg(count(lit(1)).as("n_total"))
      .withColumn("wq", wq(col("source")))
      .filter(col("wq") % 4 =!= 0)
    val oneSided = totals
      .join(frac.groupBy("source").agg(sum(col("extra")).as("e")),
        Seq("source"), "left")
      .withColumn("e", coalesce(col("e"), lit(0L)))
      .filter(col("n_total") >= 10 &&
        (col("e") === 0 || col("e") === col("n_total")))
      .collect()
    assert(oneSided.isEmpty,
      s"fractional sources never split: ${oneSided.mkString(", ")}")
  }

  test("q114: zero-replica documents are absent, not exploded") {
    // wq div 4 = 0 and hash-unselected → reps 0; Spark's sequence(1, 0)
    // would have yielded [1, 0] — the filter must drop these rows
    val zeroEpoch = up.filter(col("epoch") <= 0).count()
    assert(zeroEpoch == 0, s"$zeroEpoch rows with epoch <= 0")
  }

  private def diff = SparkEntry.queries("q115_manifest_diff")(spark, d)

  test("q115: changed = exactly the shards holding a mutated document") {
    val expected = Tables.documents(spark, d)
      .filter(col("doc_id") % 97 === 13 || col("doc_id") % 101 === 7)
      .select((col("doc_id") * 48271L % 2147483647L % 64L).as("shard"))
      .distinct().collect().map(_.getLong(0)).toSet
    val got = diff.filter(col("status") === "changed")
      .select("shard").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"changed shards $got != shards with mutations $expected")
  }

  test("q115: row-count delta equals dropped docs; a content-only edit is caught by the checksum") {
    val dropped = Tables.documents(spark, d)
      .filter(col("doc_id") % 101 === 7).count()
    val sums = diff.agg(sum(col("n_a")).as("a"), sum(col("n_b")).as("b"))
      .head()
    assert(sums.getLong(0) - sums.getLong(1) == dropped,
      s"n_a - n_b = ${sums.getLong(0) - sums.getLong(1)}, dropped $dropped")
    val contentOnly = diff.filter(
      col("status") === "changed" && col("n_a") === col("n_b")).count()
    assert(contentOnly >= 1,
      "no changed shard with equal row counts — the checksum property " +
        "(catching pure content edits) is not exercised")
  }

  test("q116: the merged manifest reproduces the independent full recompute on every shard") {
    val merged = SparkEntry.queries("q116_manifest_merge")(spark, d)
    val n = merged.count()
    assert(n > 0)
    // the mergeability invariant (stored ⊕ delta ≡ recompute) must hold
    // on EVERY shard — one false row means XOR maintenance and rescan
    // disagree and the incremental path silently drifts
    val bad = merged.filter(!col("consistent")).count()
    assert(bad == 0, s"$bad shards where merge != full recompute")
    // both arms are non-trivial: the batch slice actually lands rows
    val deltas = merged.agg(sum(col("n_delta"))).head().getLong(0)
    assert(deltas > 0, "ingest slice contributed no rows — merge untested")
  }
}
