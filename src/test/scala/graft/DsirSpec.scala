package graft

import org.apache.spark.sql.functions._

/** q135 — DSIR-style importance resampling (VERDICT r13 task 4).
  *
  * Planted distribution shift: the TARGET (lang='en') docs draw from
  * vocabulary A; the raw pool (lang='xx') is half A-like, half B-like.
  * The resampled corpus's hashed-bigram histogram must move TOWARD the
  * target's — the published recipe's defining property — which on this
  * fixture means A-like pool docs are selected at a far higher rate than
  * B-like ones.
  */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def toksOf(vocab: String, seed: Int, n: Int): String =
    (0 until n).map(i => s"$vocab${(seed * 7 + i * 3) % 12}").mkString(" ")

  private lazy val dir: String = {
    val d = TempDirs.create("graft-dsir").toString
    val target = (0 until 30).map(i =>
      (i.toLong, toksOf("alpha", i, 24), "en", "wiki"))
    val poolA = (0 until 30).map(i =>
      (100L + i, toksOf("alpha", i + 5, 24), "xx", "web"))
    val poolB = (0 until 30).map(i =>
      (200L + i, toksOf("beta", i, 24), "xx", "web"))
    (target ++ poolA ++ poolB)
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val out =
    SparkEntry.queries("q135_dsir_resample")(spark, dir)
      .select($"doc_id", $"n_bg", $"w_u", $"rate_pm", $"sel")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("A-like pool docs rate far above B-like (weights discriminate)") {
    val poolA = out.filter(r => r._1 >= 100 && r._1 < 200)
    val poolB = out.filter(_._1 >= 200)
    assert(poolA.size == 30 && poolB.size == 30)
    val minA = poolA.map(_._4).min
    val maxB = poolB.map(_._4).max
    assert(minA > maxB,
      s"A-like rates (min $minA) must dominate B-like (max $maxB)")
    // the planted shift should saturate both ends of the rate range
    assert(poolA.map(_._4).max == 1000L && poolB.map(_._4).min == 0L)
  }

  test("selected histogram moves toward the target's (L1 over buckets)") {
    val selIds = out.filter(_._5 == 1L).map(_._1).toSet
    assert(selIds.nonEmpty)
    // hashed-bigram bucket histograms, the query's own feature space
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang",
        split(lower($"text"), "\\s+").as("t"))
    val bg = docs.select($"doc_id", $"lang",
        explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"))
          .as("bgr"))
      .withColumn("b", pmod(
        graft.functions.CharHashExpr.charHashNative($"bgr"), lit(64L)))
    def hist(pred: org.apache.spark.sql.Column): Map[Long, Double] = {
      val rows = bg.filter(pred).groupBy("b").count()
        .as[(Long, Long)].collect()
      val tot = rows.map(_._2).sum.toDouble
      rows.map { case (b, c) => b -> c / tot }.toMap
    }
    val tgt = hist($"lang" === "en")
    val all = hist(lit(true))
    val sel = hist($"doc_id".isin(selIds.toSeq: _*))
    def l1(a: Map[Long, Double], b: Map[Long, Double]): Double =
      (a.keySet ++ b.keySet).toSeq
        .map(k => math.abs(a.getOrElse(k, 0.0) - b.getOrElse(k, 0.0))).sum
    val before = l1(all, tgt)
    val after = l1(sel, tgt)
    assert(after < before * 0.5,
      s"resampling must move the histogram toward the target: " +
        s"L1 before $before, after $after")
  }

  test("neutral docs (no bigrams) carry rate 500 and exact columns") {
    // an empty-ish corpus member exercises the n_bg = 0 guard through the
    // registered query (the integer-div path must not divide by zero)
    val d = TempDirs.create("graft-dsir-edge").toString
    Seq((0L, "solo", "en", "web", 4L), (1L, "a b c", "xx", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val byId = SparkEntry.queries("q135_dsir_resample")(spark, d)
      .select($"doc_id", $"n_bg", $"rate_pm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(0L)._1 == 0L && byId(0L)._2 == 500L)
    assert(byId(1L)._1 == 2L)
  }
}
