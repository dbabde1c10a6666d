package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.{TextFns => T}
import graft.operators.Sketches

/** Approximate query processing over the corpus — the third leg of the
  * 100 TB toolkit next to exact aggregation and blocked pairwise search:
  *
  *  - q47: Count-Min heavy-hitter estimation — a fixed-size mergeable
  *    counter matrix replaces the full token shuffle;
  *  - q48: deterministic hash-mod sampling — the reproducible-at-any-scale
  *    sampling idiom (no RNG state, no order dependence, pure SQL);
  *  - q49: HyperLogLog++ cardinality (`approx_count_distinct`, Spark's
  *    codegen'd built-in) — register-max merge, one tiny buffer per
  *    partition instead of a distinct shuffle.
  *
  * q47/q49 outputs are partition-invariant (cell-sum / register-max
  * merges), so they carry golden-fixture oracles; q48 is plain arithmetic
  * with a full DuckDB oracle.
  */
object SketchQueries extends QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  // ---- q47: Count-Min sketch vs exact heavy hitters ----------------------
  // One global sketch via partial aggregation (each partition builds a
  // local counter matrix, merge = cell-wise sum), then the top-20 exact
  // tokens probe it. Output carries exact AND estimated counts: the spec
  // asserts the one-sided error bound, the fixture pins the bits.
  private val Depth = 4
  private val Width = 1024

  private def q47(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(explode(T.tokens(col("text"))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val sketch = toks.agg(Sketches.countMin(Depth, Width)(col("h")).as("cms"))
    val top = toks.groupBy(col("token"), col("h"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
      .limit(20)
    val estUdf = udf((cms: Seq[Long], h: Long) =>
      Sketches.CountMin.estimate(cms.toIndexedSeq, h, Depth, Width))
    top.crossJoin(broadcast(sketch))
      .select(col("token"), col("exact_n"),
        estUdf(col("cms"), col("h")).as("est_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  // ---- q48: deterministic hash-mod sampling (full SQL oracle) ------------
  // Lehmer/MINSTD multiplicative hash on the key, keep h mod 100 < rate:
  // the same rows are kept at any scale, any partitioning, any engine —
  // unlike RNG/reservoir sampling, which depends on row order and state.
  // MINSTD (x·48271 mod 2³¹−1) rather than a 2³²-multiplier Knuth hash:
  // id·48271 stays below 2⁶³ for any id < 1.9e14, so the arithmetic never
  // overflows — under ANSI SQL (Spark 4 default) an overflowing multiply
  // THROWS at exactly the corpus sizes the sampler exists for. The
  // per-source counts audit the realized rate.
  private val SampleRate = 10 // percent

  private def q48(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("h", pmod(col("doc_id") * 48271L, lit(2147483647L)))
      .filter(pmod(col("h"), lit(100)) < SampleRate)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_sampled"),
        min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"))
      .orderBy("source")

  private val q48Sql =
    s"""SELECT source, count(*) AS n_sampled,
       | min(doc_id) AS first_id, max(doc_id) AS last_id
       |FROM (
       |  SELECT source, doc_id,
       |    (doc_id * 48271) % 2147483647 AS h
       |  FROM documents)
       |WHERE h % 100 < $SampleRate
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q49: HLL++ distinct-token cardinality per source ------------------
  // approx_count_distinct is Spark's codegen'd HLL++: per-partition
  // register arrays, merged by max — deterministic for a given input SET,
  // so the fixture oracle holds. Exact distinct sits beside it for the
  // spec's relative-error assertion.
  private def q49(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("source"), explode(T.tokens(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(approx_count_distinct(col("token"), 0.02).as("approx_distinct"),
        countDistinct(col("token")).as("exact_distinct"),
        count(lit(1)).cast(LongType).as("n_tokens"))
      .orderBy("source")

  // ---- q59: mergeable quantile sketch (DDSketch-style log histogram) ----
  // Per-priority price quantiles from a fixed-size counter array: each
  // partition reduces into one 1024-cell histogram, merge is cell-wise sum
  // (partition-invariant, unlike approx_percentile's merge-order-dependent
  // GK summaries), and the quantile is read off the cumulative counts.
  // Outputs are INTEGERS ONLY (bucket index, cumulative count, n), so the
  // DuckDB oracle — the same bucket arithmetic + a window cumsum — must
  // match bit-for-bit. Cross-engine safety of floor(ln(x)·50): measured
  // min distance from an integer over every o_totalprice is ≥ 5.4e-6 at
  // all scale factors, ~10 orders above a 1-ulp libm disagreement.
  private val DdK = 50.0
  private val DdNB = 1024
  private val QPm = Seq(500L, 900L, 990L)

  private def q59(s: SparkSession, d: String): DataFrame = {
    val qb = udf((counts: Seq[Long]) =>
      QPm.map { q =>
        val (b, cum, n) = Sketches.DdHist.quantileBucket(counts.toIndexedSeq, q)
        (q, b.toLong, cum, n)
      })
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(Sketches.ddHist(DdK, DdNB)(col("o_totalprice")).as("hist"))
      .select(col("priority"), explode(qb(col("hist"))).as("r"))
      .select(col("priority"), col("r._1").as("q_pm"),
        col("r._2").as("bucket"), col("r._3").as("cum_at_bucket"),
        col("r._4").as("n"))
      .orderBy("priority", "q_pm")
  }

  private val q59Sql =
    s"""WITH b AS (
       |  SELECT o_orderpriority AS priority,
       |    least(${DdNB - 1}, greatest(0,
       |      CAST(floor(ln(o_totalprice) * $DdK) AS BIGINT))) AS bucket
       |  FROM orders WHERE o_totalprice > 0),
       |c AS (SELECT priority, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
       |w AS (
       |  SELECT priority, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY priority ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (PARTITION BY priority) AS n
       |  FROM c),
       |q AS (SELECT unnest([${QPm.mkString(", ")}]) AS q_pm),
       |hit AS (
       |  SELECT priority, q_pm, min(bucket) AS bucket
       |  FROM w, q WHERE 1000 * cum >= q_pm * n GROUP BY 1, 2)
       |SELECT h.priority, CAST(h.q_pm AS BIGINT) AS q_pm,
       |  CAST(h.bucket AS BIGINT) AS bucket,
       |  CAST(w.cum AS BIGINT) AS cum_at_bucket, CAST(w.n AS BIGINT) AS n
       |FROM hit h JOIN w ON w.priority = h.priority AND w.bucket = h.bucket
       |ORDER BY 1, 2""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "q59_dd_quantiles" -> QueryDef(q59, Some(q59Sql)),
    "q47_countmin_hh" ->
      QueryDef(q47, Some(FixtureOracle.sql("q47_countmin_hh"))),
    "q48_hash_sample" -> QueryDef(q48, Some(q48Sql)),
    "q49_hll_distinct" ->
      QueryDef(q49, Some(FixtureOracle.sql("q49_hll_distinct"))))
}
