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

  def defs: Map[String, QueryDef] = Map(
    "q47_countmin_hh" ->
      QueryDef(q47, Some(FixtureOracle.sql("q47_countmin_hh"))),
    "q48_hash_sample" -> QueryDef(q48, Some(q48Sql)),
    "q49_hll_distinct" ->
      QueryDef(q49, Some(FixtureOracle.sql("q49_hll_distinct"))))
}
