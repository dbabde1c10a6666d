package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.{FP, VecFns => V}
import graft.operators.Aggregates

/** Similarity search and vector analytics over the `embeddings` table
  * (64-dim `array<float>`).
  *
  * Scale design: the brute-force kNN broadcasts the (small) probe set
  * against the (huge) corpus — a map-side nested loop with no shuffle of
  * the corpus. The ANN variant buckets the corpus by random-hyperplane LSH
  * and equi-joins on bucket, the scale path when the probe set is itself
  * huge. The centroid query aggregates whole arrays through a typed
  * `Aggregator` buffer, shuffling one 65-long buffer per (partition ×
  * label) instead of one row per (vector × dimension).
  */
object EmbeddingQueries extends QueryModule {
  private val Dim = 64
  private val ProbeMod = 50 // vec_id % ProbeMod == 0 → probe set

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("vec"),
      V.norm(col("embedding").cast("array<double>")).as("nrm"))
      .repartition(col("vec_id"))

  private val sqlBase =
    s"""SELECT vec_id, embedding, ${V.sqlNorm("embedding", Dim)} AS nrm
       |FROM embeddings""".stripMargin

  // ---- q40: brute-force cosine top-k (broadcast probe set) ---------------
  private def q40(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val probes = b.filter(col("vec_id") % ProbeMod === 0).select(
      col("vec_id").as("q_id"), col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_n").desc, col("vec_id"))
    b.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_n",
        FP.nano(V.dot(col("q_vec"), col("vec")) / (col("q_nrm") * col("nrm"))))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("cos_n"))
      .orderBy("q_id", "rank")
  }

  private val q40Sql =
    s"""WITH b AS ($sqlBase),
       |p AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
       |      FROM b WHERE vec_id % $ProbeMod = 0),
       |s AS (
       |  SELECT p.q_id, b.vec_id AS n_id,
       |    ${FP.sqlNano(s"${V.sqlDot("p.q_emb", "b.embedding", Dim)} / (p.q_nrm * b.nrm)")} AS cos_n
       |  FROM b CROSS JOIN p WHERE b.vec_id <> p.q_id),
       |r AS (
       |  SELECT q_id, n_id, cos_n, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_n DESC, n_id) AS rank
       |  FROM s)
       |SELECT q_id, rank, n_id, cos_n FROM r WHERE rank <= 5
       |ORDER BY 1, 2""".stripMargin

  // ---- q41: LSH-bucketed approximate nearest neighbors -------------------
  private val LshBits = 6

  private def q41(s: SparkSession, d: String): DataFrame = {
    val b = Tables.embeddings(s, d).select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
      .select(col("vec_id"), col("vec"),
        V.norm(col("vec")).as("nrm"),
        V.lshBucket(col("vec"), LshBits, Dim).as("bucket"))
      .repartition(col("bucket"))
    val probes = b.filter(col("vec_id") % ProbeMod === 0).select(
      col("bucket"), col("vec_id").as("q_id"),
      col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_n").desc, col("vec_id"))
    b.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_n",
        FP.nano(V.dot(col("q_vec"), col("vec")) / (col("q_nrm") * col("nrm"))))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("cos_n"))
      .orderBy("q_id", "rank")
  }

  private val q41Sql =
    s"""WITH b AS (
       |  SELECT vec_id, embedding, ${V.sqlNorm("embedding", Dim)} AS nrm,
       |    ${V.sqlLshBucket("embedding", LshBits, Dim)} AS bucket
       |  FROM embeddings),
       |p AS (SELECT bucket, vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
       |      FROM b WHERE vec_id % $ProbeMod = 0),
       |s AS (
       |  SELECT p.q_id, b.vec_id AS n_id,
       |    ${FP.sqlNano(s"${V.sqlDot("p.q_emb", "b.embedding", Dim)} / (p.q_nrm * b.nrm)")} AS cos_n
       |  FROM b JOIN p ON b.bucket = p.bucket WHERE b.vec_id <> p.q_id),
       |r AS (
       |  SELECT q_id, n_id, cos_n, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_n DESC, n_id) AS rank
       |  FROM s)
       |SELECT q_id, rank, n_id, cos_n FROM r WHERE rank <= 3
       |ORDER BY 1, 2""".stripMargin

  // ---- q42: per-label centroid via whole-array Aggregator (A1 core) ------
  private def q42(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(Aggregates.weightedArrayMeanFP(Dim)(lit(1L), col("embedding"))
        .as("sums"))
      .select(col("label"),
        posexplode(slice(col("sums"), 1, Dim)).as(Seq("pos", "sum_n")),
        element_at(col("sums"), Dim + 1).as("n_vecs"))
      .select(col("label"), (col("pos") + 1).cast(LongType).as("dim"),
        round(col("sum_n").cast("double") / col("n_vecs")).cast(LongType)
          .as("mean_nano"),
        col("n_vecs"))
      .orderBy("label", "dim")

  private val q42Sql =
    s"""SELECT label, d AS dim,
       |  CAST(round(sum(CAST(round(CAST(embedding[d] AS DOUBLE) * 1e9) AS BIGINT))::DOUBLE
       |    / count(*)) AS BIGINT) AS mean_nano,
       |  count(*) AS n_vecs
       |FROM embeddings, range(1, ${Dim + 1}) t(d)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "q40_knn_bruteforce" -> QueryDef(q40, Some(q40Sql)),
    "q41_ann_lsh" -> QueryDef(q41, Some(q41Sql)),
    "q42_label_centroid" -> QueryDef(q42, Some(q42Sql)))
}
