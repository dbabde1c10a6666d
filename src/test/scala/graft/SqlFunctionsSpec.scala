package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomProbeExpr, CharHashExpr, DotPackedExpr,
  NormalizeExpr, VecFns, ZOrderExpr}
import graft.operators.Sketches

/** The engine's scalar kernels as SQL functions (VERDICT r12 task 8):
  * each registry entry injected by [[graft.plans.GraftExtensions]] must
  * produce the SAME expression the Column API builds, so a SQL-only user
  * gets bit-identical semantics — codegen'd, not a UDF shim. */
class SqlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("nfc_normalize: SQL ≡ Column API, decomposed forms collapse") {
    // explicit escapes (the q131 fixture discipline): both forms render
    // identically, so raw literals could silently collapse in an editor
    val df = Seq("caf\u00e9", "cafe\u0301", "plain ascii")
      .toDF("s").localCheckpoint()
    df.createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(s) AS n FROM nfc_in").as[String].collect().toSeq
    val viaCol = df.select(NormalizeExpr.nfcNormalize(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.take(2).distinct.size == 1,
      "both forms must normalize to one string")
  }

  test("char_hash: SQL ≡ Column API on corpus text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("ch_in")
    val viaSql = spark.sql(
      "SELECT doc_id, char_hash(text) AS h FROM ch_in ORDER BY doc_id")
      .as[(Long, Long)].collect().toSeq
    val viaCol = docs
      .select(col("doc_id"), CharHashExpr.charHashNative(col("text")).as("h"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("zorder2 / zorder3: SQL ≡ Column API, int casts inserted") {
    val df = Seq((3L, 5L, 7L), (1024L, 2048L, 1L), (0L, 0L, 0L))
      .toDF("x", "y", "z").localCheckpoint()
    df.createOrReplaceTempView("z_in")
    val viaSql = spark.sql(
      "SELECT zorder2(x, y) AS z2, zorder3(x, y, z) AS z3 FROM z_in")
      .as[(Long, Long)].collect().toSeq
    val viaCol = df.select(
      ZOrderExpr.zorder2(col("x").cast("int"), col("y").cast("int")).as("z2"),
      ZOrderExpr.zorder3(col("x").cast("int"), col("y").cast("int"),
        col("z").cast("int")).as("z3"))
      .as[(Long, Long)].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head._1 == ZOrderExpr.interleave(3, 5))
  }

  test("bloom_might_contain: SQL ≡ Column API; k must be a literal") {
    val k = 5
    val bits = spark.range(100)
      .agg(Sketches.bloomFilter(1 << 12, k)(col("id")))
      .head.getAs[Array[Byte]](0)
    val df = spark.range(200).select(col("id")).localCheckpoint()
    val viaCol = df.filter(
      BloomProbeExpr.bloomMightContain(lit(bits), col("id"), k))
      .as[Long].collect().toSet
    df.select(col("id"), lit(bits).as("bits")).createOrReplaceTempView("bl_in")
    val viaSql = spark.sql(
      s"SELECT id FROM bl_in WHERE bloom_might_contain(bits, id, $k)")
      .as[Long].collect().toSet
    assert(viaSql == viaCol)
    assert((0L until 100L).toSet.subsetOf(viaSql), "no false negatives")
  }

  test("dot_packed: SQL ≡ Column API on packed embeddings") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(20)
      .select(col("vec_id"),
        VecFns.packVec(col("embedding").cast("array<double>")).as("pv"))
      .localCheckpoint()
    embs.createOrReplaceTempView("dp_in")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_packed(pv, pv) AS d FROM dp_in ORDER BY vec_id")
      .as[(Long, Double)].collect().toSeq
    val viaCol = embs
      .select(col("vec_id"), DotPackedExpr.dotPackedNative(col("pv"), col("pv")).as("d"))
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    assert(viaSql == viaCol && viaSql.forall(_._2 > 0))
  }
}
