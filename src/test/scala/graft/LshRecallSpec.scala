package graft

import org.apache.spark.sql.functions._

/** The q132 recall harness must be able to COUNT A MISS: on the driver
  * gate's corpus every true pair happens to band-collide (recall 1000
  * across the board), so a harness bug that marks every truth row found
  * would pass the oracle anyway. This spec plants a corpus where one
  * true near-dup pair shares NO band bucket (found by deterministic
  * search over crafted variants) and asserts q132 reports exactly that
  * miss — plus a byte-identical copy that must always be found. */
class LshRecallSpec extends SparkSuite {
  import spark.implicits._

  // 28 tokens: two substitutions touch 6 of 28 3-shingles → exact
  // Jaccard 22/34 ≈ 0.647 (over threshold), and P(no band collision)
  // ≈ (1 − 0.647²)⁴ ≈ 11% per variant — the search below finds a miss
  // deterministically within its fixed candidate list
  private val base = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu one two")

  /** Deterministic search: the first token-substituted variant whose
    * exact shingle Jaccard clears the q34 threshold while sharing ZERO
    * of the base's band keys — the banding's honest failure mode at
    * borderline similarity. */
  private def findMissVariant(): String = {
    val words = base.split(" ")
    val variants = (0 until 120).map { v =>
      // substitute two spread-out tokens; vary the replacement text
      val w = words.clone()
      w(5) = s"x${v}a"
      w(20) = s"y${v}b"
      (v.toLong + 1L, w.mkString(" "))
    }
    val all = ((0L, base) +: variants).toDF("doc_id", "text")
    val bands = TestAccess.bandFrame(all)
      .select($"doc_id", $"band", $"key", $"hs").collect()
    val baseKeys = bands.filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getString(2))).toSet
    val baseHs = bands.find(_.getLong(0) == 0L).get.getAs[Array[Byte]]("hs")
    val hit = variants.find { case (vid, _) =>
      val vRows = bands.filter(_.getLong(0) == vid)
      val vKeys = vRows.map(r => (r.getInt(1), r.getString(2))).toSet
      val vHs = vRows.head.getAs[Array[Byte]]("hs")
      val j = graft.functions.JaccardMicroPackedExpr.jaccardMicro(baseHs, vHs)
      j >= 500000L && vKeys.intersect(baseKeys).isEmpty
    }
    assert(hit.nonEmpty, "no borderline variant found — widen the search")
    hit.get._2
  }

  test("a banding miss at borderline similarity is reported as recall < 1000") {
    val miss = findMissVariant()
    val dir = graft.TempDirs.create("graft-lshrecall").toString
    // probe 0 (isProbe: 0 % 25 == 0), its miss variant, and a byte copy
    Seq((0L, base), (1L, miss), (2L, base))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q132_lsh_recall")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 2L, 1L, 500L)),
      s"expected probe 0 with 2 true pairs, 1 found (the byte copy), " +
        s"recall 500: $rows")
  }
}

/** Test-only bridge into TextQueries' package-private band construction. */
private object TestAccess {
  def bandFrame(docs: org.apache.spark.sql.DataFrame) =
    graft.queries.TextQueries.minhashBandFrame(docs)
}
