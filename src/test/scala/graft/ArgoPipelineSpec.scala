package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.argo.{ArgoSchemas, Atlas, AtlasStore, Interpolator, SummaryBuilder}

/** End-to-end pipeline test on FIXTURES.md-shaped synthetic data: smooth
  * analytic T/S fields sampled at irregular depths → summary → interpolated
  * profiles → atlas climatology. Because every profile samples the SAME
  * smooth field, the atlas weighted means must reproduce the field at every
  * well-sampled cell — a strong oracle with no reference binaries needed.
  */
class ArgoPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def tTrue(z: Double): Double = 2.0 + 18.0 * math.exp(-z / 500.0)
  private def sTrue(z: Double): Double = 35.0 + 0.6 * math.exp(-z / 300.0)
  /** The pipeline converts raw in-situ T to conservative temperature
    * (reference interpolation.py:207-208), so the oracle field must be
    * mapped through the same public TEOS-10 conversion. */
  private def ctTrue(z: Double): Double =
    graft.functions.Teos10.ctFromT(sTrue(z), tTrue(z), z)

  private val rng = new scala.util.Random(42)

  /** nFloats floats × nProf profiles each, clustered near (lon0, lat0). */
  private def makeRaw(nFloats: Int, nProf: Int): (DataFrame, DataFrame) = {
    val floats = (0 until nFloats).map { f =>
      val wmo = 2900000 + f
      val dac = ArgoSchemas.Dacs(f % ArgoSchemas.Dacs.length)
      val lon0 = 10.0 + (f % 5) * 2.0
      val lat0 = -40.0 + (f / 5) * 2.0
      (wmo, dac, lon0, lat0)
    }
    val summaryRows = for {
      (wmo, dac, lon0, lat0) <- floats
      ip <- 0 until nProf
    } yield (dac, wmo,
      new Timestamp(1577836800000L + (wmo % 100) * 86400000L + ip * 864000000L),
      (lon0 + ip * 0.01).toFloat, (lat0 + ip * 0.01).toFloat,
      120, "D", "1", 1, 1)
    val raw = summaryRows.toDF("dac", "WMO", "JULD", "LONGITUDE", "LATITUDE",
      "N_LEVELS", "data_mode", "platform_type", "position_qc", "juld_qc")

    val sampleRows = for {
      (wmo, _, _, _) <- floats
      ip <- 0 until nProf
    } yield {
      // irregular but sorted depths 0..2000, ~120 samples
      val depths = (0 until 120).map(k => k * 17.0 + (k % 3) * 1.5).toArray
      val qc = depths.map(_ => 1.0)
      (wmo, ip, depths.toSeq, depths.map(tTrue).toSeq,
        depths.map(z => sTrue(z) / graft.functions.Seawater.UPS).toSeq, qc.toSeq, 1)
    }
    val samples = sampleRows.toDF(
      "WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    (raw, samples)
  }

  private lazy val (raw, samples) = makeRaw(nFloats = 10, nProf = 3)
  private lazy val summary = SummaryBuilder.build(spark, raw)
  private lazy val profiles = Interpolator.interpolate(samples, summary)

  test("summary: schema, IPROF ordinal, FLAG product") {
    val s = summary.cache()
    assert(s.schema.fieldNames.toSeq == ArgoSchemas.summary.fieldNames.toSeq)
    assert(s.count() === 30)
    val iprofs = s.filter($"WMO" === 2900000).select($"IPROF").as[Short]
      .collect().sorted.toSeq
    assert(iprofs == Seq(0, 1, 2))
    assert(s.filter($"FLAG" =!= 1).count() === 0)
  }

  test("interpolation reproduces the smooth generating field at the reference levels") {
    val rows = profiles.select($"WMO", $"IPROF", $"NVALUES", $"CT", $"SR", $"IDX")
      .as[(Int, Short, Int, Seq[Float], Seq[Float], Seq[Byte])].collect()
    assert(rows.length === 30)
    rows.foreach { case (wmo, ip, nv, ct, sr, idx) =>
      assert(nv > 50, s"wmo=$wmo ip=$ip expected most levels covered, got $nv")
      ArgoSchemas.Pref.indices.foreach { k =>
        if (idx(k) == 1) {
          val z = ArgoSchemas.Pref(k)
          assert(math.abs(ct(k) - ctTrue(z)) < 0.05,
            s"CT at level $z: ${ct(k)} vs ${ctTrue(z)}")
          assert(math.abs(sr(k) - sTrue(z)) < 0.05,
            s"SR at level $z: ${sr(k)} vs ${sTrue(z)}")
        }
      }
    }
  }

  test("interpolation gate rejects short and bad-QC profiles") {
    val bad = Seq(
      // 4 samples only → rejected by the ≥5 gate
      (1, 0, Seq(0.0, 10, 20, 30), Seq(5.0, 5, 5, 5), Seq(35.0, 35, 35, 35),
        Seq(1.0, 1, 1, 1), 1),
      // all bad QC → rejected by F6
      (1, 1, (0 until 50).map(_ * 40.0), (0 until 50).map(_ => 5.0),
        (0 until 50).map(_ => 35.0), (0 until 50).map(_ => 0.0), 1))
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val hdr = Seq((1, 0.toShort), (1, 1.toShort)).toDF("WMO", "IPROF")
      .withColumn("DAC", lit(0.toByte)).withColumn("JULD", current_timestamp())
      .withColumn("LATITUDE", lit(0.0f)).withColumn("LONGITUDE", lit(0.0f))
      .withColumn("DATA_MODE", lit(1.toByte)).withColumn("FLAG", lit(1.toByte))
    val out = Interpolator.interpolate(bad, hdr)
      .select($"NVALUES").as[Int].collect()
    assert(out.forall(_ === 0))
  }

  test("atlas climTS reproduces the field at sampled cells") {
    val atlas = new Atlas(box = (0.0, 30.0, -50.0, -30.0), reso = 2.0)
    val out = atlas.climTS(spark, profiles)
      .filter($"CT" =!= 0.0f) // cells with data
      .select($"pres", $"CT", $"SR").as[(Float, Float, Float)].collect()
    assert(out.nonEmpty, "no atlas cells with data")
    out.foreach { case (pres, ct, sr) =>
      // every profile carries the same field → weighted mean == field value
      assert(math.abs(ct - ctTrue(pres)) < 0.05, s"atlas CT at $pres: $ct")
      assert(math.abs(sr - sTrue(pres)) < 0.05, s"atlas SR at $pres: $sr")
    }
  }

  test("non-monotone PRES: trailing duplicate dedups to the first occurrence; shuffled/reversed rejected") {
    // The kernel's unique-PRES pass has a strictly-increasing fast path;
    // these inputs pin the general (sort + first-occurrence) path to the
    // reference's np.unique semantics (interpolation.py:234-249): the
    // contiguity test on the value-ordered first-occurrence indices admits
    // only profiles whose distinct values already sit in ascending order —
    // in practice, sorted profiles with trailing repeats.
    val n = 40
    val pSorted = (0 until n).map(_ * 40.0)
    val tOf = (p: Double) => 2.0 + 10.0 * math.exp(-p / 500.0)
    val sOf = (p: Double) => 34.5 + 0.5 * math.exp(-p / 300.0)
    def row(ip: Int, ps: Seq[Double]) =
      (1, ip, ps, ps.map(tOf), ps.map(sOf), ps.map(_ => 1.0), 1)
    val dup = pSorted.init :+ pSorted(n - 2) // trailing duplicate value
    val shuffledP = { val r = new scala.util.Random(7); r.shuffle(pSorted) }
    val df = Seq(
      row(0, pSorted),            // fast path
      row(1, dup),                // general path, accepted
      row(2, shuffledP),          // non-contiguous → rejected
      row(3, pSorted.reverse))    // reversed → rejected
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val hdr = (0 to 3).map(ip => (1, ip.toShort)).toDF("WMO", "IPROF")
      .withColumn("DAC", lit(0.toByte)).withColumn("JULD", current_timestamp())
      .withColumn("LATITUDE", lit(0.0f)).withColumn("LONGITUDE", lit(0.0f))
      .withColumn("DATA_MODE", lit(1.toByte)).withColumn("FLAG", lit(1.toByte))
    val out = Interpolator.interpolate(df, hdr)
      .select($"IPROF", $"NVALUES", $"CT", $"SR")
      .as[(Short, Int, Seq[Float], Seq[Float])].collect().sortBy(_._1)
    assert(out(2)._2 === 0, "shuffled PRES must be rejected by the contiguity gate")
    assert(out(3)._2 === 0, "reversed PRES must be rejected by the contiguity gate")
    assert(out(1)._2 > 10, "trailing-duplicate profile must pass the gate")
    // the duplicated sample carries identical (T, S), so dedup-to-first
    // must reproduce the dedupped profile's interpolation exactly
    val dedupped = Seq(row(9, pSorted.init))
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val hdr9 = Seq((1, 9.toShort)).toDF("WMO", "IPROF")
      .withColumn("DAC", lit(0.toByte)).withColumn("JULD", current_timestamp())
      .withColumn("LATITUDE", lit(0.0f)).withColumn("LONGITUDE", lit(0.0f))
      .withColumn("DATA_MODE", lit(1.toByte)).withColumn("FLAG", lit(1.toByte))
    val ref = Interpolator.interpolate(dedupped, hdr9)
      .select($"NVALUES", $"CT", $"SR")
      .as[(Int, Seq[Float], Seq[Float])].collect().head
    assert((out(1)._2, out(1)._3, out(1)._4) === ref,
      "trailing duplicate must interpolate exactly like the dedupped profile")
  }

  test("NaN PRES among kept samples rejects the profile (NVALUES = 0)") {
    // A mis-flagged fill value must drop the profile, not poison the
    // spline into all-NaN output carrying IDX = 1 (which the fixed-point
    // atlas sums would silently count as zeros, biasing cell means).
    val n = 40
    val ps: Seq[Double] = (0 until n).map(_ * 40.0)
    val tOf = (p: Double) => 2.0 + 10.0 * math.exp(-p / 500.0)
    val withNaN = ps.updated(17, Double.NaN)
    val badQcNaN = ps.updated(17, Double.NaN) // NaN sample flagged bad below
    val df = Seq(
      (1, 0, withNaN, withNaN.map(tOf), withNaN.map(_ => 35.0),
        ps.map(_ => 1.0), 1),
      // same NaN but QC-rejected at that index → profile must still pass
      (1, 1, badQcNaN, badQcNaN.map(tOf), badQcNaN.map(_ => 35.0),
        ps.indices.map(i => if (i == 17) 0.0 else 1.0), 1))
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val hdr = Seq((1, 0.toShort), (1, 1.toShort)).toDF("WMO", "IPROF")
      .withColumn("DAC", lit(0.toByte)).withColumn("JULD", current_timestamp())
      .withColumn("LATITUDE", lit(0.0f)).withColumn("LONGITUDE", lit(0.0f))
      .withColumn("DATA_MODE", lit(1.toByte)).withColumn("FLAG", lit(1.toByte))
    val out = Interpolator.interpolate(df, hdr)
      .select($"IPROF", $"NVALUES", $"CT")
      .as[(Short, Int, Seq[Float])].collect().sortBy(_._1)
    assert(out(0)._2 === 0, "NaN PRES must reject the profile")
    assert(out(1)._2 > 10, "QC-masked NaN must not reject the profile")
    assert(out(1)._3.forall(v => !v.isNaN), "no NaN may reach the output arrays")
  }

  test("interpolation method is pluggable: PCHIP (METHODS[1]) also reproduces the field") {
    val rows = Interpolator.interpolate(samples, summary, algo = 1)
      .select($"NVALUES", $"CT", $"SR", $"IDX")
      .as[(Int, Seq[Float], Seq[Float], Seq[Byte])].collect()
    assert(rows.length === 30)
    rows.foreach { case (nv, ct, sr, idx) =>
      assert(nv > 50)
      ArgoSchemas.Pref.indices.foreach { k =>
        if (idx(k) == 1) {
          val z = ArgoSchemas.Pref(k)
          assert(math.abs(ct(k) - ctTrue(z)) < 0.05, s"PCHIP CT at $z: ${ct(k)}")
          assert(math.abs(sr(k) - sTrue(z)) < 0.05, s"PCHIP SR at $z: ${sr(k)}")
        }
      }
    }
  }

  test("interpolation method is pluggable: joint MR-PCHIP (METHODS[2]) also reproduces the field") {
    val rows = Interpolator.interpolate(samples, summary, algo = Interpolator.MrPchip)
      .select($"NVALUES", $"CT", $"SR", $"IDX")
      .as[(Int, Seq[Float], Seq[Float], Seq[Byte])].collect()
    assert(rows.length === 30)
    rows.foreach { case (nv, ct, sr, idx) =>
      assert(nv > 50)
      ArgoSchemas.Pref.indices.foreach { k =>
        if (idx(k) == 1) {
          val z = ArgoSchemas.Pref(k)
          assert(math.abs(ct(k) - ctTrue(z)) < 0.05, s"MR-PCHIP CT at $z: ${ct(k)}")
          assert(math.abs(sr(k) - sTrue(z)) < 0.05, s"MR-PCHIP SR at $z: ${sr(k)}")
        }
      }
    }
  }

  test("polar crop: longitude margin widens as 1/cos(lat)") {
    // A profile 33.5° of longitude west of the box at 77°N is only
    // ~4.6e-3 haversine-arg from the (0°E, 76°N) cell — inside the 8°-arc
    // search radius, because meridians converge — yet a fixed 4·m = 32°
    // longitude margin would crop it before the join could see it.
    val raw = Seq((ArgoSchemas.Dacs(0), 2900999,
      new Timestamp(1577836800000L), -33.5f, 77.0f, 120, "D", "1", 1, 1))
      .toDF("dac", "WMO", "JULD", "LONGITUDE", "LATITUDE", "N_LEVELS",
        "data_mode", "platform_type", "position_qc", "juld_qc")
    val depths = (0 until 120).map(k => k * 17.0 + (k % 3) * 1.5).toArray
    val polarSamples = Seq((2900999, 0, depths.toSeq, depths.map(tTrue).toSeq,
      depths.map(z => sTrue(z) / graft.functions.Seawater.UPS).toSeq,
      depths.map(_ => 1.0).toSeq, 1))
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val prof = Interpolator.interpolate(polarSamples, SummaryBuilder.build(spark, raw))
    val atlas = new Atlas(box = (0.0, 4.0, 76.0, 80.0), reso = 2.0)
    val n = atlas.climTS(spark, prof).filter($"CT" =!= 0.0f).count()
    assert(n > 0, "high-latitude profile was cropped before the join")
  }

  test("a profile at exactly +180° joins through the wrapped bin") {
    // floor((180+180)/binW) is one PAST the last longitude bin; without a
    // pmod on the profile side that phantom bin matches no grid neighbor
    // bin (the grid side wraps) and the profile silently contributes to
    // no cell — the worst kind of dateline bug, invisible in the output.
    val raw = Seq((ArgoSchemas.Dacs(0), 2900998,
      new Timestamp(1577836800000L), 180.0f, -41.0f, 120, "D", "1", 1, 1))
      .toDF("dac", "WMO", "JULD", "LONGITUDE", "LATITUDE", "N_LEVELS",
        "data_mode", "platform_type", "position_qc", "juld_qc")
    val depths = (0 until 120).map(k => k * 17.0 + (k % 3) * 1.5).toArray
    val dlSamples = Seq((2900998, 0, depths.toSeq, depths.map(tTrue).toSeq,
      depths.map(z => sTrue(z) / graft.functions.Seawater.UPS).toSeq,
      depths.map(_ => 1.0).toSeq, 1))
      .toDF("WMO", "IPROF", "PRES", "TEMP", "PSAL", "QC", "DATA_MODE")
    val prof = Interpolator.interpolate(dlSamples, SummaryBuilder.build(spark, raw))
    val atlas = new Atlas(box = (172.0, 180.0, -45.0, -37.0), reso = 2.0)
    val n = atlas.climTS(spark, prof).filter($"CT" =!= 0.0f).count()
    assert(n > 0, "the +180° profile fell into an unjoinable phantom bin")
  }

  test("atlas past the broadcast cap: binned shuffle-hash join, identical cells") {
    // At a global 1/4° grid (~10⁸ exploded rows) the broadcast branch of
    // Atlas.pairs is out of budget and the shuffle-hash fallback is the
    // branch a 100 TB run actually lives in — so it must be exercised, not
    // just exist. Dropping the cap to 0 via conf forces it on the same
    // small fixture; the fixed-point cell aggregation is partition-
    // invariant, so both join strategies must produce BIT-identical cells.
    val atlas = new Atlas(box = (0.0, 30.0, -50.0, -30.0), reso = 2.0)
    def cells() = atlas.climTS(spark, profiles).filter($"CT" =!= 0.0f)
      .select($"lon", $"lat", $"pres", $"CT", $"SR")
      .as[(Float, Float, Float, Float, Float)].collect().toSeq.sorted
    val pBroad = atlas.pairs(spark, profiles).queryExecution.executedPlan.toString
    assert(pBroad.contains("BroadcastHashJoin"),
      s"small grid should broadcast by default:\n$pBroad")
    val viaBroadcast = cells()
    assert(viaBroadcast.nonEmpty, "degenerate fixture: no cells with data")
    spark.conf.set("spark.graft.atlasBroadcastMaxRows", "0")
    try {
      // the PAIR join (keys bi, bj) must be shuffle-hash; upstream summary
      // dict joins legitimately keep broadcasting their tiny dims
      val pShuf = atlas.pairs(spark, profiles).queryExecution.executedPlan.toString
      assert(pShuf.contains("ShuffledHashJoin [bi"),
        s"past the cap the bin join must be shuffle-hash:\n$pShuf")
      assert(!pShuf.contains("BroadcastHashJoin [bi"),
        s"grid must not broadcast past the cap:\n$pShuf")
      assert(cells() == viaBroadcast,
        "shuffle fallback must produce the exact broadcast-path cells")
    } finally spark.conf.unset("spark.graft.atlasBroadcastMaxRows")
  }

  test("bucketed profile store joins co-located: no profile-side exchange") {
    // The 100 TB at-rest layout: profiles bucketed on the atlas bin key.
    // Past the broadcast cap the pair join must then shuffle ONLY the
    // exploded-grid side — the profile side's scan partitioning already
    // satisfies the join distribution.
    val atlas = new Atlas(box = (0.0, 30.0, -50.0, -30.0), reso = 2.0)
    val tmp = graft.TempDirs.create("graft-bucketed")
    AtlasStore.saveBucketed(profiles, atlas, "profiles_bucketed", buckets = 8,
      path = Some(tmp.resolve("t").toString))
    try {
      val bp = AtlasStore.loadBucketed(spark, "profiles_bucketed")
      spark.conf.set("spark.graft.atlasBroadcastMaxRows", "0")
      try {
        val plan = atlas.pairs(spark, bp).queryExecution.executedPlan.toString
        assert(plan.contains("ShuffledHashJoin [bi"),
          s"expected the shuffle-hash pair join:\n$plan")
        val nEx = "Exchange hashpartitioning\\(bi".r.findAllIn(plan).length
        assert(nEx == 1, s"only the grid side may shuffle on the bin key, found $nEx:\n$plan")
        assert(plan.contains("Bucketed: true"),
          s"profile side must read as a bucketed scan:\n$plan")
        def cells(src: org.apache.spark.sql.DataFrame) =
          atlas.climTS(spark, src).filter($"CT" =!= 0.0f)
            .select($"lon", $"lat", $"pres", $"CT", $"SR")
            .as[(Float, Float, Float, Float, Float)].collect().toSeq.sorted
        assert(cells(bp) == cells(profiles),
          "bucketed store must produce the exact direct-path cells")
      } finally spark.conf.unset("spark.graft.atlasBroadcastMaxRows")
    } finally spark.sql("DROP TABLE IF EXISTS profiles_bucketed")
  }

  test("registered q71 rides the atlas store when spark.graft.atlasStore points at it") {
    // The co-location proof above lives on hand-built profiles; this is
    // the REGISTERED atlas query over the at-rest store: identical cells,
    // a bucketed profile scan, and — under the forced shuffle fallback —
    // exactly ONE bin-key exchange (the exploded grid side; the 100 TB
    // profile side stays where its buckets put it).
    val d = "/root/testdata/sf0.001"
    val prof = graft.queries.ArgoQueries.profilesProbe(spark, d)
    val atlas = graft.queries.ArgoQueries.ExportAtlas
    val tmp = graft.TempDirs.create("graft-atlasstore-q")
    AtlasStore.saveBucketed(prof, atlas, "atlas_q71", buckets = 8,
      path = Some(tmp.resolve("t").toString))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"lon", $"lat", $"pres", $"CT", $"SR")
        .as[(Float, Float, Float, Float, Float)].collect().toSeq.sorted
    try {
      val want = rows(SparkEntry.queries("q71_argo_atlas")(spark, d))
      spark.conf.set("spark.graft.atlasStore", s"$d=atlas_q71")
      try {
        val df = SparkEntry.queries("q71_argo_atlas")(spark, d)
        assert(rows(df) == want, "q71 over the store must equal the memo path")
        assert(df.queryExecution.executedPlan.toString.contains("Bucketed: true"),
          "q71 must scan the bucketed store")
        spark.conf.set("spark.graft.atlasBroadcastMaxRows", "0")
        try {
          val df2 = SparkEntry.queries("q71_argo_atlas")(spark, d)
          assert(rows(df2) == want,
            "store + forced shuffle fallback must still match")
          val p2 = df2.queryExecution.executedPlan.toString
          val nEx = "Exchange hashpartitioning\\(bi".r.findAllIn(p2).length
          assert(nEx == 1,
            s"only the grid side may shuffle on the bin key, found $nEx:\n$p2")
        } finally spark.conf.unset("spark.graft.atlasBroadcastMaxRows")
      } finally spark.conf.unset("spark.graft.atlasStore")
    } finally spark.sql("DROP TABLE IF EXISTS atlas_q71")
  }

  test("atlas climEAPE R14: near-zero for a homogeneous ocean, SIGSTAR plausible") {
    val atlas = new Atlas(box = (8.0, 22.0, -42.0, -34.0), reso = 2.0)
    val out = atlas.climEAPE(spark, profiles, algo = "R14")
      .filter($"SIGSTAR" =!= 0.0f)
      .select($"pres", $"EAPE", $"SIGSTAR").as[(Float, Float, Float)].collect()
    assert(out.nonEmpty)
    out.foreach { case (pres, eape, sig) =>
      // all parcels identical ⇒ no displacement ⇒ EAPE ≈ 0
      assert(math.abs(eape) < 1.0, s"EAPE at $pres: $eape")
      assert(sig > 20 && sig < 35, s"SIGSTAR at $pres: $sig")
    }
  }

  test("atlas climEAPE T25 runs and produces finite GAMMAT") {
    val atlas = new Atlas(box = (8.0, 14.0, -42.0, -38.0), reso = 2.0)
    val out = atlas.climEAPE(spark, profiles, algo = "T25")
      .filter($"SIGSTAR" =!= 0.0f)
      .select($"EAPE", $"SIGSTAR").as[(Float, Float)].collect()
    assert(out.nonEmpty)
    out.foreach { case (eape, g) =>
      assert(!eape.isNaN && !g.isNaN)
      assert(g > 15 && g < 40, s"GAMMAT $g out of plausible range")
    }
  }
}
