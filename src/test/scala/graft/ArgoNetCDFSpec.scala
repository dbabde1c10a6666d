package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.argo.{Atlas, AtlasSink, Interpolator, SummaryBuilder}
import graft.functions.{Seawater, Teos10}
import graft.sources.{ArgoNetCDF, Nc3}

/** S2 end-to-end: a GDAC-layout `<dac>/<wmo>/<wmo>_prof.nc` written in the
  * classic format feeds the UNMODIFIED production pipeline (summary →
  * interpolation), and S9's writeNetcdf exports an atlas a classic reader
  * parses back. */
class ArgoNetCDFSpec extends SparkSuite {
  import spark.implicits._

  private val nProf = 3
  private val nLev = 40
  private def tTrue(z: Double): Double = 2.0 + 18.0 * math.exp(-z / 500.0)

  /** Argo-shaped classic file: science vars on (N_PROF, N_LEVELS). */
  private def profFile(): Array[Byte] = {
    val pres = Array.tabulate(nProf * nLev)(i => (i % nLev) * 50.0f)
    val temp = pres.map(p => tTrue(p).toFloat)
    val psal = pres.map(_ => 35.0f)
    val qc = Array.fill(nProf * nLev)('1'.toByte)
    // two HISTORY records (the manual's audit trail: unlimited N_HISTORY,
    // fixed-width strings per (record, profile))
    def hist(vals: Seq[String], w: Int): Array[Byte] =
      vals.map(_.padTo(w, ' ')).mkString.getBytes("UTF-8")
    Nc3.write(
      dims = Seq(Nc3.Dim("N_HISTORY", 0), Nc3.Dim("N_PROF", nProf),
        Nc3.Dim("N_LEVELS", nLev), Nc3.Dim("STRING8", 8),
        Nc3.Dim("STRING4", 4), Nc3.Dim("DATE_TIME", 14)),
      gatts = Seq(Nc3.Att("title", Nc3.NcChar, "Argo float vertical profile")),
      numRecs = 2,
      vars = Seq(
        Nc3.VarSpec("HISTORY_INSTITUTION", Seq("N_HISTORY", "N_PROF", "STRING4"),
          Nil, Nc3.NcChar, hist(Seq("AO", "AO", "AO", "IF", "IF", "IF"), 4)),
        Nc3.VarSpec("HISTORY_STEP", Seq("N_HISTORY", "N_PROF", "STRING4"),
          Nil, Nc3.NcChar, hist(Seq.fill(3)("ARFM") ++ Seq.fill(3)("ARGQ"), 4)),
        Nc3.VarSpec("HISTORY_DATE", Seq("N_HISTORY", "N_PROF", "DATE_TIME"),
          Nil, Nc3.NcChar,
          hist(Seq.fill(3)("20200101000000") ++ Seq.fill(3)("20200102000000"), 14)),
        Nc3.VarSpec("HISTORY_ACTION", Seq("N_HISTORY", "N_PROF", "STRING4"),
          Nil, Nc3.NcChar, hist(Seq.fill(3)("IP") ++ Seq.fill(3)("QCP$"), 4)),
        Nc3.VarSpec("JULD", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(25567.0, 25577.5, 25588.0)), // days since 1950 → 2020
        Nc3.VarSpec("LONGITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(12.0, 12.1, 12.2)),
        Nc3.VarSpec("LATITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(-41.0, -41.1, -41.2)),
        Nc3.VarSpec("DATA_MODE", Seq("N_PROF"), Nil, Nc3.NcChar,
          "RRR".getBytes("UTF-8")),
        Nc3.VarSpec("PLATFORM_TYPE", Seq("N_PROF", "STRING8"), Nil, Nc3.NcChar,
          ("APEX    " * nProf).getBytes("UTF-8")),
        Nc3.VarSpec("POSITION_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          "111".getBytes("UTF-8")),
        Nc3.VarSpec("JULD_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          "111".getBytes("UTF-8")),
        Nc3.VarSpec("PRES", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, pres),
        Nc3.VarSpec("TEMP", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, temp),
        Nc3.VarSpec("PSAL", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, psal),
        Nc3.VarSpec("PRES_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc),
        Nc3.VarSpec("TEMP_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc),
        Nc3.VarSpec("PSAL_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc)))
  }

  private lazy val gdac: String = {
    val root = graft.TempDirs.create("gdac")
    val dir = root.resolve("aoml/2901234")
    Files.createDirectories(dir)
    Files.write(dir.resolve("2901234_prof.nc"), profFile())
    root.toString
  }

  test("GDAC scan → per-profile rows with reference semantics") {
    val df = ArgoNetCDF.read(spark, gdac).cache()
    assert(df.count() === nProf)
    val r = df.orderBy("IPROF").head()
    assert(r.getAs[String]("dac") === "aoml")
    assert(r.getAs[Int]("WMO") === 2901234)
    assert(r.getAs[String]("data_mode") === "R")
    assert(r.getAs[String]("platform_type") === "APEX")
    // 25567 days after 1950-01-01; compare in UTC (Instant.toString), not
    // the JVM default zone Timestamp.toString would use
    assert(r.getAs[java.sql.Timestamp]("JULD").toInstant.toString
      .startsWith("2020-01-01"))
    assert(r.getAs[Seq[Double]]("QC").forall(_ === 1.0))
    assert(r.getAs[Seq[Double]]("PRES").take(3) === Seq(0.0, 50.0, 100.0))
  }

  test("HISTORY record block surfaces as a distributed audit DataFrame") {
    val h = ArgoNetCDF.history(spark, gdac).cache()
    assert(h.count() === 2 * nProf) // 2 records × 3 profiles
    val first = h.filter(col("step") === 0).orderBy("IPROF")
      .select("institution", "histStep", "action").as[(String, String, String)]
      .collect()
    assert(first.toSeq === Seq.fill(3)(("AO", "ARFM", "IP")))
    val second = h.filter(col("step") === 1).orderBy("IPROF")
      .select("institution", "histStep", "action", "date")
      .as[(String, String, String, String)].collect()
    assert(second.toSeq === Seq.fill(3)(("IF", "ARGQ", "QCP$", "20200102000000")))
  }

  test("streaming GDAC source ingests newly landed files incrementally") {
    val root = graft.TempDirs.create("gdac-stream")
    val d1 = root.resolve("aoml/3900001")
    Files.createDirectories(d1)
    Files.write(d1.resolve("3900001_prof.nc"), profFile())
    val sq = ArgoNetCDF.readStream(spark, root.toString)
      .writeStream.format("memory").queryName("gdac_stream")
      .outputMode("append")
      .option("checkpointLocation",
        graft.TempDirs.create("gdac-stream-ckpt").toString)
      .start()
    try {
      sq.processAllAvailable()
      assert(spark.table("gdac_stream").count() === nProf)
      // a new float lands mid-stream: only ITS profiles are parsed and
      // appended — the first file is never re-read (file-source tracking)
      val d2 = root.resolve("coriolis/3900002")
      Files.createDirectories(d2)
      Files.write(d2.resolve("3900002_prof.nc"), profFile())
      sq.processAllAvailable()
      val byWmo = spark.table("gdac_stream").groupBy("WMO").count()
        .as[(Int, Long)].collect().toMap
      assert(byWmo === Map(3900001 -> nProf.toLong, 3900002 -> nProf.toLong))
      val dacs = spark.table("gdac_stream").select("dac").distinct()
        .as[String].collect().toSet
      assert(dacs === Set("aoml", "coriolis"))
    } finally sq.stop()
  }

  test("NetCDF source feeds the unmodified pipeline end to end") {
    val df = ArgoNetCDF.read(spark, gdac)
    val summary = SummaryBuilder.build(spark, ArgoNetCDF.rawHeader(df))
    assert(summary.count() === nProf)
    val prof = Interpolator.interpolate(ArgoNetCDF.samples(df), summary)
    val rows = prof.select($"NVALUES", $"CT", $"SR", $"IDX")
      .as[(Int, Seq[Float], Seq[Float], Seq[Byte])].collect()
    assert(rows.length === nProf)
    rows.foreach { case (nv, ct, sr, idx) =>
      assert(nv > 30, s"expected most levels covered, got $nv")
      graft.argo.ArgoSchemas.Pref.indices.foreach { k =>
        if (idx(k) == 1) {
          val z = graft.argo.ArgoSchemas.Pref(k)
          val srTrue = Seawater.srFromSp(35.0)
          val ctTrue = Teos10.ctFromT(srTrue, tTrue(z), z)
          assert(math.abs(ct(k) - ctTrue) < 0.05, s"CT at $z: ${ct(k)} vs $ctTrue")
          assert(math.abs(sr(k) - srTrue) < 1e-3, s"SR at $z: ${sr(k)}")
        }
      }
    }
  }

  /** Delayed-mode file: raw variables are garbage with QC '4'; the
    * `_ADJUSTED` variables carry the real profile with QC '1'. The
    * reference takes BOTH the adjusted values and the adjusted QC on this
    * path (interpolation.py:188-196) — gating by the raw QC would reject
    * every sample. */
  private def delayedProfFile(): Array[Byte] = {
    val presA = Array.tabulate(nProf * nLev)(i => (i % nLev) * 50.0f)
    val tempA = presA.map(p => tTrue(p).toFloat)
    val psalA = presA.map(_ => 35.0f)
    val junk = Array.fill(nProf * nLev)(99999.0f)
    val qcBad = Array.fill(nProf * nLev)('4'.toByte)
    val qcGood = Array.fill(nProf * nLev)('1'.toByte)
    Nc3.write(
      dims = Seq(Nc3.Dim("N_PROF", nProf), Nc3.Dim("N_LEVELS", nLev)),
      gatts = Nil,
      vars = Seq(
        Nc3.VarSpec("JULD", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(25567.0, 25577.5, 25588.0)),
        Nc3.VarSpec("LONGITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(13.0, 13.1, 13.2)),
        Nc3.VarSpec("LATITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array(-42.0, -42.1, -42.2)),
        Nc3.VarSpec("DATA_MODE", Seq("N_PROF"), Nil, Nc3.NcChar,
          "DDD".getBytes("UTF-8")),
        Nc3.VarSpec("POSITION_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          "111".getBytes("UTF-8")),
        Nc3.VarSpec("JULD_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          "111".getBytes("UTF-8")),
        Nc3.VarSpec("PRES", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, junk),
        Nc3.VarSpec("TEMP", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, junk),
        Nc3.VarSpec("PSAL", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, junk),
        Nc3.VarSpec("PRES_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcBad),
        Nc3.VarSpec("TEMP_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcBad),
        Nc3.VarSpec("PSAL_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcBad),
        Nc3.VarSpec("PRES_ADJUSTED", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, presA),
        Nc3.VarSpec("TEMP_ADJUSTED", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, tempA),
        Nc3.VarSpec("PSAL_ADJUSTED", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, psalA),
        Nc3.VarSpec("PRES_ADJUSTED_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcGood),
        Nc3.VarSpec("TEMP_ADJUSTED_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcGood),
        Nc3.VarSpec("PSAL_ADJUSTED_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qcGood)))
  }

  test("S3: delayed-mode floats use adjusted VALUES and adjusted QC") {
    val root = graft.TempDirs.create("gdac_dm")
    val dir = root.resolve("aoml/2905678")
    Files.createDirectories(dir)
    Files.write(dir.resolve("2905678_prof.nc"), delayedProfFile())
    val df = ArgoNetCDF.read(spark, root.toString)
    val summary = SummaryBuilder.build(spark, ArgoNetCDF.rawHeader(df))
    val prof = Interpolator.interpolate(ArgoNetCDF.samples(df), summary)
    val rows = prof.select($"NVALUES", $"CT", $"IDX")
      .as[(Int, Seq[Float], Seq[Byte])].collect()
    assert(rows.length === nProf)
    rows.foreach { case (nv, ct, idx) =>
      // raw QC is all '4': gating by it would reject every sample (nv=0)
      assert(nv > 30, s"adjusted-QC path broken: NVALUES=$nv")
      graft.argo.ArgoSchemas.Pref.indices.foreach { k =>
        if (idx(k) == 1) {
          val z = graft.argo.ArgoSchemas.Pref(k)
          val srTrue = Seawater.srFromSp(35.0)
          val ctTrue = Teos10.ctFromT(srTrue, tTrue(z), z)
          assert(math.abs(ct(k) - ctTrue) < 0.05,
            s"adjusted CT at $z: ${ct(k)} vs $ctTrue")
        }
      }
    }
  }

  test("S9 writeNetcdf exports an atlas a classic reader parses back") {
    val out = graft.TempDirs.create("atlas_nc").resolve("atlas.nc").toString
    val atlas = new Atlas(box = (10.0, 30.0, -50.0, -40.0), reso = 5.0)
    val df = Seq(
      (10.0f, -50.0f, 0.0f, 18.5f, 35.1f),
      (15.0f, -45.0f, 10.0f, 17.5f, 35.2f))
      .toDF("lon", "lat", "pres", "CT", "SR")
    val profiles = Seq((1, new java.sql.Timestamp(1577836800000L)))
      .toDF("WMO", "JULD")
    AtlasSink.writeNetcdf(out, atlas, df, profiles)

    val nc = new Nc3.NcFile(Files.readAllBytes(Paths.get(out)))
    assert(nc.dims.map(d => (d.name, d.length)) ===
      Seq(("lon", 4), ("lat", 2), ("pres", 64)))
    assert(nc.gatt("name") === Some("Atlas of Argo statistics"))
    assert(nc.gatt("domain").get.asInstanceOf[Array[Double]].toSeq ===
      Seq(10.0, 30.0, -50.0, -40.0))
    assert(nc.variable("CT").atts.exists(a =>
      a.name == "units" && a.value == "°C"))
    assert(nc.readDoubles("lon").toSeq === Seq(10.0, 15.0, 20.0, 25.0))
    // value placed at (pres=0 → k=0, lat=-50 → j=0, lon=10 → i=0)
    val ct = nc.readDoubles("CT")
    assert(math.abs(ct(0) - 18.5) < 1e-4)
    // (pres=10 → k=2, lat=-45 → j=1, lon=15 → i=1)
    assert(math.abs(ct((2 * 2 + 1) * 4 + 1) - 17.5) < 1e-4)
    // untouched cells are zero-initialized like the reference's arrays
    assert(ct(1) === 0.0)
  }
}
