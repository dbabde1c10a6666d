package graft.argo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Interp, Seawater, SeawaterEos, Teos10}

/** Stage 2: raw sample arrays → TEOS-10 variables cubic-interpolated onto
  * the 64 reference levels (SURVEY.md §3.2; reference
  * interpolation.py:51-151).
  *
  * The reference forks a process pool over floats, each worker writing its
  * byte range of one shared pre-allocated file (README.md:153-158). Here
  * the whole stage is one narrow per-row pipeline — filter → kernel UDF →
  * equi-join — that Spark schedules per partition; the offset arithmetic
  * and the `write_header` second pass (interpolation.py:83-103) are
  * replaced by a join on (WMO, IPROF), never by row order.
  *
  * Input `samples`: one row per (WMO, IPROF) with `PRES`/`TEMP`/`PSAL`/
  * `QC` array<double> columns and optional `&#42;_ADJUSTED` variants.
  */
object Interpolator {
  import ArgoSchemas.{NLevels, Pref}

  /** An interpolation method maps the profile's (pressure, CT, SR) sample
    * arrays onto the target levels as a PAIR — the `gsw.sa_ct_interp`
    * shape, which the reference's METHODS entries share
    * (interpolation.py:74-81). Per-variable methods apply componentwise. */
  type Method = (Array[Double], Array[Double], Array[Double], Array[Double]) =>
    (Array[Double], Array[Double])

  private def perVariable(
      f: (Array[Double], Array[Double], Array[Double]) => Array[Double]): Method =
    (xs, ct, sr, targets) => (f(xs, ct, targets), f(xs, sr, targets))

  /** The reference's pluggable METHODS map (interpolation.py:20-21,74-81):
    * 0 = basic cubic (scipy `interp1d(kind="cubic")`), 1 = per-variable
    * shape-preserving PCHIP, 2 = the joint multiply-rotated PCHIP of
    * `gsw.sa_ct_interp` ([[Interp.mrPchipOnto]]) — every method,
    * including the joint one, registers here; callers validate/enumerate
    * against this map alone. */
  val Methods: Map[Int, Method] = Map(
    0 -> perVariable(Interp.cubicOnto),
    1 -> perVariable(Interp.pchipOnto),
    2 -> (Interp.mrPchipOnto _))

  /** Method id of the joint MR-PCHIP (`gsw.sa_ct_interp`) entry. */
  val MrPchip: Int = 2

  /** Per-profile kernel: QC mask (F6) → validity gate (F7, exact reference
    * thresholds) → cubic interpolation onto PREF (X6). Returns dense
    * (nvalues, ct[64], sr[64], idx[64]).
    *
    * Gate semantics (interpolation.py:234-249): ≥5 QC-good samples; the
    * first-occurrence indices of sorted-unique PRES form a contiguous
    * block of length >10; target levels within
    * [min−1.2·(PRES₁−PRES₀), max]; ≥10 target levels hit.
    */
  private[argo] def interpolateProfile(
      pres: Array[Double], temp: Array[Double], psal: Array[Double],
      qc: Array[Double],
      eos: SeawaterEos = Teos10,
      algo: Int = 0): (Int, Array[Float], Array[Float], Array[Byte]) = {
    val empty = (0, new Array[Float](NLevels), new Array[Float](NLevels),
      new Array[Byte](NLevels))
    // F6: keep QC == 1 samples (extract_raw_profile, interpolation.py:172-179).
    // Imperative primitive-array pass: this kernel runs once per RECORD of
    // the whole corpus, so collection/boxing overhead here multiplies by
    // every profile ever ingested.
    val nIn = qc.length
    var nk = 0
    var i = 0
    while (i < nIn) { if (qc(i) == 1.0) nk += 1; i += 1 }
    if (nk < 5) return empty
    val p = new Array[Double](nk)
    val t = new Array[Double](nk)
    val s = new Array[Double](nk)
    var hasNaN = false
    i = 0; var j = 0
    while (i < nIn) {
      if (qc(i) == 1.0) {
        val pv = pres(i)
        if (pv != pv) hasNaN = true
        p(j) = pv; t(j) = temp(i); s(j) = psal(i); j += 1
      }
      i += 1
    }
    // A NaN PRES among kept samples (mis-flagged fill value) rejects the
    // profile — the behavior the pre-rewrite code had implicitly: total-
    // ordering max made pMax NaN, every `Pref(k) <= NaN` was false, and
    // the empty target range returned NVALUES = 0. The explicit check is
    // needed because NaN would now pass BOTH the strict-increase scan
    // (`p(i) <= p(i-1)` is false for NaN operands) and the min/max scan
    // (both branches skip NaN), and then poison the spline's tridiagonal
    // solve into all-NaN output carrying IDX = 1.
    if (hasNaN) return empty
    // F7: np.unique(PRES, return_index=True) → first-occurrence indices,
    // ordered by value; the reference's contiguity test is on the FIRST
    // and LAST of that value-ordered index list (len == jdx[-1]-jdx[0]+1),
    // which implicitly also rejects badly unsorted profiles — reproduced
    // exactly (stable sort keeps the first occurrence of duplicates first).
    //
    // Fast path: real profiles (and the driver's testdata) are strictly
    // increasing in PRES, so detect that with one linear scan and skip the
    // boxed index sort entirely — jdx is then the identity.
    var sortedStrict = true
    i = 1
    while (sortedStrict && i < nk) { if (p(i) <= p(i - 1)) sortedStrict = false; i += 1 }
    val jdx: Array[Int] =
      if (sortedStrict) null // identity; never materialized
      else {
        val byValue = new Array[Integer](nk)
        i = 0
        while (i < nk) { byValue(i) = Integer.valueOf(i); i += 1 }
        // TimSort is stable → first occurrence of duplicates stays first
        java.util.Arrays.sort(byValue, new java.util.Comparator[Integer] {
          def compare(a: Integer, b: Integer): Int =
            java.lang.Double.compare(p(a.intValue), p(b.intValue))
        })
        val out = new Array[Int](nk)
        var m = 0
        var last = Double.NaN
        i = 0
        while (i < nk) {
          val ix = byValue(i).intValue
          if (m == 0 || p(ix) != last) { out(m) = ix; m += 1; last = p(ix) }
          i += 1
        }
        val trimmed = java.util.Arrays.copyOf(out, m)
        val contiguous = m == (trimmed(m - 1) - trimmed(0) + 1)
        if (!(contiguous && m > 10)) return empty
        trimmed
      }
    val nu = if (jdx == null) nk else jdx.length // distinct PRES count
    if (nu <= 10) return empty
    val deltaMin = 1.2 * (p(1) - p(0))
    var pMin = p(0); var pMax = p(0)
    i = 1
    while (i < nk) {
      val v = p(i)
      if (v < pMin) pMin = v else if (v > pMax) pMax = v
      i += 1
    }
    // Pref is ascending: the in-range target levels are the contiguous
    // block [k0, k1] — two linear scans over 64 entries, no boxed filter
    val loBound = pMin - deltaMin
    var k0 = 0
    while (k0 < Pref.length && Pref(k0) < loBound) k0 += 1
    var k1 = Pref.length - 1
    while (k1 >= 0 && Pref(k1) > pMax) k1 -= 1
    val nt = k1 - k0 + 1
    if (nt < 10) return empty
    // X5: TEOS-10 variables at the RAW sample pressures, before
    // interpolation — exactly the reference's add_eos10_variables
    // (interpolation.py:200-210): SR = SP·ups, CT = CT_from_t(SR, t, PRES)
    // via the pluggable EOS (production default: the real TEOS-10 port).
    //
    // xs = p(jdx) is strictly increasing BY CONSTRUCTION (first occurrence
    // per distinct value, in value order), so the old sortDedup calls were
    // identities — the arrays feed the method directly.
    val xs = new Array[Double](nu)
    val sr = new Array[Double](nu)
    val ct = new Array[Double](nu)
    i = 0
    while (i < nu) {
      val ix = if (jdx == null) i else jdx(i)
      xs(i) = p(ix)
      sr(i) = Seawater.srFromSp(s(ix))
      ct(i) = eos.ctFromT(sr(i), t(ix), xs(i))
      i += 1
    }
    // X6: the selected interpolation method (default: cubic spline with
    // scipy interp1d kind="cubic" semantics) applied to the (CT, SR) pair
    val targets = java.util.Arrays.copyOfRange(Pref, k0, k1 + 1)
    val (ctI, srI) = Methods(algo)(xs, ct, sr, targets)
    val ctOut = new Array[Float](NLevels)
    val srOut = new Array[Float](NLevels)
    val idxOut = new Array[Byte](NLevels)
    var k = 0
    while (k < nt) {
      ctOut(k0 + k) = ctI(k).toFloat
      srOut(k0 + k) = srI(k).toFloat
      idxOut(k0 + k) = 1
      k += 1
    }
    (nt, ctOut, srOut, idxOut)
  }

  /** JIT warm-up hook: run the full kernel once, return a checksum.
    * @param algo which [[Methods]] entry to drive — every registered
    *             method needs warming, not just the default spline */
  private[graft] def warmKernel(pres: Array[Double], temp: Array[Double],
      psal: Array[Double], qc: Array[Double], algo: Int = 0): Double = {
    val (n, ct, sr, _) = interpolateProfile(pres, temp, psal, qc, algo = algo)
    n + (if (ct.nonEmpty) ct(0) else 0.0f) + (if (sr.nonEmpty) sr(NLevels - 1) else 0.0f)
  }

  // Primitive Array parameters, NOT Seq: the Seq signature makes Spark box
  // every element on the way in (4×120 boxed doubles per profile) — with
  // Array[Double] the converter is a bulk UnsafeArrayData.toDoubleArray
  // copy. Same for the float outputs. IDX stays Seq[Byte]: Array[Byte]
  // would map to BinaryType, not the schema's array<tinyint>.
  //
  // ONE UDF instance per (algo, eos), not one per call: ScalaUDF compares
  // its function closure by reference, so a fresh closure makes two
  // otherwise-identical interpolation plans fail sameResult — breaking
  // exchange reuse and, worse, CacheManager dedup (a rebuilt memoized
  // frame would re-persist and RE-RUN the whole interpolation instead of
  // picking up the existing InMemoryRelation).
  private val udfCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, SeawaterEos), org.apache.spark.sql.expressions.UserDefinedFunction]

  private def interpUdf(algo: Int, eos: SeawaterEos) =
    udfCache.computeIfAbsent((algo, eos), { case (a, e) => udf(
      (pres: Array[Double], temp: Array[Double], psal: Array[Double], qc: Array[Double]) => {
        val (n, ct, sr, ix) = interpolateProfile(pres, temp, psal, qc, e, a)
        (n, ct, sr, ix.toSeq)
      })
    })

  /** S3: adjusted-variable resolution — a float uses `*_ADJUSTED` columns
    * iff ALL its profiles are delayed-mode (interpolation.py:188-192),
    * INCLUDING the QC flags: the reference's QC product is taken over the
    * `*_ADJUSTED_QC` variables on that path (interpolation.py:193-196), so
    * samples are gated by the flags that grade the values actually used.
    * `every` per WMO + broadcast join + `when`. */
  def resolveAdjusted(samples: DataFrame): DataFrame = {
    // No *_ADJUSTED columns → the fold below is the identity, but the
    // use_adj aggregate+join would still cost a groupBy and a broadcast
    // per pipeline run. Resolution only matters when adjusted data exists.
    if (!samples.columns.exists(_.endsWith("_ADJUSTED"))) return samples
    val allD = samples.groupBy(col("WMO"))
      .agg(min(col("DATA_MODE") === 1).as("use_adj"))
    def pick(name: String): Column =
      when(col("use_adj") && col(s"${name}_ADJUSTED").isNotNull,
        col(s"${name}_ADJUSTED")).otherwise(col(name)).as(name)
    val adjusted = Seq("PRES", "TEMP", "PSAL", "QC")
      .foldLeft(samples.join(broadcast(allD), Seq("WMO"))) { (df, n) =>
        if (df.columns.contains(s"${n}_ADJUSTED")) df.withColumn(n, pick(n))
        else df
      }
    adjusted.drop("use_adj")
  }

  /** Full stage: resolve → kernel → join summary header (J5). Output
    * matches [[ArgoSchemas.profile]].
    * @param algo interpolation method id from [[Methods]]
    * @param eos  equation of state for the CT conversion — pass the same
    *             instance the downstream Atlas uses so the pipeline never
    *             mixes two EOS definitions
    * @param repartitionSamples set false ONLY when the caller already
    *             hash-distributed `samples` on (WMO, IPROF) with full
    *             parallelism — e.g. after repartitioning the pre-array
    *             header rows, so the exchange moved the ~30 B headers
    *             instead of the ~4 KB sample arrays */
  def interpolate(samples: DataFrame, summary: DataFrame,
                  algo: Int = 0, eos: SeawaterEos = Teos10,
                  repartitionSamples: Boolean = true): DataFrame = {
    val resolved =
      if (samples.columns.contains("DATA_MODE")) resolveAdjusted(samples)
      else samples
    // Pin the kernel stage's parallelism with an EXPLICIT partition count:
    // AQE coalesces small shuffles by byte size and is blind to the CPU-heavy
    // spline+TEOS-10 kernel downstream — without this the whole interpolation
    // (and everything pipelined after it, e.g. the atlas join+agg) can
    // collapse onto ONE task. Hash by (WMO, IPROF) = the reference's
    // per-float task decomposition (interpolation.py:147-149), and the
    // (WMO, IPROF) header equi-join below reuses this distribution.
    val nPart = samples.sparkSession.sessionState.conf.numShufflePartitions
    val interpolated = (if (repartitionSamples)
        resolved.repartition(nPart, col("WMO"), col("IPROF"))
      else resolved)
      .withColumn("r", interpUdf(algo, eos)(col("PRES"), col("TEMP"), col("PSAL"), col("QC")))
      .select(col("WMO").cast("int"), col("IPROF").cast("short"),
        col("r._1").as("NVALUES"),
        col("r._2").as("CT"), col("r._3").as("SR"),
        col("r._4").as("IDX"))
    // J5: header via equi-join on (WMO, IPROF) — replaces the reference's
    // positional write_header (interpolation.py:83-103); only FLAG==1
    // profiles are interpolated (interpolation.py:108)
    summary.filter(col("FLAG") === 1)
      .select(col("WMO"), col("DAC"), col("IPROF"), col("JULD"),
        col("LATITUDE"), col("LONGITUDE"), col("DATA_MODE"), col("FLAG"))
      .join(interpolated, Seq("WMO", "IPROF"))
      .select(ArgoSchemas.profile.fieldNames.toIndexedSeq.map(col): _*)
  }
}
