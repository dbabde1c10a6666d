package graft.functions

/** Seawater thermodynamics kernels (SURVEY.md §2.8 X5/X7).
  *
  * Pure scalar functions on doubles: deterministic, branch-free where the
  * reference is branch-free, safe to wrap as Spark UDFs (and to promote to
  * codegen'd Catalyst expressions later — they are single-expression
  * chains of arithmetic and `math.pow`).
  *
  * The equation of state is PLUGGABLE ([[SeawaterEos]]): the reference
  * delegates to the external GSW library (TEOS-10,
  * /root/reference/src/argostats/interpolation.py:200-210 via `gsw`).
  * The production default is [[Teos10]] — the real 75-term polynomial +
  * entropy-based CT conversion, ported from the public TEOS-10 spec.
  * [[SimplifiedEos]] (the simplified-EOS functional form of Roquet et
  * al. 2015, "Defining a simplified yet realistic equation of state",
  * Ocean Modelling) remains as a cheap stand-in for tests and for
  * sensitivity studies.
  */
trait SeawaterEos extends Serializable {
  /** In-situ density, kg/m³.
    * @param sr reference-composition salinity, g/kg
    * @param ct conservative temperature, °C
    * @param p  sea pressure, dbar (≈ depth in m) */
  def rho(sr: Double, ct: Double, p: Double): Double

  /** Sound speed, m/s (feeds the atlas compressibility integral,
    * reference atlas.py:320-324). */
  def soundSpeed(sr: Double, ct: Double, p: Double): Double

  /** Conservative temperature from in-situ temperature (reference
    * interpolation.py:207-208, `gsw.CT_from_t(SR, TEMP, PRES)`). */
  def ctFromT(sr: Double, t: Double, p: Double): Double

  /** A precompiled ρ(p) evaluator for FIXED (sr, ct). Hot loops that scan
    * pressure at constant water-mass properties — the gammat bisection
    * evaluates ρ 30× per call — obtain this once and pay only the
    * pressure-dependent part per evaluation. Must be arithmetically
    * identical to `rho(sr, ct, p)`. Default: the trivial closure. */
  def rhoInP(sr: Double, ct: Double): Double => Double =
    p => rho(sr, ct, p)
}

/** Simplified EOS (S-EOS form): linear-ish in (CT, SR) with cabbeling and
  * thermobaric correction terms. */
object SimplifiedEos extends SeawaterEos {
  val Rho0 = 1026.0
  val A0 = 1.6550e-1 // thermal expansion, kg/m³/K
  val B0 = 7.6554e-1 // haline contraction, kg/m³/(g/kg)
  val Lambda1 = 5.9520e-2 // cabbeling (T²)
  val Lambda2 = 5.4914e-4 // cabbeling (S²)
  val Mu1 = 1.4970e-4 // thermobaric (T·z)
  val Mu2 = 1.1090e-5 // thermobaric (S·z)
  val Nu = 2.4341e-3 // cabbeling (T·S)
  /** Isentropic compressibility ≈ 1e4/c² kg/m³ per dbar (c ≈ 1507 m/s):
    * the in-situ density gain with pressure that the atlas's compensated
    * density RHO·CF is designed to cancel (atlas.py:152-190). Without it
    * the RHOSTAR ladder is not monotone and the R14 displacement lookup
    * degenerates. */
  val Kp = 4.4e-3

  def rho(sr: Double, ct: Double, p: Double): Double = {
    val ta = ct - 10.0
    val sa = sr - 35.0
    val z = p // 1 dbar ≈ 1 m
    Rho0 -
      A0 * (1.0 + 0.5 * Lambda1 * ta + Mu1 * z) * ta +
      B0 * (1.0 - 0.5 * Lambda2 * sa - Mu2 * z) * sa -
      Nu * ta * sa +
      Kp * z
  }

  /** Medwin's simplified sound-speed formula (public standard; ~1 m/s in
    * oceanic ranges). */
  def soundSpeed(sr: Double, ct: Double, p: Double): Double =
    Seawater.soundSpeed(sr, ct, p)

  /** The simplified EOS treats CT ≈ in-situ t (no adiabatic correction) —
    * acceptable only for the shallow/test regimes this EOS is meant for. */
  def ctFromT(sr: Double, t: Double, p: Double): Double = t
}

object Seawater {
  /** SP → SR scale factor: 35.16504 g/kg per 35 psu (TEOS-10 definition;
    * the reference applies the same constant via gsw `SR_from_SP`,
    * interpolation.py:205-208). */
  val UPS: Double = 35.16504 / 35.0

  def srFromSp(sp: Double): Double = sp * UPS

  /** Sound speed in seawater, m/s — Medwin's simplified formula (public
    * standard; the reference delegates to gsw `sound_speed`,
    * atlas.py:320-324). Accurate to ~1 m/s in oceanic ranges, ample for
    * the compressibility integral it feeds. */
  def soundSpeed(s: Double, t: Double, p: Double): Double =
    1449.2 + 4.6 * t - 0.055 * t * t + 2.9e-4 * t * t * t +
      (1.34 - 0.010 * t) * (s - 35.0) + 0.016 * p

  /** Lorenz reference-density profile and its hydrostatic pressure, from
    * the analytical World-Ocean-Atlas fit of Tailleux 2020; constants as
    * published in the reference
    * (/root/reference/src/argostats/lorenz/lorenz_state.py:35-60). */
  object Lorenz {
    val a = 4.56016575
    val b = -1.24898501
    val c = 0.00439778209
    val d = 1030.99373
    val e = 8.32218903
    val Grav = 9.81
    // precomputed composites (lorenz_state.py:86-88)
    val A: Double = a / ((b + 1) * (b + 2))
    val D: Double = A * math.pow(e, b + 2)
    val C: Double = c / 2

    /** ρ_ref(z), kg/m³, z = depth ≥ 0 in m (lorenz_state.py:63-79). */
    def rhoRef(z: Double): Double =
      a / (b + 1) * math.pow(z + e, b + 1) + c * z + d

    /** Hydrostatic pressure at depth z, dbar (lorenz_state.py:94-95). */
    def pr(z: Double): Double =
      (Grav / 1e4) * (A * math.pow(z + e, b + 2) + C * z * z + d * z - D)

    // Poly8 pressure correction, Horner form; x normalized by
    // (p - 1440)/1470 (lorenz_state.py:47-55,100,177-183)
    private val P = Array(6.431, 6.677, -0.08414, -0.03696, 0.06807,
      -0.06387, 0.03216, -0.008056, 0.0007824)

    def poly8(x: Double): Double = {
      var acc = P(8)
      var i = 7
      while (i >= 0) { acc = acc * x + P(i); i -= 1 }
      acc
    }
  }

  /** Thermodynamic neutral density γ_T and the reference depth/pressure/
    * density of a water parcel — fixed 30-iteration branch-free bisection
    * solving ρ_ref(z_ref) = ρ(sr, ct, p_r(z_ref)), then the Poly8
    * correction; algorithm and constants per the reference
    * (lorenz_state.py:115-185). Deterministic: iteration count is fixed,
    * no convergence test, so the plan is codegen-friendly.
    *
    * @return (gammat, zref, pref, sigref)
    */
  def gammatAnalytic(sr: Double, ct: Double,
                     eos: SeawaterEos = Teos10): (Double, Double, Double, Double) = {
    // Hot-loop strength reduction, same math: the EOS collapses to its
    // pressure polynomial once per call (rhoInP), and rho_ref / p_r share
    // the single math.pow((z+e), b+1) they both contain (pow(·, b+2) =
    // pow(·, b+1)·(z+e)) — one pow + one Horner per iteration instead of
    // two pows + a 75-term evaluation.
    val rhoP = eos.rhoInP(sr, ct)
    import Lorenz.{a, b, c, d, e, A, C, D, Grav}
    var ztop = 0.0
    var zbot = 6000.0
    var zref = 2000.0
    var i = 0
    while (i < 30) {
      val ze = zref + e
      val w = math.pow(ze, b + 1.0)
      val rhoRef = a / (b + 1.0) * w + c * zref + d
      val pr = (Grav / 1e4) * (A * w * ze + C * zref * zref + d * zref - D)
      val buoy = rhoRef - rhoP(pr)
      val ss = math.signum(buoy)
      val zrefNew = 0.25 * (1.0 + ss) * (ztop + zref) + 0.25 * (1.0 - ss) * (zbot + zref)
      val ztopNew = 0.5 * (1 + ss) * ztop + 0.5 * (1 - ss) * zref
      val zbotNew = 0.5 * (1 - ss) * zbot + 0.5 * (1 + ss) * zref
      ztop = ztopNew; zbot = zbotNew; zref = zrefNew
      i += 1
    }
    val pref = Lorenz.pr(zref)
    val x = (pref - 1440.0) / 1470.0
    val sigref = rhoP(pref) - 1000.0
    val gammat = sigref - Lorenz.poly8(x)
    (gammat, zref, pref, sigref)
  }
}
