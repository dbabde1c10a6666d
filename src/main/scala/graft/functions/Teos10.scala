package graft.functions

/** TEOS-10 seawater thermodynamics, ported from the PUBLIC specification:
  * the 75-term specific-volume polynomial of Roquet, Madec, McDougall &
  * Barker 2015 ("Accurate polynomial expressions for the density and
  * specific volume of seawater using the TEOS-10 standard", Ocean
  * Modelling 90) and the IOC/SCOR/IAPSO TEOS-10 manual's entropy /
  * potential-enthalpy relations (McDougall 2003) as implemented by the
  * open GSW reference toolbox.
  *
  * This is the real science behind the reference's `gsw` calls
  * (/root/reference/src/argostats/interpolation.py:205-208 `SR_from_SP`,
  * `CT_from_t`; atlas.py:184,224,291 `gsw.density.rho`; atlas.py:322
  * `gsw.sound_speed`; lorenz/lorenz_state.py:83 `rho_eos10`). All
  * functions are pure scalar Double kernels: deterministic, allocation-
  * free, safe inside Spark UDFs/Aggregators and trivially promotable to
  * codegen'd expressions.
  *
  * Salinity argument: the pipeline carries TEOS-10 *reference salinity*
  * SR (= SP·35.16504/35); for reference-composition seawater SR equals
  * absolute salinity SA, which is exactly how the reference feeds `gsw`.
  *
  * Validation (SeawaterSpec): published check values; exact identity
  * CT(SSO, pt=0) = 0; pt0(p=0) = t; numerical consistency between the
  * entropy polynomial and its analytic derivative; differential test
  * against an independently-derived UNESCO (EOS-80) potential-temperature
  * integration; physical α/β/κ ranges from numerical derivatives.
  */
object Teos10 extends SeawaterEos {

  /** Standard-ocean reference salinity, g/kg. */
  final val Sso = 35.16504
  /** TEOS-10 isobaric heat capacity J/(kg·K) defining CT = h0/Cp0. */
  final val Cp0 = 3991.86795711963
  /** Celsius zero point, K. */
  final val T0k = 273.15
  /** Salinity normalization of the polynomial root: x = √(Sfac·SA + SauOffset). */
  final val Sfac = 0.0248826675584615 // = 1/(40·(35.16504/35))
  final val SauOffset = 5.971840214030754e-1 // = 24 g/kg · Sfac

  // ---- 75-term specific volume v(SA, CT, p) ------------------------------
  // Coefficient naming vXYZ: X = power of x=√salinity, Y = power of
  // y=CT/40, Z = power of z=p/1e4. Structure (term count per z power:
  // 28+21+15+6+3+1+1 = 75) and values per Roquet et al. 2015 App. A.
  private final val v000 = 1.0769995862e-3
  private final val v100 = -3.1038981976e-4
  private final val v200 = 6.6928067038e-4
  private final val v300 = -8.5047933937e-4
  private final val v400 = 5.8086069943e-4
  private final val v500 = -2.1092370507e-4
  private final val v600 = 3.1932457305e-5
  private final val v010 = -1.5649734675e-5
  private final val v110 = 3.5009599764e-5
  private final val v210 = -4.3592678561e-5
  private final val v310 = 3.4532461828e-5
  private final val v410 = -1.1959409788e-5
  private final val v510 = 1.3864594581e-6
  private final val v020 = 2.7762106484e-5
  private final val v120 = -3.7435842344e-5
  private final val v220 = 3.5907822760e-5
  private final val v320 = -1.8698584187e-5
  private final val v420 = 3.8595339244e-6
  private final val v030 = -1.6521159259e-5
  private final val v130 = 2.4141479483e-5
  private final val v230 = -1.4353633048e-5
  private final val v330 = 2.2863324556e-6
  private final val v040 = 6.9111322702e-6
  private final val v140 = -8.7595873154e-6
  private final val v240 = 4.3703680598e-6
  private final val v050 = -8.0539615540e-7
  private final val v150 = -3.3052758900e-7
  private final val v060 = 2.0543094268e-7
  private final val v001 = -6.0799143809e-5
  private final val v101 = 2.4262468747e-5
  private final val v201 = -3.4792460974e-5
  private final val v301 = 3.7470777305e-5
  private final val v401 = -1.7322218612e-5
  private final val v501 = 3.0927427253e-6
  private final val v011 = 1.8505765429e-5
  private final val v111 = -9.5677088156e-6
  private final val v211 = 1.1100834765e-5
  private final val v311 = -9.8447117844e-6
  private final val v411 = 2.5909225260e-6
  private final val v021 = -1.1716606853e-5
  private final val v121 = -2.3678308361e-7
  private final val v221 = 2.9283346295e-6
  private final val v321 = -4.8826139200e-7
  private final val v031 = 7.9279656173e-6
  private final val v131 = -3.4558773655e-6
  private final val v231 = 3.1655306078e-7
  private final val v041 = -3.4102187482e-6
  private final val v141 = 1.2956717783e-6
  private final val v051 = 5.0736766814e-7
  private final val v002 = 9.9856169219e-6
  private final val v102 = -5.8484432984e-7
  private final val v202 = -4.8122251597e-6
  private final val v302 = 4.9263106998e-6
  private final val v402 = -1.7811974727e-6
  private final val v012 = -1.1736386731e-6
  private final val v112 = -5.5699154557e-6
  private final val v212 = 5.4620748834e-6
  private final val v312 = -1.3544185627e-6
  private final val v022 = 2.1305028740e-6
  private final val v122 = 3.9137387080e-7
  private final val v222 = -6.5731104067e-7
  private final val v032 = -4.6132540037e-7
  private final val v132 = 7.7618888092e-9
  private final val v042 = -6.3352916514e-8
  private final val v003 = -1.1309361437e-6
  private final val v103 = 3.6310188515e-7
  private final val v203 = 1.6746303780e-8
  private final val v013 = -3.6527006553e-7
  private final val v113 = -2.7295696237e-7
  private final val v023 = 2.8695905159e-7
  private final val v004 = 1.0531153080e-7
  private final val v104 = -1.1147125423e-7
  private final val v014 = 3.1454099902e-7
  private final val v005 = -1.2647261286e-8
  private final val v006 = 1.9613503930e-9

  /** The six z-power coefficient polynomials B_k(x, y) such that
    * v = ΣB_k·z^k. Shared by [[specvol]] and the analytic z-derivative
    * that [[soundSpeed]] needs. */
  private def zBlocks(x: Double, y: Double): (Double, Double, Double, Double, Double, Double, Double) = {
    val b0 = v000 + x * (v100 + x * (v200 + x * (v300 + x * (v400 + x * (v500 + x * v600))))) +
      y * (v010 + x * (v110 + x * (v210 + x * (v310 + x * (v410 + x * v510)))) +
        y * (v020 + x * (v120 + x * (v220 + x * (v320 + x * v420))) +
          y * (v030 + x * (v130 + x * (v230 + x * v330)) +
            y * (v040 + x * (v140 + x * v240) +
              y * (v050 + x * v150 + y * v060)))))
    val b1 = v001 + x * (v101 + x * (v201 + x * (v301 + x * (v401 + x * v501)))) +
      y * (v011 + x * (v111 + x * (v211 + x * (v311 + x * v411))) +
        y * (v021 + x * (v121 + x * (v221 + x * v321)) +
          y * (v031 + x * (v131 + x * v231) +
            y * (v041 + x * v141 + y * v051))))
    val b2 = v002 + x * (v102 + x * (v202 + x * (v302 + x * v402))) +
      y * (v012 + x * (v112 + x * (v212 + x * v312)) +
        y * (v022 + x * (v122 + x * v222) +
          y * (v032 + x * v132 + y * v042)))
    val b3 = v003 + x * (v103 + x * v203) +
      y * (v013 + x * v113 + y * v023)
    val b4 = v004 + x * v104 + y * v014
    (b0, b1, b2, b3, b4, v005, v006)
  }

  @inline private def xRoot(sa: Double): Double =
    math.sqrt(Sfac * math.max(sa, 0.0) + SauOffset)

  /** Specific volume, m³/kg. @param sa SA (≡ SR) g/kg; ct °C; p dbar. */
  def specvol(sa: Double, ct: Double, p: Double): Double = {
    val x = xRoot(sa)
    val y = ct * 0.025
    val z = p * 1e-4
    val (b0, b1, b2, b3, b4, b5, b6) = zBlocks(x, y)
    b0 + z * (b1 + z * (b2 + z * (b3 + z * (b4 + z * (b5 + z * b6)))))
  }

  /** In-situ density 1/v, kg/m³ — the reference's `gsw.density.rho`. */
  def rho(sa: Double, ct: Double, p: Double): Double =
    1.0 / specvol(sa, ct, p)

  /** ρ(p) with the (x, y) coefficient blocks folded ONCE: the remaining
    * per-pressure work is a degree-6 Horner instead of the full 75-term
    * evaluation — ~10× cheaper inside the gammat bisection, with results
    * bit-identical to [[rho]] (same blocks, same Horner order). */
  override def rhoInP(sa: Double, ct: Double): Double => Double = {
    val x = xRoot(sa)
    val y = ct * 0.025
    val (b0, b1, b2, b3, b4, b5, b6) = zBlocks(x, y)
    p => {
      val z = p * 1e-4
      1.0 / (b0 + z * (b1 + z * (b2 + z * (b3 + z * (b4 + z * (b5 + z * b6))))))
    }
  }

  /** Sound speed, m/s: c = 10⁴·√(−v²/(∂v/∂z)) with the analytic
    * z-derivative of the same 75-term polynomial (z = p/10⁴; the 10⁴
    * converts the dbar pressure scaling to Pa). The reference's
    * `gsw.sound_speed` (atlas.py:322). */
  def soundSpeed(sa: Double, ct: Double, p: Double): Double = {
    val x = xRoot(sa)
    val y = ct * 0.025
    val z = p * 1e-4
    val (b0, b1, b2, b3, b4, b5, b6) = zBlocks(x, y)
    val v = b0 + z * (b1 + z * (b2 + z * (b3 + z * (b4 + z * (b5 + z * b6)))))
    val vz = b1 + z * (2.0 * b2 + z * (3.0 * b3 + z * (4.0 * b4 + z * (5.0 * b5 + z * 6.0 * b6))))
    10000.0 * math.sqrt(-v * v / vz)
  }

  // ---- entropy / potential temperature / conservative temperature --------
  // The Gibbs-function entropy polynomials (IAPWS-09 pure water + the
  // TEOS-10 saline part), in the toolbox's normalized variables
  // x² = Sfac·SA, y = t/40, z = p/1e4.

  /** Entropy-like part σ(SA, t, p) (the terms of −∂g/∂T that depend on
    * (t,p); the difference σ(SA,t,p) − σ0(SA,θ) vanishes exactly when θ is
    * the potential temperature referenced to 0 dbar). */
  private[graft] def entropyPart(sa: Double, t: Double, p: Double): Double = {
    val x2 = Sfac * math.max(sa, 0.0)
    val x = math.sqrt(x2)
    val y = t * 0.025
    val z = p * 1e-4
    val g03 =
      z * (-270.983805184062 +
        z * (776.153611613101 + z * (-196.51255088122 +
          (28.9796526294175 - 2.13290083518327 * z) * z))) +
        y * (-24715.571866078 + z * (2910.0729080936 +
          z * (-1513.116771538718 + z * (546.959324647056 +
            z * (-111.1208127634436 + 8.68841343834394 * z)))) +
          y * (2210.2236124548363 + z * (-2017.52334943521 +
            z * (1498.081172457456 + z * (-718.6359919632359 +
              (146.4037555781616 - 4.9892131862671505 * z) * z))) +
            y * (-592.743745734632 + z * (1591.873781627888 +
              z * (-1207.261522487504 + (608.785486935364 -
                105.4993508931208 * z) * z)) +
              y * (290.12956292128547 + z * (-973.091553087975 +
                z * (602.603274510125 + z * (-276.361526170076 +
                  32.40953340386105 * z))) +
                y * (-113.90630790850321 + y * (21.35571525415769 -
                  67.41756835751434 * z) +
                  z * (381.06836198507096 + z * (-133.7383902842754 +
                    49.023632509086724 * z)))))))
    val g08 = x2 * (z * (729.116529735046 +
      z * (-343.956902961561 + z * (124.687671116248 +
        z * (-31.656964386073 + 7.04658803315449 * z)))) +
      x * (x * (y * (-137.1145018408982 + y * (148.10030845687618 +
        y * (-68.5590309679152 + 12.4848504784754 * y))) -
        22.6683558512829 * z) + z * (-175.292041186547 +
        (83.1923927801819 - 29.483064349429 * z) * z) +
        y * (-86.1329351956084 + z * (766.116132004952 +
          z * (-108.3834525034224 + 51.2796974779828 * z)) +
          y * (-30.0682112585625 - 1380.9597954037708 * z +
            y * (3.50240264723578 + 938.26075044542 * z)))) +
      y * (1760.062705994408 + y * (-675.802947790203 +
        y * (365.7041791005036 + y * (-108.30162043765552 +
          12.78101825083098 * y) +
          z * (-1190.914967948748 + (298.904564555024 -
            145.9491676006352 * z) * z)) +
          z * (2082.7344423998043 + z * (-614.668925894709 +
            (340.685093521782 - 33.3848202979239 * z) * z))) +
        z * (-1721.528607567954 + z * (674.819060538734 +
          z * (-356.629112415276 + (88.4080716616 -
            15.84003094423364 * z) * z)))))
    -(g03 + g08) * 0.025
  }

  /** [[entropyPart]] at p = 0 (only the y-terms survive). */
  private[graft] def entropyPartZerop(sa: Double, pt0: Double): Double = {
    val x2 = Sfac * math.max(sa, 0.0)
    val x = math.sqrt(x2)
    val y = pt0 * 0.025
    val g03 = y * (-24715.571866078 + y * (2210.2236124548363 +
      y * (-592.743745734632 + y * (290.12956292128547 +
        y * (-113.90630790850321 + y * 21.35571525415769)))))
    val g08 = x2 * (x * (x * (y * (-137.1145018408982 + y * (148.10030845687618 +
      y * (-68.5590309679152 + 12.4848504784754 * y)))) +
      y * (-86.1329351956084 + y * (-30.0682112585625 +
        y * 3.50240264723578))) +
      y * (1760.062705994408 + y * (-675.802947790203 +
        y * (365.7041791005036 + y * (-108.30162043765552 +
          12.78101825083098 * y)))))
    -(g03 + g08) * 0.025
  }

  /** ∂²g/∂T² at p = 0 — the Newton derivative d(entropy)/dθ = −g_TT.
    * (SeawaterSpec asserts d[[entropyPartZerop]]/dθ ≡ −this, numerically.) */
  private[graft] def gibbsPt0Pt0(sa: Double, pt0: Double): Double = {
    val x2 = Sfac * math.max(sa, 0.0)
    val x = math.sqrt(x2)
    val y = pt0 * 0.025
    val g03 = -24715.571866078 + y * (4420.4472249096725 +
      y * (-1778.231237203896 + y * (1160.5182516851419 +
        y * (-569.531539542516 + y * 128.13429152494615))))
    val g08 = x2 * (1760.062705994408 + x * (-86.1329351956084 +
      x * (-137.1145018408982 + y * (296.20061691375236 +
        y * (-205.67709290374563 + 49.9394019139016 * y))) +
      y * (-60.136422517125 + y * 10.50720794170734)) +
      y * (-1351.605895580406 + y * (1097.1125373015109 +
        y * (-433.20648175062206 + 63.905091254154904 * y))))
    (g03 + g08) * 0.000625
  }

  /** Potential temperature referenced to 0 dbar, from in-situ (SA, t, p):
    * polynomial first guess, then two modified-Newton steps on
    * σ0(SA, θ) = σ(SA, t, p) — the standard toolbox algorithm, accurate
    * to ~1e-10 °C. */
  def pt0FromT(sa: Double, t: Double, p: Double): Double = {
    val s1 = sa * (35.0 / Sso)
    var pt0 = t + p * (8.65483913395442e-6 -
      s1 * 1.41636299744881e-6 -
      p * 7.38286467135737e-9 +
      t * (-8.38241357039698e-6 +
        s1 * 2.83933368585534e-8 +
        t * 1.77803965218656e-8 +
        p * 1.71155619208233e-10))
    var dentropyDt = Cp0 / ((T0k + pt0) * (1.0 - 0.05 * (1.0 - sa / Sso)))
    val trueEntropyPart = entropyPart(sa, t, p)
    var i = 0
    while (i < 2) {
      val pt0m = pt0
      val dentropy = entropyPartZerop(sa, pt0m) - trueEntropyPart
      pt0 = pt0m - dentropy / dentropyDt
      pt0 = 0.5 * (pt0m + pt0)
      dentropyDt = -gibbsPt0Pt0(sa, pt0)
      pt0 = pt0m - dentropy / dentropyDt
      i += 1
    }
    pt0
  }

  /** Conservative temperature from potential temperature: CT = h⁰/Cp0
    * with the McDougall 2003 potential-enthalpy polynomial. Exact
    * identity CT(Sso, 0) = 0 (asserted in SeawaterSpec). */
  def ctFromPt(sa: Double, pt: Double): Double = {
    val x2 = Sfac * math.max(sa, 0.0)
    val x = math.sqrt(x2)
    val y = pt * 0.025
    val potEnthalpy = 61.01362420681071 + y * (168776.46138048015 +
      y * (-2735.2785605119625 + y * (2574.2164453821433 +
        y * (-1536.6644434977543 + y * (545.7340497931629 +
          (-50.91091728474331 - 18.30489878927802 * y) * y))))) +
      x2 * (268.5520265845071 + y * (-12019.028203559312 +
        y * (3734.858026725145 + y * (-2046.7671145057618 +
          y * (465.28655623826234 + (-0.6370820302376359 -
            10.650848542359153 * y) * y)))) +
        x * (937.2099110620707 + y * (588.1802812170108 +
          y * (248.39476522971285 + (-3.871557904936333 -
            2.6268019854268356 * y) * y)) +
          x * (-1687.914374187449 + x * (246.9598888781377 +
            x * (123.59576582457964 - 48.5891069025409 * x)) +
            y * (936.3206544460336 +
              y * (-942.7827304544439 + y * (369.4389437509002 +
                (-33.83664947895248 - 9.987880382780322 * y) * y))))))
    potEnthalpy / Cp0
  }

  /** Conservative temperature from in-situ temperature — the reference's
    * `gsw.CT_from_t(SR, TEMP, PRES)` (interpolation.py:207-208). */
  def ctFromT(sa: Double, t: Double, p: Double): Double =
    ctFromPt(sa, pt0FromT(sa, t, p))
}
