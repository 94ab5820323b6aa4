package graft.models

import graft.expr._
import graft.expr.E._

/** Melt Fe3+/Fe2+ redox models, closed-form subset
  * (reference `Fe_redox/Fe3Fe2_models.py`). Inputs: a [[CompCtx]] whose
  * `molNorm` gives oxide mol fractions, plus T_K and absolute fO2
  * expressions. Missing components read as 0 (check_components zero-fill).
  * The iterative models (deng2020, oneill2006, armstrong2019) are per-row
  * solver UDFs implemented separately.
  */
object Fe3Fe2 {

  /** "fixed": constant ratio from config (`Fe3Fe2_models.py:33-74`). */
  def fixed(ratio: Double): E = Lit(ratio)

  /** Borisov et al. (2018) eq. 4 (`Fe3Fe2_models.py:77-141`). */
  def borisov2018(m: CompCtx, tK: E, fO2: E): E = {
    def x(ox: String): E = m.molNorm(ox)
    val part1 = Lit(0.207) * log10(fO2) + Lit(4633.3) / tK -
      Lit(0.445) * x("SiO2") - Lit(0.900) * x("TiO2") + Lit(1.532) * x("MgO")
    val part2 = Lit(0.314) * x("CaO") + Lit(2.030) * x("Na2O") +
      Lit(3.355) * x("K2O") - Lit(4.851) * x("P2O5")
    val part3 = Lit(-3.081) * x("SiO2") * x("Al2O3") -
      Lit(4.370) * x("SiO2") * x("MgO") - Lit(1.852)
    pow(Lit(10.0), part1 + part2 + part3)
  }

  /** Kress & Carmichael (1991) eq. 7 (`Fe3Fe2_models.py:144-223`). */
  def kressCarmichael1991(m: CompCtx, tK: E, fO2: E, pBar: E): E = {
    val d = Seq("Al2O3" -> -2.243, "FeO" -> -1.828, "CaO" -> 3.201,
      "Na2O" -> 5.854, "K2O" -> 6.215)
    val pPa = pBar * Lit(1e5)
    val t0 = Lit(1673.0)
    val sumComponents = sumAll(d.map { case (ox, c) => m.molNorm(ox) * Lit(c): E })
    val part1 = Lit(0.196) * ln(fO2) + Lit(1.1492e4) / tK + Lit(-6.675) + sumComponents
    val part2 = Lit(-3.36) * (Lit(1.0) - t0 / tK - ln(tK / t0))
    val part3 = Lit(-7.01e-7) * pPa / tK +
      Lit(-1.54e-10) * ((tK - t0) * pPa) / tK +
      Lit(3.85e-17) * pPa * pPa / tK
    Lit(2.0) * exp(part1 + part2 + part3)
  }

  /** Jayasuriya et al. (2004) eq. 12 (`Fe3Fe2_models.py:226-276`). */
  def jayasuriya2004(m: CompCtx, tK: E, fO2: E): E = {
    val d = Seq("MgO" -> -0.487, "CaO" -> 2.201, "Na2O" -> 6.610,
      "K2O" -> 8.214, "Al2O3" -> -3.781, "P2O5" -> -62.79, "FeO" -> 1.377)
    val sumComponents = sumAll(d.map { case (ox, c) => m.molNorm(ox) * Lit(c): E })
    Lit(2.0) * exp(Lit(0.1967) * ln(fO2) + Lit(12420.0) / tK - Lit(7.054) +
      sumComponents)
  }

  /** Putirka (2016) eq. 6b (`Fe3Fe2_models.py:279-323`). */
  def putirka2016_6b(m: CompCtx, tK: E, fO2: E): E = {
    def x(ox: String): E = m.molNorm(ox)
    val part1 = Lit(-6.53) + Lit(10813.8) / tK
    val part2 = Lit(0.19) * ln(fO2) + Lit(12.4) * (x("Na2O") + x("K2O"))
    val part3 = Lit(-3.44) * (x("Al2O3") / (x("Al2O3") + x("SiO2"))) +
      Lit(4.15) * x("CaO")
    Lit(2.0) * exp(part1 + part2 + part3)
  }

  /** Putirka (2016) eq. 6c with its own NBO/T variant
    * (Al_IV = min(Al, Na+K+2(Ca+Mg))) (`Fe3Fe2_models.py:326-416`).
    * The reference computes this via slow row-wise `df.apply`; here it is a
    * single vectorised expression. */
  def putirka2016_6c(m: CompCtx, tK: E, fO2: E): E = {
    def x(ox: String): E = m.molNorm(ox)
    def cat(c: String): E = m.cat(c)
    val alIV = least(cat("Al"), cat("Na") + cat("K") +
      Lit(2.0) * (cat("Ca") + cat("Mg")))
    val tet = cat("Si") + cat("Ti") + alIV
    val o = Lit(2.0) * (cat("Si") + cat("Ti")) +
      Lit(1.5) * (cat("Al") + cat("Cr")) +
      (cat("Fe") + cat("Mn") + cat("Mg") + cat("Ca")) +
      Lit(0.5) * (cat("Na") + cat("K")) + Lit(2.5) * cat("P")
    val nboT = (Lit(2.0) * o - Lit(4.0) * tet) / tet
    val part1 = Lit(-6.75) + Lit(10634.9) / tK + Lit(0.195) * ln(fO2)
    val part2 = Lit(7.9) * (x("Na2O") + x("K2O")) + Lit(-4.6) * x("MgO")
    val part3 = Lit(0.54) * (x("MgO") / (x("MgO") + x("FeO"))) +
      Lit(-53.4) * x("P2O5") + Lit(1.07) * nboT
    Lit(2.0) * exp(part1 + part2 + part3)
  }

  /** O'Neill et al. (2018) eq. 9a (`Fe3Fe2_models.py:880-934`):
    * 10^(0.25 dQFM - 1.36 + cation terms), with dQFM vs the simplified
    * log10 QFM = 8.58 - 25050/T. */
  def oneill2018(m: CompCtx, tK: E, fO2: E): E = {
    val deltaQFM = log10(fO2) - (Lit(8.58) - Lit(25050.0) / tK)
    pow(Lit(10.0),
      Lit(0.25) * deltaQFM - Lit(1.36) + Lit(2.4) * m.cat("Ca") +
        Lit(2.0) * m.cat("Na") + Lit(3.7) * m.cat("K") - Lit(2.4) * m.cat("P"))
  }

  /** Zhang et al. (2017) eq. 11, "LC" parameterisation
    * (`Fe3Fe2_models.py:1162-1243`): closed-form in (T, P, fO2) only. */
  def zhang2017(tK: E, fO2: E, pBar: E): E = {
    val (dVdT, a, b, c, d) = (2.92, -6.376, 107257.0, 15095.0, 8.27e-2)
    val R = 8.31446261815324
    val pGPa = pBar * Lit(1e5) / Lit(1e9)
    val part1 = ln(fO2) / Lit(4.0) + Lit(a) + Lit(b) / (Lit(R) * tK)
    val part2 = (Lit(0.0) - (Lit(20170.0) + Lit(4.54) * (tK - Lit(1673.0)))) *
      Lit(16.6 / 3.0) * (pow(Lit(1.0) + Lit(0.241) * pGPa, Lit(0.75)) - Lit(1.0)) /
      (Lit(R) * tK)
    val part3 = (Lit(c) + Lit(dVdT) * (tK - Lit(1673.0))) * Lit(4.0 / (3.0 * d))
    val part4 = (pow(Lit(1.0) + Lit(d) * pGPa, Lit(0.75)) - Lit(1.0)) /
      (Lit(R) * tK)
    exp(part1 + part2 + part3 * part4)
  }

  /** Armstrong et al. (2019) Tait-like VdP of the FeO/FeO1.5 partial molar
    * volumes as closed-form expressions (`Fe3Fe2_models.py:1088-1135`) —
    * the dVdP basis hirschmann2022 delegates to. */
  private def armstrongVdP(tK: E, pBar: E, fe3: Boolean): E = {
    val (k0, kp0) = if (fe3) (12.6, 1.3) else (37.0, 8.0)
    val kpp0 = -kp0 / k0
    val v0 = if (fe3) Lit(21070.0) + Lit(4.54) * (tK - Lit(1673.0))
      else Lit(13650.0) + Lit(2.92) * (tK - Lit(1673.0))
    val a = (1.0 + kp0) / (1.0 + kp0 + k0 * kpp0)
    val b = kp0 / k0 - kpp0 / (1.0 + kp0)
    val c = (1.0 + kp0 + k0 * kpp0) / (kp0 * kp0 + kp0 - k0 * kpp0)
    val pGPa = pBar / Lit(1e4)
    val part1 = Lit(a) * (Lit(1.0) - pow(Lit(1.0) + Lit(b) * pGPa, Lit(1.0 - c)))
    val part2 = Lit(b * (c - 1.0)) * pGPa
    pGPa * v0 * (Lit(1.0 - a) + part1 / part2)
  }

  /** Hirschmann (2022) eq. 21 (`Fe3Fe2_models.py:1246-1357`), dVdP via the
    * armstrong2019 analytic volumes — fully closed-form. */
  def hirschmann2022(m: CompCtx, tK: E, fO2: E, pBar: E): E = {
    val R = 8.31446261815324
    val (a, b, c, dCp, t0) = (0.1917, -1.961, 4158.1, 33.25, 1673.15)
    val ys = Seq(-520.46, -185.37, 494.39, 1838.34, 2888.48, 3473.68, -4473.6)
    val cats = Seq("Si", "Ti", "Mg", "Ca", "Na", "K", "P")
    val compositional = sumAll(cats.zip(ys).map { case (cName, y) =>
      m.cat(cName) * Lit(y): E
    }) + Lit(-1245.09) * m.cat("Si") * m.cat("Al") +
      Lit(-1156.86) * m.cat("Si") * m.cat("Mg")
    val dVdP = armstrongVdP(tK, pBar, fe3 = true) -
      armstrongVdP(tK, pBar, fe3 = false)
    val part1 = Lit(a) * log10(fO2) + Lit(b) + Lit(c) / tK
    val part2 = Lit(-dCp / (R * math.log(10.0))) *
      (Lit(1.0) - Lit(t0) / tK - ln(tK / Lit(t0)))
    val part3 = (Lit(0.0) - dVdP) / (Lit(R * math.log(10.0)) * tK)
    val part4 = Lit(1.0) / tK * compositional
    pow(Lit(10.0), part1 + part2 + part3 + part4)
  }

  /** Sun (2024) eq. 9, the reference's DEFAULT Fe3Fe2 model, with the
    * closed-form parameterised Gamma(T,P) instead of the deng2020 EOS
    * integral (`Fe3Fe2_models.py:1360-1544`, `_Gamma_parameterised`
    * `:1467-1490`).
    *
    * Defined through [[sun2024TpParts]] + [[sun2024FromParts]] so a
    * caller that fans a sample out into composition-perturbed draws
    * (q_monte_carlo_fe3fe2) can hoist the draw-invariant T/P-only
    * numerator terms above the explode — the split preserves the exact
    * operation tree (`((log10(fO2) - omega) - phi) - h*gamma` with
    * A = log10(fO2) - omega and B = h*gamma evaluates the numerator as
    * `(A - phi) - B`, the same IEEE ops in the same order), so every
    * existing sun2024 consumer and the hand-rendered oracle SQL compute
    * bit-identical doubles. */
  def sun2024(m: CompCtx, tK: E, fO2: E, pBar: E): E = {
    val (a, b) = sun2024TpParts(tK, fO2, pBar)
    sun2024FromParts(m, a, b)
  }

  /** The T/P-only (composition-invariant) numerator terms of [[sun2024]]:
    * `A = log10(fO2) - omega(T)`, `B = h * gamma(T,P)`. */
  def sun2024TpParts(tK: E, fO2: E, pBar: E): (E, E) = {
    val a1 = -230.2593; val a2 = -1.8557e-4; val a3 = 34.3293
    val h = 2.1410
    // Gamma parameter table rows b0..b4, c1..c4 per t0/t1/t2
    val gammaParams: Map[String, Seq[Double]] = Map(
      "t0" -> Seq(-1.75528e-01, 3.48174e00, 3.06370e00, 1.36134e-02,
        1.52660e-05, -4.68802e-01, -3.58957e00, -1.09496e-01, -7.28938e-04),
      "t1" -> Seq(1.82549e-03, -1.06395e-02, -2.36645e-02, -1.56206e-08,
        -1.66849e-08, 1.44394e-03, 1.48791e-02, -3.32256e-04, 5.45464e-07),
      "t2" -> Seq(-2.14783e-04, 1.19184e-03, 2.76222e-03, -3.92864e-07,
        1.56116e-09, -1.60439e-04, -1.69242e-03, 4.31406e-05, -4.43921e-08))
    val pGPa = pBar / Lit(1e4)
    val p0 = 1e-4
    def t(number: Int): E = {
      val ps = gammaParams(s"t$number") // b0 b1 b2 b3 b4 c1 c2 c3 c4
      val part1 = Lit(ps(0)) * pGPa * pGPa * ln(pGPa / Lit(p0))
      val part2 = sumAll((1 to 4).map { n =>
        Lit(ps(n)) * pow(pGPa - Lit(p0), Lit(n.toDouble)) +
          Lit(ps(4 + n)) * pow(pGPa - Lit(p0), Lit(n - 0.5)): E
      })
      part1 + part2
    }
    val gamma = t(0) + t(1) * tK + t(2) * tK * ln(tK)
    val omega = Lit(a1) + Lit(a2) * pow(tK, Lit(1.5)) + Lit(a3) * ln(tK)
    (log10(fO2) - omega, Lit(h) * gamma)
  }

  /** [[sun2024]] over pre-computed T/P parts `(a, b)` from
    * [[sun2024TpParts]] (possibly routed through columns):
    * `10^(((a - phi) - b) / (4 + a0*sqrt(Fe_cat)))`. */
  def sun2024FromParts(m: CompCtx, a: E, b: E): E = {
    val a0 = 2.1479
    val a4 = 1.4138; val a5 = -17.3040; val a6 = -10.1820; val a7 = -6.7463
    val a8 = -7.3886; val a9 = -14.5430; val a10 = -9.9776; val a11 = -16.1506
    val a12 = -37.5572
    def cat(c: String): E = m.cat(c)
    val phi = Lit(a4) * ln(cat("Fe")) + Lit(a5) * pow(cat("Fe"), Lit(0.5)) +
      Lit(a6) * pow(cat("Si"), Lit(3.0)) +
      Lit(a7) * cat("Al") + Lit(a8) * cat("Ti") + Lit(a9) * cat("Ca") +
      Lit(a10) * cat("Mg") +
      (Lit(a11) + Lit(a12) * cat("Fe")) * (cat("Na") + cat("K"))
    pow(Lit(10.0),
      (a - phi - b) /
        (Lit(4.0) + Lit(a0) * pow(cat("Fe"), Lit(0.5))))
  }

  /** Registry of the closed-form models: name -> (ctx, T_K, fO2, P_bar) => E. */
  val closedForm: Map[String, (CompCtx, E, E, E) => E] = Map(
    "sun2024" -> ((m, t, f, p) => sun2024(m, t, f, p)),
    "zhang2017" -> ((_, t, f, p) => zhang2017(t, f, p)),
    "hirschmann2022" -> ((m, t, f, p) => hirschmann2022(m, t, f, p)),
    "borisov2018" -> ((m, t, f, _) => borisov2018(m, t, f)),
    "kress_carmichael1991" -> ((m, t, f, p) => kressCarmichael1991(m, t, f, p)),
    "jayasuriya2004" -> ((m, t, f, _) => jayasuriya2004(m, t, f)),
    "putirka2016_6b" -> ((m, t, f, _) => putirka2016_6b(m, t, f)),
    "putirka2016_6c" -> ((m, t, f, _) => putirka2016_6c(m, t, f)),
    "oneill2018" -> ((m, t, f, _) => oneill2018(m, t, f)))
}
