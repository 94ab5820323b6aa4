package graft.functions

import graft.chem.Elements

/** Iterative Fe3+/Fe2+ models (reference `Fe_redox/Fe3Fe2_models.py`):
  * activities depend on the Fe speciation itself, so each row solves a
  * fixed point Fe3Fe2 = f(Fe3Fe2) (the reference calls per-row
  * `scipy.optimize.fsolve` from 0.3; here damped secant with a bracketed
  * fallback). Row-local — no cross-row state, one narrow stage.
  */
object Fe3Fe2Iterative {

  val R = 8.31446261815324

  /** Cation fractions after splitting total Fe (as FeO) into FeO + Fe2O3
    * at ratio r (`melt.py:225-274` with wtpc=False, then `cations()`). */
  private[functions] def cationsWithFeSplit(
      mol: Map[String, Double], r: Double): Map[String, Double] = {
    val ft = 1.0 / (1.0 + r)
    val feo = mol.getOrElse("FeO", 0.0)
    val updated = mol + ("FeO" -> feo * ft) + ("Fe2O3" -> feo * (1.0 - ft) / 2.0)
    val terms = updated.toSeq.map { case (ox, x) =>
      Elements.cationName(ox) -> x * Elements.cationAmount(ox)
    }
    val tot = terms.iterator.map(_._2).sum
    terms.groupBy(_._1).map { case (c, vs) => c -> vs.iterator.map(_._2).sum / tot }
  }

  /** The r-invariant decomposition of [[cationsWithFeSplit]]: splitting
    * FeO into FeO + Fe2O3 CONSERVES the cation count (each Fe is one
    * cation on either side), so the denominator and every non-Fe cation
    * fraction are constant across the fixed-point trials — only the
    * Fe2+/Fe3+ pair redistributes `feTot` by 1/(1+r). Hoisting this out
    * of the trial evaluations removes all per-trial Map building. */
  private[functions] final case class CatBase(cat: Map[String, Double],
                                              feTot: Double) {
    @inline def fe(r: Double): Double = feTot / (1.0 + r)
    @inline def fe3(r: Double): Double = feTot - fe(r)
    /** cat("Fe") - cat("Fe3") at trial r. */
    @inline def feMinusFe3(r: Double): Double = fe(r) - fe3(r)
    def apply(n: String): Double = cat.getOrElse(n, 0.0)
  }

  private[functions] def catBase(mol: Map[String, Double]): CatBase = {
    val feo = mol.getOrElse("FeO", 0.0)
    val terms = (mol - "FeO" - "Fe2O3").toSeq.map { case (ox, x) =>
      Elements.cationName(ox) -> x * Elements.cationAmount(ox)
    }
    val tot = terms.iterator.map(_._2).sum + feo
    CatBase(
      terms.groupBy(_._1).map { case (c, vs) => c -> vs.iterator.map(_._2).sum / tot },
      feo / tot)
  }

  /** O'Neill et al. (2006) eq. 10 (`Fe3Fe2_models.py:840-871`): the cation
    * polynomial and pressure term are per-row constants; only the
    * Fe2+-Fe3+ difference varies per trial. */
  def oneill2006(mol: Map[String, Double], tK: Double, pBar: Double,
                 fO2: Double): Double = {
    val b = catBase(mol)
    val pGPa = pBar / 1e4
    val catPoly = -28144.0 + 3905.0 * b("Mg") - 13359.0 * b("Ca") -
      14858.0 * b("Na") - 9805.0 * b("K") + 10906.0 * b("Al") +
      110971.0 * b("P")
    val part2 = 13.95 +
      (33122.0 / tK - 5.24) * (math.pow(1.0 + 0.241 * pGPa, 0.75) - 1.0) -
      (39156.0 / tK - 6.17) * (math.pow(1.0 + 0.132 * pGPa, 0.75) - 1.0)
    val log10fO2 = math.log10(fO2)
    fixedPoint { r =>
      val part1 = (catPoly - 11952.0 * b.feMinusFe3(r)) / tK
      math.pow(10.0, (log10fO2 - part1 - part2) / 4.0)
    }
  }

  /** Armstrong et al. (2019) Supplementary eq. S12
    * (`Fe3Fe2_models.py:1030-1155`): Gibbs0 + Tait-like VdP of the FeO/
    * FeO1.5 partial molar volumes + Jayasuriya Margules activities.
    * Everything but the Fe2+-Fe3+ Margules term is per-row constant. */
  def armstrong2019(mol: Map[String, Double], tK: Double, pBar: Double,
                    fO2: Double): Double = {
    val b = catBase(mol)
    val gibbs0 = -(16201.0 / tK - 8.031) * (R * tK)
    def vdp(phase: String): Double = {
      val (k0, kp0) = phase match {
        case "Fe2" => (37.0, 8.0)
        case "Fe3" => (12.6, 1.3)
      }
      val kpp0 = -kp0 / k0
      val v0 = phase match {
        case "Fe2" => 13650.0 + 2.92 * (tK - 1673.0)
        case "Fe3" => 21070.0 + 4.54 * (tK - 1673.0)
      }
      val pGPa = pBar / 1e4
      val a = (1.0 + kp0) / (1.0 + kp0 + k0 * kpp0)
      val bb = kp0 / k0 - kpp0 / (1.0 + kp0)
      val cc = (1.0 + kp0 + k0 * kpp0) / (kp0 * kp0 + kp0 - k0 * kpp0)
      val part1 = a * (1.0 - math.pow(1.0 + bb * pGPa, 1.0 - cc))
      val part2 = bb * (cc - 1.0) * pGPa
      pGPa * v0 * (1.0 - a + part1 / part2)
    }
    val dVdP = vdp("Fe3") - vdp("Fe2")
    val sumMargules = -2248.0 * b("Mg") + 7690.0 * b("Ca") + 8553.0 * b("Na") +
      5644.0 * b("K") + -6278.0 * b("Al")
    val lnfO2Quarter = math.log(fO2) / 4.0
    val gTerm = (gibbs0 + dVdP) / (R * tK)
    fixedPoint { r =>
      val lnAFe3AFe2 = sumMargules / tK + 6880.0 * (b.feMinusFe3(r) / tK)
      math.exp(lnfO2Quarter - gTerm + lnAFe3AFe2)
    }
  }

  /** Plain cation fractions with Fe as total Fe2+ (no Fe3 split) — the
    * reference's `moles.cations()` used by hirschmann2022
    * (`Fe3Fe2_models.py:1304-1307`). */
  private[graft] def plainCations(mol: Map[String, Double]): Map[String, Double] = {
    val terms = mol.toSeq.map { case (ox, x) =>
      Elements.cationName(ox) -> x * Elements.cationAmount(ox)
    }
    val tot = terms.iterator.map(_._2).sum
    terms.groupBy(_._1).map { case (c, vs) => c -> vs.iterator.map(_._2).sum / tot }
  }

  /** Hirschmann (2022) eq. 21 with the deng2020 EOS-integral dVdP instead
    * of the armstrong2019 analytic volumes (the reference's
    * `dVdP_method="deng2020"` variant, `Fe3Fe2_models.py:1325-1330`).
    * Closed-form in Fe3Fe2 — no fixed point — but needs the numeric Deng
    * volume integral, so it lives here rather than in the expression AST. */
  def hirschmann2022DengVdP(mol: Map[String, Double], tK: Double,
                            pBar: Double, fO2: Double): Double = {
    val (a, b, c, dCp, t0) = (0.1917, -1.961, 4158.1, 33.25, 1673.15)
    val cats = plainCations(mol)
    def cat(n: String): Double = cats.getOrElse(n, 0.0)
    val compositional =
      Seq("Si" -> -520.46, "Ti" -> -185.37, "Mg" -> 494.39, "Ca" -> 1838.34,
        "Na" -> 2888.48, "K" -> 3473.68, "P" -> -4473.6)
        .map { case (n, y) => cat(n) * y }.sum +
        -1245.09 * cat("Si") * cat("Al") + -1156.86 * cat("Si") * cat("Mg")
    val dVdP = Deng2020.dVdP(tK, pBar)
    val part1 = a * math.log10(fO2) + b + c / tK
    val part2 = -dCp / (R * math.log(10.0)) *
      (1.0 - t0 / tK - math.log(tK / t0))
    val part3 = -dVdP / (R * math.log(10.0) * tK)
    val part4 = compositional / tK
    math.pow(10.0, part1 + part2 + part3 + part4)
  }

  /** Sun (2024) eq. 9 with the deng2020 EOS-integral Gamma — the
    * reference's DEFAULT `dV="deng"` variant
    * (`Fe_redox/Fe3Fe2_models.py:1494-1534`). The expression-AST
    * [[graft.models.Fe3Fe2.sun2024]] uses Sun's closed-form parameterised
    * Gamma instead (the published approximation; deviates by up to ~8% in
    * Fe3Fe2 at 1 GPa), which keeps the hot path codegen'd + oracle-able.
    * Closed-form in Fe3Fe2 (total-Fe cations, no split). */
  def sun2024DengVdP(mol: Map[String, Double], tK: Double, pBar: Double,
                     fO2: Double): Double = {
    val a0 = 2.1479; val a1 = -230.2593; val a2 = -1.8557e-4; val a3 = 34.3293
    val a4 = 1.4138; val a5 = -17.3040; val a6 = -10.1820; val a7 = -6.7463
    val a8 = -7.3886; val a9 = -14.5430; val a10 = -9.9776; val a11 = -16.1506
    val a12 = -37.5572; val h = 2.1410
    val cats = plainCations(mol)
    def cat(n: String): Double = cats.getOrElse(n, 0.0)
    val gamma = Deng2020.dVdP(tK, pBar) / (R * tK)
    val omega = a1 + a2 * math.pow(tK, 1.5) + a3 * math.log(tK)
    val fe = cat("Fe")
    val phi = a4 * math.log(fe) + a5 * math.sqrt(fe) +
      a6 * math.pow(cat("Si"), 3.0) + a7 * cat("Al") + a8 * cat("Ti") +
      a9 * cat("Ca") + a10 * cat("Mg") +
      (a11 + a12 * fe) * (cat("Na") + cat("K"))
    math.pow(10.0,
      (math.log10(fO2) - omega - phi - h * gamma) / (4.0 + a0 * math.sqrt(fe)))
  }

  /** Solve r = f(r) by 60 fixed bisection steps on g(r) = f(r) - r over
    * the reference's fsolve-equivalent bracket. Both callers' f are
    * strictly decreasing in r (the Fe2-Fe3 redistribution term enters with
    * a negative derivative), so g is strictly decreasing and the root is
    * unique; 60 steps reach ~1e-15 relative — far inside the golden parity
    * tolerances. Deterministic straight-line IEEE arithmetic with no
    * convergence branches, so the DuckDB oracle's recursive-CTE twin
    * ([[graft.Fe3Fe2IterSql]]) computes bit-identical ratios (the earlier
    * secant-then-brent hybrid had data-dependent branch paths no SQL
    * rendering could follow). */
  private def fixedPoint(f: Double => Double): Double = {
    def g(r: Double): Double = f(r) - r
    val lo0 = 1e-8
    val hi0 = 100.0
    if (!(g(lo0) > 0.0) || !(g(hi0) < 0.0)) return Double.NaN // unbracketed
    var lo = lo0
    var hi = hi0
    var it = 0
    while (it < 60) {
      val mid = (lo + hi) * 0.5
      if (g(mid) > 0.0) lo = mid else hi = mid
      it += 1
    }
    (lo + hi) * 0.5
  }
}
