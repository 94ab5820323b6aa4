package graft.models

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.expr._
import graft.expr.E._

/** Olivine-melt Fe-Mg exchange coefficient (Kd) models
  * (reference `Kd/Ol_melt/FeMg/Kd_models.py`).
  *
  * Closed-form models are expressions; toplis2005's signature Kd<->Fo
  * fixed-point iteration (`Kd_iterate.py:31-100`) is row-local with no
  * cross-row state, so it runs as a typed Scala UDF with the loop inside —
  * one narrow stage, no shuffle, iterations (~3-10) per row.
  */
object Kd {

  val R = 8.31446261815324

  /** Normalised wt.% of a composition — putirka2016_8x convert mol
    * fractions back to wt.% (`Kd_models.py:482`). From a wt.% ctx that is
    * just normalisation to 100. */
  private def wtNorm(m: CompCtx, ox: String): E =
    if (!m.has(ox)) Lit(0.0)
    else m.wt(ox) / sumAll(m.elements.map(m.wt)) * Lit(100.0)

  /** Putirka (2016) eq. 8a: constant 0.33 (`Kd_models.py:422-445`). */
  def putirka2016_8a: E = Lit(0.33)

  /** Putirka (2016) eq. 8b, P > 1 GPa (`Kd_models.py:446-491`). */
  def putirka2016_8b(m: CompCtx, pBar: E): E = {
    val alk = wtNorm(m, "Na2O") + wtNorm(m, "K2O")
    Lit(0.21) + Lit(8e-3) * (pBar / Lit(1e4)) +
      Lit(2.5e-3) * wtNorm(m, "SiO2") + Lit(-3.63e-4) * (alk * alk)
  }

  /** Putirka (2016) eq. 8c, P < 1 GPa (`Kd_models.py:494-533`). */
  def putirka2016_8c(m: CompCtx): E = {
    val alk = wtNorm(m, "Na2O") + wtNorm(m, "K2O")
    Lit(0.25) + Lit(1.8e-3) * wtNorm(m, "SiO2") + Lit(-3.27e-4) * (alk * alk)
  }

  /** Putirka (2016) eq. 8d, alkaline liquids (`Kd_models.py:536-593`). */
  def putirka2016_8d(m: CompCtx, pBar: E): E = {
    val si = wtNorm(m, "SiO2")
    val al = wtNorm(m, "Al2O3")
    val alk = wtNorm(m, "Na2O") + wtNorm(m, "K2O")
    val alNumber = al / (al + si)
    Lit(0.6) + Lit(1.3e-2) * (pBar / Lit(1e4)) + Lit(1.6e-2) * si +
      Lit(-1.73e-4) * (si * si) + Lit(1.79e-2) * al + Lit(-2.6) * alNumber +
      Lit(2.11e-1) * ln(alNumber) + Lit(3.19e-5) * (alk * alk * alk)
  }

  /** Sun & Dasgupta (2020) eq. 7 (`Kd_models.py:596-652`). Note the 2.45
    * Na2O coefficient deliberately deviates from the published 2.45/xx to
    * reproduce the paper's spreadsheet (`Kd_models.py:645-646`). */
  def sun2020(m: CompCtx, fe3fe2: E): E = {
    val vf = m.volatileFree
    val kdFeTotal = exp(Lit(-1.65) +
      Lit(1.22) * sqrt(vf.catPerOxygen("MgO")) +
      Lit(2.45) * vf.catPerOxygen("Na2O") +
      Lit(0.54) * (wtNorm(m, "H2O") / Lit(100.0)))
    val fe3FeTotal = fe3fe2 / (Lit(1.0) + fe3fe2)
    kdFeTotal / (Lit(1.0) - fe3FeTotal)
  }

  /** Toplis (2005) Kd at FIXED forsterite — the closed-form core
    * (`Kd_models.py:185-215`). Inputs in mole PERCENT. */
  def toplis2005Fixed(m: CompCtx, forsterite: E, tK: E, pBar: E): E = {
    def mp(ox: String): E = m.molNorm(ox) * Lit(100.0)
    val si = mp("SiO2"); val na = mp("Na2O"); val k = mp("K2O")
    val phi = If(si > Lit(60.0),
      (Lit(11.0) - Lit(5.5) * (Lit(100.0) / (Lit(100.0) - si))) *
        exp(Lit(-0.31) * (na + k)),
      (Lit(0.46) * (Lit(100.0) / (Lit(100.0) - si)) - Lit(0.93)) * (na + k) +
        (Lit(-5.33) * (Lit(100.0) / (Lit(100.0) - si)) + Lit(9.69)))
    val sio2A0 = si + phi * (na + k)
    val sio2A = if (m.has("H2O")) sio2A0 + Lit(0.8) * mp("H2O") else sio2A0
    exp((Lit(-6766.0) / (Lit(R) * tK) - Lit(7.34 / R)) +
      ln(Lit(0.036) * sio2A - Lit(0.22)) +
      (Lit(3000.0) * (Lit(1.0) - Lit(2.0) * forsterite) / (Lit(R) * tK)) +
      (Lit(0.035) * (pBar - Lit(1.0)) / (Lit(R) * tK)))
  }

  // ---- toplis2005 with Kd<->equilibrium-Fo fixed point (UDF) -----------

  /** Scala port of the per-row iteration (`Kd_iterate.py:31-100`):
    * Kd from Fo, equilibrium Fo from Kd (1/(1+Kd*Fe2Mg_liq)), repeat until
    * rel. dFo < 0.001. */
  private[graft] def toplisIterate(
      siO2mp: Double, na2Omp: Double, k2Omp: Double, h2Omp: Double,
      feOmol: Double, mgOmol: Double,
      fe3fe2: Double, tK: Double, pBar: Double): Double = {
    def kdAt(fo: Double): Double = {
      val phi =
        if (siO2mp > 60.0)
          (11.0 - 5.5 * (100.0 / (100.0 - siO2mp))) * math.exp(-0.31 * (na2Omp + k2Omp))
        else
          (0.46 * (100.0 / (100.0 - siO2mp)) - 0.93) * (na2Omp + k2Omp) +
            (-5.33 * (100.0 / (100.0 - siO2mp)) + 9.69)
      val sio2A = siO2mp + phi * (na2Omp + k2Omp) + 0.8 * h2Omp
      math.exp(-6766.0 / (R * tK) - 7.34 / R +
        math.log(0.036 * sio2A - 0.22) +
        3000.0 * (1.0 - 2.0 * fo) / (R * tK) +
        0.035 * (pBar - 1.0) / (R * tK))
    }
    val fe2FeTotal = 1.0 / (1.0 + fe3fe2)
    val fe2MgLiquid = feOmol * fe2FeTotal / mgOmol
    def eqFo(kd: Double): Double = 1.0 / (1.0 + kd * fe2MgLiquid)

    var foInit = 0.85
    var kd = kdAt(foInit)
    var foEq = eqFo(kd)
    var delta = math.abs(foInit - foEq) / foInit
    var n = 0
    while (delta > 0.001 && n < 100) {
      kd = kdAt(foInit)
      foInit = foEq
      foEq = eqFo(kd)
      delta = math.abs(foInit - foEq) / foInit
      n += 1
    }
    kd
  }

  /** Generic Kd <-> equilibrium-Fo fixed point (`Kd_iterate.py:31-100`)
    * shared by toplis2005 / blundy2020 / saper2022: only the inner
    * Kd(Fo) kernel differs. */
  private[graft] def iterateKdFo(kdAt: Double => Double, feOmol: Double,
                                 mgOmol: Double, fe3fe2: Double): Double = {
    val fe2FeTotal = 1.0 / (1.0 + fe3fe2)
    val fe2MgLiquid = feOmol * fe2FeTotal / mgOmol
    def eqFo(kd: Double): Double = 1.0 / (1.0 + kd * fe2MgLiquid)
    var foInit = 0.85
    var kd = kdAt(foInit)
    var foEq = eqFo(kd)
    var delta = math.abs(foInit - foEq) / foInit
    var n = 0
    while (delta > 0.001 && n < 100) {
      kd = kdAt(foInit)
      foInit = foEq
      foEq = eqFo(kd)
      delta = math.abs(foInit - foEq) / foInit
      n += 1
    }
    kd
  }

  /** Blundy (2020) eq. 8 with Fo iteration (`Kd_models.py:271-419`):
    * Kd_Fe2 = 0.3642 exp(312.7 (1-2Fo)/T) — the Fe3/FeTotal factor cancels
    * between Kd_Fe_total and the Fe2 correction; Fe3Fe2 (forced to
    * borisov2018 by the reference, `:352-362`) enters via equilibrium Fo. */
  private[graft] def blundy2020Iterate(feOmol: Double, mgOmol: Double,
                                       fe3fe2Borisov: Double, tK: Double): Double =
    iterateKdFo(fo => 0.3642 * math.exp(312.7 * (1.0 - 2.0 * fo) / tK),
      feOmol, mgOmol, fe3fe2Borisov)

  /** Saper & Stolper (2022) eq. 10 with Fo iteration (`Kd_models.py:
    * 655-752`): Gibbs + melt cation interaction terms. */
  private[graft] def saper2022Iterate(feOmol: Double, mgOmol: Double,
                                      catSi: Double, catTi: Double, catNaK: Double,
                                      fe3fe2: Double, tK: Double): Double =
    iterateKdFo(fo => math.exp(
      (-6766.0 - 7.34 * tK) / (R * tK) +
        1.0445 * catSi - 1.3125 * catTi - 3.0550 * catSi * catNaK +
        3040.0 * (1.0 - 2.0 * fo) / (R * tK)),
      feOmol, mgOmol, fe3fe2)

  def blundy2020(feOmol: Column, mgOmol: Column, fe3fe2Borisov: Column,
                 tK: Column): Column =
    udf(blundy2020Iterate _).apply(feOmol, mgOmol, fe3fe2Borisov, tK)

  def saper2022(feOmol: Column, mgOmol: Column, catSi: Column, catTi: Column,
                catNaK: Column, fe3fe2: Column, tK: Column): Column =
    udf(saper2022Iterate _).apply(feOmol, mgOmol, catSi, catTi, catNaK,
      fe3fe2, tK)

  /** Column-level toplis2005 iterative Kd. Feed mole-percent/mol-fraction
    * scalar columns (cheap expressions) so the UDF stays narrow. */
  def toplis2005(siO2mp: Column, na2Omp: Column, k2Omp: Column, h2Omp: Column,
                 feOmol: Column, mgOmol: Column,
                 fe3fe2: Column, tK: Column, pBar: Column): Column =
    udf(toplisIterate _).apply(siO2mp, na2Omp, k2Omp, h2Omp, feOmol, mgOmol,
      fe3fe2, tK, pBar)

  /** Observed Kd from measured olivine+melt pair (J1 join query;
    * `core/MagmaFrames/olivine.py:60-95`): melt and olivine mol fractions
    * with melt Fe2+ from Fe3Fe2. Column names are prefixed by side. */
  def observed(meltFeMol: E, meltMgMol: E, olFeMol: E, olMgMol: E, fe3fe2: E): E = {
    val fe2Melt = meltFeMol * (Lit(1.0) / (Lit(1.0) + fe3fe2))
    (olFeMol / olMgMol) / (fe2Melt / meltMgMol)
  }
}
