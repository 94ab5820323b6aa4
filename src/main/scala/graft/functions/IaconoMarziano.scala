package graft.functions

import graft.chem.Elements

/** H2O-CO2 solubility and saturation-pressure model of Iacono-Marziano et
  * al. (2012) (reference `volatile_solubility/volatile_solubility_models/
  * iaconomarziano2012.py`), "hydrous_webapp" parameterisation, ideal
  * fugacity/activity.
  *
  * All solves are row-local: H2O solubility needs an inner fixed point
  * (H2O appears on both sides via NBO/O, `:196-205`), saturation bracketed
  * root finds per species (`:239-246, 411-418`), mixed saturation a 2-D
  * solve on (P, x_fluid) (`:477-481` — reference uses MINPACK hybr; here a
  * damped 2-D Newton with the same fixed point, difference documented).
  * Failures return NaN, mirroring the reference's per-sample NaN fallback
  * (`core/MagmaFrames/melt.py:410-413`).
  */
object IaconoMarziano {

  // H2O eq. 13 coefficients, hydrous_webapp (`iaconomarziano2012.py:104-110`)
  val h2oA = 0.52096846; val h2oB = 2.11575907
  val h2oBB = -3.24443335; val h2oC = -0.02238884
  // CO2 eq. 12 coefficients, hydrous (`:128-137`)
  val co2DH2O = -16.4; val co2DAI = 4.4; val co2DFM = -17.1; val co2DNK = 22.8
  val co2A = 1.0; val co2B = 17.3; val co2BB = -6.0; val co2C = 0.12

  /** Oxide wt.% composition keyed by element name; H2O replaceable. */
  final case class Comp(names: Array[String], wt: Array[Double]) {
    private def weights = Comp.weightsFor(names)
    def updated(element: String, v: Double): Comp = {
      val i = names.indexOf(element)
      val w2 = wt.clone(); w2(i) = v
      Comp(names, w2)
    }
    def apply(element: String): Double = {
      val i = names.indexOf(element)
      if (i < 0) 0.0 else wt(i)
    }
    /** Normalised mol fractions. */
    def molNorm: Map[String, Double] = {
      val ws = weights
      var sum = 0.0
      val mol = new Array[Double](names.length)
      var i = 0
      while (i < names.length) { mol(i) = wt(i) / ws(i); sum += mol(i); i += 1 }
      names.zip(mol.map(_ / sum)).toMap
    }
  }

  object Comp {
    /** Molar weights per schema, cached by the identity of the names array:
      * every `updated`/per-row Comp shares one names reference, so the
      * weight lookups happen once per schema instead of once per solver
      * trial (this sat at the top of the sf0.1 bench profile). Plain
      * get-then-put — CHM.get is lock-free, and racing puts compute the
      * same value. */
    private val weightsCache = new java.util.concurrent.ConcurrentHashMap[
      Array[String], Array[Double]]()
    def weightsFor(names: Array[String]): Array[Double] = {
      val hit = weightsCache.get(names)
      if (hit != null) hit
      else {
        val w = names.map(n => Elements.chemicalWeight(n).get)
        weightsCache.putIfAbsent(names, w)
        w
      }
    }
  }

  /** Per-sample invariants of the IM solubility laws, precomputed so the
    * nested solves (H2O fixed point x saturation bracket x mixed 2-D
    * Newton) run on pure double arithmetic with zero allocation. Exploits
    * NBO/O's scale invariance (a mole-weighted ratio, so normalisation
    * cancels): the dissolved-H2O trial value only shifts the accumulators
    * by its own mole count.
    *
    * Mirrors `iaconomarziano2012.py:565-606` (NBO/O) and `:297-375` (CO2
    * compositional terms) computed per trial in the reference. */
  final case class Prep(nbo0: Double, o0: Double, tot0: Double,
                        molAl: Double, molCaNaK: Double, molFM0: Double,
                        molNK: Double, wH2O: Double) {
    @inline def nboO(hMol: Double): Double = (nbo0 + 2.0 * hMol) / (o0 + hMol)
  }

  def prepare(c: Comp): Prep = {
    val ws = Comp.weightsFor(c.names)
    def mol(name: String): Double = {
      val i = c.names.indexOf(name)
      if (i < 0) 0.0 else c.wt(i) / ws(i)
    }
    var tot0 = 0.0
    var i = 0
    while (i < c.names.length) {
      if (c.names(i) != "H2O") tot0 += c.wt(i) / ws(i)
      i += 1
    }
    val fe2O3 = mol("Fe2O3")
    val nbo0 = 2.0 * (mol("K2O") + mol("Na2O") + mol("CaO") + mol("MgO") +
      mol("FeO") + 2.0 * fe2O3 - mol("Al2O3"))
    val o0 = 2.0 * mol("SiO2") + 2.0 * mol("TiO2") + 3.0 * mol("Al2O3") +
      mol("MgO") + mol("FeO") + 2.0 * fe2O3 + mol("CaO") + mol("Na2O") +
      mol("K2O")
    Prep(nbo0, o0, tot0,
      molAl = mol("Al2O3"),
      molCaNaK = mol("CaO") + mol("Na2O") + mol("K2O"),
      molFM0 = mol("FeO") + mol("MgO") + 2.0 * fe2O3,
      molNK = mol("Na2O") + mol("K2O"),
      wH2O = Elements.chemicalWeight("H2O").get)
  }

  /** NBO/O after Marrochi & Toplis: all Fe as FeO, hydrous terms included
    * (`iaconomarziano2012.py:565-606`). */
  def nboO(mol: Map[String, Double]): Double = {
    def x(e: String): Double = mol.getOrElse(e, 0.0)
    val fe2O3 = x("Fe2O3")
    var nbo = 2.0 * (x("K2O") + x("Na2O") + x("CaO") + x("MgO") + x("FeO") +
      2.0 * fe2O3 - x("Al2O3"))
    var o = 2.0 * x("SiO2") + 2.0 * x("TiO2") + 3.0 * x("Al2O3") + x("MgO") +
      x("FeO") + 2.0 * fe2O3 + x("CaO") + x("Na2O") + x("K2O")
    nbo += 2.0 * x("H2O")
    o += x("H2O")
    nbo / o
  }

  /** Eq. 13 closed form at a FIXED dissolved-H2O mole count (`:231-247`). */
  @inline private def h2oSolubilityAt(prep: Prep, hMol: Double, xFluid: Double,
                                      pBar: Double, tK: Double): Double = {
    val pH2O = xFluid * pBar
    math.exp(h2oA * math.log(pH2O) + h2oB * prep.nboO(hMol) + h2oBB +
      h2oC * pBar / tK)
  }

  /** Dissolved H2O: inner fixed point because the hydrous parameterisation
    * feeds H2O back into NBO/O — secant from x0=1, x1=2 (`:196-205`). */
  def h2oSolubility(prep: Prep, xFluid: Double, pBar: Double, tK: Double): Double = {
    if (pBar <= 0 || xFluid <= 0) return 0.0
    def f(h: Double): Double =
      h - h2oSolubilityAt(prep, h / prep.wH2O, xFluid, pBar, tK)
    val s = Solver.secant(f, 1.0, 2.0)
    // secant can diverge far from the root at bracket-endpoint pressures;
    // fall back to a bracketed solve (f(0+) < 0 < f(high))
    if (s.isFinite && s >= 0.0 && math.abs(f(s)) < 1e-6) s
    else try Solver.brent(f, 1e-12, 1e4) catch { case _: Throwable => Double.NaN }
  }

  def h2oSolubility(c: Comp, xFluid: Double, pBar: Double, tK: Double): Double =
    h2oSolubility(prepare(c), xFluid, pBar, tK)

  /** Dissolved CO2 (wt.%), eq. 12 (`:297-375`): dissolved H2O first, then
    * the carbonate term. All compositional terms are mole fractions of the
    * hydrous total, reconstructed from the anhydrous accumulators. */
  def co2Solubility(prep: Prep, xFluid: Double, pBar: Double, tK: Double): Double = {
    if (pBar <= 0 || 1.0 - xFluid <= 0) return 0.0
    val hMol = h2oSolubility(prep, xFluid, pBar, tK) / prep.wH2O
    val tot = prep.tot0 + hMol
    val pCO2 = (1.0 - xFluid) * pBar
    val xAI = prep.molAl / prep.molCaNaK // fraction ratio = mole ratio
    val xFM = prep.molFM0 / tot
    val xNK = prep.molNK / tot
    val xH2O = hMol / tot
    val co3ppm = math.exp(xH2O * co2DH2O + xAI * co2DAI + xFM * co2DFM +
      xNK * co2DNK + co2A * math.log(pCO2) + co2B * prep.nboO(hMol) + co2BB +
      co2C * pBar / tK)
    co3ppm / 1e4
  }

  def co2Solubility(c: Comp, xFluid: Double, pBar: Double, tK: Double): Double =
    co2Solubility(prepare(c), xFluid, pBar, tK)

  /** H2O saturation pressure: bracketed Brent on [1e-15, 15 kbar]
    * (`:205-246`). */
  def h2oSaturation(c: Comp, tK: Double, xFluid: Double = 1.0): Double = {
    val h2o = c("H2O")
    if (h2o == 0.0) return 0.0
    val prep = prepare(c)
    try Solver.brent(p => h2o - h2oSolubility(prep, xFluid, p, tK), 1e-15, 1.5e4)
    catch { case _: Throwable => Double.NaN }
  }

  /** CO2 saturation pressure: bracketed Brent on [1e-10, 100 kbar]
    * (`:377-430`). */
  def co2Saturation(c: Comp, tK: Double, xFluid: Double = 0.0): Double = {
    val co2 = c("CO2")
    if (co2 == 0.0) return 0.0
    val prep = prepare(c)
    try Solver.brent(p => co2 - co2Solubility(prep, xFluid, p, tK), 1e-10, 1e5)
    catch { case _: Throwable => Double.NaN }
  }

  /** Mixed-fluid saturation: (P_sat, x_fluid) 2-D solve seeded at the sum
    * of the pure-species pressures, with pure-species fallbacks when the
    * fluid fraction leaves [0,1] (`:434-562`). */
  def mixedSaturation(c: Comp, tK: Double): (Double, Double) = {
    val pH2O = h2oSaturation(c, tK)
    val pCO2 = co2Saturation(c, tK)
    if (c("H2O") <= 0.0) return (pCO2, 0.0)
    if (c("CO2") <= 0.0) return (pH2O, 1.0)
    val prep = prepare(c)
    val pGuess = (if (pH2O.isFinite) pH2O else 0.0) +
      (if (pCO2.isFinite) pCO2 else 0.0)
    val h2oObs = c("H2O"); val co2Obs = c("CO2")
    def objective(p: Double, xfl: Double): (Double, Double) = {
      val pc = math.max(p, 1e-15)
      val xc = math.min(1.0, math.max(0.0, xfl))
      val h = h2oSolubility(prep, xc, pc, tK)
      val co = co2Solubility(prep, xc, pc, tK)
      (h - h2oObs, co - co2Obs)
    }
    val (p, xflRaw) = Solver.newton2d(objective, pGuess, 0.0,
      clampX = x => math.max(x, 1e-15),
      clampY = y => math.min(1.0, math.max(0.0, y)))
    val xfl = math.min(1.0, math.max(0.0, xflRaw))
    if (xflRaw <= 0.0) (pCO2, xfl)
    else if (xflRaw >= 1.0) (pH2O, xfl)
    else (p, xfl)
  }
}
