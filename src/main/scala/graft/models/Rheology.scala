package graft.models

import graft.expr._
import graft.expr.E._

/** Melt viscosity (Giordano et al. 2008) and density (Iacovino & Till 2019)
  * as closed-form expressions (reference `rheology/viscosity.py`,
  * `rheology/density.py`).
  */
object Rheology {

  /** Giordano 2008 VFT viscosity, log10(Pa.s): A + B/(T_K - C).
    * Input: melt mol fractions x100 (mole percent) over the model's
    * component list; F2 reads 0 when absent (`rheology/viscosity.py`). */
  def viscosity(m: CompCtx, tK: E): E = {
    def mp(ox: String): E =
      if (m.has(ox)) m.molNorm(ox) * Lit(100.0) else Lit(0.0)
    val b = Lit(159.6) * (mp("SiO2") + mp("TiO2")) +
      Lit(-173.3) * mp("Al2O3") +
      Lit(72.1) * (mp("FeO") + mp("MnO") + mp("P2O5")) +
      Lit(75.7) * mp("MgO") +
      Lit(-39.0) * mp("CaO") +
      Lit(-84.1) * (mp("Na2O") + mp("H2O") + mp("F2")) +
      Lit(141.5) * (mp("H2O") + mp("F2") + ln(Lit(1.0) + mp("H2O"))) +
      Lit(-2.43) * ((mp("SiO2") + mp("TiO2")) * (mp("FeO") + mp("MnO") + mp("MgO"))) +
      Lit(-0.91) * ((mp("SiO2") + mp("TiO2") + mp("Al2O3") + mp("P2O5")) *
        (mp("Na2O") + mp("K2O") + mp("H2O"))) +
      Lit(17.6) * (mp("Al2O3") * (mp("Na2O") + mp("K2O")))
    val c = Lit(2.75) * mp("SiO2") +
      Lit(15.7) * (mp("TiO2") + mp("Al2O3")) +
      Lit(8.3) * (mp("FeO") + mp("MgO") + mp("MnO")) +
      Lit(10.2) * mp("CaO") +
      Lit(-12.3) * (mp("Na2O") + mp("K2O")) +
      Lit(-99.5) * ln(Lit(1.0) + mp("H2O") + mp("F2")) +
      Lit(0.3) * ((mp("Al2O3") + mp("FeO") + mp("MgO") + mp("MnO") + mp("CaO") -
        mp("P2O5")) * (mp("Na2O") + mp("K2O") + mp("H2O") + mp("F2")))
    Lit(-4.55) + b / (tK - c)
  }

  /** Iacovino & Till (2019) densities, kg/m3 (`rheology/density.py:72-115`).
    * Per-oxide (molar volume, dV/dT, Tref, dV/dP) constants; mole fractions
    * normalised over the FULL composition then subset to the model oxides. */
  val densityParams: Seq[(String, Double, Double, Double, Double)] = Seq(
    // oxide, Vref, dVdT, Tref, dVdP
    ("SiO2", 26.86, 0.0, 1773, -1.89e-4),
    ("TiO2", 28.32, 0.00724, 1773, -2.31e-4),
    ("Al2O3", 37.42, 0.00262, 1773, -2.26e-4),
    ("Fe2O3", 41.50, 0.0, 1723, -2.5e-4),
    ("FeO", 12.68, 0.00369, 1723, -4.5e-5),
    ("MgO", 12.02, 0.00327, 1773, 2.7e-5),
    ("CaO", 16.90, 0.00374, 1773, 3.4e-5),
    ("Na2O", 29.65, 0.00768, 1773, -2.4e-4),
    ("K2O", 47.28, 0.01208, 1773, -6.75e-4),
    ("H2O", 22.9, 0.0095, 1273, -3.2e-4))

  def density(m: CompCtx, tK: E, pBar: E): E = {
    import graft.chem.Elements
    val terms = densityParams.map { case (ox, vref, dvdt, tref, dvdp) =>
      val x = m.molNorm(ox)
      val mass = x * Lit(Elements.chemicalWeight(ox).get)
      val vol = (Lit(dvdt) * (tK - Lit(tref.toDouble)) +
        Lit(dvdp) * (pBar - Lit(1.0)) + Lit(vref)) * x
      (mass, vol)
    }
    val mass1mol = sumAll(terms.map(_._1))
    val vLiquid = sumAll(terms.map(_._2))
    mass1mol / vLiquid * Lit(1e3)
  }
}
