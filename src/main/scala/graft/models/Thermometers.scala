package graft.models

import graft.expr._
import graft.expr.E._

/** Melt-only liquidus thermometers (reference `thermometers/melt.py`).
  * Each returns a single expression T_K over an oxide wt.% composition (plus
  * a `P_bar` column where pressure-sensitive). Pure closed-form — compiles to
  * one codegen'd Catalyst projection, no UDFs.
  */
object Thermometers {

  /** SEE (1σ) per thermometer (`thermometers/melt.py:36-48`). */
  val errors: Map[String, Double] = Map(
    "putirka2008_13" -> 71, "putirka2008_14" -> 58, "putirka2008_15" -> 46,
    "putirka2008_16" -> 26, "putirka2008_22" -> 32, "sun2020" -> 49,
    "shea2022" -> 13, "sugawara2000_3" -> 33, "sugawara2000_6a" -> 30)

  /** Eq. 13, Putirka (2008) (`thermometers/melt.py:71-106`). */
  def putirka2008_13(m: CompCtx, offset: Double = 0.0): E =
    Lit(26.3) * m.wt("MgO") + Lit(994.4) + Lit(273.15) +
      Lit(errors("putirka2008_13") * offset)

  /** Melt Mg# from anhydrous mol fractions (Fe as total Fe). */
  private def mgNo(m: CompCtx): E = {
    val a = m.anhydrous
    a.molNorm("MgO") / (a.molNorm("MgO") + a.molNorm("FeO"))
  }

  /** Eq. 14, Putirka (2008) (`thermometers/melt.py:109-188`). */
  def putirka2008_14(m: CompCtx, offset: Double = 0.0): E =
    Lit(754.0) + Lit(190.6) * mgNo(m) + Lit(25.52) * m.wt("MgO") +
      Lit(9.585) * m.wt("FeO") + Lit(14.87) * (m.wt("Na2O") + m.wt("K2O")) -
      Lit(9.176) * m.wt("H2O") + Lit(273.15) +
      Lit(errors("putirka2008_14") * offset)

  /** Eq. 15, Putirka (2008), pressure-sensitive
    * (`thermometers/melt.py:191-279`). `P_bar` column required. */
  def putirka2008_15(m: CompCtx, offset: Double = 0.0): E = {
    val pGPa = C("P_bar") / Lit(1e4)
    Lit(815.3) + Lit(265.5) * mgNo(m) + Lit(15.37) * m.wt("MgO") +
      Lit(8.61) * m.wt("FeO") + Lit(6.646) * (m.wt("Na2O") + m.wt("K2O")) +
      Lit(39.16) * pGPa - Lit(12.83) * m.wt("H2O") + Lit(273.15) +
      Lit(errors("putirka2008_15") * offset)
  }

  /** Eq. 16, Putirka (2008) (`thermometers/melt.py:282-346`). Anhydrous
    * mol fractions when H2O present. */
  def putirka2008_16(m: CompCtx, offset: Double = 0.0): E = {
    val a = if (m.has("H2O")) m.anhydrous else m
    val pGPa = C("P_bar") / Lit(1e4)
    Lit(-583.0) + Lit(3141.0) * a.molNorm("SiO2") +
      Lit(15779.0) * a.molNorm("Al2O3") + Lit(1338.6) * a.molNorm("MgO") -
      Lit(31440.0) * a.molNorm("SiO2") * a.molNorm("Al2O3") +
      Lit(77.67) * pGPa + Lit(273.15) + Lit(errors("putirka2008_16") * offset)
  }

  /** Beattie (1993) eq. 12 olivine-melt partition constants
    * (`thermometers/melt.py:63-70`). */
  private val beattie: Seq[(String, Double, Double)] = Seq(
    ("Mg", 1.0, 0.0), ("Mn", 0.259, -4.9e-2), ("Fe", 0.299, 2.7e-2),
    ("Co", 0.786, -0.385), ("Ni", 3.346, -3.665))

  /** Eq. 22, Putirka (2008) + Beattie (1993) D(Mg)
    * (`thermometers/melt.py:349-425`). Uses the ANHYDROUS-normalised
    * composition's cation fractions; H2O wt.% from the original. */
  def putirka2008_22(m: CompCtx, offset: Double = 0.0): E = {
    val a = m.anhydrous
    val pGPa = C("P_bar") / Lit(1e4)
    val lnDMg = ln(
      (Lit(0.666) - sumAll(beattie.map { case (c, _, b) => a.cat(c) * Lit(b): E })) /
        sumAll(beattie.map { case (c, va, _) => a.cat(c) * Lit(va): E }))
    val cNM = sumAll(Seq("Fe", "Mn", "Mg", "Ca", "Co", "Ni").map(a.cat(_): E))
    val nf = Lit(7.0 / 2.0) * ln(Lit(1.0) - a.cat("Al")) +
      Lit(7.0) * ln(Lit(1.0) - a.cat("Ti"))
    (Lit(15294.6) + Lit(1318.8) * pGPa + Lit(2.4834) * pGPa * pGPa) /
      (Lit(8.048) + Lit(2.8352) * lnDMg + Lit(2.097) * ln(Lit(1.5) * cNM) +
        Lit(2.575) * ln(Lit(3.0) * a.cat("Si")) - Lit(1.41) * nf +
        Lit(0.222) * m.wt("H2O") + Lit(0.5) * pGPa) +
      Lit(273.15) + Lit(errors("putirka2008_22") * offset)
  }

  /** Eq. 6, Sun & Dasgupta (2020) (`thermometers/melt.py:428-486`).
    * Cation-moles-per-unit-oxygen terms on the volatile-free composition. */
  def sun2020(m: CompCtx, offset: Double = 0.0): E = {
    val vf = m.volatileFree
    val pGPa = C("P_bar") / Lit(1e4)
    def uo(ox: String): E = vf.catPerOxygen(ox)
    val omega = Lit(2.59) +
      Lit(3.5) * (uo("CaO") - Lit(2.0) * uo("K2O")) +
      Lit(4.85) * uo("TiO2") +
      Lit(1.4) * (uo("MgO") / (uo("MgO") + uo("FeO"))) +
      Lit(0.5) * uo("MgO") * sqrt(m.wt("CO2")) +
      Lit(5.7e-2) * m.wt("H2O")
    Lit(1e4) / (omega - Lit(0.34) * sqrt(pGPa) - Lit(1.26) * ln(uo("MgO"))) +
      Lit(errors("sun2020") * offset)
  }

  /** Eq. 1, Shea (2022) (`thermometers/melt.py:489-521`). */
  def shea2022(m: CompCtx, offset: Double = 0.0): E =
    Lit(21.2) * m.wt("MgO") + Lit(1017.0) + Lit(273.15) +
      Lit(errors("shea2022") * offset)

  /** Eq. 3 + 7a, Sugawara (2000) (`thermometers/melt.py:524-567`).
    * Anhydrous-normalised mole PERCENT MgO; H2O correction from full moles. */
  def sugawara2000_3(m: CompCtx, offset: Double = 0.0): E = {
    val a = m.anhydrous
    val base = Lit(1293.0) + Lit(14.60) * (a.molNorm("MgO") * Lit(100.0)) +
      Lit(5.5e-3) * C("P_bar")
    val t = if (m.has("H2O")) base - Lit(5.403) * m.molNorm("H2O") * Lit(100.0) else base
    t + Lit(errors("sugawara2000_3") * offset)
  }

  /** Eq. 6a + 7a, Sugawara (2000) (`thermometers/melt.py:570-616`). */
  def sugawara2000_6a(m: CompCtx, offset: Double = 0.0): E = {
    val a = m.anhydrous
    def mp(e: String): E = a.molNorm(e) * Lit(100.0)
    val base = Lit(1466.0) - Lit(1.44) * mp("SiO2") - Lit(0.5) * mp("FeO") +
      Lit(12.32) * mp("MgO") - Lit(3.899) * mp("CaO") + Lit(4.3e-3) * C("P_bar")
    val t = if (m.has("H2O")) base - Lit(5.403) * m.molNorm("H2O") * Lit(100.0) else base
    t + Lit(errors("sugawara2000_6a") * offset)
  }

  /** Registry (reference collects by reflection, `melt.py:619-624`).
    * Every entry takes `(ctx, offset)` so the `offset_SEE` shift of
    * `melt.py:104` (T + offset·SEE) is reachable through the public API. */
  val all: Map[String, (CompCtx, Double) => E] = Map(
    "putirka2008_13" -> (putirka2008_13(_, _)),
    "putirka2008_14" -> (putirka2008_14(_, _)),
    "putirka2008_15" -> (putirka2008_15(_, _)),
    "putirka2008_16" -> (putirka2008_16(_, _)),
    "putirka2008_22" -> (putirka2008_22(_, _)),
    "sun2020" -> (sun2020(_, _)),
    "shea2022" -> (shea2022(_, _)),
    "sugawara2000_3" -> (sugawara2000_3(_, _)),
    "sugawara2000_6a" -> (sugawara2000_6a(_, _)))
}
