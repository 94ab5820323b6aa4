package graft

import graft.chem.Elements
import graft.expr.E
import graft.functions.{IaconoMarziano => IM}

/** Shared DuckDB renderings of the Iacono-Marziano dissolved-H2O fixed
  * point (secant from (1,2) + fixed-step bisection fallback,
  * `functions/IaconoMarziano.h2oSolubility`) — the common core of
  * [[SolubilitySql]] (in-table P, T at x = 0.5) and [[IsobarSql]]
  * (P x x_fluid grid). The chain is keyed by an arbitrary column list so
  * the same rendering serves both per-sample and per-grid-cell solves.
  */
private[graft] object ImSolveSql {

  def lit(v: Double): String = E.formatDouble(v)

  def mole(ox: String): String =
    s"(\"$ox\" / ${lit(Elements.chemicalWeight(ox).get)})"

  val WH: String = lit(Elements.chemicalWeight("H2O").get)

  val meltCols: String = Tables.meltSource.cols
    .map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")

  /** prepare(): anhydrous mole accumulators in melt-schema order (Fe2O3
    * terms vanish; +0.0 is bitwise identity). */
  val tot0: String = Tables.meltElements.filter(_ != "H2O").map(mole)
    .reduce((l, r) => s"($l + $r)")
  val nbo0: String =
    s"(2.0e0 * ((((((${mole("K2O")} + ${mole("Na2O")}) + ${mole("CaO")}) + " +
      s"${mole("MgO")}) + ${mole("FeO")}) - ${mole("Al2O3")})))"
  val o0: String =
    s"((((((((2.0e0 * ${mole("SiO2")}) + (2.0e0 * ${mole("TiO2")})) + " +
      s"(3.0e0 * ${mole("Al2O3")})) + ${mole("MgO")}) + ${mole("FeO")}) + " +
      s"${mole("CaO")}) + ${mole("Na2O")}) + ${mole("K2O")})"

  /** f(h) = h - exp(A ln(pH2O) + B NBO/O(h) + BB + ct), referencing the
    * lateral aliases lnp, ct, nbo0, o0. */
  def fSql(h: String): String = {
    val nbo = s"((nbo0 + (2.0e0 * ($h / $WH))) / (o0 + ($h / $WH)))"
    s"($h - exp((((${lit(IM.h2oA)} * lnp) + " +
      s"(${lit(IM.h2oB)} * $nbo)) + (${lit(IM.h2oBB)})) + ct))"
  }

  /** Eq. 12 carbonate exponent body, referencing lateral aliases xh, xai,
    * xfm, xnk, pco2, nbo2 (`IaconoMarziano.co2Solubility` sum order);
    * `p`/`t` name the pressure/temperature columns. */
  def co2BodyAt(p: String, t: String): String = Seq(
    s"(xh * (${lit(IM.co2DH2O)}))",
    s"(xai * ${lit(IM.co2DAI)})",
    s"(xfm * (${lit(IM.co2DFM)}))",
    s"(xnk * ${lit(IM.co2DNK)})",
    s"(${lit(IM.co2A)} * ln(pco2))",
    s"(${lit(IM.co2B)} * nbo2)",
    s"(${lit(IM.co2BB)})",
    s"((${lit(IM.co2C)} * $p) / $t)")
    .reduce((l, r) => s"($l + $r)")

  val co2Body: String = co2BodyAt("\"P_bar\"", "\"T_K\"")

  /** The secant + acceptance + bisection-fallback CTE chain over an `inp`
    * CTE that must provide `keys` plus lnp, ct, nbo0, o0, flo, fhi and a
    * `seedCond` selecting rows that actually solve (P > 0, x > 0 — others
    * are CASE-resolved downstream). Emits CTEs sec/sfin/acc/bseed/bis/
    * broots; the caller joins acc + broots on `keys` and applies
    * [[solvedH2o]]. */
  def chain(keys: Seq[String], seedCond: String): String = {
    val k = keys.mkString(", ")
    val carry = "lnp, ct, nbo0, o0"
    s""" sec AS (
       |   SELECT $k, 0 AS n, 1.0e0 AS a, ${fSql("1.0e0")} AS fa,
       |     2.0e0 AS b, ${fSql("2.0e0")} AS fb, $carry FROM inp
       |   WHERE $seedCond
       |   UNION ALL
       |   SELECT $k, n + 1, b AS a2, fb AS fa2,
       |     (b - ((fb * (b - a)) / (fb - fa))) AS b2, ${fSql("b2")} AS fb2,
       |     $carry
       |   FROM sec WHERE abs(fb) > 1.0e-10 AND (NOT isnan(fb)) AND n < 100
       |     AND (fb - fa) <> 0.0e0),
       | sfin AS (SELECT $k, b, fb FROM sec
       |   QUALIFY row_number() OVER (PARTITION BY $k ORDER BY n DESC) = 1),
       | acc AS (SELECT $k, b,
       |   (isfinite(b) AND (b >= 0.0e0) AND (abs(fb) < 1.0e-6)) AS ok FROM sfin),
       | bseed AS (SELECT DISTINCT ${keys.map("i." + _).mkString(", ")},
       |     i.lnp, i.ct, i.nbo0, i.o0
       |   FROM inp i JOIN acc USING ($k)
       |   WHERE ($seedCond) AND (NOT acc.ok) AND (i.flo < 0.0e0)
       |     AND isfinite(i.fhi) AND (i.fhi > 0.0e0)),
       | bis AS (
       |   SELECT $k, 0 AS it, 1.0e-12 AS lo, 1.0e4 AS hi, $carry
       |   FROM bseed
       |   UNION ALL
       |   SELECT $k, it + 1,
       |     CASE WHEN fm < 0.0e0 THEN mid ELSE lo END,
       |     CASE WHEN fm < 0.0e0 THEN hi ELSE mid END, $carry
       |   FROM (SELECT $k, it, lo, hi, $carry,
       |           ((lo + hi) * 0.5e0) AS mid, ${fSql("mid")} AS fm
       |         FROM bis WHERE it < 60) t),
       | broots AS (SELECT $k, ((lo + hi) * 0.5e0) AS root FROM bis
       |   WHERE it = 60)""".stripMargin
  }

  /** The solved dissolved-H2O value: `zeroCond` mirrors the Scala early
    * return (pBar <= 0 || xFluid <= 0 -> 0.0); references the joined
    * aliases a (acc) and r (broots) plus inp's flo/fhi. */
  def solvedH2o(zeroCond: String): String =
    s"""CASE WHEN $zeroCond THEN 0.0e0
       |     WHEN a.ok THEN a.b
       |     WHEN (NOT ((flo < 0.0e0) AND isfinite(fhi) AND (fhi > 0.0e0)))
       |       THEN 'NaN'::DOUBLE
       |     ELSE r.root END""".stripMargin.replace("\n", " ")
}
