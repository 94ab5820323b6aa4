package graft

import graft.chem.Elements
import graft.expr.E
import graft.functions.IaconoMarziano

/** DuckDB oracle rendering of `q_solubility_mixed`: Iacono-Marziano (2012)
  * dissolved H2O and CO2 at the in-table (P, T) and x_fluid = 0.5.
  *
  * Dissolved H2O is an inner fixed point (the hydrous parameterisation
  * feeds H2O back into NBO/O); the engine solves it by secant from (1, 2)
  * with a fixed-step bisection fallback
  * (`functions/IaconoMarziano.h2oSolubility`). Both solver paths are
  * deterministic straight-line IEEE arithmetic, so they render as recursive
  * CTEs replicating the Scala operation-for-operation — including the
  * secant's exit conditions (|f| <= 1e-10, 100 rounds, zero denominator,
  * NaN-guarded exactly like Java comparison semantics, where NaN > x is
  * false but DuckDB sorts NaN greater). CO2 then evaluates in closed form
  * from the solved H2O. Same dual-compilation discipline as
  * [[ShishkinaSql]] / [[KdIterSql]] / [[Fe3Fe2IterSql]].
  */
object SolubilitySql {

  private def lit(v: Double): String = E.formatDouble(v)

  private def mole(ox: String): String =
    s"(\"$ox\" / ${lit(Elements.chemicalWeight(ox).get)})"

  private val WH = lit(Elements.chemicalWeight("H2O").get)

  /** f(h) = h - exp(A ln(pH2O) + B NBO/O(h) + BB + C P/T), referencing the
    * lateral aliases lnp, ct, nbo0, o0 (`IaconoMarziano.h2oSolubilityAt`).
    * Fe2O3 terms vanish for the melt schema (adding +0.0 is bitwise
    * identity), so the accumulators omit them. */
  private def fSql(h: String): String = {
    val nbo = s"((nbo0 + (2.0e0 * ($h / $WH))) / (o0 + ($h / $WH)))"
    s"($h - exp((((${lit(IaconoMarziano.h2oA)} * lnp) + " +
      s"(${lit(IaconoMarziano.h2oB)} * $nbo)) + (${lit(IaconoMarziano.h2oBB)})) + ct))"
  }

  val sql: String = {
    val meltCols = Tables.meltSource.cols
      .map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")
    // prepare(): anhydrous mole accumulators in input (melt-schema) order
    val tot0 = Tables.meltElements.filter(_ != "H2O").map(mole)
      .reduce((l, r) => s"($l + $r)")
    val nbo0 = s"(2.0e0 * ((((((${mole("K2O")} + ${mole("Na2O")}) + ${mole("CaO")}) + " +
      s"${mole("MgO")}) + ${mole("FeO")}) - ${mole("Al2O3")})))"
    val o0 = s"((((((((2.0e0 * ${mole("SiO2")}) + (2.0e0 * ${mole("TiO2")})) + " +
      s"(3.0e0 * ${mole("Al2O3")})) + ${mole("MgO")}) + ${mole("FeO")}) + " +
      s"${mole("CaO")}) + ${mole("Na2O")}) + ${mole("K2O")})"
    val secCarry = "lnp, ct, nbo0, o0"
    val co2Body = {
      val terms = Seq(
        s"(xh * (${lit(IaconoMarziano.co2DH2O)}))",
        s"(xai * ${lit(IaconoMarziano.co2DAI)})",
        s"(xfm * (${lit(IaconoMarziano.co2DFM)}))",
        s"(xnk * ${lit(IaconoMarziano.co2DNK)})",
        s"(${lit(IaconoMarziano.co2A)} * ln(pco2))",
        s"(${lit(IaconoMarziano.co2B)} * nbo2)",
        s"(${lit(IaconoMarziano.co2BB)})",
        "((" + lit(IaconoMarziano.co2C) + " * \"P_bar\") / \"T_K\")")
      terms.reduce((l, r) => s"($l + $r)")
    }
    s"""WITH RECURSIVE
       | m AS (SELECT $meltCols FROM lineitem),
       | inp AS (SELECT "sample_id", "T_K", "P_bar",
       |   $tot0 AS tot0, $nbo0 AS nbo0, $o0 AS o0,
       |   ${mole("Al2O3")} AS mal,
       |   ((${mole("CaO")} + ${mole("Na2O")}) + ${mole("K2O")}) AS mcnk,
       |   (${mole("FeO")} + ${mole("MgO")}) AS mfm,
       |   (${mole("Na2O")} + ${mole("K2O")}) AS mnk,
       |   ln((0.5e0 * "P_bar")) AS lnp,
       |   ((${lit(IaconoMarziano.h2oC)} * "P_bar") / "T_K") AS ct,
       |   ${fSql("1.0e-12")} AS flo, ${fSql("1.0e4")} AS fhi
       |   FROM m),
       | sec AS (
       |   SELECT "sample_id", 0 AS n, 1.0e0 AS a, ${fSql("1.0e0")} AS fa,
       |     2.0e0 AS b, ${fSql("2.0e0")} AS fb, $secCarry FROM inp
       |   UNION ALL
       |   SELECT "sample_id", n + 1, b AS a2, fb AS fa2,
       |     (b - ((fb * (b - a)) / (fb - fa))) AS b2, ${fSql("b2")} AS fb2,
       |     $secCarry
       |   FROM sec WHERE abs(fb) > 1.0e-10 AND (NOT isnan(fb)) AND n < 100
       |     AND (fb - fa) <> 0.0e0),
       | sfin AS (SELECT "sample_id", b, fb FROM sec
       |   QUALIFY row_number() OVER (PARTITION BY "sample_id" ORDER BY n DESC) = 1),
       | acc AS (SELECT "sample_id", b,
       |   (isfinite(b) AND (b >= 0.0e0) AND (abs(fb) < 1.0e-6)) AS ok FROM sfin),
       | bseed AS (SELECT DISTINCT i."sample_id", i.lnp, i.ct, i.nbo0, i.o0
       |   FROM inp i JOIN acc USING ("sample_id")
       |   WHERE (NOT acc.ok) AND (i.flo < 0.0e0) AND isfinite(i.fhi)
       |     AND (i.fhi > 0.0e0)),
       | bis AS (
       |   SELECT "sample_id", 0 AS it, 1.0e-12 AS lo, 1.0e4 AS hi, $secCarry
       |   FROM bseed
       |   UNION ALL
       |   SELECT "sample_id", it + 1,
       |     CASE WHEN fm < 0.0e0 THEN mid ELSE lo END,
       |     CASE WHEN fm < 0.0e0 THEN hi ELSE mid END, $secCarry
       |   FROM (SELECT "sample_id", it, lo, hi, $secCarry,
       |           ((lo + hi) * 0.5e0) AS mid, ${fSql("mid")} AS fm
       |         FROM bis WHERE it < 60) t),
       | broots AS (SELECT "sample_id", ((lo + hi) * 0.5e0) AS root FROM bis
       |   WHERE it = 60),
       | fin AS (SELECT i."sample_id", i."P_bar", i."T_K",
       |   CASE WHEN i."P_bar" <= 0.0e0 THEN 0.0e0
       |        WHEN a.ok THEN a.b
       |        WHEN (NOT ((i.flo < 0.0e0) AND isfinite(i.fhi) AND (i.fhi > 0.0e0)))
       |          THEN 'NaN'::DOUBLE
       |        ELSE r.root END AS h2o,
       |   (h2o / $WH) AS hm, (i.tot0 + hm) AS tot,
       |   (0.5e0 * i."P_bar") AS pco2,
       |   (i.mal / i.mcnk) AS xai, (i.mfm / tot) AS xfm, (i.mnk / tot) AS xnk,
       |   (hm / tot) AS xh,
       |   ((i.nbo0 + (2.0e0 * hm)) / (i.o0 + hm)) AS nbo2
       |   FROM inp i JOIN acc a USING ("sample_id")
       |   LEFT JOIN broots r USING ("sample_id"))
       | SELECT "sample_id", round(h2o, 6) AS "H2O_dissolved",
       |   round(CASE WHEN "P_bar" <= 0.0e0 THEN 0.0e0
       |              ELSE (exp($co2Body) / 10000.0e0) END, 6) AS "CO2_dissolved"
       | FROM fin ORDER BY "sample_id"""".stripMargin.replace("\n", " ")
  }
}
