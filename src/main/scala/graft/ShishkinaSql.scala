package graft

import graft.chem.Elements
import graft.expr.E

/** DuckDB oracle rendering of `q_saturation_shishkina`.
  *
  * Shishkina et al. (2014) is the one solubility model whose mixed-fluid
  * saturation decouples exactly into per-species partial pressures
  * (`functions/Shishkina.mixedSaturation`): CO2 inverts in closed form and
  * the H2O law is a cubic in the H2O partial pressure, solved by 60 FIXED
  * bisection steps — straight-line IEEE arithmetic with no convergence
  * branches. This object replicates that arithmetic operation-for-operation
  * in DuckDB SQL (bisection as a depth-60 recursive CTE), so the query is a
  * full hash-match instead of a rows-only check. Every literal is rendered
  * with [[E.formatDouble]] (e-notation => DOUBLE typing) and every
  * sum/product keeps the Scala evaluation order, the same dual-compilation
  * discipline as `ext/DualHash`.
  */
object ShishkinaSql {

  private def lit(v: Double): String = E.formatDouble(v)

  /** Cation-mole term for one oxide: (wt / W) * nCations — the op order of
    * `Shishkina.anhydrousCations`. */
  private def mole(ox: String): String =
    s"((\"$ox\" / ${lit(Elements.chemicalWeight(ox).get)}) * ${lit(Elements.cationAmount(ox))})"

  private val anhydrous: Seq[String] =
    Tables.meltElements.filter(ox => ox != "H2O" && ox != "CO2")

  private def oxideOf(cation: String): String =
    anhydrous.find(ox => Elements.cationName(ox) == cation).get

  /** Anhydrous cation fraction of `cation`, referencing the lateral alias
    * `tot`. */
  private def frac(cation: String): String = s"(${mole(oxideOf(cation))} / tot)"

  /** h2oSolubilityB(b, 1, p) with fH2O already substituted as `f`:
    * a*b + cc with a, cc in the exact Scala association order. */
  private def solSql(f: String, b: String): String = {
    val a = s"((((3.36e-7 * (($f * $f) * $f)) - ((2.33e-4 * $f) * $f)) + (0.0711e0 * $f)) - 1.1309e0)"
    val cc = s"(((((-1.2e-5) * $f) * $f) + (0.0196e0 * $f)) + 1.1297e0)"
    s"(($a * $b) + $cc)"
  }

  val sql: String = {
    val meltCols = Tables.meltSource.cols
      .map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")
    val totExpr = anhydrous.map(mole).reduce((l, r) => s"($l + $r)")
    val bExpr = s"(${frac("Na")} + ${frac("K")})"
    val piExpr = s"(((((${frac("Ca")} + (0.8e0 * ${frac("K")})) + " +
      s"(0.7e0 * ${frac("Na")})) + (0.4e0 * ${frac("Mg")})) + " +
      s"(0.4e0 * ${frac("Fe")})) / (${frac("Si")} + ${frac("Al")}))"
    // xFluid = 1: fH2O = (1.0 * p) / 10.0 == p / 10.0 bitwise
    val ghi = s"(h2o - ${solSql("1500.0e0", "b")})" // f(1.5e4 bar) = 1500 MPa
    // co2Saturation at xFluid = 0 divides by (1.0 - 0.0) = 1.0 — a bitwise
    // no-op, omitted
    val pco2 =
      "(exp(((ln((co2 * 1.0e4)) + 1.345e0) - (6.71e0 * pi)) / 1.15e0) * 10.0e0)"
    val nanCase = "WHEN (NOT isfinite(ph2o)) OR (NOT isfinite(pco2)) THEN 'NaN'::DOUBLE"
    s"""WITH RECURSIVE
       | m AS (SELECT $meltCols FROM lineitem),
       | base AS (SELECT "sample_id", "H2O" AS h2o, "CO2" AS co2,
       |   $totExpr AS tot, $bExpr AS b, $piExpr AS pi FROM m),
       | g0 AS (SELECT *, ((-1.1309e0 * b) + 1.1297e0) AS sol0, $ghi AS ghi FROM base),
       | bis AS (
       |   SELECT "sample_id", 0 AS it, 1.0e-15 AS lo, 1.5e4 AS hi, h2o, b
       |   FROM g0 WHERE h2o <> 0.0e0 AND h2o >= sol0 AND ghi <= 0.0e0
       |   UNION ALL
       |   SELECT "sample_id", it + 1,
       |     CASE WHEN g > 0.0e0 THEN mid ELSE lo END,
       |     CASE WHEN g > 0.0e0 THEN hi ELSE mid END, h2o, b
       |   FROM (SELECT "sample_id", it, lo, hi, h2o, b,
       |           ((lo + hi) * 0.5e0) AS mid, (mid / 10.0e0) AS fh,
       |           (h2o - ${solSql("fh", "b")}) AS g
       |         FROM bis WHERE it < 60) t),
       | roots AS (SELECT DISTINCT "sample_id", ((lo + hi) * 0.5e0) AS root
       |   FROM bis WHERE it = 60),
       | sat AS (SELECT g0."sample_id", h2o, co2,
       |   CASE WHEN h2o = 0.0e0 THEN 0.0e0
       |        WHEN h2o < sol0 THEN 'NaN'::DOUBLE
       |        WHEN ghi > 0.0e0 THEN 'NaN'::DOUBLE
       |        ELSE r.root END AS ph2o,
       |   CASE WHEN co2 = 0.0e0 THEN 0.0e0 ELSE $pco2 END AS pco2
       |   FROM g0 LEFT JOIN roots r USING ("sample_id"))
       | SELECT "sample_id",
       |   round(CASE WHEN h2o <= 0.0e0 THEN pco2
       |              WHEN co2 <= 0.0e0 THEN ph2o
       |              $nanCase
       |              ELSE (ph2o + pco2) END, 4) AS "P_sat_bar",
       |   round(CASE WHEN h2o <= 0.0e0 THEN 0.0e0
       |              WHEN co2 <= 0.0e0 THEN 1.0e0
       |              $nanCase
       |              ELSE (ph2o / (ph2o + pco2)) END, 6) AS "X_fluid"
       | FROM sat ORDER BY "sample_id"""".stripMargin.replace("\n", " ")
  }
}
