package graft

import graft.functions.{IaconoMarziano => IM}
import ImSolveSql._

/** DuckDB oracle rendering of `q_isobars`: Iacono-Marziano dissolved H2O /
  * CO2 over the (P grid x x_fluid grid) cross product for the sampled
  * compositions — the same secant + bisection-fallback fixed point as
  * [[SolubilitySql]] ([[ImSolveSql.chain]]), keyed by (sample, P, x) grid
  * cell, with the x <= 0 / x >= 1 species zero cases CASE-resolved exactly
  * as the Scala early returns. The CTE body is parameterised on both grids
  * so [[IsobarCurveSql]] reuses it for the denser curve-assembly lattice.
  */
object IsobarSql {

  /** CTE list (no WITH keyword) from the melt scan through `pts`:
    * (sample_id, pg, xf, h2o, co2) per grid cell, values unrounded. */
  private[graft] def cellCtes(pGrid: Seq[Double], xGrid: Seq[Double]): String = {
    val key = Seq("\"sample_id\"", "pg", "xf")
    val k = key.mkString(", ")
    val ps = pGrid.map(lit).mkString(", ")
    val xs = xGrid.map(lit).mkString(", ")
    s""" m AS (SELECT $meltCols FROM lineitem),
       | fm AS (SELECT * FROM m WHERE ("sample_id" % 997) = 3),
       | inp AS (SELECT "sample_id", "T_K", pg, xf,
       |   $tot0 AS tot0, $nbo0 AS nbo0, $o0 AS o0,
       |   ${mole("Al2O3")} AS mal,
       |   ((${mole("CaO")} + ${mole("Na2O")}) + ${mole("K2O")}) AS mcnk,
       |   (${mole("FeO")} + ${mole("MgO")}) AS mfm,
       |   (${mole("Na2O")} + ${mole("K2O")}) AS mnk,
       |   (CASE WHEN (xf * pg) = 0.0e0 THEN '-Infinity'::DOUBLE
       |         ELSE ln((xf * pg)) END) AS lnp,
       |   ((${lit(IM.h2oC)} * pg) / "T_K") AS ct,
       |   ${fSql("1.0e-12")} AS flo, ${fSql("1.0e4")} AS fhi
       |   FROM fm
       |   CROSS JOIN (SELECT unnest([$ps]) AS pg) gp
       |   CROSS JOIN (SELECT unnest([$xs]) AS xf) gx),
       |${chain(key, "pg > 0.0e0 AND xf > 0.0e0")},
       | fin AS (SELECT i."sample_id", i.pg, i.xf, i."T_K",
       |   ${solvedH2o("(i.pg <= 0.0e0) OR (i.xf <= 0.0e0)")} AS h2o,
       |   (h2o / $WH) AS hm, (i.tot0 + hm) AS tot,
       |   (((1.0e0 - i.xf)) * i.pg) AS pco2,
       |   (i.mal / i.mcnk) AS xai, (i.mfm / tot) AS xfm, (i.mnk / tot) AS xnk,
       |   (hm / tot) AS xh,
       |   ((i.nbo0 + (2.0e0 * hm)) / (i.o0 + hm)) AS nbo2
       |   FROM inp i LEFT JOIN acc a USING ($k)
       |   LEFT JOIN broots r USING ($k)),
       | pts AS (SELECT "sample_id", pg, xf, h2o,
       |   CASE WHEN (pg <= 0.0e0) OR ((1.0e0 - xf) <= 0.0e0) THEN 0.0e0
       |        ELSE (exp(${co2BodyAt("pg", "\"T_K\"")}) / 10000.0e0)
       |   END AS co2 FROM fin)""".stripMargin
  }

  val sql: String =
    (s"""WITH RECURSIVE
        |${cellCtes((1 to 5).map(_ * 1000.0), (0 to 4).map(_ * 0.25))}
        | SELECT "sample_id", pg AS "P_grid", xf AS "x_fluid",
        |   round(h2o, 6) AS "H2O", round(co2, 6) AS "CO2"
        | FROM pts ORDER BY "sample_id", "P_grid", "x_fluid"""").stripMargin
      .replace("\n", " ")
}
