package graft

import graft.functions.{IaconoMarziano => IM}
import ImSolveSql._

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
  * from the solved H2O. The chain lives in [[ImSolveSql]], shared with
  * [[IsobarSql]].
  */
object SolubilitySql {

  val sql: String = {
    val key = Seq("\"sample_id\"")
    s"""WITH RECURSIVE
       | m AS (SELECT $meltCols FROM lineitem),
       | inp AS (SELECT "sample_id", "T_K", "P_bar",
       |   $tot0 AS tot0, $nbo0 AS nbo0, $o0 AS o0,
       |   ${mole("Al2O3")} AS mal,
       |   ((${mole("CaO")} + ${mole("Na2O")}) + ${mole("K2O")}) AS mcnk,
       |   (${mole("FeO")} + ${mole("MgO")}) AS mfm,
       |   (${mole("Na2O")} + ${mole("K2O")}) AS mnk,
       |   ln((0.5e0 * "P_bar")) AS lnp,
       |   ((${lit(IM.h2oC)} * "P_bar") / "T_K") AS ct,
       |   ${fSql("1.0e-12")} AS flo, ${fSql("1.0e4")} AS fhi
       |   FROM m),
       |${chain(key, "TRUE")},
       | fin AS (SELECT i."sample_id", i."P_bar", i."T_K",
       |   ${solvedH2o("i.\"P_bar\" <= 0.0e0")} AS h2o,
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
