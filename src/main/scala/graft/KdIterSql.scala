package graft

import graft.expr.{C, E}
import graft.models.{CompCtx, Fe3Fe2, Fo2Buffers, Kd}

/** DuckDB oracle renderings of the three iterative olivine-melt Kd queries
  * (`q_kd_toplis2005_iterative`, `q_kd_blundy2020`, `q_kd_saper2022`).
  *
  * All three share the reference's Kd <-> equilibrium-Fo fixed point
  * (`Kd_iterate.py:31-100`, mirrored by `Kd.iterateKdFo`): Kd from Fo,
  * equilibrium Fo from Kd, repeat while the relative Fo step exceeds 1e-3
  * (max 100 rounds). The loop is deterministic straight-line IEEE
  * arithmetic, so it renders as a recursive CTE whose per-row transition
  * replicates the Scala operation-for-operation; the row's answer is the
  * last state it emitted (rows leave the working table exactly when the
  * Scala loop exits). Same dual-compilation discipline as [[ShishkinaSql]].
  */
object KdIterSql {

  private val R = Kd.R

  private def lit(v: Double): String = E.formatDouble(v)

  /** Shared harness: `consts` are per-row constant columns for the `inp`
    * CTE (rendered with DuckDB lateral aliases — later entries may
    * reference earlier names); `kdAt(fo)` is the kernel SQL; `f2mCol` names
    * the fe2/Mg liquid-ratio column among `consts`. */
  private def harness(consts: Seq[(String, String)], kdAt: String => String,
                      f2mCol: String): String = {
    val meltCols = Tables.meltSource.cols
      .map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")
    val carry = (Seq("\"T_K\"", "\"P_bar\"") ++ consts.map(_._1)).mkString(", ")
    val inpSel = (Seq("\"sample_id\"", "\"T_K\"", "\"P_bar\"") ++
      consts.map { case (n, s) => s"$s AS $n" }).mkString(", ")
    // seed: foInit = 0.85, kd = kdAt(0.85), foEq = 1/(1 + kd*f2m),
    // delta = |foInit - foEq| / foInit  (Kd_iterate.py:55-60)
    val seed =
      s"""SELECT "sample_id", 0 AS n, 0.85e0 AS foi, ${kdAt("0.85e0")} AS kd,
         | (1.0e0 / (1.0e0 + (kd * $f2mCol))) AS foe,
         | (abs((0.85e0 - foe)) / 0.85e0) AS delta, $carry FROM inp""".stripMargin
    // step: kd' = kdAt(foi); foi' = foe; foe' = 1/(1 + kd'*f2m);
    // delta' = |foi' - foe'| / foi'  (Kd_iterate.py:61-67)
    val step =
      s"""SELECT "sample_id", (n + 1) AS n2, foe AS foi2, ${kdAt("foi")} AS kd2,
         | (1.0e0 / (1.0e0 + (kd2 * $f2mCol))) AS foe2,
         | (abs((foi2 - foe2)) / foi2) AS delta2, $carry
         | FROM it WHERE delta > 0.001e0 AND n < 100""".stripMargin
    s"""WITH RECURSIVE
       | m AS (SELECT $meltCols FROM lineitem),
       | inp AS (SELECT $inpSel FROM m),
       | it AS ($seed UNION ALL $step),
       | fin AS (SELECT "sample_id", kd FROM it
       |   QUALIFY row_number() OVER (PARTITION BY "sample_id" ORDER BY n DESC) = 1)
       | SELECT i."sample_id", round(f.kd, 6) AS "Kd"
       | FROM inp i JOIN fin f USING ("sample_id")
       | ORDER BY "sample_id"""".stripMargin.replace("\n", " ")
  }

  private val mctx = CompCtx(Tables.meltElements)
  private def molSql(ox: String): String = E.toSql(mctx.molNorm(ox))

  /** fe2MgLiquid = feOmol * (1/(1+Fe3Fe2)) / mgOmol with the op order of
    * `Kd.iterateKdFo` (fe * f2t, then / mg). */
  private def f2m(fe3fe2Sql: String): String =
    s"((${molSql("FeO")} * (1.0e0 / (1.0e0 + $fe3fe2Sql))) / ${molSql("MgO")})"

  /** toplis2005 (`Kd_models.py:185-215` via `Kd.toplisIterate`): phi/sio2A
    * are fo-independent, so the ln and pressure terms hoist into per-row
    * constants; only the 3000(1-2Fo)/RT term iterates. fe3fe2 fixed 0.2,
    * matching the registered query. */
  val toplis2005: String = {
    val rl = lit(R)
    val consts = Seq(
      "si" -> s"(${molSql("SiO2")} * 100.0e0)",
      "na" -> s"(${molSql("Na2O")} * 100.0e0)",
      "k2" -> s"(${molSql("K2O")} * 100.0e0)",
      "h2" -> s"(${molSql("H2O")} * 100.0e0)",
      "phi" -> ("""(CASE WHEN si > 60.0e0
        | THEN ((11.0e0 - (5.5e0 * (100.0e0 / (100.0e0 - si)))) * exp((-0.31e0) * (na + k2)))
        | ELSE ((((0.46e0 * (100.0e0 / (100.0e0 - si))) - 0.93e0) * (na + k2)) +
        |   (((-5.33e0) * (100.0e0 / (100.0e0 - si))) + 9.69e0)) END)"""
        .stripMargin.replace("\n", " ")),
      "sioa" -> "((si + (phi * (na + k2))) + (0.8e0 * h2))",
      "rt" -> s"($rl * \"T_K\")",
      // ((-6766/RT - 7.34/R) + ln(0.036*sio2A - 0.22)): the fo-independent
      // prefix of the exp argument, grouped exactly as the Scala sum
      "bs" -> s"""((((-6766.0e0) / rt) - (7.34e0 / $rl)) + ln((0.036e0 * sioa) - 0.22e0))""",
      "pt" -> "((0.035e0 * (\"P_bar\" - 1.0e0)) / rt)",
      "f2m" -> f2m("0.2e0"))
    harness(consts,
      fo => s"exp(((bs + ((3000.0e0 * (1.0e0 - (2.0e0 * $fo))) / rt)) + pt))",
      "f2m")
  }

  /** blundy2020 (`Kd_models.py:271-419` via `Kd.blundy2020Iterate`):
    * Kd = 0.3642 exp(312.7(1-2Fo)/T); Fe3Fe2 forced to borisov2018 at
    * QFM+0 1-bar fO2, the same expression the Spark side feeds the UDF. */
  val blundy2020: String = {
    val borisov = E.toSql(
      Fe3Fe2.borisov2018(mctx, C("T_K"), Fo2Buffers.qfm1bar(C("T_K"))))
    harness(
      Seq("ff" -> borisov, "f2m" -> f2m("ff")),
      fo => s"""(0.3642e0 * exp(((312.7e0 * (1.0e0 - (2.0e0 * $fo))) / "T_K")))""",
      "f2m")
  }

  /** saper2022 (`Kd_models.py:655-752` via `Kd.saper2022Iterate`): Gibbs +
    * cation interaction terms hoist to a per-row constant prefix; fe3fe2
    * fixed 0.2, matching the registered query. */
  val saper2022: String = {
    val rl = lit(R)
    val consts = Seq(
      "csi" -> E.toSql(mctx.cat("Si")),
      "cti" -> E.toSql(mctx.cat("Ti")),
      "cnk" -> E.toSql(mctx.cat("Na") + mctx.cat("K")),
      "rt" -> s"($rl * \"T_K\")",
      // ((-6766 - 7.34T)/RT + 1.0445Si) - 1.3125Ti) - 3.0550*Si*NaK: the
      // fo-independent prefix, grouped as the Scala sum
      "bs" -> ("""(((((((-6766.0e0) - (7.34e0 * "T_K")) / rt) +
        | (1.0445e0 * csi)) - (1.3125e0 * cti)) -
        | ((3.055e0 * csi) * cnk)))""".stripMargin.replace("\n", " ")),
      "f2m" -> f2m("0.2e0"))
    harness(consts,
      fo => s"exp((bs + ((3040.0e0 * (1.0e0 - (2.0e0 * $fo))) / rt)))",
      "f2m")
  }
}
