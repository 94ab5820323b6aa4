package graft

import graft.chem.Elements
import graft.expr.{C, E}
import graft.models.Fo2Buffers

/** DuckDB oracle renderings of the fixed-point Fe3+/Fe2+ queries
  * (`q_fe3fe2_oneill2006_iterative`, `q_fe3fe2_armstrong2019_iterative`).
  *
  * Both models solve r = f(r) where only the Fe2-Fe3 redistribution term
  * depends on r (`functions/Fe3Fe2Iterative`); the engine's solver is 60
  * fixed bisection steps, rendered here as a depth-60 recursive CTE with
  * the per-row constants (cation polynomial, pressure terms, fO2) hoisted
  * into the seed — the same dual-compilation discipline as [[ShishkinaSql]]
  * and [[KdIterSql]].
  *
  * The cation fractions are scale-invariant in the input moles, so the SQL
  * computes them from wt/W directly; the resulting <=1-ulp differences
  * against the Scala map-order sums are orders of magnitude below the
  * round(6) output grid.
  */
object Fe3Fe2IterSql {

  private val R = graft.functions.Fe3Fe2Iterative.R

  private def lit(v: Double): String = E.formatDouble(v)

  /** Cation-mole term of one oxide: (wt / W) * nCations. */
  private def cmole(ox: String): String =
    s"((\"$ox\" / ${lit(Elements.chemicalWeight(ox).get)}) * ${lit(Elements.cationAmount(ox))})"

  private def oxideOf(cation: String): String =
    Tables.meltElements.find(ox => Elements.cationName(ox) == cation).get

  /** Shared harness around a model-specific `consts` list (lateral-alias
    * CTE columns; must include the cation fractions the kernel uses and
    * `fet`) and the f(r) kernel SQL. */
  private def harness(consts: Seq[(String, String)],
                      fAt: String => String): String = {
    val meltCols = Tables.meltSource.cols
      .map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")
    // feMinusFe3(r) = fe(r) - (feTot - fe(r)), fe(r) = feTot / (1 + r)
    def g(r: String): String = s"(${fAt(r)} - $r)"
    val tot = Tables.meltElements.map(cmole).reduce((l, r) => s"($l + $r)")
    val baseConsts = Seq("tot" -> tot) ++ consts
    val inpSel = (Seq("\"sample_id\"", "\"T_K\"", "\"P_bar\"") ++
      baseConsts.map { case (n, s) => s"$s AS $n" }).mkString(", ")
    val carry = consts.map(_._1).mkString(", ")
    s"""WITH RECURSIVE
       | m AS (SELECT $meltCols FROM lineitem),
       | inp AS (SELECT $inpSel FROM m),
       | g0 AS (SELECT *, ${g("1.0e-8")} AS glo, ${g("100.0e0")} AS ghi FROM inp),
       | bis AS (
       |   SELECT "sample_id", 0 AS it, 1.0e-8 AS lo, 100.0e0 AS hi, $carry
       |   FROM g0 WHERE isfinite(glo) AND glo > 0.0e0 AND ghi < 0.0e0
       |   UNION ALL
       |   SELECT "sample_id", it + 1,
       |     CASE WHEN g > 0.0e0 THEN mid ELSE lo END,
       |     CASE WHEN g > 0.0e0 THEN hi ELSE mid END, $carry
       |   FROM (SELECT "sample_id", it, lo, hi, $carry,
       |           ((lo + hi) * 0.5e0) AS mid, ${g("mid")} AS g
       |         FROM bis WHERE it < 60) t),
       | roots AS (SELECT DISTINCT "sample_id", ((lo + hi) * 0.5e0) AS root
       |   FROM bis WHERE it = 60),
       | fin AS (SELECT g0."sample_id",
       |   CASE WHEN (NOT isfinite(glo)) OR (NOT (glo > 0.0e0)) OR
       |             (NOT (ghi < 0.0e0)) THEN 'NaN'::DOUBLE
       |        ELSE r.root END AS fe3fe2
       |   FROM g0 LEFT JOIN roots r USING ("sample_id"))
       | SELECT "sample_id", round(fe3fe2, 6) AS "Fe3Fe2" FROM fin
       | ORDER BY "sample_id"""".stripMargin.replace("\n", " ")
  }

  /** Cation fraction of `cation`, referencing the lateral alias `tot`. */
  private def frac(cation: String): String = s"(${cmole(oxideOf(cation))} / tot)"

  private val qfm1barSql: String = E.toSql(Fo2Buffers.qfm1bar(C("T_K")))

  /** feMinusFe3(r) with fe = fet / (1 + r): fe - (fet - fe). */
  private def feM(r: String): String =
    s"((fet / (1.0e0 + $r)) - (fet - (fet / (1.0e0 + $r))))"

  /** O'Neill et al. (2006) eq. 10 (`Fe3Fe2_models.py:840-871` via
    * `Fe3Fe2Iterative.oneill2006`); fO2 = QFM 1-bar at T_K, as registered. */
  val oneill2006: String = {
    val consts = Seq(
      "fet" -> s"(${cmole("FeO")} / tot)",
      "cp" -> ("""((((((-28144.0e0 + (3905.0e0 * MGF)) - (13359.0e0 * CAF)) -
        | (14858.0e0 * NAF)) - (9805.0e0 * KF)) + (10906.0e0 * ALF)) +
        | (110971.0e0 * PF))""".stripMargin.replace("\n", " ")
        .replace("MGF", frac("Mg")).replace("CAF", frac("Ca"))
        .replace("NAF", frac("Na")).replace("KF", frac("K"))
        .replace("ALF", frac("Al")).replace("PF", frac("P"))),
      "pg" -> "(\"P_bar\" / 10000.0e0)",
      "p2" -> ("""(13.95e0 + (((33122.0e0 / "T_K") - 5.24e0) *
        | (pow(1.0e0 + (0.241e0 * pg), 0.75e0) - 1.0e0)) -
        | (((39156.0e0 / "T_K") - 6.17e0) *
        | (pow(1.0e0 + (0.132e0 * pg), 0.75e0) - 1.0e0)))"""
        .stripMargin.replace("\n", " ")),
      "lf" -> s"log10($qfm1barSql)",
      "tk" -> "\"T_K\"")
    harness(consts, r =>
      s"pow(10.0e0, (((lf - ((cp - (11952.0e0 * ${feM(r)})) / tk)) - p2) / 4.0e0))")
  }

  /** Armstrong et al. (2019) S12 (`Fe3Fe2_models.py:1030-1155` via
    * `Fe3Fe2Iterative.armstrong2019`). The Tait EOS shape constants
    * (a, b, c per phase) are T/P-independent, so they are evaluated by the
    * same Scala arithmetic and baked as literals. */
  val armstrong2019: String = {
    def taitConsts(k0: Double, kp0: Double): (Double, Double, Double) = {
      val kpp0 = -kp0 / k0
      val a = (1.0 + kp0) / (1.0 + kp0 + k0 * kpp0)
      val bb = kp0 / k0 - kpp0 / (1.0 + kp0)
      val cc = (1.0 + kp0 + k0 * kpp0) / (kp0 * kp0 + kp0 - k0 * kpp0)
      (a, bb, cc)
    }
    def vdpSql(k0: Double, kp0: Double, v0: String): String = {
      val (a, bb, cc) = taitConsts(k0, kp0)
      val part1 = s"(${lit(a)} * (1.0e0 - pow(1.0e0 + (${lit(bb)} * pg), ${lit(1.0 - cc)})))"
      val part2 = s"((${lit(bb * (cc - 1.0))}) * pg)"
      s"((pg * $v0) * ((1.0e0 - ${lit(a)}) + ($part1 / $part2)))"
    }
    val vdpFe2 = vdpSql(37.0, 8.0, "(13650.0e0 + (2.92e0 * (\"T_K\" - 1673.0e0)))")
    val vdpFe3 = vdpSql(12.6, 1.3, "(21070.0e0 + (4.54e0 * (\"T_K\" - 1673.0e0)))")
    val consts = Seq(
      "fet" -> s"(${cmole("FeO")} / tot)",
      "sm" -> ("""(((((-2248.0e0 * MGF) + (7690.0e0 * CAF)) +
        | (8553.0e0 * NAF)) + (5644.0e0 * KF)) + ((-6278.0e0) * ALF))"""
        .stripMargin.replace("\n", " ")
        .replace("MGF", frac("Mg")).replace("CAF", frac("Ca"))
        .replace("NAF", frac("Na")).replace("KF", frac("K"))
        .replace("ALF", frac("Al"))),
      "pg" -> "(\"P_bar\" / 10000.0e0)",
      "tk" -> "\"T_K\"",
      // gTerm = (gibbs0 + (vdp(Fe3) - vdp(Fe2))) / (R*T),
      // gibbs0 = -(16201/T - 8.031) * (R*T)
      "gt" -> (s"((((-(((16201.0e0 / tk) - 8.031e0))) * (${lit(R)} * tk)) + " +
        s"($vdpFe3 - $vdpFe2)) / (${lit(R)} * tk))"),
      "lq" -> s"(ln($qfm1barSql) / 4.0e0)")
    harness(consts, r =>
      s"exp(((lq - gt) + ((sm / tk) + (6880.0e0 * (${feM(r)} / tk)))))")
  }
}
