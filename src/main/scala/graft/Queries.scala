package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.expr._
import graft.expr.E._
import graft.models._

/** The driver-facing query registry: every implemented operator from
  * SURVEY.md §2 gets (a) a Spark DataFrame builder and (b) — when
  * SQL-expressible — the equivalent DuckDB oracle SQL. Both sides are
  * compiled from the SAME expression AST (graft.expr), so the oracle
  * computes identical arithmetic in identical order.
  */
object Queries {

  final case class Q(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** A query defined by a staged pipeline over one source table. */
  private def stagedQ(name: String, table: String, base: Staged,
                      f: Staged => Staged,
                      out: Seq[String] = Seq.empty,
                      orderBy: Seq[String] = Seq("sample_id")): Q = {
    val st0 = f(base)
    val st = if (out.nonEmpty) st0.select(out: _*) else st0
    Q(name,
      (s, dir) => Pipeline.applySpark(Tables.read(s, dir, table), st.stages)
        .orderBy(orderBy.map(org.apache.spark.sql.functions.col): _*),
      Some(st.sql(table, orderBy)))
  }

  private def meltQ(name: String)(f: Staged => Staged): Q =
    stagedQ(name, "lineitem", Tables.melts, f)

  private val mctx = CompCtx(Tables.meltElements)

  /** Thermometer query: sample_id + T_K_calc (rounded when the formula uses
    * transcendentals — Java Math vs libm can differ in the last ulp). */
  private def thermoQ(name: String, expr: CompCtx => E, transcendental: Boolean): Q =
    meltQ(s"q_thermo_$name") { m =>
      val e = expr(mctx)
      m.derive("T_K_calc", if (transcendental) round(e, 6) else e)
        .select("sample_id", "T_K_calc")
    }

  def all: Seq[Q] = Seq(
    // --- S1/C7: wrap + total invariant -----------------------------------
    meltQ("q_total")(_.withTotal),
    // --- C1-C6 conversions ----------------------------------------------
    meltQ("q_moles")(_.moles()),
    meltQ("q_moles_nonnorm")(_.moles(normalise = false)),
    meltQ("q_wtpc_roundtrip")(_.moles().wtPc()),
    meltQ("q_ppm")(_.ppm),
    meltQ("q_normalise")(_.normalise()),
    meltQ("q_cations")(_.cations()),
    meltQ("q_cations_wtpc")(_.cations(molFractions = false)),
    meltQ("q_oxides_roundtrip")(_.cations().oxides()),
    // --- C8/C9/C13: mineral formula, oxygen, polymerisation --------------
    stagedQ("q_mineral_formula", "orders", Tables.olivines, _.mineralFormula(4.0)),
    meltQ("q_oxygen")(_.withOxygen().select("sample_id", "oxygen")),
    meltQ("q_nbo")(_.meltPolymerisation
      .select("sample_id", "oxygen", "tetrahedral", "NBO", "NBO_T")),
    // --- C11: Fe split with fixed Fe3Fe2 (model "fixed") ------------------
    meltQ("q_fe_split")(_.feSplit(Lit(0.2))),
    // --- C16/C18: phase ops ----------------------------------------------
    stagedQ("q_forsterite", "orders", Tables.olivines,
      _.withMgNumber("Fo").select("sample_id", "Fo")),
    stagedQ("q_plag_endmembers", "customer", Tables.plag,
      _.plagEndmembers.select("sample_id", "anorthite", "albite", "orthoclase")),
    // --- P11: calibration-range predicate (putirka2008_14/15 window) -----
    meltQ("q_calibration_range") { m =>
      val inRange =
        (C("SiO2") >= Lit(31.0)) && (C("SiO2") <= Lit(73.64)) &&
          (C("Na2O") + C("K2O") >= Lit(0.0)) && (C("Na2O") + C("K2O") <= Lit(14.3)) &&
          (C("H2O") >= Lit(0.0)) && (C("H2O") <= Lit(18.6))
      m.derive("in_calibration", CastD(If(inRange, ILit(1), ILit(0))))
        .select("sample_id", "in_calibration")
    },
    // --- 2.7 thermometers -------------------------------------------------
    thermoQ("putirka2008_13", Thermometers.putirka2008_13(_), transcendental = false),
    thermoQ("putirka2008_14", Thermometers.putirka2008_14(_), transcendental = false),
    thermoQ("putirka2008_15", Thermometers.putirka2008_15(_), transcendental = false),
    thermoQ("putirka2008_16", Thermometers.putirka2008_16(_), transcendental = false),
    thermoQ("putirka2008_22", Thermometers.putirka2008_22(_), transcendental = true),
    thermoQ("sun2020", Thermometers.sun2020(_), transcendental = true),
    thermoQ("shea2022", Thermometers.shea2022(_), transcendental = false),
    thermoQ("sugawara2000_3", Thermometers.sugawara2000_3(_), transcendental = false),
    thermoQ("sugawara2000_6a", Thermometers.sugawara2000_6a(_), transcendental = false)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
