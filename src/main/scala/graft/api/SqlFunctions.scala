package graft.api

import org.apache.spark.sql.SparkSession
import graft.functions._

/** SQL-surface registration: exposes the scalar model library as session
  * UDFs so `spark.sql` users (and JDBC/thrift clients) can call it without
  * the DataFrame API — e.g.
  * `SELECT qfm_log10_fo2(T_K, P_bar) FROM melts`.
  *
  * Only the solver-backed scalars are registered; closed-form models
  * compile to Catalyst expressions through the DataFrame API and through
  * the query registry, where they stay codegen'd (a SQL UDF would hide
  * them from the optimizer). Compositions are passed as
  * `array(oxide wt.% in `elements` order)`.
  */
object SqlFunctions {

  /** Element order expected by the composition-array UDFs. */
  val elements: Array[String] = graft.Tables.meltElements.toArray

  def register(spark: SparkSession): Unit = {
    val els = elements
    def comp(wt: Seq[Double]): IaconoMarziano.Comp =
      IaconoMarziano.Comp(els, wt.toArray)

    spark.udf.register("qfm_log10_fo2",
      (tK: Double, pBar: Double) => math.log10(QfmFull.fO2(tK, pBar)))
    spark.udf.register("iw_log10_fo2",
      (tK: Double, pBar: Double) => math.log10(IwFull.fO2(tK, pBar)))
    spark.udf.register("saturation_pressure_im",
      (wt: Seq[Double], tK: Double) =>
        IaconoMarziano.mixedSaturation(comp(wt), tK)._1)
    spark.udf.register("saturation_pressure_allison",
      (wt: Seq[Double], tK: Double) =>
        Allison.mixedSaturation(comp(wt), tK)._1)
    spark.udf.register("saturation_pressure_shishkina",
      (wt: Seq[Double]) => Shishkina.mixedSaturation(comp(wt))._1)
    spark.udf.register("fe3fe2_deng2020",
      (wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        Deng2020.fe3Fe2(comp(wt).molNorm, tK, pBar, fO2))
    spark.udf.register("fe3fe2_oneill2006",
      (wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        Fe3Fe2Iterative.oneill2006(comp(wt).molNorm, tK, pBar, fO2))
    spark.udf.register("fe3fe2_armstrong2019",
      (wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        Fe3Fe2Iterative.armstrong2019(comp(wt).molNorm, tK, pBar, fO2))
    spark.udf.register("fe3fe2_sun2024",
      (wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        Fe3Fe2Iterative.sun2024DengVdP(comp(wt).molNorm, tK, pBar, fO2))
  }
}
