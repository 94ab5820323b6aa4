package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.core._
import graft.expr._
import graft.expr.E._
import graft.models._

/** Sanity + hand-computed golden checks for the model expression library. */
class ModelSpec extends SparkSpec {

  val elements = Tables.meltElements
  val mctx = CompCtx(elements)

  // a single MORB-like melt at 1450 K, 2 kbar
  lazy val df = {
    val rows = Seq(Row(1L, 1450.0, 2000.0,
      49.5, 1.2, 14.8, 9.5, 0.17, 7.6, 11.2, 2.7, 0.3, 0.15, 0.8, 0.05))
    val schema = StructType(Seq(StructField("sample_id", LongType),
      StructField("T_K", DoubleType), StructField("P_bar", DoubleType)) ++
      elements.map(e => StructField(e, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  def eval(e: E): Double =
    df.select(E.toColumn(e).cast("double").as("v")).collect()(0).getDouble(0)

  test("putirka2008_13 matches hand calculation") {
    // T = 26.3*MgO + 994.4 + 273.15 = 26.3*7.6 + 1267.55
    assert(math.abs(eval(Thermometers.putirka2008_13(mctx)) -
      (26.3 * 7.6 + 994.4 + 273.15)) < 1e-9)
  }

  test("thermometers produce liquidus-range temperatures") {
    for ((name, f) <- Thermometers.all) {
      val t = eval(f(mctx, 0.0))
      assert(t > 1200 && t < 1800, s"$name: $t K")
    }
  }

  test("QFM 1 bar fO2 matches O'Neill 1987 at 1400 K") {
    // muO2 = -587474 + 1584.427*1400 - 203.3164*1400*ln(1400) + 0.09271*1400^2
    val t = 1400.0
    val mu = -587474.0 + 1584.427 * t - 203.3164 * t * math.log(t) +
      0.092710 * t * t
    val expected = math.exp(mu / (Fo2Buffers.R * t))
    val got = eval(Fo2Buffers.qfm1bar(Lit(t)))
    assert(math.abs(got / expected - 1.0) < 1e-12)
    // log10 fO2 at QFM(1400 K, 1 bar) ~ -9.3 (published curves)
    assert(math.abs(math.log10(expected) - (-9.31)) < 0.1)
  }

  test("fO2 buffers are ordered IW < QFM < NNO+2 at magmatic T") {
    val iw = eval(log10(Fo2Buffers.iwOneill1993(C("T_K"))))
    val qfm = eval(log10(Fo2Buffers.qfm1bar(C("T_K"))))
    val nno2 = eval(log10(Fo2Buffers.nno1bar(C("T_K"), logshift = 2)))
    assert(iw < qfm && qfm < nno2, s"IW=$iw QFM=$qfm NNO+2=$nno2")
  }

  test("Fe3Fe2 models give reducing-to-oxidising trend with fO2") {
    val fLow = Fo2Buffers.qfm1bar(C("T_K"), logshift = -2)
    val fHigh = Fo2Buffers.qfm1bar(C("T_K"), logshift = 2)
    for ((name, f) <- Fe3Fe2.closedForm) {
      val lo = eval(f(mctx, C("T_K"), fLow, C("P_bar")))
      val hi = eval(f(mctx, C("T_K"), fHigh, C("P_bar")))
      assert(lo < hi, s"$name: $lo !< $hi")
      assert(lo > 0 && hi < 10, s"$name out of range: $lo $hi")
    }
  }

  test("toplis2005 iteration converges to its own fixed point") {
    val si = eval(mctx.molNorm("SiO2") * Lit(100.0))
    val na = eval(mctx.molNorm("Na2O") * Lit(100.0))
    val k = eval(mctx.molNorm("K2O") * Lit(100.0))
    val h = eval(mctx.molNorm("H2O") * Lit(100.0))
    val fe = eval(mctx.molNorm("FeO"))
    val mg = eval(mctx.molNorm("MgO"))
    val kd = Kd.toplisIterate(si, na, k, h, fe, mg, 0.2, 1450.0, 2000.0)
    assert(kd > 0.25 && kd < 0.40, s"Kd=$kd")
    // check the fixed point: recompute eq Fo from kd, then Kd at that Fo
    val fe2Mg = fe * (1.0 / 1.2) / mg
    val foEq = 1.0 / (1.0 + kd * fe2Mg)
    val kdAtFo = eval(Kd.toplis2005Fixed(mctx, Lit(foEq), Lit(1450.0), Lit(2000.0)))
    assert(math.abs(kdAtFo - kd) / kd < 0.02, s"kd=$kd kdAtFo=$kdAtFo")
  }

  test("viscosity and density in physical ranges") {
    val visc = eval(Rheology.viscosity(mctx, C("T_K")))
    assert(visc > -1 && visc < 6, s"log10 viscosity $visc") // basalt ~ 1-2
    val rho = eval(Rheology.density(mctx, C("T_K"), C("P_bar")))
    assert(rho > 2400 && rho < 2900, s"density $rho") // basaltic liquid
  }

  test("sql rendering of a model expression runs in Spark SQL too") {
    val e = Thermometers.putirka2008_15(mctx)
    val sql = E.toSql(e)
    assert(sql.contains("\"MgO\"") && sql.contains("815.3"))
  }
}
