package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CO2-H2O isobar / isopleth curve assembly (reference
  * `volatile_solubility/isobars.py:13-141`): evaluate the mixed-fluid
  * solubility model on a (P, x_fluid) grid, then interpolate each curve
  * and union the segments into one tidy frame.
  *
  * Scale split: the GRID evaluation is the expensive part (one solubility
  * solve per point, embarrassingly parallel) and runs as a distributed
  * one-stage job — compositions x isobars x fluid fractions exploded into
  * rows. The INTERPOLATION touches only `n_isobars x n_points` tiny curves
  * per sample; like the reference (scipy interp1d on a collected frame) it
  * runs driver-side on the collected grid. Natural cubic splines stand in
  * for scipy's not-a-knot cubic / quadratic interpolants — same knots,
  * same continuity class; values differ only between knots.
  */
object Isobars {

  /** Natural cubic spline through (xs, ys), xs strictly increasing;
    * returns the interpolant. */
  private[graft] def cubicSpline(xs: Array[Double], ys: Array[Double]): Double => Double = {
    val n = xs.length
    require(n >= 3, s"spline needs >= 3 points, got $n")
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    require(h.forall(_ > 0), "spline abscissae must be strictly increasing")
    // tridiagonal solve for second derivatives, natural BCs (m0 = mn = 0)
    val m = new Array[Double](n)
    val diag = new Array[Double](n)
    val rhs = new Array[Double](n)
    diag(0) = 1.0; diag(n - 1) = 1.0
    for (i <- 1 until n - 1) {
      diag(i) = 2.0 * (h(i - 1) + h(i))
      rhs(i) = 6.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
    }
    // forward sweep (sub/super diagonals are h; natural rows have none)
    val cPrime = new Array[Double](n)
    val dPrime = new Array[Double](n)
    cPrime(0) = 0.0; dPrime(0) = 0.0
    for (i <- 1 until n - 1) {
      val denom = diag(i) - h(i - 1) * cPrime(i - 1)
      cPrime(i) = h(i) / denom
      dPrime(i) = (rhs(i) - h(i - 1) * dPrime(i - 1)) / denom
    }
    m(n - 1) = 0.0
    for (i <- (n - 2) to 1 by -1) m(i) = dPrime(i) - cPrime(i) * m(i + 1)
    (x: Double) => {
      val j0 = java.util.Arrays.binarySearch(xs, x)
      val j = if (j0 >= 0) math.min(j0, n - 2)
        else math.min(math.max(-j0 - 2, 0), n - 2)
      val t = x - xs(j)
      val a = ys(j)
      val b = (ys(j + 1) - ys(j)) / h(j) - h(j) * (2.0 * m(j) + m(j + 1)) / 6.0
      val c = m(j) / 2.0
      val d = (m(j + 1) - m(j)) / (6.0 * h(j))
      a + t * (b + t * (c + t * d))
    }
  }

  /** Distributed (sample x P x x_fluid) grid of dissolved (H2O, CO2) for
    * the configured model. `samples` must carry (sample_id, element wt.%
    * columns, T_K). One narrow UDF stage. */
  def isobarGrid(samples: DataFrame, elements: Array[String],
                 isobars: Seq[Double], nPoints: Int = 10,
                 model: String = "iaconomarziano2012"): DataFrame = {
    val xfls = (0 to nPoints).map(_.toDouble / nPoints)
    val sol = solubilityUdf(elements, model)
    samples
      .withColumn("P_bar_iso", explode(array(isobars.map(lit): _*)))
      .withColumn("xfl", explode(array(xfls.map(lit): _*)))
      .withColumn("sol", sol(array(elements.map(col).toIndexedSeq: _*),
        col("P_bar_iso"), col("T_K"), col("xfl")))
      .select(col("sample_id"), col("P_bar_iso").as("P_bar"), col("xfl"),
        col("sol._1").as("H2O"), col("sol._2").as("CO2"))
  }

  private def solubilityUdf(elements: Array[String], model: String) = {
    val solve: (IaconoMarziano.Comp, Double, Double, Double) => (Double, Double) =
      model match {
        case "iaconomarziano2012" => (c, p, t, x) =>
          (IaconoMarziano.h2oSolubility(c, x, p, t),
            IaconoMarziano.co2Solubility(c, x, p, t))
        case "allison2022" => (c, p, t, x) =>
          (Allison.h2oSolubility(t, p, x), Allison.co2Solubility(c, t, p, x))
        case "shishkina2014" => (c, p, _, x) =>
          (Shishkina.h2oSolubility(c, x, p), Shishkina.co2Solubility(c, x, p))
        case other => throw new IllegalArgumentException(s"model $other")
      }
    udf((wt: Seq[Double], p: Double, t: Double, x: Double) =>
      solve(IaconoMarziano.Comp(elements, wt.toArray), p, t, x))
  }

  /** Smooth isobar curves (`_isobar_interpolate`, `isobars.py:107-120`):
    * per (sample, P) spline of CO2 over H2O sampled at 10x density, all
    * segments unioned. The grid job is distributed; interpolation runs on
    * the collected grid (isobar curves are metadata-sized by construction). */
  def isobarCurves(spark: SparkSession, grid: DataFrame,
                   pointsPerKnot: Int = 10): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = grid.select("sample_id", "P_bar", "xfl", "H2O", "CO2")
      .collect()
    val segments = rows.groupBy(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy(_._1).flatMap { case ((sid, p), pts) =>
        val sorted = pts.sortBy(_.getDouble(2)) // by xfl -> H2O ascending
        val xs = sorted.map(_.getDouble(3))
        val ys = sorted.map(_.getDouble(4))
        // drop non-increasing duplicates at curve ends (xfl=0 -> H2O=0)
        val keep = xs.indices.filter(i => i == 0 || xs(i) > xs(i - 1))
        val (kx, ky) = (keep.map(xs).toArray, keep.map(ys).toArray)
        if (kx.length < 3) Seq.empty
        else {
          val f = cubicSpline(kx, ky)
          val n = kx.length * pointsPerKnot
          (0 until n).map { i =>
            val h2o = kx.head + (kx.last - kx.head) * i / (n - 1)
            org.apache.spark.sql.Row(sid, p, h2o, math.max(f(h2o), 0.0))
          }
        }
      }
    spark.createDataFrame(segments.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sample_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("P_bar",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("H2O",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("CO2",
          org.apache.spark.sql.types.DoubleType))))
  }
}
