package graft.models

import graft.expr._
import graft.expr.E._

/** Fe3+/Fe2+ error models (reference `Fe_redox/Fe3Fe2_errors.py`,
  * `Fe_redox/Fe3Fe2_baseclass.py:93-157`): 1-sigma uncertainties derived
  * from the reference's compiled validation dataset. At 1 bar a fitted
  * curve a*x + b*x^2 + c^(x+d); above 1 bar a cubic B-spline (scipy splrep
  * fit — knots/coefficients shipped, evaluated with De Boor's algorithm).
  * Used by the Monte-Carlo offset wrappers
  * (`Fe3Fe2_baseclass.py:51-91, 149-157`).
  */
object ErrorModels {

  /** (a, b, c, d) per model (`Fe3Fe2_errors.py:9-41`). */
  val fe3fe2ErrorParams1Bar: Map[String, (Double, Double, Double, Double)] = Map(
    "borisov2018" -> (0.07881702, 0.02656421, 0.4333133, 3.4452295),
    "kress_carmichael1991" -> (7.05463020e-02, 2.43940927e-02, 9.88024806e-01, 2.25645326e02),
    "jayasuriya2004" -> (1.38784813e-01, 2.08193376e-02, 9.85875764e-01, 1.86942686e02),
    "putirka2016_6b" -> (5.72217982e-02, 5.16056662e-02, 9.85659083e-01, 1.81879745e02),
    "putirka2016_6c" -> (-3.34648539e-02, 7.56520883e-02, 9.84864214e-01, 1.55199181e02),
    "deng2020" -> (2.07517182e-01, 3.67122574e-03, 9.81786273e-01, 1.96442938e02),
    "oneill2006" -> (2.40671679e-01, 1.17056951e-02, 9.86394234e-01, 2.09113418e02),
    "oneill2018" -> (1.05928984e-02, 8.16688488e-02, 7.86674390e-01, 1.12117269e01),
    "armstrong2019" -> (1.85786883e-01, 3.01012716e-02, 9.80903060e-01, 1.38943588e02),
    "zhang2017" -> (1.71420881e-01, 5.50814149e-03, 9.85221818e-01, 2.35216497e02),
    "hirschmann2022" -> (0.06558719, 0.02810096, 0.56167845, 4.64421989),
    "sun2024" -> (0.05573283, 0.04157452, 0.4727692, 3.60686759))

  /** 1-bar error curve as an expression: a*x + b*x^2 + c^(x+d)
    * (`tools/model_errors.py:6-10`). */
  def fe3fe2Error1Bar(model: String, fe3fe2: E): E = {
    val (a, b, c, d) = fe3fe2ErrorParams1Bar(model)
    Lit(a) * fe3fe2 + Lit(b) * fe3fe2 * fe3fe2 + pow(Lit(c), fe3fe2 + Lit(d))
  }

  /** Cubic B-spline (t, c, k=3) high-pressure error fits for the default
    * and the blundy2020-forced models (`Fe3Fe2_errors.py:46-...`). */
  val fe3fe2SplineHP: Map[String, (Array[Double], Array[Double])] = Map(
    "sun2024" -> (Array(0.05263158, 0.05263158, 0.05263158, 0.05263158,
      2.16064117, 2.16064117, 2.16064117, 2.16064117),
      Array(0.06507369, 0.68064076, -0.00770687, 0.33039029)),
    "borisov2018" -> (Array(0.05263158, 0.05263158, 0.05263158, 0.05263158,
      0.59035243, 2.16064117, 2.16064117, 2.16064117, 2.16064117),
      Array(0.00581678, 0.27693333, 1.48747235, 1.74215223, 0.50682697)))

  /** De Boor evaluation of a degree-k B-spline at x (scipy splev
    * semantics, with clamped extrapolation onto the end spans). */
  def splev(x: Double, knots: Array[Double], coefs: Array[Double],
            k: Int = 3): Double = {
    val n = coefs.length
    // find span index i with t(i) <= x < t(i+1), clamped to valid range
    var span = k
    val xr = math.max(knots(k), math.min(x, knots(knots.length - k - 1)))
    while (span < n - 1 && xr >= knots(span + 1)) span += 1
    val d = new Array[Double](k + 1)
    var j = 0
    while (j <= k) { d(j) = coefs(span - k + j); j += 1 }
    var r = 1
    while (r <= k) {
      var i = k
      while (i >= r) {
        val alpha = (xr - knots(span - k + i)) /
          (knots(span + 1 + i - r) - knots(span - k + i))
        d(i) = (1.0 - alpha) * d(i - 1) + alpha * d(i)
        i -= 1
      }
      r += 1
    }
    d(k)
  }

  /** Single-span HP spline rendered closed-form: a clamped cubic B-spline
    * with 4 coefficients is one Bezier span, so De Boor reduces to the
    * Bernstein polynomial with clamped extrapolation — pure arithmetic the
    * dual-compiled AST (and hence the DuckDB oracle) can express. */
  def fe3fe2ErrorHPExpr(model: String, fe3fe2: E): E = {
    val (t, c) = fe3fe2SplineHP(model)
    require(c.length == 4, s"closed-form render needs a single span: $model")
    val a = t(3); val b = t(4)
    val u = (least(greatest(fe3fe2, Lit(a)), Lit(b)) - Lit(a)) / Lit(b - a)
    val v = Lit(1.0) - u
    v * v * v * Lit(c(0)) + Lit(3.0) * v * v * u * Lit(c(1)) +
      Lit(3.0) * v * u * u * Lit(c(2)) + u * u * u * Lit(c(3))
  }

  /** get_error as an expression: 1-bar curve at/below 1 bar, HP spline
    * above (`Fe3Fe2_baseclass.py:93-147`). */
  def fe3fe2ErrorExpr(model: String, fe3fe2: E, pBar: E): E =
    If(pBar <= Lit(1.0), fe3fe2Error1Bar(model, fe3fe2),
      fe3fe2ErrorHPExpr(model, fe3fe2))

  /** get_error: 1-bar curve below/at 1 bar, spline above
    * (`Fe3Fe2_baseclass.py:93-147`). */
  def fe3fe2Error(model: String, fe3fe2: Double, pBar: Double): Double = {
    val (a, b, c, d) = fe3fe2ErrorParams1Bar(model)
    val oneBar = a * fe3fe2 + b * fe3fe2 * fe3fe2 + math.pow(c, fe3fe2 + d)
    if (pBar <= 1.0) oneBar
    else fe3fe2SplineHP.get(model) match {
      case Some((t, cf)) => splev(fe3fe2, t, cf)
      case None => oneBar
    }
  }

  /** Monte-Carlo offset wrapper: Fe3Fe2 + N(0,1)-draw x error, floored at
    * 1e-6 (`Fe3Fe2_baseclass.py:51-91`). */
  def withOffset(fe3fe2: E, offsetParam: E, error: E): E =
    greatest(fe3fe2 + offsetParam * error, Lit(1e-6))
}
