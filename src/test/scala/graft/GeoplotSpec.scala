package graft

import graft.expr._
import graft.expr.E._
import graft.models.{CalibrationData, Tas, TraceElements}

/** TAS classification, trace-element normalisation, calibration registry. */
class GeoplotSpec extends SparkSpec {

  private def classifyOne(s: Double, t: Double): String = {
    import spark.implicits._
    val df = Seq((s, t)).toDF("s", "t")
    df.select(E.toColumn(Tas.classify(C("s"), C("t"))).as("rock"))
      .head().getString(0)
  }

  test("TAS classification matches every reference label point") {
    // The label coordinates in TAS_diagram.py:25-45 are interior points of
    // their fields — 15 golden classifications from the reference itself.
    Tas.labelPoints.foreach { case (rock, s, t) =>
      assert(classifyOne(s, t) == rock, s"at ($s, $t)")
    }
  }

  test("TAS classification is total over the diagram domain") {
    import spark.implicits._
    val grid = for {
      si <- BigDecimal(35.0) to BigDecimal(80.0) by BigDecimal(0.5)
      ta <- BigDecimal(0.0) to BigDecimal(17.0) by BigDecimal(0.5)
    } yield (si.toDouble, ta.toDouble)
    val rocks = grid.toDF("s", "t")
      .select(E.toColumn(Tas.classify(C("s"), C("t"))).as("rock"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(rocks.subsetOf(Tas.rocks.toSet))
    assert(rocks.size == 15, s"grid only hit: $rocks") // all fields reachable
  }

  test("TAS spark and duckdb-sql renderings are the same expression") {
    // The SQL side must at least render (DuckDB itself runs in the driver
    // gate); here we check the tree compiles to both targets without error.
    val e = Tas.classify(C("s"), C("t"))
    assert(E.toSql(e).contains("CASE WHEN"))
    assert(E.toColumn(e) != null)
  }

  test("chondrite normalisation divides by McDonough & Sun 1995 values") {
    import spark.implicits._
    val df = Seq((0.474, 0.296, 0.398, 0.1126)).toDF("La", "Sm", "Gd", "Eu")
    val row = df.select(
      E.toColumn(TraceElements.normalise(C("La"), "La",
        TraceElements.c1Chondrite)).as("la_n"),
      E.toColumn(TraceElements.euAnomaly(
        TraceElements.normalise(C("Eu"), "Eu", TraceElements.c1Chondrite),
        TraceElements.normalise(C("Sm"), "Sm", TraceElements.c1Chondrite),
        TraceElements.normalise(C("Gd"), "Gd", TraceElements.c1Chondrite)))
        .as("eu_an")).head()
    assert(math.abs(row.getDouble(0) - 2.0) < 1e-12) // 0.474/0.237 = 2
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12) // flat pattern: no anomaly
  }

  test("REE order and radii cover the reference series") {
    assert(TraceElements.reeOrder.size == 15)
    assert(TraceElements.reeOrder.forall(TraceElements.reeRadii.contains))
    assert(TraceElements.reeOrder.forall(TraceElements.c1Chondrite.contains))
    assert(TraceElements.reeOrder.forall(TraceElements.primitiveMantle.contains))
    // radii strictly decreasing La -> Lu (lanthanide contraction)
    val r = TraceElements.reeOrder.map(TraceElements.reeRadii)
    assert(r.zip(r.tail).forall { case (a, b) => a > b })
  }

  test("calibration registry filters to the model's datasets") {
    import spark.implicits._
    val refs = Seq("A2019", "B2013", "O2006", "Z2017", "KC1991").toDF("ref")
    val kept = refs.filter(org.apache.spark.sql.functions.col("ref")
        .isin(CalibrationData.fe3fe2Datasets("armstrong2019"): _*))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("A2019", "O2006", "Z2017"))
    assert(CalibrationData.fe3fe2Datasets("sun2024").size == 34)
  }
}
