package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.core._
import graft.expr.{Pipeline, Lit}

/** Property tests for the conversion pipeline (FIXTURES.md §7):
  * wtPc∘moles = id, normalise idempotent, cations∘oxides = id, Fe-split
  * mass balance, mineral-formula oxygen sums, chained derives.
  */
class ConversionSpec extends SparkSpec {

  val elements = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO",
    "Na2O", "K2O", "P2O5", "H2O", "CO2")

  lazy val df = {
    val rows = Seq(
      Row(1L, 48.1, 1.2, 15.3, 8.9, 0.15, 7.8, 10.9, 2.6, 0.7, 0.25, 1.1, 0.04),
      Row(2L, 51.7, 0.9, 13.8, 9.9, 0.18, 6.1, 9.4, 3.1, 1.3, 0.4, 3.9, 0.09),
      Row(3L, 45.2, 2.4, 12.1, 11.3, 0.2, 9.8, 11.8, 2.1, 0.4, 0.3, 0.0, 0.01))
    val schema = StructType(StructField("sample_id", LongType) +:
      elements.map(e => StructField(e, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  def base: Staged =
    Staged(MagmaSchema(elements, Vector("sample_id"), CUnit.WtPc, CType.Oxide),
      Vector.empty)

  def collectMap(st: Staged): Map[Long, Map[String, Double]] =
    st.spark(df).collect().map { r =>
      r.getAs[Long]("sample_id") ->
        r.schema.fieldNames.filter(_ != "sample_id")
          .map(f => f -> r.getAs[Double](f)).toMap
    }.toMap

  test("moles -> wtPc roundtrip recovers normalised composition") {
    val normalised = collectMap(base.normalise())
    val roundtrip = collectMap(base.moles().wtPc())
    for ((id, cols) <- roundtrip; (e, v) <- cols if elements.contains(e))
      assert(math.abs(v - normalised(id)(e)) < 1e-9, s"$id/$e")
  }

  test("normalise is idempotent and totals 100") {
    val once = collectMap(base.normalise())
    val twice = collectMap(base.normalise().normalise())
    for ((id, cols) <- once) {
      assert(math.abs(cols("total") - 100.0) < 1e-9)
      for ((e, v) <- cols) assert(math.abs(v - twice(id)(e)) < 1e-9, s"$id/$e")
    }
  }

  test("cations -> oxides roundtrip recovers oxide mol fractions") {
    // reference semantics: units follow the cation frame (mol fractions), so
    // the roundtrip target is moles(), not wt.% (`magmaFrame.py:299-303`)
    val moles = collectMap(base.moles())
    val roundtrip = collectMap(base.cations().oxides())
    for ((id, cols) <- moles; (e, v) <- cols if elements.contains(e))
      assert(math.abs(roundtrip(id)(e) - v) < 1e-9, s"$id/$e")
  }

  test("wt.% cations -> oxides roundtrip recovers normalised wt.%") {
    val normalised = collectMap(base.normalise())
    val roundtrip = collectMap(base.cations(molFractions = false).oxides())
    for ((id, cols) <- normalised; (e, v) <- cols if elements.contains(e))
      assert(math.abs(roundtrip(id)(e) - v) < 1e-9, s"$id/$e")
  }

  test("cation fractions sum to 1") {
    val cats = collectMap(base.cations())
    for ((id, cols) <- cats) {
      val catSum = cols.filterNot { case (k, _) => k == "total" }.values.sum
      assert(math.abs(catSum - 1.0) < 1e-9, id)
    }
  }

  test("Fe split conserves total Fe in mole space") {
    val m = collectMap(base.moles())
    val split = collectMap(base.feSplit(Lit(0.3), wtpc = false))
    for ((id, cols) <- split) {
      val feTotal = cols("FeO") + 2.0 * cols("Fe2O3")
      // relative to pre-split FeO (both mole-normalised before re-normalise)
      assert(math.abs(feTotal - m(id)("FeO")) < 1e-9, id)
      // speciation ratio: Fe3/Fe2 = 2*Fe2O3/FeO = 0.3
      assert(math.abs(2.0 * cols("Fe2O3") / cols("FeO") - 0.3) < 1e-9, id)
    }
  }

  test("mineral formula normalises to requested oxygens") {
    val olElements = Vector("SiO2", "FeO", "MnO", "MgO", "CaO", "NiO")
    val rows = Seq(Row(1L, 40.1, 12.5, 0.2, 46.8, 0.3, 0.35))
    val schema = StructType(StructField("sample_id", LongType) +:
      olElements.map(e => StructField(e, DoubleType)))
    val ol = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val st = Staged(MagmaSchema(olElements, Vector("sample_id"), CUnit.WtPc,
      CType.Oxide), Vector.empty).mineralFormula(4.0)
    val r = st.spark(ol).collect()(0)
    // olivine (Mg,Fe)2SiO4: Si ~1, (Mg+Fe) ~2, oxygen column = 4
    assert(math.abs(r.getAs[Double]("O") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("Si") - 1.0) < 0.05)
    assert(math.abs(r.getAs[Double]("Mg") + r.getAs[Double]("Fe") - 2.0) < 0.1)
    // oxygen balance: sum(cation_i * O_per_cation_i) == 4
    val opc = Map("Si" -> 2.0, "Fe" -> 1.0, "Mn" -> 1.0, "Mg" -> 1.0,
      "Ca" -> 1.0, "Ni" -> 1.0)
    val oSum = opc.map { case (c, o) => r.getAs[Double](c) * o }.sum
    assert(math.abs(oSum - 4.0) < 1e-9)
  }

  test("derives chain and survive later stages") {
    val st = base.derive("a", Lit(1.0)).derive("b", graft.expr.C("a") + Lit(1.0))
      .select("sample_id", "a", "b")
    val r = st.spark(df).collect()(0)
    assert(r.getAs[Double]("a") == 1.0 && r.getAs[Double]("b") == 2.0)
  }

  test("ppm roundtrip") {
    val there = collectMap(base.ppm)
    for ((id, cols) <- collectMap(base); (e, v) <- cols if elements.contains(e))
      assert(math.abs(there(id)(e) - v * 1e4) < 1e-9)
  }
}
