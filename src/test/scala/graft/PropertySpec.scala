package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core._
import graft.ext.DualHash
import graft.functions.Isobars

/** Property-based layer over the fixed-fixture specs: the conversion
  * algebra, dedup partition laws, hash-range invariants and the spline
  * interpolation property hold on RANDOM inputs, not just the curated
  * rows the other suites (and the driver corpus) exercise. Scalacheck for
  * pure kernels; for DataFrame laws one seeded 200-row frame per property
  * (one Spark job, not one per sample). */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  // ---- conversion algebra on random compositions ------------------------

  val elements = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO",
    "Na2O", "K2O", "P2O5", "H2O", "CO2")

  /** 200 uniformly random (seeded) compositions, wt.% in (0.01, 60). */
  lazy val randomDf = {
    val rng = new scala.util.Random(20260813L)
    val rows = (1L to 200L).map { id =>
      Row.fromSeq(id +: elements.map(_ => 0.01 + rng.nextDouble() * 59.99))
    }
    val schema = StructType(StructField("sample_id", LongType) +:
      elements.map(e => StructField(e, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  def base: Staged =
    Staged(MagmaSchema(elements, Vector("sample_id"), CUnit.WtPc, CType.Oxide),
      Vector.empty)

  private def collectMap(st: Staged): Map[Long, Map[String, Double]] =
    st.spark(randomDf).collect().map { r =>
      r.getAs[Long]("sample_id") ->
        r.schema.fieldNames.filter(_ != "sample_id")
          .map(f => f -> r.getAs[Double](f)).toMap
    }.toMap

  test("wtPc after moles recovers the normalised composition on random rows") {
    val normalised = collectMap(base.normalise())
    val roundtrip = collectMap(base.moles().wtPc())
    for ((id, cols) <- roundtrip; (e, v) <- cols if elements.contains(e))
      assert(math.abs(v - normalised(id)(e)) < 1e-9, s"$id/$e")
  }

  test("normalise is idempotent on random rows") {
    val once = collectMap(base.normalise())
    val twice = collectMap(base.normalise().normalise())
    for ((id, cols) <- once) {
      assert(math.abs(cols("total") - 100.0) < 1e-9, s"$id total")
      for ((e, v) <- cols) assert(math.abs(v - twice(id)(e)) < 1e-9, s"$id/$e")
    }
  }

  test("oxides after cations recovers oxide mol fractions on random rows") {
    val moles = collectMap(base.moles())
    val roundtrip = collectMap(base.cations().oxides())
    for ((id, cols) <- moles; (e, v) <- cols if elements.contains(e))
      assert(math.abs(roundtrip(id)(e) - v) < 1e-9, s"$id/$e")
  }

  // ---- dedup partition laws on a random corpus --------------------------

  test("exact dedup partitions a random corpus: counts sum, keeper is min id") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    // ~60 base texts, duplicated a random number of times with fresh ids
    val texts = Vector.fill(60)(
      Vector.fill(3 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    val docs = scala.util.Random.javaRandomToRandom(new java.util.Random(9L))
      .shuffle((1L to 300L).map(id => id -> texts(rng.nextInt(texts.size))))
    val df = docs.toDF("doc_id", "text")
    val out = graft.ext.Dedup.exact(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = docs.groupBy(_._2).map { case (_, g) =>
      (g.map(_._1).min, g.size.toDouble)
    }.toSet
    assert(out.map(r => (r._2, r._3)).toSet == expected)
    assert(out.map(_._3).sum == 300.0)
    assert(out.map(_._1).distinct.length == out.length) // one row per fingerprint
  }

  test("tokenBudget is monotone in the budget and never overspends on a random corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ext.PipelineOps
    val rng = new scala.util.Random(11L)
    val vocab = Vector("one", "two", "three", "four", "five", "six", "seven")
    val docs = (1L to 250L).map(id => (id,
        Vector.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      .toDF("doc_id", "text")
    val tokens = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var prev = Set.empty[Long]
    for (budget <- Seq(0L, 50L, 200L, 700L, 1300L, 100000L)) {
      val kept = PipelineOps.tokenBudget(docs, budget, buckets = 32)
        .select("doc_id").as[Long].collect().toSet
      assert(prev.subsetOf(kept), s"budget $budget lost rows")
      assert(kept.toSeq.map(tokens).sum <= budget || budget == 0L,
        s"budget $budget overspent")
      prev = kept
    }
    assert(prev == tokens.keySet) // a huge budget keeps the whole corpus
  }

  test("decontamination is monotone in the eval set on a random corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ext.PipelineOps
    val rng = new scala.util.Random(13L)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold")
    val docs = (0L until 120L).map(id => (id,
        Vector.fill(4 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      .toDF("doc_id", "text")
    def contaminated(mod: Long): Set[Long] =
      PipelineOps.decontaminate(docs, col("doc_id") % mod === 0)
        .filter(col("contaminated") === 1L)
        .select("doc_id").as[Long].collect().toSet
    // eval(%20) ⊇ eval(%40): a larger eval set can only flag more docs
    // (restricted to docs outside both eval sets, where both are defined)
    val small = contaminated(40L)
    val large = contaminated(20L)
    val commonTrain = (0L until 120L).filter(id => id % 20 != 0).toSet
    assert((small & commonTrain).subsetOf(large & commonTrain),
      s"small=${small & commonTrain} large=${large & commonTrain}")
    assert(large.nonEmpty) // dense vocab guarantees shared shingles
  }

  // ---- hash kernels -----------------------------------------------------

  test("base60 stays in [0, 2^60) and is deterministic on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val ha = DualHash.base60(a)
      ha >= 0L && ha < (1L << 60) && ha == DualHash.base60(a) &&
        ((a == b) || DualHash.base60(b) != ha || a.getBytes.sameElements(b.getBytes))
    })
  }

  test("affine families keep values in [0, P) for any input and family index") {
    val genX = Gen.chooseNum(0L, (1L << 60) - 1)
    val genI = Gen.chooseNum(0, 63)
    check(Prop.forAll(genX, genI) { (x, i) =>
      val y = DualHash.family(i, x)
      y >= 0L && y < DualHash.P
    })
  }

  // ---- spline interpolation property ------------------------------------

  test("not-a-knot spline interpolates its knots for random knot sets") {
    val genKnots = for {
      n <- Gen.chooseNum(3, 12)
      gaps <- Gen.listOfN(n - 1, Gen.chooseNum(0.05, 3.0))
      x0 <- Gen.chooseNum(-5.0, 5.0)
      ys <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    } yield (gaps.scanLeft(x0)(_ + _).toArray, ys.toArray)
    check(Prop.forAll(genKnots) { case (xs, ys) =>
      val f = Isobars.cubicSpline(xs, ys)
      xs.indices.forall { i =>
        val scale = math.max(1.0, math.abs(ys(i)))
        math.abs(f(xs(i)) - ys(i)) / scale < 1e-8
      }
    }, n = 100)
  }

  test("spline reproduces cubics exactly (not-a-knot is exact on degree <= 3)") {
    val genCubic = for {
      a <- Gen.chooseNum(-2.0, 2.0); b <- Gen.chooseNum(-2.0, 2.0)
      c <- Gen.chooseNum(-2.0, 2.0); d <- Gen.chooseNum(-2.0, 2.0)
    } yield (a, b, c, d)
    check(Prop.forAll(genCubic) { case (a, b, c, d) =>
      def g(x: Double) = ((a * x + b) * x + c) * x + d
      val xs = Array(0.0, 0.7, 1.1, 2.3, 3.0)
      val f = Isobars.cubicSpline(xs, xs.map(g))
      // probe strictly inside segments, away from the knots
      Seq(0.3, 0.9, 1.6, 2.9).forall { x =>
        math.abs(f(x) - g(x)) < 1e-7 * math.max(1.0, math.abs(g(x)))
      }
    }, n = 100)
  }
}
