package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.chem.Elements
import graft.core._
import graft.expr._
import graft.expr.E._
import graft.functions._
import graft.models._

/** Golden-value anchors from the REFERENCE'S OWN accuracy-benchmark
  * fixtures (`docs/source/notebooks/benchmarks/data/`, compared in
  * `docs/source/notebooks/benchmarks/{fO2,Fe3Fe2,Kd,melt_thermometers}
  * .ipynb`). These pin the solver families that the DuckDB oracle cannot
  * reach (the oracle consumes the same expression AST the engine compiles,
  * so only EXTERNAL numbers catch transcribed-constant errors):
  *
  *  - QFM full EOS buffer vs Anenburg's app (`QFM_anenburg.csv`)
  *  - IW full buffer vs Hirschmann's MATLAB code (`fO2_IW_Hirschmann.csv`)
  *  - deng2020 / armstrong2019 iterative Fe3Fe2 vs Hirschmann (2022)'s
  *    published per-sample model values (`Fe3Fe2_hirschmann.csv`) and
  *    Deng (2020)'s published planet adiabat curves (`earth/moon/mars.csv`)
  *  - sun2024 vs Sun et al. (2024)'s Excel implementation
  *  - putirka2008 / sun2020 thermometers vs the authors' Excel sheets
  *  - sun2020 / saper2022 / blundy2020 Kd vs Excel + measured values
  *
  * Volatile-saturation models have no fixture in the reference's own
  * benchmark suite (fO2/Fe3Fe2/Kd/thermometers only) but ARE anchored
  * bit-level here against the reference's executed output
  * (`ref_saturation_parity.csv` — see golden/README.md provenance), on
  * top of the inverse/self-consistency properties in SolverSpec.
  */
object Golden {
  /** Parse a plain (unquoted) CSV resource: (header, rows). */
  def load(name: String): (Array[String], Array[Array[String]]) = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource $name")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    val header = lines.head.split(",", -1).map(_.trim)
    (header, lines.tail.filter(_.nonEmpty).map(_.split(",", -1).map(_.trim)))
  }

  def num(s: String): Double =
    if (s.isEmpty) Double.NaN
    else try s.toDouble catch { case _: NumberFormatException => Double.NaN }

  /** Rows as column-name maps. */
  def rows(name: String): Array[Map[String, Double]] = {
    val (h, rs) = load(name)
    rs.map(r => h.zip(r.map(num)).toMap)
  }

  /** wt.% oxides -> normalised oxide mol fractions (reference
    * `Melt(...).moles()`); NaN/absent read as 0. */
  def wtToMol(comp: Seq[(String, Double)]): Map[String, Double] = {
    val mol = comp.collect { case (ox, wt) if !wt.isNaN && wt > 0.0 =>
      ox -> wt / Elements.chemicalWeight(ox).get
    }
    val tot = mol.map(_._2).sum
    mol.map { case (o, m) => o -> m / tot }.toMap
  }

  /** cation mol fractions -> normalised oxide mol fractions (reference
    * `Melt(..., datatype="cation").oxides()`). */
  def cationToOxideMol(cats: Seq[(String, Double)]): Map[String, Double] = {
    val mol = cats.collect { case (c, x) if !x.isNaN && x > 0.0 =>
      val ox = Elements.oxideName(c)
      ox -> x / Elements.cationAmount(ox)
    }
    val tot = mol.map(_._2).sum
    mol.map { case (o, m) => o -> m / tot }.toMap
  }
}

class GoldenSpec extends SparkSpec {
  import Golden._

  private def maxAbs(ds: Seq[Double]): Double =
    if (ds.isEmpty) 0.0 else ds.map(math.abs).max
  private def medianAbs(ds: Seq[Double]): Double = {
    val s = ds.map(math.abs).sorted
    s(s.length / 2)
  }

  // ---- fO2 buffers vs external calculators --------------------------------

  test("QFM full matches Anenburg's calculator (golden fixture)") {
    val devByP = rows("QFM_anenburg.csv").groupBy(_("P_bar")).map {
      case (p, rs) =>
        p -> rs.toSeq.map { r =>
          math.log10(QfmFull.fO2(r("T_K"), p)) - math.log10(r("fO2"))
        }
    }
    for ((p, devs) <- devByP.toSeq.sortBy(_._1)) {
      info(f"QFM P=$p%.0f bar: max |dlog10 fO2| = ${maxAbs(devs)}%.4f " +
        f"median ${medianAbs(devs)}%.4f over ${devs.size} points")
      // Bit-exact vs Anenburg up to 10 kbar. At 10 GPa the REFERENCE ITSELF
      // deviates from Anenburg by up to ~1.05 log units (different EOS
      // datasets once the qtz->coe->stish / fay->ring transitions engage) —
      // verified by executing `fO2/QFM.py` in-container; exact parity with
      // the reference at that tier is pinned by the ref_qfm_parity test.
      val tol = if (p <= 1e4) 0.01 else 1.1
      assert(maxAbs(devs) < tol, f"P=$p max dev ${maxAbs(devs)}%.4f")
    }
  }

  test("QFM full matches the reference implementation bit-exactly to 10 GPa") {
    // golden/ref_qfm_parity.csv = output of the reference's own
    // `QFM.calculate_fO2` executed in-container over a (T, P) grid.
    val devs = rows("ref_qfm_parity.csv").toSeq.map { r =>
      math.log10(QfmFull.fO2(r("T_K"), r("P_bar"))) - r("log10fO2")
    }
    info(f"QFM parity: max |dlog10 fO2| = ${maxAbs(devs)}%.8f " +
      f"over ${devs.size} points")
    assert(maxAbs(devs) < 1e-5, f"max dev ${maxAbs(devs)}")
  }

  test("IW full matches the reference implementation (parity grid)") {
    // reference float32-coerces its IW output (`fO2/IW.py:461-466`); we
    // keep doubles, so parity holds to float32 resolution (~1e-7 rel).
    val devs = rows("ref_iw_parity.csv").toSeq.map { r =>
      math.log10(IwFull.fO2(r("T_K"), r("P_bar"))) - r("log10fO2")
    }
    info(f"IW parity: max |dlog10 fO2| = ${maxAbs(devs)}%.2e over ${devs.size}")
    assert(maxAbs(devs) < 1e-5, f"max dev ${maxAbs(devs)}")
  }

  test("IW full matches Hirschmann's MATLAB values (golden fixture)") {
    val devByP = rows("fO2_IW_Hirschmann.csv").groupBy(_("P_bar")).map {
      case (p, rs) =>
        p -> rs.toSeq.map { r =>
          math.log10(IwFull.fO2(r("T_K"), p)) - math.log10(r("fO2"))
        }
    }
    for ((p, devs) <- devByP.toSeq.sortBy(_._1)) {
      info(f"IW P=$p%.0f bar: max |dlog10 fO2| = ${maxAbs(devs)}%.4f " +
        f"median ${medianAbs(devs)}%.4f over ${devs.size} points")
      val tol = if (p <= 1e4) 0.05 else 0.3
      assert(maxAbs(devs) < tol, f"P=$p max dev ${maxAbs(devs)}%.4f")
    }
  }

  // ---- iterative Fe3Fe2 vs published model values -------------------------

  /** Hirschmann (2022) benchmark table rows, aligned 1:1 (original file
    * order) with `ref_hirschmann_parity.csv` — the reference's own
    * deng2020/armstrong2019/hirschmann2022(x2 dVdP methods) Fe3Fe2 output
    * executed in-container on the same rows. The table's
    * `Fe3Fetotal_deng/armstrong` columns are Hirschmann's OWN model
    * (hirschmann2022 eq. 21) evaluated with the deng/armstrong dVdP bases
    * (see `benchmarks/Fe3Fe2.ipynb`), NOT the deng2020/armstrong2019
    * models — the reference's deng/armstrong deviate from those columns by
    * up to 0.07/0.14 Fe3Fetotal, identical to ours. */
  private lazy val hirschmannRows = {
    val (h, rs) = load("Fe3Fe2_hirschmann.csv")
    val oxides = h.drop(8) // SiO2..P2O5 wt.%
    val parity = rows("ref_hirschmann_parity.csv")
    rs.zip(parity).map { case (r, p) =>
      val m = h.zip(r.map(num)).toMap
      (m, wtToMol(oxides.map(ox => ox -> num(r(h.indexOf(ox))))), p)
    }
  }

  test("deng2020 / armstrong2019 match the reference bit-exactly (parity fixture)") {
    val (dD, dA) = hirschmannRows.toSeq.map { case (m, mol, p) =>
      val t = m("T_K"); val pb = m("P_GPa") * 1e4
      val f = math.pow(10.0, m("log10fO2"))
      val rD = Deng2020.fe3Fe2(mol, t, pb, f)
      val rA = Fe3Fe2Iterative.armstrong2019(mol, t, pb, f)
      (math.abs(rD - p("ref_deng")) / p("ref_deng"),
        math.abs(rA - p("ref_armstrong")) / p("ref_armstrong"))
    }.unzip
    info(f"deng2020 parity: max rel dev = ${maxAbs(dD)}%.2e over ${dD.size}")
    info(f"armstrong2019 parity: max rel dev = ${maxAbs(dA)}%.2e")
    assert(maxAbs(dD) < 1e-6 && maxAbs(dA) < 1e-6)
  }

  test("hirschmann2022 (armstrong dVdP) matches reference + published table") {
    val elements = Vector("SiO2", "TiO2", "Al2O3", "Cr2O3", "FeO", "MnO",
      "MgO", "NiO", "CaO", "Na2O", "K2O", "P2O5")
    val ms = hirschmannRows.map { case (m, _, _) =>
      elements.map(e => e -> (if (m(e).isNaN) 0.0 else m(e))).toMap ++
        Map("T_K" -> m("T_K"), "P_bar" -> m("P_GPa") * 1e4,
          "fO2" -> math.pow(10.0, m("log10fO2")))
    }.toSeq
    val df = fixtureDf(ms, elements ++ Seq("T_K", "P_bar", "fO2"))
    val mctx = CompCtx(elements)
    val got = evalCol(df, E.toColumn(
      Fe3Fe2.hirschmann2022(mctx, C("T_K"), C("fO2"), C("P_bar"))))
    val parityDev = got.zip(hirschmannRows).map { case (g, (_, _, p)) =>
      (g - p("ref_h22_armstrong")) / p("ref_h22_armstrong") }
    val tableDev = got.zip(hirschmannRows).map { case (g, (m, _, _)) =>
      g / (1.0 + g) - m("Fe3Fetotal_armstrong") }
    info(f"h22(armstrong) parity: max rel dev = ${maxAbs(parityDev)}%.2e")
    info(f"h22(armstrong) vs Hirschmann table: max |dFe3Fetotal| = " +
      f"${maxAbs(tableDev)}%.4f median ${medianAbs(tableDev)}%.4f")
    assert(maxAbs(parityDev) < 1e-6)
    assert(maxAbs(tableDev) < 0.01) // reference achieves 0.0042
  }

  test("hirschmann2022 (deng dVdP) matches reference + published table") {
    val devs = hirschmannRows.toSeq.map { case (m, mol, p) =>
      val g = Fe3Fe2Iterative.hirschmann2022DengVdP(mol, m("T_K"),
        m("P_GPa") * 1e4, math.pow(10.0, m("log10fO2")))
      ((g - p("ref_h22_deng")) / p("ref_h22_deng"),
        g / (1.0 + g) - m("Fe3Fetotal_deng"))
    }
    val (parityDev, tableDev) = devs.unzip
    info(f"h22(deng) parity: max rel dev = ${maxAbs(parityDev)}%.2e")
    info(f"h22(deng) vs Hirschmann table: max |dFe3Fetotal| = " +
      f"${maxAbs(tableDev)}%.4f median ${medianAbs(tableDev)}%.4f")
    assert(maxAbs(parityDev) < 1e-6)
    assert(maxAbs(tableDev) < 0.01) // reference achieves 0.0037
  }

  test("deng2020 reproduces Deng (2020)'s planet adiabat curves") {
    val comps = {
      val (h, rs) = load("deng2020_compositions.csv")
      rs.map { r =>
        r(0) -> cationToOxideMol(
          h.drop(1).dropRight(1).zipWithIndex.map { case (c, i) =>
            c -> num(r(i + 1)) })
      }.toMap
    }
    for ((planet, meltFe) <- Seq("earth" -> "12.5molpc",
        "moon" -> "12.5molpc", "mars" -> "25molpc")) {
      val mol = comps(planet)
      val devs = rows(s"deng2020_$planet.csv").zipWithIndex
        .collect { case (r, i) if i % 5 == 0 => r }.toSeq.map { r =>
          val x = Deng2020.fe3Fe2(mol, r("T_K"), r("P_GPa") * 1e4,
            math.pow(10.0, r("log10fO2")), meltFe)
          x / (1.0 + x) - r("Fe3Fetotal")
        }
      info(f"deng2020 $planet: max |dFe3Fetotal| = ${maxAbs(devs)}%.4f " +
        f"over ${devs.size} points")
      assert(maxAbs(devs) < 0.01, f"$planet max dev ${maxAbs(devs)}%.4f")
    }
  }

  // ---- Spark-side helpers -------------------------------------------------

  /** Build a DataFrame with (row_id, numeric columns) from fixture maps. */
  private def fixtureDf(ms: Seq[Map[String, Double]], cols: Seq[String]) = {
    val schema = StructType(StructField("row_id", IntegerType) +:
      cols.map(c => StructField(c, DoubleType)))
    val rws = ms.zipWithIndex.map { case (m, i) =>
      Row.fromSeq(i +: cols.map(c => m.getOrElse(c, Double.NaN) match {
        case d if d.isNaN => 0.0
        case d => d
      }))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rws, 2), schema)
  }

  private def evalCol(df: org.apache.spark.sql.DataFrame,
                      c: org.apache.spark.sql.Column): Seq[Double] =
    df.select(c.cast("double").as("v"), org.apache.spark.sql.functions
      .col("row_id")).collect().sortBy(_.getInt(1)).toSeq.map(_.getDouble(0))

  test("sun2024 matches Sun et al. (2024)'s Excel implementation") {
    val ms = rows("Fe3Fe2_input_sun2024.csv")
    val elements = Vector("SiO2", "TiO2", "Al2O3", "MgO", "CaO", "Na2O",
      "K2O", "P2O5", "MnO", "CoO", "NiO", "FeO")
    val df = fixtureDf(ms, elements ++ Seq("T_K", "P_bar", "fO2"))
    val mctx = CompCtx(elements)
    val e = Fe3Fe2.sun2024(mctx, C("T_K"), C("fO2"), C("P_bar"))
    val got = evalCol(df, E.toColumn(e))
    val devs = got.zip(ms).map { case (g, m) =>
      (g - m("_Fe3Fe2_sun2024")) / m("_Fe3Fe2_sun2024")
    }
    info(f"sun2024: max |rel dev| = ${maxAbs(devs)}%.4f " +
      f"median ${medianAbs(devs)}%.4f over ${devs.size} samples")
    assert(maxAbs(devs) < 0.02, f"max rel dev ${maxAbs(devs)}%.4f")
  }

  // ---- thermometers vs author Excel sheets --------------------------------

  private lazy val calibration: Map[String, Map[String, Double]] = {
    val (h, rs) = load("Kd_calibration_data.csv")
    rs.map { r =>
      r(h.indexOf("run")) -> h.zip(r.map(num)).toMap
    }.toMap
  }

  test("putirka2008 thermometers match Putirka's Excel sheet") {
    val golden = {
      val (h, rs) = load("melt_thermometer_putirka2008.csv")
      rs.map(r => r(0) -> h.tail.zip(r.tail.map(num)).toMap).toMap
    }
    val runs = golden.keys.toSeq.sorted.filter(calibration.contains)
    val elements = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "H2O")
    val ms = runs.map(r => calibration(r))
    val df = fixtureDf(ms, elements :+ "P_bar")
    val mctx = CompCtx(elements)
    for (name <- Seq("putirka2008_13", "putirka2008_14", "putirka2008_15",
        "putirka2008_16", "putirka2008_22")) {
      val got = evalCol(df, E.toColumn(Thermometers.all(name)(mctx, 0.0)))
      // golden sheet records Celsius
      val devs = got.zip(runs).map { case (g, run) =>
        g - 273.15 - golden(run)(name)
      }
      info(f"$name: max |dT| = ${maxAbs(devs)}%.2f K " +
        f"median ${medianAbs(devs)}%.2f K over ${devs.size} runs")
      assert(medianAbs(devs) < 5.0, f"$name median dev ${medianAbs(devs)}%.2f")
      assert(maxAbs(devs) < 25.0, f"$name max dev ${maxAbs(devs)}%.2f")
    }
  }

  test("sun2020 thermometer and Kd match Sun's Excel sheet") {
    val golden = rows("Kd_sun2020.csv")
    val (gh, grs) = load("Kd_sun2020.csv")
    val runs = grs.map(_(0)).filter(calibration.contains)
    val goldenByRun = grs.map(r => r(0) -> gh.zip(r.map(num)).toMap).toMap
    val elements = Vector("SiO2", "TiO2", "Al2O3", "Cr2O3", "FeO", "MnO",
      "MgO", "CaO", "Na2O", "K2O", "P2O5", "NiO", "H2O", "CO2")
    val ms = runs.toSeq.map(r => calibration(r) ++
      Map("P_bar" -> goldenByRun(r)("P_bar")))
    val df = fixtureDf(ms, elements :+ "P_bar")
    val mctx = CompCtx(elements)

    val gotT = evalCol(df, E.toColumn(Thermometers.sun2020(mctx)))
    val devT = gotT.zip(runs).map { case (g, run) =>
      g - goldenByRun(run)("T_K") }
    info(f"sun2020 T: max |dT| = ${maxAbs(devT)}%.2f K " +
      f"median ${medianAbs(devT)}%.2f K over ${devT.size} runs")
    assert(medianAbs(devT) < 10.0, f"median dT ${medianAbs(devT)}%.2f")

    // Kd at fixed Fe3Fe2 = 0.2, Fe_total basis (benchmark notebook recipe)
    val kdFe2 = evalCol(df, E.toColumn(Kd.sun2020(mctx, Lit(0.2))))
    val fe3FeTot = 0.2 / 1.2
    val devKd = kdFe2.zip(runs).map { case (g, run) =>
      g * (1 - fe3FeTot) - goldenByRun(run)("Kd_Fetotal") }
    info(f"sun2020 Kd: max |dKd| = ${maxAbs(devKd)}%.4f " +
      f"median ${medianAbs(devKd)}%.4f over ${devKd.size} runs")
    assert(medianAbs(devKd) < 0.02, f"median dKd ${medianAbs(devKd)}%.4f")
  }

  // ---- Kd models vs measured values ---------------------------------------

  test("saper2022 Kd predictions sit on the measured values (fig 6a)") {
    val ms = rows("Kd_saper2022_table3_glass.csv")
    val elements = Vector("SiO2", "TiO2", "Al2O3", "Cr2O3", "FeO", "MnO",
      "MgO", "CaO", "Na2O", "K2O", "NiO")
    val df = fixtureDf(ms, elements ++ Seq("T_K", "fO2"))
    val mctx = CompCtx(elements)
    val fe3fe2 = E.toColumn(Fe3Fe2.borisov2018(mctx, C("T_K"), C("fO2")))
    val kdPred = Kd.saper2022(
      E.toColumn(mctx.molNorm("FeO")), E.toColumn(mctx.molNorm("MgO")),
      E.toColumn(mctx.cat("Si")), E.toColumn(mctx.cat("Ti")),
      E.toColumn(mctx.cat("Na") + mctx.cat("K")),
      fe3fe2, org.apache.spark.sql.functions.col("T_K"))
    val got = evalCol(df, kdPred)
    val fe3 = evalCol(df, fe3fe2)
    val devs = got.zip(fe3).zip(ms).map { case ((kd, r), m) =>
      val measuredFe2 = m("Kd_FeTMg") / (1.0 - r / (1.0 + r))
      kd - measuredFe2
    }
    info(f"saper2022: max |dKd_Fe2| = ${maxAbs(devs)}%.4f " +
      f"median ${medianAbs(devs)}%.4f over ${devs.size} runs")
    // measured-vs-predicted (experimental scatter); fig 6a spans 0.30-0.37
    assert(medianAbs(devs) < 0.02, f"median ${medianAbs(devs)}%.4f")
    assert(maxAbs(devs) < 0.06, f"max ${maxAbs(devs)}%.4f")
  }

  // ---- volatile saturation vs reference execution -------------------------

  test("saturation models match the reference implementation (parity fixture)") {
    // golden/ref_saturation_parity.csv = the reference's own
    // iaconomarziano2012 / allison2022 / shishkina2014 h2o/co2/mixed
    // saturation + fixed-condition solubility executed in-container over 18
    // composition x volatile x T cases (the reference publishes no
    // solubility benchmark fixtures of its own).
    val ms = rows("ref_saturation_parity.csv")
    val oxides = Array("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO",
      "Na2O", "K2O", "P2O5", "H2O", "CO2")
    def relDevs(tag: String)(
        f: (IaconoMarziano.Comp, Double, Map[String, Double]) => Option[(Double, Double)])
        : Seq[Double] =
      ms.toSeq.flatMap { m =>
        val c = IaconoMarziano.Comp(oxides, oxides.map(m(_)))
        f(c, m("T_K"), m).toSeq.flatMap { case (got, want) =>
          if (want.isNaN) None
          else Some(math.abs(got - want) / math.max(math.abs(want), 1e-9))
        }
      }
    val checks: Seq[(String, Seq[Double])] = Seq(
      "im_h2o_sat" -> relDevs("im_h2o_sat")((c, t, m) =>
        Some((IaconoMarziano.h2oSaturation(c, t), m("im_h2o_sat")))),
      "im_co2_sat" -> relDevs("im_co2_sat")((c, t, m) =>
        Some((IaconoMarziano.co2Saturation(c, t), m("im_co2_sat")))),
      "im_mixed_P" -> relDevs("im_mixed_P")((c, t, m) =>
        Some((IaconoMarziano.mixedSaturation(c, t)._1, m("im_mixed_P")))),
      "im_mixed_X" -> relDevs("im_mixed_X")((c, t, m) =>
        Some((IaconoMarziano.mixedSaturation(c, t)._2, m("im_mixed_X")))),
      "im_h2o_sol" -> relDevs("im_h2o_sol")((c, t, m) =>
        Some((IaconoMarziano.h2oSolubility(c, 1.0, 2000.0, t), m("im_h2o_sol_2k")))),
      "im_co2_sol" -> relDevs("im_co2_sol")((c, t, m) =>
        Some((IaconoMarziano.co2Solubility(c, 0.0, 2000.0, t) * 1e4, m("im_co2_sol_2k")))),
      "al_h2o_sat" -> relDevs("al_h2o_sat")((c, t, m) =>
        Some((Allison.h2oSaturation(c, t), m("al_h2o_sat")))),
      "al_co2_sat" -> relDevs("al_co2_sat")((c, t, m) =>
        Some((Allison.co2Saturation(c, t), m("al_co2_sat")))),
      "al_mixed_P" -> relDevs("al_mixed_P")((c, t, m) =>
        Some((Allison.mixedSaturation(c, t)._1, m("al_mixed_P")))),
      "al_h2o_sol" -> relDevs("al_h2o_sol")((c, t, m) =>
        Some((Allison.h2oSolubility(t, 2000.0), m("al_h2o_sol_2k")))),
      "al_co2_sol" -> relDevs("al_co2_sol")((c, t, m) =>
        Some((Allison.co2Solubility(c, t, 2000.0), m("al_co2_sol_2k")))),
      "sh_h2o_sat" -> relDevs("sh_h2o_sat")((c, t, m) =>
        Some((Shishkina.h2oSaturation(c), m("sh_h2o_sat")))),
      "sh_co2_sat" -> relDevs("sh_co2_sat")((c, t, m) =>
        Some((Shishkina.co2Saturation(c), m("sh_co2_sat")))),
      "sh_mixed_P" -> relDevs("sh_mixed_P")((c, t, m) =>
        Some((Shishkina.mixedSaturation(c)._1, m("sh_mixed_P")))),
      "sh_h2o_sol" -> relDevs("sh_h2o_sol")((c, t, m) =>
        Some((Shishkina.h2oSolubility(c, 1.0, 2000.0), m("sh_h2o_sol_2k")))),
      "sh_co2_sol" -> relDevs("sh_co2_sol")((c, t, m) =>
        Some((Shishkina.co2Solubility(c, 0.0, 2000.0), m("sh_co2_sol_2k")))),
      // x_fluid = 0.5: exercises the dissolved-H2O -> CO2 cross-coupling
      // (d_H2O term) that the pure-species cases cannot reach
      "im_h2o_sol_05" -> relDevs("im_h2o_sol_05")((c, t, m) =>
        Some((IaconoMarziano.h2oSolubility(c, 0.5, 2000.0, t), m("im_h2o_sol_05")))),
      "im_co2_sol_05" -> relDevs("im_co2_sol_05")((c, t, m) =>
        Some((IaconoMarziano.co2Solubility(c, 0.5, 2000.0, t) * 1e4, m("im_co2_sol_05")))),
      // NOTE: the al_co2_sol_05 fixture column is all-NaN (skipped): the
      // reference RAISES on every mixed-fluid Allison CO2 solubility call
      // (`allison2022.py:315` passes `species` positionally but its
      // `_check_argument` decorator only reads kwargs). Our implementation
      // takes the documented semantics instead of replicating the crash.
      "al_co2_sol_05" -> relDevs("al_co2_sol_05")((c, t, m) =>
        Some((Allison.co2Solubility(c, t, 2000.0, 0.5), m("al_co2_sol_05")))),
      "sh_co2_sol_05" -> relDevs("sh_co2_sol_05")((c, t, m) =>
        Some((Shishkina.co2Solubility(c, 0.5, 2000.0), m("sh_co2_sol_05")))))
    for ((tag, devs) <- checks) {
      info(f"$tag: max rel dev = ${maxAbs(devs)}%.2e over ${devs.size} cases")
      assert(maxAbs(devs) < 1e-3, f"$tag max rel dev ${maxAbs(devs)}%.2e")
    }
  }

  test("oneill2006 and iterative Kd models match the reference (parity fixture)") {
    // golden/ref_kd_parity.csv = reference execution of oneill2006 Fe3Fe2
    // and the full Fo-iterating toplis2005/blundy2020/saper2022 Kd chains
    // over 18 composition x (T, P) cases.
    val ms = rows("ref_kd_parity.csv")
    val elements = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "P2O5", "H2O", "CO2")
    val df = fixtureDf(ms.toIndexedSeq, elements ++ Seq("T_K", "fO2"))
    val mctx = CompCtx(elements)
    val borisov = evalCol(df,
      E.toColumn(Fe3Fe2.borisov2018(mctx, C("T_K"), C("fO2"))))
    val checksPerRow = ms.toSeq.zip(borisov).map { case (m, bor) =>
      val mol = wtToMol(elements.map(e => e -> m(e)))
      def molPc(ox: String): Double = mol.getOrElse(ox, 0.0) * 100.0
      val t = m("T_K"); val p = m("P_bar"); val f = m("fO2")
      val oneill = Fe3Fe2Iterative.oneill2006(mol, t, p, f)
      val toplis = Kd.toplisIterate(molPc("SiO2"), molPc("Na2O"),
        molPc("K2O"), molPc("H2O"), mol.getOrElse("FeO", 0.0),
        mol.getOrElse("MgO", 0.0), m("fe3fe2_in"), t, p)
      val blundy = Kd.blundy2020Iterate(mol.getOrElse("FeO", 0.0),
        mol.getOrElse("MgO", 0.0), bor, t)
      val saper = {
        val cats = Fe3Fe2Iterative.plainCations(mol)
        Kd.saper2022Iterate(mol.getOrElse("FeO", 0.0),
          mol.getOrElse("MgO", 0.0), cats.getOrElse("Si", 0.0),
          cats.getOrElse("Ti", 0.0),
          cats.getOrElse("Na", 0.0) + cats.getOrElse("K", 0.0),
          m("fe3fe2_in"), t)
      }
      Seq("oneill2006" -> (oneill, m("ref_oneill2006")),
        "toplis2005_iter" -> (toplis, m("ref_toplis")),
        "blundy2020_iter" -> (blundy, m("ref_blundy")),
        "saper2022_iter" -> (saper, m("ref_saper")))
    }
    for (tag <- Seq("oneill2006", "toplis2005_iter", "blundy2020_iter",
        "saper2022_iter")) {
      val devs = checksPerRow.map(_.toMap.apply(tag)).map { case (got, want) =>
        math.abs(got - want) / want }
      info(f"$tag: max rel dev = ${maxAbs(devs)}%.2e over ${devs.size} cases")
      assert(maxAbs(devs) < 1e-3, f"$tag max rel dev ${maxAbs(devs)}%.2e")
    }
  }

  test("every closed-form model family matches the reference (parity fixture)") {
    // golden/ref_models_parity.csv = reference execution of ALL closed-form
    // thermometers, Fe3Fe2 models, Kd models and fO2 buffers over 18
    // composition x (T, P) cases. This catches transcribed-constant errors
    // that the DuckDB oracle cannot (it consumes the same AST we compile).
    val ms = rows("ref_models_parity.csv")
    val elements = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "P2O5", "H2O", "CO2")
    val df = fixtureDf(ms.toIndexedSeq, elements ++ Seq("T_K", "P_bar", "fO2"))
    val mctx = CompCtx(elements)
    def check(tag: String, e: E): Unit = {
      val got = evalCol(df, E.toColumn(e))
      val devs = got.zip(ms).map { case (g, m) =>
        math.abs(g - m(tag)) / math.max(math.abs(m(tag)), 1e-300) }
      info(f"$tag: max rel dev = ${maxAbs(devs)}%.2e")
      assert(maxAbs(devs) < 1e-9, f"$tag max rel dev ${maxAbs(devs)}%.2e")
    }
    for (name <- Thermometers.all.keys.toSeq.sorted)
      check(s"th_$name", Thermometers.all(name)(mctx, 0.0))
    // offset = 1 sigma pins the SEE error constants too
    val withOffset: Map[String, (CompCtx, Double) => E] = Map(
      "putirka2008_13" -> (Thermometers.putirka2008_13(_, _)),
      "putirka2008_14" -> (Thermometers.putirka2008_14(_, _)),
      "putirka2008_15" -> (Thermometers.putirka2008_15(_, _)),
      "putirka2008_16" -> (Thermometers.putirka2008_16(_, _)),
      "putirka2008_22" -> (Thermometers.putirka2008_22(_, _)),
      "sun2020" -> (Thermometers.sun2020(_, _)),
      "shea2022" -> (Thermometers.shea2022(_, _)),
      "sugawara2000_3" -> (Thermometers.sugawara2000_3(_, _)),
      "sugawara2000_6a" -> (Thermometers.sugawara2000_6a(_, _)))
    for ((name, f) <- withOffset.toSeq.sortBy(_._1))
      check(s"th_${name}_off1", f(mctx, 1.0))
    // the AST sun2024 is the dV="parameterised" variant; the reference
    // DEFAULT dV="deng" is the scalar sun2024DengVdP, checked below
    for (name <- Fe3Fe2.closedForm.keys.toSeq.sorted) {
      val tag = if (name == "sun2024") "fe_sun2024_param" else s"fe_$name"
      check(tag, Fe3Fe2.closedForm(name)(mctx, C("T_K"), C("fO2"), C("P_bar")))
    }
    locally {
      val devs = ms.toSeq.map { m =>
        val mol = wtToMol(elements.map(e => e -> m(e)))
        val g = Fe3Fe2Iterative.sun2024DengVdP(mol, m("T_K"), m("P_bar"),
          m("fO2"))
        math.abs(g - m("fe_sun2024")) / m("fe_sun2024")
      }
      info(f"fe_sun2024 (deng dV): max rel dev = ${maxAbs(devs)}%.2e")
      assert(maxAbs(devs) < 1e-9)
    }
    check("kd_putirka2016_8a", Kd.putirka2016_8a)
    check("kd_putirka2016_8b", Kd.putirka2016_8b(mctx, C("P_bar")))
    check("kd_putirka2016_8c", Kd.putirka2016_8c(mctx))
    check("kd_putirka2016_8d", Kd.putirka2016_8d(mctx, C("P_bar")))
    check("kd_sun2020", Kd.sun2020(mctx, Lit(0.2)))
    check("rheo_density", Rheology.density(mctx, C("T_K"), C("P_bar")))
    check("rheo_viscosity", Rheology.viscosity(mctx, C("T_K")))
    check("fo2_nno", Fo2Buffers.nno(C("T_K"), C("P_bar")))
    check("fo2_nno_1bar", Fo2Buffers.nno1bar(C("T_K")))
    check("fo2_nno_frost", Fo2Buffers.nnoFrost(C("T_K"), C("P_bar")))
    check("fo2_ruruo2", Fo2Buffers.ruRuO2(C("T_K"), C("P_bar")))
    check("fo2_iw_campbell", Fo2Buffers.iwCampbell(C("T_K"), C("P_bar")))
    check("fo2_fefeo", Fo2Buffers.feFeO94OneillHuebner(C("T_K"), C("P_bar")))
    check("fo2_iw_zhang", Fo2Buffers.iwZhang(C("T_K"), C("P_bar")))
    check("fo2_iw_oneill1993", Fo2Buffers.iwOneill1993(C("T_K")))
  }

  test("olivine-melt thermometer matches the reference (parity fixture)") {
    // ref_olmelt_parity.csv = reference putirka2007_4 on melt+olivine
    // pairs; evaluates the PRODUCT's factored expression (olMeltTExpr +
    // olMeltMeltDerives) on the same compositions.
    import org.apache.spark.sql.functions.col
    val ms = rows("ref_olmelt_parity.csv")
    val meltEls = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "P2O5", "H2O", "CO2", "CoO", "NiO")
    val olEls = Vector("SiO2", "FeO", "MnO", "MgO", "CaO", "NiO")
    val ctx = CompCtx(meltEls)
    val olCtx = CompCtx(olEls)
    val meltDf = fixtureDf(ms.toIndexedSeq.map(m =>
      meltEls.map(e => e -> m(s"melt_$e")).toMap + ("P_bar" -> m("P_bar"))),
      meltEls :+ "P_bar")
    val derived = Queries.olMeltMeltDerives(ctx).foldLeft(meltDf) {
      case (d, (n, e)) => d.withColumn(n, E.toColumn(e))
    }
    val olDf = fixtureDf(ms.toIndexedSeq.map(m =>
      olEls.map(e => e -> m(s"ol_$e")).toMap), olEls)
      .select(col("row_id").as("ol_row_id"),
        E.toColumn(olCtx.cat("Mg")).as("ol_mg_cat"))
    val got = derived.join(olDf, col("row_id") === col("ol_row_id"))
      .select(col("row_id"), E.toColumn(Queries.olMeltTExpr).as("t"))
      .collect().sortBy(_.getAs[Int]("row_id")).map(_.getAs[Double]("t"))
    for ((g, m) <- got.zip(ms))
      assert(math.abs(g - m("T_K")) < 1e-5, s"$g vs ${m("T_K")}")
  }

  test("conversion semantics match the reference (parity fixture)") {
    // ref_conversions_parity.csv = reference moles()/cations() on a melt
    // and forsterite/4-oxygen formula on olivines — pins normalisation
    // choices (what sums to 1, which columns join the denominator).
    val (h, rs) = load("ref_conversions_parity.csv")
    val kindIdx = h.indexOf("kind")
    val byKind = rs.map(r => r(kindIdx) -> h.zip(r.map(num)).toMap).toMap
    val meltEls = Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "P2O5", "H2O", "CO2")
    def staged(els: Vector[String]) = graft.core.Staged(
      graft.core.MagmaSchema(els, Vector("row_id"),
        graft.core.CUnit.WtPc, graft.core.CType.Oxide), Vector.empty)
    val m = byKind("melt")
    val meltDf = fixtureDf(Seq(meltEls.map(e => e -> m(s"in_$e")).toMap), meltEls)
    val molRow = Pipeline.applySpark(meltDf, staged(meltEls).moles().stages)
      .collect().head
    for (e <- meltEls)
      assert(math.abs(molRow.getAs[Double](e) - m(s"mol_$e")) < 1e-12,
        s"mol $e: ${molRow.getAs[Double](e)} vs ${m(s"mol_$e")}")
    val catRow = Pipeline.applySpark(meltDf, staged(meltEls).cations().stages)
      .collect().head
    for (c <- Seq("Si", "Ti", "Al", "Fe", "Mn", "Mg", "Ca", "Na", "K", "P"))
      assert(math.abs(catRow.getAs[Double](c) - m(s"cat_$c")) < 1e-12,
        s"cat $c: ${catRow.getAs[Double](c)} vs ${m(s"cat_$c")}")

    val olEls = Vector("SiO2", "FeO", "MnO", "MgO", "CaO", "NiO")
    val olRows = Seq("olivine0", "olivine1").map(k => byKind(k))
    val olDf = fixtureDf(olRows.map(r => olEls.map(e =>
      e -> r(s"in_$e")).toMap), olEls)
    val fo = Pipeline.applySpark(olDf, staged(olEls).withMgNumber("Fo").stages)
      .collect().sortBy(_.getAs[Int]("row_id"))
    for ((row, r) <- fo.zip(olRows))
      assert(math.abs(row.getAs[Double]("Fo") - r("forsterite")) < 1e-12,
        s"Fo: ${row.getAs[Double]("Fo")} vs ${r("forsterite")}")
    val fm = Pipeline.applySpark(olDf, staged(olEls).mineralFormula(4.0).stages)
      .collect().sortBy(_.getAs[Int]("row_id"))
    for ((row, r) <- fm.zip(olRows); c <- Seq("Si", "Fe", "Mn", "Mg", "Ca", "Ni"))
      assert(math.abs(row.getAs[Double](c) - r(s"fm_$c")) < 1e-12,
        s"formula $c: ${row.getAs[Double](c)} vs ${r(s"fm_$c")}")
  }

  test("mineral endmembers match the reference (parity fixture)") {
    // ref_endmembers_parity.csv = reference Magnetite/Ilmenite/Plagioclase
    // .endmembers executed on representative compositions — pins the
    // cation-basis endmember recipes the oracle cannot distinguish from a
    // consistently-wrong transcription.
    val (h, rs) = load("ref_endmembers_parity.csv")
    val kindIdx = h.indexOf("kind")
    def casesFor(kind: String): Seq[Map[String, Double]] =
      rs.filter(_(kindIdx) == kind).map(r => h.zip(r.map(num)).toMap).toSeq
    def checkKind(kind: String, elements: Vector[String],
                  op: graft.core.Staged => graft.core.Staged,
                  emCols: Seq[String]): Unit = {
      val ms = casesFor(kind)
      val df = fixtureDf(ms, elements)
      val staged = op(graft.core.Staged(graft.core.MagmaSchema(elements,
        Vector("row_id"), graft.core.CUnit.WtPc, graft.core.CType.Oxide),
        Vector.empty))
      val out = Pipeline.applySpark(df, staged.stages)
        .collect().sortBy(_.getAs[Int]("row_id"))
      for ((row, m) <- out.zip(ms); col <- emCols) {
        val got = row.getAs[Double](col)
        val want = m(s"em_$col")
        assert(math.abs(got - want) < 1e-9 * math.max(1.0, math.abs(want)),
          s"$kind $col: $got vs $want")
      }
    }
    checkKind("magnetite",
      Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "Cr2O3"),
      _.magnetiteEndmembers, Seq("magnetite", "ulvospinel"))
    checkKind("ilmenite",
      Vector("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO"),
      _.ilmeniteEndmembers,
      Seq("hematite", "ilmenite", "geikielite", "pyrophanite"))
    checkKind("plagioclase",
      Vector("SiO2", "Al2O3", "FeO", "CaO", "Na2O", "K2O"),
      _.plagEndmembers, Seq("anorthite", "albite", "orthoclase"))
  }

  test("reservoir constants match the reference's McDonough & Sun table") {
    // Mcdonough_sun_1995.csv copied verbatim from the reference's geoplot
    // data package — pins the C1-chondrite / primitive-mantle literals the
    // REE-normalisation expressions fold into plans.
    val (h, rs) = load("Mcdonough_sun_1995.csv")
    val byRes = rs.map(r => r(0) -> h.zip(r.map(num)).toMap).toMap
    for ((el, v) <- models.TraceElements.c1Chondrite if el != "Y")
      assert(byRes("C1")(el) == v, s"C1 $el: file ${byRes("C1")(el)} vs $v")
    assert(byRes("C1")("Y") == models.TraceElements.c1Chondrite("Y"))
    for ((el, v) <- models.TraceElements.primitiveMantle)
      assert(byRes("Pyrolite")(el) == v,
        s"PM $el: file ${byRes("Pyrolite")(el)} vs $v")
  }

  test("all 12 Fe3Fe2 1-bar error curves match the reference (parity fixture)") {
    // ref_fe3fe2_errors_parity.csv = reference get_error(Fe3Fe2=x) at
    // 1 bar (pressure omitted) — pins every model's fitted (a, b, c, d)
    // error parameters against transcription mistakes.
    val ms = rows("ref_fe3fe2_errors_parity.csv")
    for (model <- ErrorModels.fe3fe2ErrorParams1Bar.keys.toSeq.sorted) {
      val devs = ms.toSeq.map { m =>
        val got = ErrorModels.fe3fe2Error(model, m("fe3fe2"), 1.0)
        math.abs(got - m(s"err_$model")) / m(s"err_$model")
      }
      info(f"err_$model: max rel dev = ${maxAbs(devs)}%.2e")
      assert(maxAbs(devs) < 1e-12, f"$model ${maxAbs(devs)}%.2e")
    }
  }

  test("multi-span De Boor matches an independent Cox-de-Boor basis sum") {
    // borisov2018's HP error fit has 5 coefficients (2 spans) — the only
    // multi-span spline in the registry; evaluate it with the textbook
    // basis-function recursion as an algorithm-independent cross-check.
    def basis(i: Int, k: Int, x: Double, t: Array[Double]): Double =
      if (k == 0) {
        if (t(i) <= x && x < t(i + 1)) 1.0 else 0.0
      } else {
        val left = if (t(i + k) == t(i)) 0.0
          else (x - t(i)) / (t(i + k) - t(i)) * basis(i, k - 1, x, t)
        val right = if (t(i + k + 1) == t(i + 1)) 0.0
          else (t(i + k + 1) - x) / (t(i + k + 1) - t(i + 1)) *
            basis(i + 1, k - 1, x, t)
        left + right
      }
    val (t, c) = ErrorModels.fe3fe2SplineHP("borisov2018")
    for (x <- Seq(0.06, 0.2, 0.4, 0.59, 0.8, 1.2, 1.8, 2.1)) {
      val independent = c.indices.map(i => c(i) * basis(i, 3, x, t)).sum
      val deBoor = ErrorModels.splev(x, t, c)
      assert(math.abs(independent - deBoor) < 1e-12,
        s"x=$x: basis=$independent deBoor=$deBoor")
    }
  }

  test("closed-form HP error spline matches scalar De Boor evaluation") {
    val df = fixtureDf(Seq(Map("x" -> 0.0)), Seq("x"))
    for (x <- Seq(0.06, 0.1, 0.3, 0.5, 1.0, 1.5, 2.0, 2.16, 3.0)) {
      val got = evalCol(df,
        E.toColumn(ErrorModels.fe3fe2ErrorHPExpr("sun2024", Lit(x)))).head
      val want = ErrorModels.splev(x,
        ErrorModels.fe3fe2SplineHP("sun2024")._1,
        ErrorModels.fe3fe2SplineHP("sun2024")._2)
      assert(math.abs(got - want) < 1e-12, s"x=$x: $got vs $want")
    }
  }

  test("not-a-knot spline matches independent B-spline collocation interior values") {
    // Fixture: numpy-only Cox-de Boor collocation on the not-a-knot knot
    // vector — the construction scipy's interp1d(kind="cubic") uses —
    // validated by exact cubic-polynomial reproduction (3e-14); see
    // golden/README.md. Anchors INTERIOR values, not just knots.
    val (h, rws) = Golden.load("notaknot_spline.csv")
    val col = h.zipWithIndex.toMap
    for (ds <- Seq("d7", "d11")) {
      val mine = rws.filter(_(col("dataset")) == ds)
      val knots = mine.filter(_(col("role")) == "knot")
      val f = Isobars.cubicSpline(
        knots.map(_(col("x")).toDouble), knots.map(_(col("y")).toDouble))
      for (r <- mine.filter(_(col("role")) == "eval")) {
        val x = r(col("x")).toDouble; val want = r(col("y")).toDouble
        assert(math.abs(f(x) - want) < 1e-9, s"$ds x=$x: ${f(x)} vs $want")
      }
    }
    // the defining not-a-knot property: a cubic polynomial is reproduced
    // EXACTLY between knots (a natural spline fails this)
    val xs = Array(0.0, 0.7, 1.1, 1.9, 3.2, 4.0, 5.3)
    def cubic(x: Double) = x * x * x - 2.0 * x * x + 3.0 * x - 1.0
    val g = Isobars.cubicSpline(xs, xs.map(cubic))
    for (i <- 0 to 53; x = i * 0.1)
      assert(math.abs(g(x) - cubic(x)) < 1e-9, s"x=$x")
  }

  test("3-knot spline degenerates to the exact parabola (documented extension)") {
    // scipy's CubicSpline refuses n=3 under not-a-knot; the engine (and
    // the IsobarCurveSql n=3 CASE arm mirroring it) returns the unique
    // parabola through the points — verify it reproduces one exactly,
    // including outside the knot hull (a parabola has one global form).
    def parab(x: Double): Double = 2.0 * x * x - 3.0 * x + 1.0
    val xs = Array(0.0, 1.0, 3.0) // deliberately non-uniform spacing
    val f = Isobars.cubicSpline(xs, xs.map(parab))
    for (x <- Seq(0.0, 0.5, 1.0, 1.7, 2.9, 3.0))
      assert(math.abs(f(x) - parab(x)) < 1e-12, s"x=$x: ${f(x)} vs ${parab(x)}")
  }

  test("isobarCurves is distributed: per-group fit, no driver collect") {
    import spark.implicits._
    val big = (1L to 50L).flatMap(s => (0 until 10).map(i =>
      (s, 2000.0, i / 10.0, i * 0.5, 3.0 - i * 0.2)))
      .toDF("sample_id", "P_bar", "xfl", "H2O", "CO2")
    val curves = Isobars.isobarCurves(spark, big)
    // 50 groups x 10 knots x 10 points each
    assert(curves.count() == 50L * 100)
    // plan shape: one grouping aggregate, no CollectLimit/driver loop
    val plan = curves.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"), plan.take(400))
    assert(plan.contains("Aggregate"), plan.take(400))
  }

  test("isobar curves pass through their knots and track direct solubility") {
    import spark.implicits._
    val oxides = Array("SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO",
      "Na2O", "K2O", "P2O5", "H2O", "CO2")
    val vals = Array(48.5, 1.2, 15.3, 9.0, 0.17, 7.8, 11.0, 2.6, 0.7, 0.25,
      2.0, 0.05)
    val t = 1473.15
    val sample = Seq((1L, vals(0), vals(1), vals(2), vals(3), vals(4),
      vals(5), vals(6), vals(7), vals(8), vals(9), vals(10), vals(11), t))
      .toDF("sample_id" +: oxides.toIndexedSeq :+ "T_K": _*)
    val grid = Isobars.isobarGrid(sample, oxides, isobars = Seq(2000.0))
    val gridRows = grid.collect().map(r =>
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))) // (xfl, H2O, CO2)
    val curve = Isobars.isobarCurves(spark, grid).collect()
      .map(r => (r.getDouble(2), r.getDouble(3))) // (H2O, CO2)
    assert(curve.length >= 100)
    // the spline passes through every knot exactly (interpolation property)
    val sorted = gridRows.sortBy(_._1).filter(_._2 > 0)
    val kx = sorted.map(_._2); val ky = sorted.map(_._3)
    val f = Isobars.cubicSpline(kx, ky)
    for ((x, y) <- kx.zip(ky))
      assert(math.abs(f(x) - y) < 1e-12, s"knot ($x, $y) -> ${f(x)}")
    // interpolated CO2 tracks direct solubility evaluation between knots
    val comp = IaconoMarziano.Comp(oxides, vals)
    val co2Range = gridRows.map(_._3).max - gridRows.map(_._3).min
    val errs = curve.filter(p => p._1 > 1e-6 && p._1 < kx.last - 1e-8)
      .map { case (h, cInterp) =>
      val xfl = Solver.brent(x =>
        IaconoMarziano.h2oSolubility(comp, x, 2000.0, t) - h, 1e-9, 1.0 - 1e-9)
      math.abs(cInterp - IaconoMarziano.co2Solubility(comp, xfl, 2000.0, t))
    }
    info(f"isobar interp: max |dCO2| = ${errs.max}%.5f of range $co2Range%.4f")
    assert(errs.max < 0.02 * co2Range, s"max err ${errs.max}")
  }

  test("blundy2020 Kd formula reproduces measured Kd at reported Fo") {
    val ms = rows("Kd_blundy2020_input.csv").filter(m =>
      !m("olivine_forsterite").isNaN && !m("_Fe3Fe2").isNaN &&
        !m("Kd_FeTMg").isNaN)
    assert(ms.nonEmpty)
    val devs = ms.toSeq.map { m =>
      val fo = m("olivine_forsterite"); val r = m("_Fe3Fe2")
      val kdFe2 = 0.3642 * math.exp(312.7 * (1.0 - 2.0 * fo) / m("T_K"))
      kdFe2 * (1.0 - r / (1.0 + r)) - m("Kd_FeTMg")
    }
    info(f"blundy2020: max |dKd_FeT| = ${maxAbs(devs)}%.4f " +
      f"median ${medianAbs(devs)}%.4f over ${devs.size} runs")
    assert(medianAbs(devs) < 0.03, f"median ${medianAbs(devs)}%.4f")
  }
}
