package graft

import org.apache.spark.sql.functions._
import graft.functions.{IaconoMarziano, QfmFull}
import graft.Queries.Q

/** Solver-backed operators. Every query carries a full DuckDB oracle: the
  * solver loops are deterministic fixed-step bisections / Picard
  * iterations dual-compiled as recursive CTEs (`*Sql.scala`), including
  * the driver-side not-a-knot spline assembly ([[IsobarCurveSql]]).
  */
object SolverQueries {

  private val meltEls = Tables.meltElements.toArray

  private def compUdf(f: (IaconoMarziano.Comp, Double) => Double) =
    udf((wt: Seq[Double], tK: Double) =>
      f(IaconoMarziano.Comp(meltEls, wt.toArray), tK))

  private val wtArray = array(Tables.meltElements.map(col): _*)

  /** Spread CPU-bound per-row solves across the cluster: a small local scan
    * yields 1-2 input partitions, which would serialize the solver UDF on
    * one core (observed: the Shishkina solve pinned a single task for
    * minutes at sf0.01). Only ever RAISES the partition count — at 100 TB
    * the scan already has thousands of partitions and this is a no-op, so
    * no gratuitous shuffle at scale. */
  private def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def all: Seq[Q] = Seq(
    // EP2 flagship: volatile saturation pressure (mixed H2O-CO2 fluid).
    // Full oracle: closed inner fixed point -> pure-species bisections +
    // branch-free Picard, rendered as recursive CTEs (SaturationSql).
    Q("q_saturation_mixed", (s, dir) => {
      val sat = udf((wt: Seq[Double], tK: Double) => {
        val (p, x) = IaconoMarziano
          .mixedSaturation(IaconoMarziano.Comp(meltEls, wt.toArray), tK)
        (p, x)
      })
      Tables.meltsRangedDF(s, dir)
        .withColumn("sat", sat(wtArray, col("T_K")))
        .select(col("sample_id"), round(col("sat._1"), 4).as("P_sat_bar"),
          round(col("sat._2"), 6).as("X_fluid"))
        .orderBy("sample_id")
    }, Some(SaturationSql.mixed)),
    Q("q_saturation_h2o", (s, dir) => {
      val sat = compUdf((c, t) => IaconoMarziano.h2oSaturation(c, t))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(sat(wtArray, col("T_K")), 4).as("P_sat_bar"))
        .orderBy("sample_id")
    }, Some(SaturationSql.h2o)),
    Q("q_saturation_co2", (s, dir) => {
      val sat = compUdf((c, t) => IaconoMarziano.co2Saturation(c, t))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(sat(wtArray, col("T_K")), 4).as("P_sat_bar"))
        .orderBy("sample_id")
    }, Some(SaturationSql.co2)),
    // Dissolved volatiles at in-table (P, T), x_fluid = 0.5. Full oracle:
    // secant + bisection-fallback fixed point rendered as recursive CTEs
    // (SolubilitySql), CO2 closed-form from the solved H2O.
    Q("q_solubility_mixed", (s, dir) => {
      val sol = udf((wt: Seq[Double], p: Double, tK: Double) => {
        val c = IaconoMarziano.Comp(meltEls, wt.toArray)
        val h = IaconoMarziano.h2oSolubility(c, 0.5, p, tK)
        val co = IaconoMarziano.co2Solubility(c, 0.5, p, tK)
        (h, co)
      })
      Tables.meltsRangedDF(s, dir)
        .withColumn("sol", sol(wtArray, col("P_bar"), col("T_K")))
        .select(col("sample_id"), round(col("sol._1"), 6).as("H2O_dissolved"),
          round(col("sol._2"), 6).as("CO2_dissolved"))
        .orderBy("sample_id")
    }, Some(SolubilitySql.sql)),
    // Full QFM with EOS pressure terms: one narrow per-row UDF stage with
    // per-executor (T,P) memo caches — no shuffle, no unbounded broadcast
    // (see the scale note on QfmFull). Full oracle: bisection transition
    // solve + Tait/Landau VdP replicated op-for-op by QfmSql.
    Q("q_fo2_qfm_full", (s, dir) => {
      QfmFull.withQfm(Tables.meltsRangedDF(s, dir), "T_K", "P_bar",
          logshift = 0.0)
        .select(col("sample_id"), round(log10(col("fO2")), 6).as("log10_fO2"))
        .orderBy("sample_id")
    }, Some(QfmSql.sql)),
    // Full IW buffer (Hirschmann 2021): Vinet EOS + wustite equilibrium;
    // same per-row memoised-UDF shape (IwFull caches per (T,P) internally).
    // Full oracle: bisection volume/wustite solves + trapezoid VdP
    // replicated by IwSql (grids on DISTINCT P, mirroring the cache).
    Q("q_fo2_iw_full", (s, dir) => {
      graft.functions.IwFull.withIw(Tables.meltsRangedDF(s, dir),
          "T_K", "P_bar", logshift = 0.0, as = "fO2_iw")
        .select(col("sample_id"), round(log10(col("fO2_iw")), 6).as("log10_fO2"))
        .orderBy("sample_id")
    }, Some(IwSql.sql)),
    // Second solubility model family (config-dispatchable alternative).
    // Full oracle: the decoupled partial-pressure solve is deterministic
    // straight-line arithmetic (closed-form CO2 + fixed-step H2O bisection),
    // replicated op-for-op by ShishkinaSql's recursive-CTE rendering.
    Q("q_saturation_shishkina", (s, dir) => {
      val sat = udf((wt: Seq[Double]) => {
        val (p, x) = graft.functions.Shishkina
          .mixedSaturation(IaconoMarziano.Comp(meltEls, wt.toArray))
        (p, x)
      })
      Tables.meltsRangedDF(s, dir)
        .withColumn("sat", sat(wtArray))
        .select(col("sample_id"), round(col("sat._1"), 4).as("P_sat_bar"),
          round(col("sat._2"), 6).as("X_fluid"))
        .orderBy("sample_id")
    }, Some(ShishkinaSql.sql)),
    // Third solubility model family. Full oracle: the 2-D fsolve decouples
    // into three monotone 1-D bisections (see Allison.mixedSaturation);
    // AllisonSql renders them — including the MRK cubic-root branches and
    // the >4 kbar Saxena correction — as recursive CTEs.
    Q("q_saturation_allison", (s, dir) => {
      val sat = udf((wt: Seq[Double], tK: Double) => {
        val (p, x) = graft.functions.Allison
          .mixedSaturation(IaconoMarziano.Comp(meltEls, wt.toArray), tK)
        (p, x)
      })
      Tables.meltsRangedDF(s, dir)
        .withColumn("sat", sat(wtArray, col("T_K")))
        .select(col("sample_id"), round(col("sat._1"), 4).as("P_sat_bar"),
          round(col("sat._2"), 6).as("X_fluid"))
        .orderBy("sample_id")
    }, Some(AllisonSql.sql)),
    // Iterative Fe3Fe2 models: per-row fixed point (activities depend on
    // speciation), fO2 from QFM 1-bar. oneill2006/armstrong2019 carry
    // recursive-CTE oracles (Fe3Fe2IterSql); deng2020/sun2024-deng mirror
    // their EOS-integral dVdP lattice + solvers through DengSql.
    Q("q_fe3fe2_oneill2006_iterative", (s, dir) => {
      val f = udf((wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        graft.functions.Fe3Fe2Iterative.oneill2006(
          IaconoMarziano.Comp(meltEls, wt.toArray).molNorm, tK, pBar, fO2))
      val fO2 = graft.expr.E.toColumn(
        graft.models.Fo2Buffers.qfm1bar(graft.expr.C("T_K")))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(f(wtArray, col("T_K"), col("P_bar"), fO2), 6).as("Fe3Fe2"))
        .orderBy("sample_id")
    }, Some(Fe3Fe2IterSql.oneill2006)),
    Q("q_fe3fe2_armstrong2019_iterative", (s, dir) => {
      val f = udf((wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        graft.functions.Fe3Fe2Iterative.armstrong2019(
          IaconoMarziano.Comp(meltEls, wt.toArray).molNorm, tK, pBar, fO2))
      val fO2 = graft.expr.E.toColumn(
        graft.models.Fo2Buffers.qfm1bar(graft.expr.C("T_K")))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(f(wtArray, col("T_K"), col("P_bar"), fO2), 6).as("Fe3Fe2"))
        .orderBy("sample_id")
    }, Some(Fe3Fe2IterSql.armstrong2019)),
    // Reference-default sun2024 (dV="deng": EOS-integral Gamma). The
    // oracle-checked q_fe3fe2_sun2024 is the dV="parameterised" variant.
    Q("q_fe3fe2_sun2024_deng", (s, dir) => {
      val f = udf((wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        graft.functions.Fe3Fe2Iterative.sun2024DengVdP(
          IaconoMarziano.Comp(meltEls, wt.toArray).molNorm, tK, pBar, fO2))
      val fO2 = graft.expr.E.toColumn(
        graft.models.Fo2Buffers.qfm1bar(graft.expr.C("T_K")))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(f(wtArray, col("T_K"), col("P_bar"), fO2), 6).as("Fe3Fe2"))
        .orderBy("sample_id")
    }, Some(DengSql.sun2024)),
    Q("q_fe3fe2_deng2020", (s, dir) => {
      val f = udf((wt: Seq[Double], tK: Double, pBar: Double, fO2: Double) =>
        graft.functions.Deng2020.fe3Fe2(
          IaconoMarziano.Comp(meltEls, wt.toArray).molNorm, tK, pBar, fO2))
      val fO2 = graft.expr.E.toColumn(
        graft.models.Fo2Buffers.qfm1bar(graft.expr.C("T_K")))
      Tables.meltsRangedDF(s, dir)
        .select(col("sample_id"),
          round(f(wtArray, col("T_K"), col("P_bar"), fO2), 6).as("Fe3Fe2"))
        .orderBy("sample_id")
    }, Some(DengSql.deng2020)),
    // Multimodal decode: each doc gets a REAL minimal container (PNG with
    // CRC'd IHDR / JPEG with a marker scan past APP0+COM to SOF0 / GIF
    // logical screen) synthesized from its key, and the real header
    // parser (Multimodal.parseHeader — pure byte arithmetic, no codec
    // libs) reads format/width/height back out of the bytes. The payload
    // length is closed-form in (doc_id, text length), so DuckDB pins the
    // whole encode -> parse round trip; independent hand-built byte
    // fixtures live in ExtOpsSpec ("container header parser").
    Q("q_multimodal_decode", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text"))
      graft.ext.Multimodal.decodeFeatures(
          graft.ext.Multimodal.synthesizedPayloads(docs))
        .select(col("doc_id"), col("payload_bytes"), col("format"),
          col("width"), col("height"))
        .orderBy("doc_id")
    }, Some("""WITH d AS (SELECT "doc_id",
             | least(32, octet_length(CAST("text" AS BLOB))) AS k
             | FROM documents)
             | SELECT "doc_id",
             |   CAST((CASE ("doc_id" % 3) WHEN 0 THEN 57
             |         WHEN 1 THEN 45 ELSE 18 END) + k AS INTEGER)
             |     AS "payload_bytes",
             |   (CASE ("doc_id" % 3) WHEN 0 THEN 'png'
             |         WHEN 1 THEN 'jpeg' ELSE 'gif' END) AS "format",
             |   CAST((16 + ("doc_id" % 64)) AS INTEGER) AS "width",
             |   CAST((16 + (("doc_id" // 64) % 64)) AS INTEGER) AS "height"
             | FROM d ORDER BY "doc_id"""".stripMargin.replace("\n", " "))),
    // Byte-sampling feature extractor over an arbitrary binary payload
    // (here: the raw UTF-8 text bytes — the corpus is ASCII, so
    // ascii(substr(text, j, 1)) equals byte j and list_reduce keeps the
    // sum in the Scala loop's order). Format-agnostic half of the decode.
    Q("q_multimodal_feature", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      graft.ext.Multimodal.decodeFeatures(docs)
        .select(col("doc_id"), col("payload_bytes"),
          round(element_at(col("feature"), 1), 6).as("f0"))
        .orderBy("doc_id")
    }, Some("""WITH d AS (SELECT "doc_id", "text",
             | octet_length(CAST("text" AS BLOB)) AS n FROM documents),
             | f AS (SELECT "doc_id", n,
             |   list_reduce(list_transform(range(1, n + 1, 8),
             |     j -> (ascii(substr("text", CAST(j AS INTEGER), 1)) / 255.0e0)),
             |     (x, y) -> (x + y)) AS acc FROM d)
             | SELECT "doc_id", CAST(n AS INTEGER) AS "payload_bytes",
             |   round((acc / greatest(1, ((n + 7) // 8))), 6) AS "f0"
             | FROM f ORDER BY "doc_id"""".stripMargin.replace("\n", " "))),
    Q("q_multimodal_resize_plan", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text"))
      graft.ext.Multimodal.resizePlan(
          graft.ext.Multimodal.decodeFeatures(
            graft.ext.Multimodal.synthesizedPayloads(docs)), maxSide = 32)
        .select(col("doc_id"), col("width"), col("height"),
          col("out_width"), col("out_height"))
        .orderBy("doc_id")
    }, Some("""WITH w AS (SELECT "doc_id",
             |   CAST((16 + ("doc_id" % 64)) AS INTEGER) AS width,
             |   CAST((16 + (("doc_id" // 64) % 64)) AS INTEGER) AS height
             |   FROM documents),
             | s AS (SELECT "doc_id", width, height,
             |   least(1.0e0, (32.0e0 / greatest(width, height))) AS scale FROM w)
             | SELECT "doc_id", width AS "width", height AS "height",
             |   CAST(ceil((width * scale)) AS INTEGER) AS "out_width",
             |   CAST(ceil((height * scale)) AS INTEGER) AS "out_height"
             | FROM s ORDER BY "doc_id"""".stripMargin.replace("\n", " "))),
    // AV-extended decode over a 5-format corpus (png/jpeg/gif/wav/mp4 by
    // doc_id % 5): the WAV RIFF chunk walk reads channels/sample rate/
    // data size from real bytes, the MP4 box walk reads mvhd timescale/
    // duration past a free box — every metadata field is closed-form in
    // (doc_id, text length), so DuckDB pins the full five-container
    // encode -> parse round trip. Hand-built byte fixtures (truncation,
    // bad magic, extra chunks, version-1 mvhd) live in MultimodalSpec.
    Q("q_multimodal_av", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text"))
      graft.ext.Multimodal.decodeMedia(
          graft.ext.Multimodal.synthesizedAvPayloads(docs))
        .select(col("doc_id"), col("payload_bytes"), col("format"),
          col("width"), col("height"), col("channels"), col("sample_rate"),
          round(col("duration_ms"), 6).as("duration_ms"))
        .orderBy("doc_id")
    }, Some("""WITH d AS (SELECT "doc_id",
             | least(32, octet_length(CAST("text" AS BLOB))) AS k
             | FROM documents)
             | SELECT "doc_id",
             |   CAST((CASE ("doc_id" % 5) WHEN 0 THEN 57 WHEN 1 THEN 45
             |         WHEN 2 THEN 18 WHEN 3 THEN 44 ELSE 140 END) + k
             |     AS INTEGER) AS "payload_bytes",
             |   (CASE ("doc_id" % 5) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             |         WHEN 2 THEN 'gif' WHEN 3 THEN 'wav' ELSE 'mp4' END)
             |     AS "format",
             |   (CASE WHEN ("doc_id" % 5) <= 2
             |     THEN CAST(16 + ("doc_id" % 64) AS INTEGER) END) AS "width",
             |   (CASE WHEN ("doc_id" % 5) <= 2
             |     THEN CAST(16 + (("doc_id" // 64) % 64) AS INTEGER) END)
             |     AS "height",
             |   (CASE WHEN ("doc_id" % 5) = 3
             |     THEN CAST(1 + ("doc_id" % 2) AS INTEGER) END) AS "channels",
             |   (CASE WHEN ("doc_id" % 5) = 3
             |     THEN CAST(8000 + 1000 * ("doc_id" % 4) AS INTEGER) END)
             |     AS "sample_rate",
             |   (CASE WHEN ("doc_id" % 5) = 3 THEN round((k * 1000.0e0) /
             |       CAST((8000 + 1000 * ("doc_id" % 4)) *
             |            (1 + ("doc_id" % 2)) * 2 AS DOUBLE), 6)
             |     WHEN ("doc_id" % 5) = 4 THEN round(
             |       ((1000 + 10 * ("doc_id" % 100)) * 1000.0e0) /
             |       CAST(600 + 100 * ("doc_id" % 10) AS DOUBLE), 6)
             |     END) AS "duration_ms"
             | FROM d ORDER BY "doc_id"""".stripMargin.replace("\n", " "))),
    // Duration-driven frame sampling over the PARSED mp4 durations (2 fps,
    // every 2nd frame): the video half of the multimodal plumbing made
    // real — frame counts come from mvhd, not a constant.
    Q("q_multimodal_av_frames", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text"))
      val media = graft.ext.Multimodal.decodeMedia(
        graft.ext.Multimodal.synthesizedAvPayloads(docs))
      graft.ext.Multimodal.frameSamplePlanFromDuration(
          media.where(col("format") === "mp4"), fps = 2.0, everyNth = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""WITH m AS (SELECT "doc_id",
             |   ((1000 + 10 * ("doc_id" % 100)) * 1000.0e0) /
             |     CAST(600 + 100 * ("doc_id" % 10) AS DOUBLE) AS dur_ms
             |   FROM documents WHERE ("doc_id" % 5) = 4),
             | f AS (SELECT "doc_id",
             |   CAST(floor((dur_ms / 1000.0e0) * 2.0e0) AS INTEGER) AS nf
             |   FROM m)
             | SELECT "doc_id",
             |   CAST(unnest(generate_series(0, nf - 1, 2)) AS BIGINT)
             |     AS "frame_idx"
             | FROM f WHERE nf >= 1 ORDER BY 1, 2""".stripMargin
      .replace("\n", " "))),
    // Frame-sampling plan for video-like payloads: every 3rd frame of 10
    // as (doc_id, frame_idx) work units — lateral explode, no shuffle.
    Q("q_multimodal_frames", (s, dir) => {
      val docs = Tables.readRangedBy(s, dir, "documents",
          Seq(graft.expr.C("doc_id")))
        .select(col("doc_id"), col("text"))
      graft.ext.Multimodal.frameSamplePlan(
          graft.ext.Multimodal.decodeFeatures(
            graft.ext.Multimodal.synthesizedPayloads(docs)),
          everyNth = 3, frames = 10)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""SELECT "doc_id", CAST(unnest(generate_series(0, 9, 3)) AS BIGINT)
              | AS "frame_idx" FROM documents ORDER BY 1, 2""".stripMargin
      .replace("\n", " "))),
    // Smooth isobar curve assembly (reference isobars.py:107-141):
    // distributed grid -> per-group distributed spline fit. Full
    // oracle: grid cells via the shared solubility fixed point, then the
    // whole spline pipeline (knot filter, pivoted elimination, piecewise
    // evaluation) op-for-op over DuckDB LIST columns (IsobarCurveSql).
    Q("q_isobar_curves", (s, dir) => {
      val comps = spread(Tables.meltsDF(s, dir)
        .filter(col("sample_id") % 997 === 3))
      val grid = graft.functions.Isobars.isobarGrid(comps, meltEls,
        isobars = Seq(1000.0, 2000.0, 3000.0))
      graft.functions.Isobars.isobarCurves(s, grid)
        .select(col("sample_id"), col("P_bar"),
          round(col("H2O"), 6).as("H2O"), round(col("CO2"), 6).as("CO2"))
        .orderBy("sample_id", "P_bar", "H2O")
    }, Some(IsobarCurveSql.sql)),
    // Isobar grid (J2 cross-join pattern): a few compositions x P x x_fluid.
    // Full oracle: the same solubility fixed point keyed per grid cell
    // (IsobarSql).
    Q("q_isobars", (s, dir) => {
      val comps = Tables.meltsRangedDF(s, dir).filter(col("sample_id") % 997 === 3)
      val pGrid = explode(array((1 to 5).map(i => lit(i * 1000.0)): _*)).as("P_grid")
      val xGrid = explode(array((0 to 4).map(i => lit(i * 0.25)): _*)).as("x_fluid")
      val sol = udf((wt: Seq[Double], p: Double, tK: Double, xfl: Double) => {
        val c = IaconoMarziano.Comp(meltEls, wt.toArray)
        (IaconoMarziano.h2oSolubility(c, xfl, p, tK),
          IaconoMarziano.co2Solubility(c, xfl, p, tK))
      })
      comps.select(col("sample_id"), wtArray.as("wt"), col("T_K"), pGrid)
        .select(col("sample_id"), col("wt"), col("T_K"), col("P_grid"), xGrid)
        .withColumn("sol", sol(col("wt"), col("P_grid"), col("T_K"), col("x_fluid")))
        .select(col("sample_id"), col("P_grid"), col("x_fluid"),
          round(col("sol._1"), 6).as("H2O"), round(col("sol._2"), 6).as("CO2"))
        .orderBy("sample_id", "P_grid", "x_fluid")
    }, Some(IsobarSql.sql))
  )
}
