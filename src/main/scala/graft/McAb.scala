package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, avg, col, explode, lit,
  stddev_samp, round => sround}
import graft.expr._
import graft.expr.E._
import graft.models.{CompCtx, Fe3Fe2, Fo2Buffers}

/** A/B harness for the q_monte_carlo_fe3fe2 formulation study
  * (bench_ab/r10_monte_carlo_formulation.md — r9 verdict #7): does an
  * explode-free single-pass draw expansion beat the explode + groupBy?
  *
  *  - form A (shipped): explode 8 draw rows -> CSE-staged perturb +
  *    sun2024 -> groupBy(sample_id) mean/sd. 3 exchanges.
  *  - form B: the 8 draws as eight inline column trees (draw index
  *    substituted as a literal), closed-form mean/sd in the same
  *    projection — ZERO data exchanges beyond the scan + orderBy, but
  *    the sun2024 tree is instantiated 8x in one codegen unit (CSE
  *    still shares the draw-independent T/P subtrees).
  *
  * Run one formulation per JVM (GRAFT_MC_FORM=a|b), cold + warm timed;
  * GRAFT_MC_COMPARE=1 additionally cross-checks B's rows against A's.
  * HashGauss is replicated verbatim from Queries (private there). */
object McAb {
  private val M = 1000003L
  private val A = 48271L
  private def unif(salt: Long, extra: E): E = {
    val h0 = (C("sample_id") % ILit(M)) * ILit(A) + ILit(salt) +
      extra * ILit(7919L)
    val h1 = (h0 % ILit(M)) * ILit(A) + ILit(31L * salt + 17L)
    (CastD(h1 % ILit(M)) + Lit(0.5)) / Lit(M.toDouble)
  }
  private def gauss(salt: Long, extra: E): E =
    sqrt(Lit(-2.0) * ln(unif(salt, extra))) *
      cos(Lit(2.0 * math.Pi) * unif(salt + 1000L, extra))

  /** One-level column substitution over the public AST (replacements are
    * not re-substituted, so a replacement may reference the original
    * column it replaces). */
  def subst(e: E, f: PartialFunction[String, E]): E = e match {
    case C(n) if f.isDefinedAt(n) => f(n)
    case Bin(op, a, b) => Bin(op, subst(a, f), subst(b, f))
    case Fn(fn, args) => Fn(fn, args.map(subst(_, f)))
    case If(c, t, fa) => If(substC(c, f), subst(t, f), subst(fa, f))
    case CastD(a) => CastD(subst(a, f))
    case other => other
  }
  private def substC(c: Cond, f: PartialFunction[String, E]): Cond = c match {
    case Cmp(op, l, r) => Cmp(op, subst(l, f), subst(r, f))
    case AndOr(op, l, r) => AndOr(op, substC(l, f), substC(r, f))
    case NotC(x) => NotC(substC(x, f))
  }

  private val mctx = CompCtx(Tables.meltElements)
  private val nDraws = 8
  private val errWtPc = 0.02
  private val elIdx = Tables.meltElements.zipWithIndex.toMap
  private val fe3fe2E: E = Fe3Fe2.sun2024(mctx, C("T_K"),
    Fo2Buffers.qfm1bar(C("T_K")), C("P_bar"))

  /** Form A — verbatim mirror of the shipped q_monte_carlo_fe3fe2. */
  def formA(s: SparkSession, dir: String): DataFrame = {
    def perturbE(e: String, i: Int): E =
      greatest(C(e) + gauss(42L + i, C("draw")) * Lit(errWtPc), Lit(0.0))
    val base = Tables.meltsDF(s, dir)
      .withColumn("draw", explode(array((0 until nDraws).map(i =>
        lit(i.toLong)): _*)))
    val pass = Seq("sample_id", "T_K", "P_bar", "draw").map(c => c -> (C(c): E))
    val perturbStage = Stage(pass ++ Tables.meltElements.zipWithIndex.map {
      case (e, i) => e -> perturbE(e, i) })
    val feStage = Stage(Seq("sample_id" -> (C("sample_id"): E),
      "Fe3Fe2" -> fe3fe2E))
    Pipeline.applySpark(base, Cse.expand(perturbStage) ++ Cse.expand(feStage))
      .groupBy("sample_id")
      .agg(sround(avg("Fe3Fe2"), 6).as("fe3fe2_mean"),
        sround(stddev_samp("Fe3Fe2"), 6).as("fe3fe2_sd"))
      .orderBy("sample_id")
  }

  /** Form B — explode-free: 8 inline draw columns + closed-form mean/sd
    * (two-pass textbook formula as a single projection chain). */
  def formB(s: SparkSession, dir: String): DataFrame = {
    val drawCols = (0 until nDraws).map { d =>
      s"__fe_$d" -> subst(fe3fe2E, {
        case e if elIdx.contains(e) =>
          greatest(C(e) + gauss(42L + elIdx(e), ILit(d.toLong)) * Lit(errWtPc),
            Lit(0.0))
      })
    }
    val feStage = Stage(Seq("sample_id" -> (C("sample_id"): E)) ++ drawCols)
    val meanStage = Stage(Seq("sample_id" -> (C("sample_id"): E),
      "__m" -> sumAll(drawCols.map(c => C(c._1): E)) / Lit(nDraws.toDouble)) ++
      drawCols.map(c => c._1 -> (C(c._1): E)))
    val outStage = Stage(Seq(
      "sample_id" -> (C("sample_id"): E),
      "fe3fe2_mean" -> round(C("__m"), 6),
      "fe3fe2_sd" -> round(sqrt(sumAll(drawCols.map { c =>
        val dlt = C(c._1) - C("__m"); dlt * dlt
      }) / Lit((nDraws - 1).toDouble)), 6)))
    Pipeline.applySpark(Tables.meltsDF(s, dir),
        Cse.expand(feStage) ++ Seq(meanStage) ++ Cse.expand(outStage))
      .orderBy("sample_id")
  }

  /** Form C — form A with the draw-INDEPENDENT fO2 buffer term hoisted
    * above the explode (computed once per sample, carried through the 8
    * draw rows) instead of recomputed per draw row. */
  def formC(s: SparkSession, dir: String): DataFrame = {
    def perturbE(e: String, i: Int): E =
      greatest(C(e) + gauss(42L + i, C("draw")) * Lit(errWtPc), Lit(0.0))
    val feHoisted: E = Fe3Fe2.sun2024(mctx, C("T_K"), C("__fo2"), C("P_bar"))
    val base = Tables.meltsDF(s, dir)
      .withColumn("__fo2", E.toColumn(Fo2Buffers.qfm1bar(C("T_K"))))
      .withColumn("draw", explode(array((0 until nDraws).map(i =>
        lit(i.toLong)): _*)))
    val pass = Seq("sample_id", "T_K", "P_bar", "draw", "__fo2")
      .map(c => c -> (C(c): E))
    val perturbStage = Stage(pass ++ Tables.meltElements.zipWithIndex.map {
      case (e, i) => e -> perturbE(e, i) })
    val feStage = Stage(Seq("sample_id" -> (C("sample_id"): E),
      "Fe3Fe2" -> feHoisted))
    Pipeline.applySpark(base, Cse.expand(perturbStage) ++ Cse.expand(feStage))
      .groupBy("sample_id")
      .agg(sround(avg("Fe3Fe2"), 6).as("fe3fe2_mean"),
        sround(stddev_samp("Fe3Fe2"), 6).as("fe3fe2_sd"))
      .orderBy("sample_id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val form = sys.env.getOrElse("GRAFT_MC_FORM", "a")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = form match {
      case "b" => formB _
      case "c" => formC _
      case _   => formA _
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warms = (1 to 3).map(_ => once())
    println(f"""{"form":"$form","sf":"$sfDir","cold_s":$cold%.3f,""" +
      s""""warm_s":[${warms.map(w => f"$w%.3f").mkString(",")}]}""")
    if (sys.env.get("GRAFT_MC_COMPARE").exists(_.nonEmpty)) {
      val a = formA(spark, sfDir).collect()
      for ((other, tag) <- Seq(formB _ -> "b", formC _ -> "c")) {
        val o = other(spark, sfDir).collect()
        val diffs = a.zip(o).map { case (ra, rb) =>
          require(ra.getLong(0) == rb.getLong(0))
          math.max(math.abs(ra.getDouble(1) - rb.getDouble(1)),
            math.abs(ra.getDouble(2) - rb.getDouble(2)))
        }
        println(f"""{"compare":"a-vs-$tag","rows":${a.length},"max_abs_diff":${diffs.max}%.2e}""")
      }
    }
    spark.stop()
  }
}
