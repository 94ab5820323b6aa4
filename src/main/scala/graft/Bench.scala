package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds, COLD and WARM.
  *
  * Timing is honest full evaluation: `df.queryExecution.toRdd.count()`
  * executes the final optimized physical plan — every projection, UDF and
  * sort — without collecting rows to the driver. A plain `df.count()` would
  * let Catalyst prune all projected columns (a select-only query collapses
  * to a scan count and "benchmarks" nothing).
  *
  * Cold = first execution (dominated by planning + whole-stage-codegen
  * compilation for the narrow closed-form queries — measured 30-80x the
  * steady state); warm = second execution of the same query, the number
  * that tracks actual operator cost and catches plan regressions.
  * `queries` stays the cold map (comparable with earlier rounds);
  * `queries_warm`/`total_warm` carry the steady-state column.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B knob: SPARK_GRAFT_EXTENSIONS=1 injects graft.GraftExtensions the
    // way a production spark-submit would, to measure the injection's cost
    // (a session-build-time function-registry insert) against the default
    // no-extensions session the driver benchmarks.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries; a 130+-query
      // registry evicts everything between the cold and warm passes, so
      // "warm" numbers were re-paying janino compilation. Static conf —
      // must be set before the first session is built (fine here: Bench
      // owns the JVM).
      .config("spark.sql.codegen.cache.maxEntries", "4000")
    val spark = (if (sys.env.get("SPARK_GRAFT_EXTENSIONS").exists(_.nonEmpty))
      builder.config("spark.sql.extensions", "graft.GraftExtensions")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (JVM, codegen, file listing) outside any query's
    // timing window.
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val dengMetrics = graft.functions.Deng2020.attachMetrics(spark)
    // Pass-level JVM + codegen instrumentation (round-7 verdict: two bench
    // outliers were unexplainable because neither GC time nor janino
    // compile counts were visible per pass). CodegenMetrics counts every
    // whole-stage compilation: if the warm pass adds compilations, the
    // codegen class cache is being missed and "warm" re-pays janino.
    def jvmStats(): (Long, Long, Long) = {
      import scala.jdk.CollectionConverters._
      val gc = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      (gc.map(_.getCollectionTime).sum, gc.map(_.getCollectionCount).sum,
        cg.METRIC_COMPILATION_TIME.getCount)
    }
    def passNote(tag: String, before: (Long, Long, Long)): Unit = {
      val (gcMs0, gcN0, cgN0) = before
      val (gcMs1, gcN1, cgN1) = jvmStats()
      val mean = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getMean
      System.err.println(f"[bench] $tag: gc=${(gcMs1 - gcMs0) / 1000.0}%.1fs" +
        f" (${gcN1 - gcN0} collections), codegenCompiles=${cgN1 - cgN0}" +
        f" (meanCompile=${mean}%.0fms); ${dengMetrics.render}")
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val s0 = jvmStats()
    val cold = ordered.map { case (name, fn) => name -> timeOnce(fn) }
    passNote("cold pass", s0)
    val s1 = jvmStats()
    val warm = ordered.map { case (name, fn) => name -> timeOnce(fn) }
    passNote("warm pass", s1)
    // Outlier chase (round-7 verdict): SPARK_GRAFT_REBENCH=q_a,q_b times
    // the named queries twice more at the END of the session — if a cold/
    // warm number was session noise (GC, codegen churn), these two extra
    // timings expose it without touching the comparable cold/warm protocol.
    for (names <- sys.env.get("SPARK_GRAFT_REBENCH").filter(_.nonEmpty)) {
      val pick = names.split(",").toSet
      val s2 = jvmStats()
      for ((name, fn) <- ordered if pick(name); i <- 1 to 2)
        System.err.println(f"[bench] rebench $name #$i: ${timeOnce(fn)}%.3fs")
      passNote("rebench", s2)
    }
    // millisecond precision keeps the line compact enough for line-buffered
    // log capture (a full-precision line for ~100 queries risks truncation)
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = cold.map(_._2).sum
    val totalWarm = warm.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(cold)},"total_warm":$totalWarm%.3f,"queries_warm":${jsonMap(warm)},"sf":"$sfDir"}"""
    // full per-query map (cold + warm) as the sole content of a known file
    try java.nio.file.Files.writeString(java.nio.file.Path.of("BENCH_LAST.json"), line)
    catch { case _: Throwable => () }
    // The harness capturing stdout keeps only a bounded tail (~2000 chars,
    // minus sbt's trailing status line), so the FULL line above can never
    // parse from the tail once the registry passed ~60 queries. Emit a
    // compact final line that is guaranteed to fit: headline totals + the
    // slowest cold queries, with the complete map in BENCH_LAST.json.
    val budget = 1500
    val slowest = cold.sortBy(-_._2)
    val entries = new StringBuilder
    var kept = 0
    for ((k, v) <- slowest if entries.length < budget) {
      if (kept > 0) entries.append(',')
      entries.append(f""""$k":$v%.3f""")
      kept += 1
    }
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":{${entries.toString}},"queries_omitted":${cold.size - kept},"queries_full":"BENCH_LAST.json","total_warm":$totalWarm%.3f,"n_queries":${cold.size},"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so shutdown chatter (block-manager /
    // context-cleaner log lines) cannot land after the JSON: the harness
    // parses the LAST stdout line, so these two prints must be final.
    spark.stop()
    println(line)
    println(compact)
    System.out.flush()
  }
}
