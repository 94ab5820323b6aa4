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
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val cold = ordered.map { case (name, fn) => name -> timeOnce(fn) }
    val warm = ordered.map { case (name, fn) => name -> timeOnce(fn) }
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
