package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` of every registered query to
  * <outDir>/<name>_<tag>.txt, plus a one-line-per-query summary
  * (exchange count, join operators, scan count) to <outDir>/_summary_<tag>.tsv.
  * Not part of the driver contract — used by the optimization rounds to
  * capture before/after plan evidence (guide §1 / §7.2).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val tag = if (args.length > 2) args(2) else "before"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val rows = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          def cnt(p: String) = p.r.findAllIn(plan).length
          val ex = cnt("\\bExchange\\b")
          val smj = cnt("\\bSortMergeJoin\\b")
          val bhj = cnt("\\bBroadcastHashJoin\\b")
          val shj = cnt("\\bShuffledHashJoin\\b")
          val bnl = cnt("\\bBroadcastNestedLoopJoin\\b")
          val cart = cnt("\\bCartesianProduct\\b")
          val scans = cnt("Scan parquet")
          val sorts = cnt("\\bSort \\[")
          val wins = cnt("\\bWindow\\b")
          val aggs = cnt("\\bHashAggregate\\b") + cnt("\\bObjectHashAggregate\\b") +
            cnt("\\bSortAggregate\\b")
          rows.append(s"$name\tex=$ex\tsmj=$smj\tbhj=$bhj\tshj=$shj\tbnl=$bnl" +
            s"\tcart=$cart\tscan=$scans\tsort=$sorts\twin=$wins\tagg=$aggs\n")
          System.err.println(s"[plans] $name ok (ex=$ex)")
        } catch { case e: Throwable =>
          rows.append(s"$name\tERROR\t${e.getMessage}\n")
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
      }
    Files.writeString(Paths.get(s"$outDir/_summary_$tag.tsv"), rows.toString)
    spark.stop()
  }
}
