package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool (guide §1 / §7.2), sibling of [[DumpPlans]]: EXECUTE every
  * registered query at a small SF and record the AQE-final plan — the
  * runtime truth the initial-plan dumps cannot show (exchange reuse,
  * AQE join rewrites). Emits one line per query with the materialised
  * shuffle-exchange count, ReusedExchange count and Generate (explode)
  * count of the final plan, plus the full final-plan text per query.
  * Not part of the driver contract.
  */
object DumpRuntimePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "plans/r16/runtime"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
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
          df.queryExecution.toRdd.count()
          val s = df.queryExecution.executedPlan.toString
          val fin = s.split("== Initial Plan ==")(0)
          val real = fin.linesIterator.count(l =>
            l.contains("+- Exchange ") && !l.contains("ReusedExchange"))
          val reused = fin.linesIterator.count(_.contains("ReusedExchange"))
          val gen = fin.linesIterator.count(_.contains("Generate "))
          val scans = fin.linesIterator.count(_.contains("FileScan parquet"))
          Files.writeString(Paths.get(s"$outDir/$name.txt"), s)
          rows.append(s"$name\treal=$real\treused=$reused\tgen=$gen\tscan=$scans\n")
          System.err.println(s"[rtplans] $name real=$real reused=$reused gen=$gen scan=$scans")
        } catch { case e: Throwable =>
          rows.append(s"$name\tERROR\t${e.getMessage}\n")
          System.err.println(s"[rtplans] $name failed: ${e.getMessage}")
        }
      }
    Files.writeString(Paths.get(s"$outDir/_summary.tsv"), rows.toString)
    spark.stop()
  }
}
