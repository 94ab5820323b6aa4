package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: time named queries cold+warm without the full Bench run.
  * Usage: sbt "Test/runMain graft.QueryTime <sfDir> q_a,q_b" */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      Queries.queries(n)(spark, args(0)).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- args(1).split(",")) {
      val cold = once(n); val warm = once(n)
      println(f"$n: cold $cold%.2fs warm $warm%.2fs")
    }
    spark.stop()
  }
}
