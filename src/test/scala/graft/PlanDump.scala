package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: print exchange/join lines of named query plans.
  * Usage: sbt "Test/runMain graft.PlanDump q_a,q_b" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(0).split(",")) {
      val p = Queries.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"==== $n ====")
      val exch = p.linesIterator.count(l =>
        raw"(^|[^A-Za-z])Exchange\s".r.findFirstIn(l).isDefined &&
          !l.contains("BroadcastExchange"))
      println(s"nonBroadcastExchanges=$exch")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
