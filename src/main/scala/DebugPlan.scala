import org.apache.spark.sql.SparkSession

object DebugPlan extends App {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.ui.enabled","false")
    .config("spark.sql.shuffle.partitions","4").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  val cands = graft.ext.Dedup.minhashCandidates(docs, 16, 2)
  cands.explain("formatted")
  val t0 = System.nanoTime()
  println("pairs: " + cands.count() + " in " + (System.nanoTime()-t0)/1e9 + "s")
  spark.stop()
}
