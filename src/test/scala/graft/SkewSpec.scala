package graft

import org.apache.spark.sql.functions._
import graft.ext.Skew

/** Salted-join law: row-equivalence with the plain join, and the hot key
  * actually scatters across salt partitions. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows where one key holds 80% of the big side — the shape that
  // puts 80% of a shuffle partition's work in one task
  lazy val big = spark.range(10000).select(
    when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
    col("id").as("row_id"))
  lazy val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "attr").collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"),
        saltParts = 8, bigSalt = Skew.saltFrom(col("row_id")))
      .select("k", "row_id", "attr").collect().toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("the hot key scatters across salt values; small side replicates") {
    val saltParts = 8
    val scattered = big
      .withColumn("salt", pmod(Skew.saltFrom(col("row_id")), lit(saltParts)))
      .filter(col("k") === 7L)
      .groupBy("salt").count().collect().map(r => r.getLong(1))
    assert(scattered.length == saltParts, s"only ${scattered.length} salts hit")
    // uniform-ish: no salt holds more than 2x its fair share of the hot key
    val total = scattered.sum
    assert(scattered.max <= 2 * total / saltParts,
      s"skew survived salting: ${scattered.toSeq}")
  }

  test("degenerate salts (function of the join key) are the documented trap") {
    // salting by the join key itself re-concentrates the hot key: every
    // k=7 row lands on ONE salt — the anti-pattern the scaladoc forbids
    val bad = big
      .withColumn("salt", pmod(Skew.saltFrom(col("k")), lit(8)))
      .filter(col("k") === 7L)
      .select("salt").distinct().count()
    assert(bad == 1L)
  }
}
