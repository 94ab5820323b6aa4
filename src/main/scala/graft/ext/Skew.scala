package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join split (on by default in Spark 4) is the first answer
  * for a one-off skewed sort-merge join — it needs no code change and
  * splits oversized partitions at runtime. Explicit salting remains the
  * tool where AQE cannot reach: a skewed key feeding a hash-partitioned
  * stateful operator, a streaming join (no runtime re-plan), or a
  * broadcast-ineligible dimension repeatedly joined against the same hot
  * keys. The trade is explicit: the small side is replicated `saltParts`
  * times, the big side's hot key is spread across `saltParts` partitions.
  */
object Skew {

  /** Inner equi-join with the big side's rows scattered across
    * `saltParts` salt values and the small side replicated once per salt.
    * Row-for-row equivalent to `big.join(small, keys)` — every big row
    * meets exactly the replica carrying its salt — but a key holding p%
    * of the big side now lands in `saltParts` tasks instead of one.
    *
    * `bigSalt` decides the scatter. It must be uniform-ish and MUST NOT
    * be a function of the join keys alone (same key -> same salt would
    * re-concentrate the hot key); hash a row-unique column. Deterministic
    * by construction when `bigSalt` is — no rand() in the plan, so
    * retried tasks and their oracle comparisons see identical rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltParts: Int, bigSalt: Column): DataFrame = {
    require(saltParts > 0, s"saltParts must be positive, got $saltParts")
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    val salted = big.withColumn("__graft_salt",
      pmod(bigSalt, lit(saltParts)).cast("int"))
    val replicated = small.withColumn("__graft_salt",
      explode(array((0 until saltParts).map(lit): _*)))
    salted.join(replicated, keys :+ "__graft_salt").drop("__graft_salt")
  }

  /** Uniform deterministic salt from any row-unique column: xxhash64 is
    * plan-stable across retries (unlike rand()). */
  def saltFrom(rowKey: Column): Column = abs(xxhash64(rowKey))
}
