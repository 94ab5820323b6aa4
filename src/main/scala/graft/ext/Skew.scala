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

  /** Key-skew diagnosis — the report a 100 TB job reads BEFORE picking a
    * join strategy for `keys`: the `topK` hottest keys with exact counts,
    * each key's share of all rows, and its ratio to the mean key count
    * (`skew_ratio` — the number AQE's skewedPartitionFactor thresholds
    * against, and the direct input to choosing `saltParts` for
    * [[saltedJoin]]).
    *
    * Scale shape: one map-side-combinable groupBy over the keys; the
    * hottest rows come out via `orderBy(...).limit(topK)` — Spark's
    * distributed TakeOrderedAndProject (per-partition top-k, merged on
    * one tiny reducer), NOT a global rank window, which would move the
    * whole (possibly billions-distinct) count table to one task. The
    * rank window that numbers the result runs over topK rows only, and
    * the one-row totals aggregate broadcasts onto them — the fact table
    * is never re-shuffled and nothing key-scale ever reaches one task. */
  def diagnose(df: DataFrame, keys: Seq[String], topK: Int = 5): DataFrame = {
    require(keys.nonEmpty, "diagnose needs at least one key column")
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("__total"),
      count(lit(1)).as("__nkeys"))
    val top = counts
      .orderBy(col("cnt").desc +: keys.map(col): _*).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc +: keys.map(col): _*)
    top.withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(totals))
      .select(col("rank") +: keys.map(col) :+ col("cnt") :+
        round(col("cnt") / col("__total"), 6).as("share") :+
        round(col("cnt") * col("__nkeys") / col("__total"), 6)
          .as("skew_ratio"): _*)
  }

  /** DuckDB rendering of [[diagnose]] over `tableSql`. */
  def diagnoseOracleSql(tableSql: String, keys: Seq[String],
                        topK: Int = 5): String = {
    val kq = keys.map(k => s""""$k"""").mkString(", ")
    s"""WITH c AS (SELECT $kq, count(*) AS cnt FROM $tableSql GROUP BY $kq),
       | t AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM c),
       | r AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, $kq) AS rank
       |   FROM c)
       | SELECT CAST(rank AS INTEGER) AS "rank", $kq, cnt AS "cnt",
       |   round(CAST(cnt AS DOUBLE) / t.total, 6) AS "share",
       |   round(CAST(cnt AS DOUBLE) * t.nkeys / t.total, 6) AS "skew_ratio"
       | FROM r CROSS JOIN t WHERE rank <= $topK
       | ORDER BY rank""".stripMargin.replace("\n", " ")
  }
}
