package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift scoring between two corpus slices — the Population
  * Stability Index (PSI, the standard model-monitoring drift measure:
  * Σ_b (p_cur,b − p_ref,b)·ln(p_cur,b / p_ref,b) over fixed value
  * buckets), plus the per-bucket decomposition that tells an operator
  * WHICH part of the distribution moved. The pipeline use: a nightly
  * ingest compares its length/quality/score distribution against the
  * accepted reference corpus; PSI > 0.2 is the conventional
  * "investigate" threshold.
  *
  * Determinism: bucket assignment is integer division, counts are exact,
  * probabilities use additive smoothing ((n_b + 0.5)/(N + 0.5·B) — every
  * bucket of the FIXED spine contributes, so ln never sees zero) in a
  * fixed operation order both engines execute identically.
  *
  * Scale shape: ONE pass over the corpus (a bucket-keyed partial
  * aggregation counting both slices with conditional sums), then all
  * arithmetic happens on the B-row bucket spine (localCheckpointed so
  * the total and the per-bucket frame don't re-scan the corpus); the
  * spine join and the one-row total ride broadcasts. B is a constant
  * (tens), never data-scale.
  */
object Drift {

  /** Per-bucket PSI decomposition + the total.
    *
    * Output: (bucket, n_ref, n_cur, p_ref, p_cur, contrib, psi) — one
    * row per spine bucket, `psi` repeated on every row (the total is the
    * headline; the rows are its explanation).
    *
    * @param refPred     rows forming the reference distribution
    * @param curPred     rows forming the current distribution
    * @param bucketWidth value-to-bucket divisor (integer division)
    * @param nBuckets    fixed spine size; values past the last bucket
    *                    clamp into it
    */
  def psi(df: DataFrame, valueCol: String, refPred: Column, curPred: Column,
          bucketWidth: Int, nBuckets: Int): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 1)
    val spark = df.sparkSession
    val bucket = least(lit(nBuckets - 1L),
      expr(s"CAST($valueCol AS BIGINT) div $bucketWidth")).as("bucket")
    // one corpus pass: conditional counts for both slices per bucket
    val counts = df
      .where(refPred || curPred)
      .select(bucket, refPred.as("is_ref"), curPred.as("is_cur"))
      .groupBy("bucket")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_cur"), 1L).otherwise(0L)).as("n_cur"))
      .localCheckpoint() // B rows; totals + spine reuse without re-scan
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val filled = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = broadcast(filled
      .agg(sum("n_ref").as("tot_ref"), sum("n_cur").as("tot_cur")))
    val smoothed = filled.crossJoin(totals)
      .withColumn("p_ref",
        (col("n_ref").cast("double") + lit(0.5)) /
          (col("tot_ref").cast("double") + lit(0.5) * nBuckets))
      .withColumn("p_cur",
        (col("n_cur").cast("double") + lit(0.5)) /
          (col("tot_cur").cast("double") + lit(0.5) * nBuckets))
      .withColumn("contrib",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    val total = broadcast(smoothed.agg(sum("contrib").as("psi_raw")))
    smoothed.crossJoin(total)
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round(col("contrib"), 6).as("contrib"),
        round(col("psi_raw"), 6).as("psi"))
  }

  /** DuckDB rendering of [[psi]] over `tableSql` — identical bucket
    * arithmetic, smoothing order and ln. `refSql`/`curSql` are the
    * predicate renderings. */
  def psiOracleSql(tableSql: String, valueCol: String, refSql: String,
                   curSql: String, bucketWidth: Int, nBuckets: Int): String =
    s"""WITH c AS (SELECT least(${nBuckets - 1},
       |     CAST("$valueCol" AS BIGINT) // $bucketWidth) AS bucket,
       |     sum(CASE WHEN $refSql THEN 1 ELSE 0 END) AS n_ref,
       |     sum(CASE WHEN $curSql THEN 1 ELSE 0 END) AS n_cur
       |   FROM $tableSql WHERE ($refSql) OR ($curSql) GROUP BY 1),
       | f AS (SELECT r.range AS bucket,
       |     COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
       |   FROM range(0, $nBuckets) r LEFT JOIN c ON c.bucket = r.range),
       | t AS (SELECT sum(n_ref) AS tot_ref, sum(n_cur) AS tot_cur FROM f),
       | s AS (SELECT bucket, n_ref, n_cur,
       |     (CAST(n_ref AS DOUBLE) + 0.5e0)
       |       / (CAST(tot_ref AS DOUBLE) + 0.5e0 * $nBuckets) AS p_ref,
       |     (CAST(n_cur AS DOUBLE) + 0.5e0)
       |       / (CAST(tot_cur AS DOUBLE) + 0.5e0 * $nBuckets) AS p_cur
       |   FROM f CROSS JOIN t),
       | w AS (SELECT bucket, n_ref, n_cur, p_ref, p_cur,
       |     (p_cur - p_ref) * ln(p_cur / p_ref) AS contrib FROM s),
       | tt AS (SELECT sum(contrib) AS psi_raw FROM w)
       | SELECT bucket AS "bucket", CAST(n_ref AS BIGINT) AS "n_ref",
       |   CAST(n_cur AS BIGINT) AS "n_cur",
       |   round(p_ref, 6) AS "p_ref", round(p_cur, 6) AS "p_cur",
       |   round(contrib, 6) AS "contrib", round(psi_raw, 6) AS "psi"
       | FROM w CROSS JOIN tt""".stripMargin.replace("\n", " ")
}
