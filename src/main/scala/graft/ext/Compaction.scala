package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the nightly layout job's other half
  * (next to [[ZOrder.clusterByZ]]): at 100 TB, ingest produces millions
  * of KB-scale files whose per-file open/footer overhead dominates scan
  * time, and every table format ships a compaction that rewrites them
  * into target-sized files. This operator computes that plan as a
  * relation: files (any `(id, bytes)` rows, optionally grouped by
  * partition columns) → contiguous bins of ~`targetBytes`.
  *
  * Binning is the deterministic running-sum split every lakehouse
  * compactor uses: within a partition, files in stable id order,
  * `bin = floor(cumulative_bytes_before / target)` — a file starts a new
  * bin exactly when the bytes before it cross a target multiple. No
  * driver-side loop, no greedy sequential state: one window over the
  * file listing (which is partition-count-scale, not data-scale), so the
  * plan for a million files is a sub-second job. Properties (spec-pinned):
  * bins are contiguous from 0 per partition, conserve bytes, and no bin
  * exceeds `target + max file size` (an unsplittable oversized file gets
  * its own bin).
  */
object Compaction {

  /** Adds `bin` (int, per-partition contiguous from 0) to the file rows.
    * `idCol` fixes the packing order — stable ids (paths) make the plan
    * reproducible across runs. */
  def plan(files: DataFrame, idCol: String, sizeCol: String,
           targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // raw split ids skip after an oversized file (its bytes jump the
    // cumulative across several target multiples); dense_rank over the
    // SAME partitioning — no extra shuffle — relabels them contiguous
    // from 0, so a rewrite job can size its task array as max(bin)+1.
    files
      .withColumn("__cum", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("__rawbin", floor(col("__cum") / lit(targetBytes)))
      .withColumn("bin",
        (dense_rank().over(w0.orderBy(col("__rawbin"))) - 1).cast("int"))
      .drop("__cum", "__rawbin")
  }

  /** The compact summary a rewrite job consumes: one row per
    * (partition, bin) with file count and total bytes. */
  def planSummary(files: DataFrame, idCol: String, sizeCol: String,
                  targetBytes: Long,
                  partitionCols: Seq[String] = Nil): DataFrame =
    plan(files, idCol, sizeCol, targetBytes, partitionCols)
      .groupBy((partitionCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_files"), sum(sizeCol).as("bin_bytes"))

  /** DuckDB rendering of [[planSummary]] over `tableSql`. */
  def planSummaryOracleSql(tableSql: String, idCol: String, sizeCol: String,
                           targetBytes: Long, partitionCols: Seq[String],
                           orderBy: Seq[String]): String = {
    val parts = partitionCols.map(c => s""""$c"""").mkString(", ")
    val partBy = if (partitionCols.isEmpty) "" else s"PARTITION BY $parts "
    val grp = (partitionCols.map(c => s""""$c"""") :+ "bin").mkString(", ")
    val ord = orderBy.map(c => s""""$c"""").mkString(", ")
    s"""WITH c AS (SELECT *, coalesce(sum("$sizeCol") OVER ($partBy
       | ORDER BY "$idCol" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       | 0) AS cum FROM $tableSql),
       | b0 AS (SELECT *, floor(CAST(cum AS DOUBLE) / $targetBytes)
       |   AS rawbin FROM c),
       | b AS (SELECT *, CAST(dense_rank() OVER ($partBy ORDER BY rawbin)
       |   - 1 AS INTEGER) AS bin FROM b0)
       | SELECT $grp, count(*) AS "n_files",
       |   CAST(sum("$sizeCol") AS BIGINT) AS "bin_bytes"
       | FROM b GROUP BY $grp ORDER BY $ord""".stripMargin.replace("\n", " ")
  }
}
