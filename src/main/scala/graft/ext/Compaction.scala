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
  * bin exactly when the bytes before it cross a target multiple.
  *
  * With `partitionCols` the windows are partitioned by those columns —
  * bounded by the largest table partition's listing. With NO partition
  * columns the naive form is a single-task global window; this
  * implementation instead runs the [[graft.ext.PipelineOps.tokenBudget]]
  * two-phase cumsum shape (r9 verdict #4): range-partition by id into
  * `defaultParallelism` monotone buckets, per-bucket windows + a
  * broadcast prefix-offset table, then a bin-scale dense relabel — no
  * single-task window over the file listing at any point, row-identical
  * to the global window. Properties (spec-pinned): bins are contiguous
  * from 0 per partition, conserve bytes, no bin exceeds `target + max
  * file size` (an unsplittable oversized file gets its own bin), and the
  * global path plans no empty-partition window.
  *
  * NOTE: the global (no partitionCols) path is EAGER like tokenBudget —
  * it snapshots the listing (localCheckpoint) and runs two small jobs at
  * call time (per-bucket byte sums: ≤ parallelism longs; distinct raw
  * bins: ≤ totalBytes/targetBytes + #oversized values — bin-scale, e.g.
  * 100 TB / 512 MB ≈ 200k longs).
  */
object Compaction {

  /** Adds `bin` (int, per-partition contiguous from 0) to the file rows.
    * `idCol` fixes the packing order — stable ids (paths) make the plan
    * reproducible across runs. */
  def plan(files: DataFrame, idCol: String, sizeCol: String,
           targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    if (partitionCols.isEmpty) globalPlan(files, idCol, sizeCol, targetBytes)
    else {
      val w0 = Window.partitionBy(partitionCols.map(col): _*)
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
  }

  /** Unpartitioned listing: two-phase global cumsum. Range-partition by
    * id (monotone buckets, equal ids never split), window per bucket,
    * add broadcast per-bucket prefix offsets — row-identical to the
    * single global window because bucket index is monotone in id. The
    * dense relabel joins a broadcast (rawbin → rank) table built from
    * the DISTINCT raw bins (bin-scale, not listing-scale). */
  private def globalPlan(files: DataFrame, idCol: String, sizeCol: String,
                         targetBytes: Long): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val buckets = math.max(2, spark.sparkContext.defaultParallelism)
    // snapshot: the bucket id of a row must be identical in the sums job
    // and the window job (range boundaries come from a deterministic
    // sample, but pinning the materialized assignment is free at
    // listing scale and removes the recompute coupling entirely)
    val base = files.repartitionByRange(buckets, col(idCol))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()
    val sums = base.groupBy("__bucket")
      .agg(sum(col(sizeCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxB = if (sums.isEmpty) -1 else sums.keys.max
    var acc = 0L
    val offs = (0 to maxB).map { b =>
      val o = acc; acc += sums.getOrElse(b, 0L); (b, o)
    }
    val offDf = broadcast(offs.toDF("__bucket", "__off"))
    val w = Window.partitionBy("__bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRaw = base.join(offDf, Seq("__bucket"))
      .withColumn("__cum",
        coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)) + col("__off"))
      .withColumn("__rawbin", floor(col("__cum") / lit(targetBytes)))
    // bin-scale collect: one long per occupied raw bin
    val bins = withRaw.select("__rawbin").distinct()
      .collect().map(_.getLong(0)).sorted
    val rankDf = broadcast(
      bins.toSeq.zipWithIndex.toDF("__rawbin", "__rank"))
    withRaw.join(rankDf, Seq("__rawbin"))
      .withColumn("bin", col("__rank").cast("int"))
      .select(files.columns.map(col) :+ col("bin"): _*)
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
