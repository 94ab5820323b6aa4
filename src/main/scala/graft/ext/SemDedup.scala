package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster embeddings with k-means, then look for
  * near-duplicate pairs ONLY within a cluster — the clustering turns an
  * O(n²) all-pairs cosine into k independent, bounded blocks.
  *
  * Scale shape: the k-means fit is [[KMeansDet]] (narrow assignment
  * projection + one map-side-combinable agg per iteration). Pairing
  * shuffles (vec_id, v, cid) hash-partitioned by cluster; within a
  * cluster the join is quadratic, so cluster population must stay
  * bounded — at corpus scale k grows with n (SemDeDup uses n/k ≈ 10⁴)
  * and `cap` hard-bounds the blowup the same way the MinHash/SimHash/LSH
  * stages cap hot buckets: members ranked by vec_id beyond the cap are
  * excluded from pairing and counted in the observe metric, never
  * silently joined. Determinism: quantized coordinates make every dot
  * product exact and every cosine a single correctly-rounded IEEE
  * divide, so the DuckDB oracle reproduces pair sets and similarity
  * values bit-for-bit.
  */
object SemDedup {

  /** Default per-cluster population cap for [[pairs]]. */
  val DefaultClusterCap: Int = 4096

  /** Spark conf key overriding [[DefaultClusterCap]] at deploy time (same
    * pattern as [[Dedup.MaxBucketSizeConfKey]]): the right cap tracks
    * n/k, which is a corpus property. The [[DedupMetrics]] "semdedup"
    * counter is the monitoring hook for choosing a value. */
  val ClusterCapConfKey = "spark.graft.semdedup.clusterCap"

  /** Sentinel: resolve the cap from [[ClusterCapConfKey]]. */
  val ConfiguredClusterCap: Int = -1

  private def resolveCap(df: DataFrame, cap: Int): Int =
    if (cap != ConfiguredClusterCap) cap
    else df.sparkSession.conf.getOption(ClusterCapConfKey).map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$ClusterCapConfKey must be a positive integer, got '$v'")
      }
      require(n > 0, s"$ClusterCapConfKey must be positive, got $n")
      n
    }.getOrElse(DefaultClusterCap)

  /** Near-duplicate pairs (keep_id < drop_id, same cluster,
    * cosine >= threshold). */
  def pairs(embeddings: DataFrame, k: Int, iters: Int, threshold: Double,
            cap: Int = ConfiguredClusterCap): DataFrame = {
    val capN = resolveCap(embeddings, cap)
    DedupMetrics.ensure(embeddings.sparkSession)
    val capped = KMeansDet.fitFull(embeddings, k, iters)
      .withColumn("rk",
        row_number().over(Window.partitionBy("cid").orderBy("vec_id")))
      .observe(DedupMetrics.nextName("semdedup"),
        sum(when(col("rk") > capN, 1L).otherwise(0L)).as("dropped"))
      .filter(col("rk") <= capN)
      .select(col("vec_id"), col("v"), col("cid"))
    val a = capped.select(col("vec_id").as("keep_id"), col("v").as("va"),
      col("cid"))
    val b = capped.select(col("vec_id").as("drop_id"), col("v").as("vb"),
      col("cid"))
    a.join(b, Seq("cid"))
      .filter(col("keep_id") < col("drop_id"))
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) /
        (sqrt(Similarity.dot(col("va"), col("va"))) *
          sqrt(Similarity.dot(col("vb"), col("vb")))))
      .filter(col("cos") >= threshold)
      .select(col("keep_id"), col("drop_id"), round(col("cos"), 6).as("cos"))
  }

  /** The dedup decision itself: every vector that has a lower-id
    * near-duplicate in its cluster is dropped; survivors remain. */
  def survivors(embeddings: DataFrame, k: Int, iters: Int,
                threshold: Double, cap: Int = ConfiguredClusterCap): DataFrame = {
    val drop = pairs(embeddings, k, iters, threshold, cap)
      .select(col("drop_id").as("vec_id")).distinct()
    embeddings.select("vec_id").join(drop, Seq("vec_id"), "left_anti")
  }

  /** DuckDB mirror: the [[KMeansDet]] fit stages verbatim, then the
    * identical capped within-cluster pairing. */
  def pairsOracleSql(k: Int, iters: Int, dim: Int, threshold: Double,
                     cap: Int = DefaultClusterCap): String =
    (KMeansDet.oracleStages(k, iters, dim) +
      s""", capped AS (SELECT "vec_id", v, cid FROM (
         |   SELECT "vec_id", v, cid,
         |     row_number() OVER (PARTITION BY cid ORDER BY "vec_id") AS rk
         |   FROM fin) WHERE rk <= $cap),
         | pr AS (SELECT a."vec_id" AS keep_id, b."vec_id" AS drop_id,
         |   list_dot_product(a.v, b.v) /
         |     (sqrt(list_dot_product(a.v, a.v)) *
         |      sqrt(list_dot_product(b.v, b.v))) AS cos
         | FROM capped a JOIN capped b
         |   ON a.cid = b.cid AND a."vec_id" < b."vec_id")
         | SELECT keep_id AS "keep_id", drop_id AS "drop_id",
         |   round(cos, 6) AS "cos"
         | FROM pr WHERE cos >= ${threshold}e0
         | ORDER BY 1, 2""".stripMargin).replace("\n", " ")
}
