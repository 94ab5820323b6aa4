package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage operator that keeps a
  * 100 TB float32 embedding store scannable at an 4× (vs f32) / 8× (vs
  * f64) compression with ~0.2% cosine error: per-vector max-abs scaling
  * (the symmetric linear quantizer every serving stack ships — e.g.
  * FAISS's ScalarQuantizer QT_8bit_direct family) to codes in [−127,127],
  * plus the per-vector reconstruction error that drives the "which
  * vectors need f32 residuals" decision.
  *
  *   scale  = max_i |v_i|            (exact double max)
  *   code_i = ⌊ v_i · 127 / scale + 0.5 ⌋    (round-half-up, exact floor)
  *   recon_i = code_i · scale / 127
  *   qerr   = Σ (v_i − recon_i)²     (via the dot-product kernel both
  *                                    engines sum in index order)
  *
  * Every step is deterministic IEEE arithmetic rendered identically in
  * both engines (floor(x+0.5) instead of engine round(), whose half-case
  * tie-breaking differs between Spark and DuckDB), so codes AND the
  * reconstruction error hash-match the oracle — the same discipline as
  * [[Pq]]'s codes. A pure per-row projection: no shuffle, no state.
  * All-zero vectors quantize to all-zero codes (scale 0 guard).
  *
  * Dequantized search composes with the ANN family: recon vectors feed
  * [[Similarity.ivfTopK]]/[[Pq]] unchanged; PQ remains the heavier-
  * compression sibling (sub-byte per dim) when 1 byte/dim is still too
  * much.
  */
object Quantize {

  private def vcol: Column = col("embedding").cast("array<double>")

  /** vec_id, scale, codes (array<int>), qerr. */
  def int8(embeddings: DataFrame): DataFrame = {
    val scale = array_max(transform(vcol, x => abs(x)))
    val e = embeddings.select(col("vec_id"), vcol.as("v"),
      scale.as("scale"))
    val codes = when(col("scale") === 0.0,
        transform(col("v"), _ => lit(0)))
      .otherwise(transform(col("v"),
        x => floor(x * lit(127.0) / col("scale") + lit(0.5)).cast("int")))
    val withCodes = e.withColumn("codes", codes)
    val recon = transform(col("codes"),
      c => c.cast("double") * col("scale") / lit(127.0))
    val diff = zip_with(col("v"), recon, (a, b) => a - b)
    withCodes.withColumn("qerr", Similarity.dot(diff, diff))
      .select(col("vec_id"), col("scale"), col("codes"), col("qerr"))
  }

  /** The dequantized corpus: (vec_id, embedding) with every vector
    * reconstructed from its int8 codes (code·scale/127) — the form the
    * 1-byte storage tier serves to the ANN stack: recon vectors feed
    * [[Similarity.ivfTopK]]/[[Similarity.bruteForceTopK]] UNCHANGED
    * (q_knn_int8 runs the full IVF topology over them, and
    * SemDedupPackSpec's recall law gates the dequantized search against
    * the f32 brute-force truth). Still a pure per-row projection. */
  def reconEmbeddings(embeddings: DataFrame): DataFrame = {
    val scale = array_max(transform(vcol, x => abs(x)))
    val e = embeddings.select(col("vec_id"), vcol.as("v"),
      scale.as("scale"))
    val codes = when(col("scale") === 0.0,
        transform(col("v"), _ => lit(0)))
      .otherwise(transform(col("v"),
        x => floor(x * lit(127.0) / col("scale") + lit(0.5)).cast("int")))
    e.withColumn("codes", codes)
      .select(col("vec_id"),
        transform(col("codes"),
          c => c.cast("double") * col("scale") / lit(127.0))
          .as("embedding"))
  }

  /** The residual TIER decision consumed by search — the payoff of the
    * per-vector reconstruction error: the store keeps int8 codes for
    * every vector plus f32 residuals for exactly the vectors whose qerr
    * exceeds `qerrBudget` (the q_quant_residuals decision), and search
    * runs in two stages:
    *
    *   1. shortlist — the unchanged IVF topology over the dequantized
    *      corpus ([[Similarity.ivfTopK]] on [[reconEmbeddings]]), top
    *      `shortlist` per query;
    *   2. re-rank — cosine over the TIERED vectors (exact f32 where the
    *      residual is stored, recon otherwise — both query and neighbour
    *      side, since a corpus self-search serves both from the same
    *      tier), top `k` of the shortlist.
    *
    * Scale shape: stage 1 is the IVF plan; stage 2 is shortlist-scale
    * id-keyed equi-joins against the tier relation (at 100 TB the
    * residual patch join touches only flagged ids) and a
    * shortlist-bounded rank window. Every similarity is the identical
    * IEEE arithmetic in both engines (round-6 before ranking, id
    * tiebreak), so the whole two-stage search hash-matches; the
    * recall-vs-f32-brute law (>= plain int8 recall) is gated in
    * SemDedupPackSpec. */
  /** The tier relation the residual store serves, as ONE per-row
    * projection (codes → recon → qerr → choose exact-or-recon are all
    * column algebra over the same row — joining [[int8]] /
    * [[reconEmbeddings]] / the raw scan back together on vec_id would
    * pay three scans and two corpus-keyed joins for identical values).
    * The arithmetic is the same IEEE chain as [[int8]], so the oracle's
    * join-based tr/tn CTEs compute the identical doubles. */
  private def tieredVectors(embeddings: DataFrame,
                            qerrBudget: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), vcol.as("v"),
      array_max(transform(vcol, x => abs(x))).as("scale"))
    val codes = when(col("scale") === 0.0,
        transform(col("v"), _ => lit(0)))
      .otherwise(transform(col("v"),
        x => floor(x * lit(127.0) / col("scale") + lit(0.5)).cast("int")))
    val withR = e.withColumn("codes", codes)
      .withColumn("rv", transform(col("codes"),
        c => c.cast("double") * col("scale") / lit(127.0)))
    val diff = zip_with(col("v"), col("rv"), (a, b) => a - b)
    withR.withColumn("qerr", Similarity.dot(diff, diff))
      .select(col("vec_id"),
        when(col("qerr") > lit(qerrBudget), col("v")).otherwise(col("rv"))
          .as("tv"))
      .withColumn("tn", sqrt(Similarity.dot(col("tv"), col("tv"))))
  }

  def residualRefinedTopK(embeddings: DataFrame, k: Int, shortlist: Int,
                          qerrBudget: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = Similarity.ivfTopK(reconEmbeddings(embeddings), shortlist)
      .select(col("qid"), col("nid"))
    val tiered = tieredVectors(embeddings, qerrBudget)
    val ref = short
      .join(tiered.select(col("vec_id").as("qid"), col("tv").as("qtv"),
        col("tn").as("qtn")), "qid")
      .join(tiered.select(col("vec_id").as("nid"), col("tv").as("ntv"),
        col("tn").as("ntn")), "nid")
      .select(col("qid"), col("nid"),
        round(Similarity.dot(col("qtv"), col("ntv")) /
          (col("qtn") * col("ntn")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    ref.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** DuckDB CTE chain ending in `e("vec_id", v)` where v is the
    * dequantized vector — drop-in replacement for the plain
    * `e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v ...)` head
    * of the ANN oracles, computing the identical recon doubles. */
  def reconOracleCte: String =
    """e0 AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v0
      |   FROM embeddings),
      | s0 AS (SELECT "vec_id", v0,
      |   list_max(list_transform(v0, x -> abs(x))) AS scale FROM e0),
      | c0 AS (SELECT "vec_id", scale,
      |   CASE WHEN scale = 0.0e0
      |     THEN list_transform(v0, x -> 0)
      |     ELSE list_transform(v0,
      |       x -> CAST(floor(x * 127.0e0 / scale + 0.5e0) AS INTEGER))
      |   END AS codes FROM s0),
      | e AS (SELECT "vec_id", list_transform(codes,
      |   x -> CAST(x AS DOUBLE) * scale / 127.0e0) AS v FROM c0)"""
      .stripMargin.replace("\n", " ")

  /** DuckDB mirror of [[int8]] over the `embeddings` table: identical
    * max-abs scale, floor(x+0.5) codes, and list_dot_product error (the
    * same index-order summation as the engine's dot kernel). */
  def int8OracleSql(round6: Boolean = true): String =
    s"""WITH e AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v
       |   FROM embeddings),
       | s AS (SELECT "vec_id", v,
       |   list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
       | c AS (SELECT "vec_id", v, scale,
       |   CASE WHEN scale = 0.0e0
       |     THEN list_transform(v, x -> 0)
       |     ELSE list_transform(v,
       |       x -> CAST(floor(x * 127.0e0 / scale + 0.5e0) AS INTEGER))
       |   END AS codes FROM s),
       | r AS (SELECT "vec_id", scale, codes,
       |   list_transform(v, (x, i) ->
       |     x - CAST(codes[i] AS DOUBLE) * scale / 127.0e0) AS d
       |   FROM c)
       | SELECT "vec_id", round(scale, 6) AS "scale",
       |   array_to_string(codes, ',') AS "codes",
       |   round(list_dot_product(d, d), 6) AS "qerr"
       | FROM r ORDER BY "vec_id"""".stripMargin.replace("\n", " ")
}
