package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  *  - Brute-force cosine top-k: the exactness baseline. O(n^2) pair space —
  *    fine for verification scale; at 100 TB this is the per-bucket kernel,
  *    not the global plan.
  *  - Random-hyperplane LSH: deterministic hyperplanes (seeded PRNG baked
  *    into the plan as literals), sign-bit bucket key, neighbours searched
  *    within-bucket only. The shuffle carries (bucket, id, vec) and each
  *    bucket's pair space is tiny — this is the 100 TB path.
  */
object Similarity {

  /** Elementwise dot product of two array<double> columns — a native
    * codegen'd Catalyst expression ([[graft.expressions.DotProduct]]); the
    * zip_with/aggregate higher-order form costs ~30x in lambda dispatch on
    * the all-pairs kernel. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact cosine top-k neighbours for every vector (brute force).
    * Ranking uses the 6-decimal-rounded similarity with id tiebreak so
    * results are reproducible across engines. */
  def bruteForceTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    a.crossJoin(b).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim.as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: unordered (id_a < id_b) pairs
    * whose cosine similarity clears `threshold` — the dedup DECISION set,
    * as opposed to the top-k NEIGHBOUR set. Exact all-pairs kernel here;
    * at 100 TB the identical select runs after an LSH-bucket equi-join
    * (see [[lshTopK]]'s bucketing) so the pair space stays per-bucket. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), sim.as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Deterministic random hyperplanes: dim x planes doubles from a seeded
    * PRNG, baked into the plan as array literals. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** LSH bucket key: sign bits of projections onto the hyperplanes. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(v, array(p.map(lit): _*))
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Embedding dimension read from the first row (a one-row head job —
    * metadata-scale even on a large cluster). [[DotProduct]] fails fast on
    * any row whose length disagrees. */
  def inferDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding")).as("d")).head().getInt(0)

  private def resolveDim(embeddings: DataFrame, dim: Int): Int =
    if (dim > 0) dim else inferDim(embeddings)

  /** Default number of IVF cells probed per query vector. */
  val DefaultIvfProbes: Int = 2

  /** Spark conf key overriding [[DefaultIvfProbes]] at deploy time: probe
    * count is the recall/cost dial of [[ivfTopK]] (more probes = higher
    * recall, linearly more candidate pairs), and tuning it must not
    * require recompiling. `SimilaritySpec`'s recall gate is the
    * quality budget for choosing a value. */
  val IvfProbesConfKey = "spark.graft.ann.ivfProbes"

  /** Sentinel: resolve probe count from [[IvfProbesConfKey]]. */
  val ConfiguredIvfProbes: Int = -1

  private def resolveProbes(df: DataFrame, probes: Int): Int =
    if (probes != ConfiguredIvfProbes) probes
    else df.sparkSession.conf.getOption(IvfProbesConfKey).map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$IvfProbesConfKey must be a positive integer, got '$v'")
      }
      require(n > 0, s"$IvfProbesConfKey must be positive, got $n")
      n
    }.getOrElse(DefaultIvfProbes)

  /** Drop rows in LSH buckets larger than `cap` before any self-join —
    * the same skew guard as [[Dedup.minhashCandidates]]: a degenerate
    * bucket (e.g. a zero/constant embedding cluster) would otherwise put
    * a quadratic pair space in one task. Dropped-row counts flow through
    * the shared [[DedupMetrics]] `observe` hook (tag "emblsh"); the
    * default cap is [[Dedup.MaxBucketSizeConfKey]]-tunable and far above
    * any healthy bucket (`PlanAuditSpec` proves it inert on the oracle
    * corpora, so capped and uncapped results coincide there). */
  private def capBuckets(withBucket: DataFrame, cap: Int): DataFrame = {
    DedupMetrics.ensure(withBucket.sparkSession)
    withBucket
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("bucket")))
      .observe(DedupMetrics.nextName("emblsh"),
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("dropped"))
      .filter(col("bucket_n") <= cap)
      .drop("bucket_n")
  }

  /** Approximate top-k: neighbours restricted to the same LSH bucket.
    * Returns (qid, nid, sim) — a subset of brute force's pairs. `dim` is
    * inferred from the data when not given. */
  def lshTopK(embeddings: DataFrame, k: Int, planes: Int = 8,
              seed: Long = 42L, dim: Int = -1,
              maxBucketSize: Int = Dedup.ConfiguredBucketSize): DataFrame = {
    val e = prepared(embeddings)
    val hp = hyperplanes(resolveDim(embeddings, dim), planes, seed)
    val withBucket = capBuckets(
      e.withColumn("bucket", lshBucket(col("v"), hp)),
      Dedup.resolveCap(embeddings, maxBucketSize))
    val a = withBucket.select(col("bucket"), col("vec_id").as("qid"),
      col("v").as("va"), col("nrm").as("na"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("nid"),
      col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    a.join(b, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim.as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: vectors are assigned to their
    * nearest of `cells` centroids, queries probe their `probes` nearest
    * cells and search only those inverted lists. Complements [[lshTopK]]:
    * IVF adapts to the data distribution where random hyperplanes cannot.
    *
    * Centroid selection is deterministic hash-sampling (the k-means++
    * refinement the literature adds is an offline driver loop over a
    * sample; the operator contract — centroids broadcast, assignment via
    * small-dimension crossJoin, per-cell candidate join — is identical).
    * Scale shape: assignment is a broadcast join (cells x dim doubles),
    * the candidate join shuffles (cell, id, vec) like the LSH bucket join,
    * and no stage ever materialises the n^2 pair space. */
  /** Shared IVF candidate machinery: (qid, nid, sim) over the probed
    * cells. Each neighbour has exactly ONE home cell, so a (qid, nid)
    * pair appears at most once across the probed cells — no distinct. */
  private def ivfCandidatePairs(embeddings: DataFrame, cells: Int,
                                probes: Int, seed: Long): DataFrame = {
    val nProbes = resolveProbes(embeddings, probes)
    val e = prepared(embeddings)
    // deterministic centroid sample: lowest `cells` dual-compilable hashes
    // of "<vec_id>:<seed>" (md5-based, so the DuckDB oracle picks the
    // identical centroid set); vec_id tiebreak for full determinism
    val cent = e.withColumn("h", graft.ext.Dedup.base60Col(
        concat(col("vec_id").cast("string"), lit(":" + seed))))
      .orderBy("h", "vec_id").limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // rank centroids per vector by cosine; keep top `probes` for the query
    // side and the top-1 as the home cell. The ranking similarity is
    // 6-decimal rounded (cid tiebreak) so cell assignment is reproducible
    // across engines — same convention as the final top-k ranking.
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("csim",
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    val ranked = scored.withColumn("crk", row_number().over(w))
    val home = ranked.filter(col("crk") === 1)
      .select(col("cid").as("cell"), col("vec_id").as("nid"),
        col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    ranked.filter(col("crk") <= nProbes)
      .select(col("cid").as("cell"), col("vec_id").as("qid"),
        col("v").as("va"), col("nrm").as("na"))
      .join(home, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim.as("sim"))
  }

  def ivfTopK(embeddings: DataFrame, k: Int, cells: Int = 16,
              probes: Int = ConfiguredIvfProbes, seed: Long = 42L): DataFrame = {
    val wq = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    ivfCandidatePairs(embeddings, cells, probes, seed)
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** Hard-negative mining for contrastive embedding training (the
    * in-batch-negatives upgrade every retrieval/embedding recipe calls
    * for — e.g. DPR, Karpukhin 2020 §4.2: negatives that are CLOSE to
    * the anchor teach the margin; random negatives are too easy): per
    * anchor, the top-`k` neighbours whose cosine lies in [lo, hi) — the
    * "hard" band below the near-duplicate zone (a near-dup is a false
    * negative, not a hard one, hence the `hi` ceiling). Candidates come
    * from the same IVF probed-cell topology as [[ivfTopK]] — at 100 TB
    * the pair space stays per-cell, and mining cost is the ANN search
    * cost, not an all-pairs pass. Fully dual-compilable: same centroid
    * sample, cell ranks, rounded cosine, band filter and rank. */
  def hardNegatives(embeddings: DataFrame, k: Int, lo: Double, hi: Double,
                    cells: Int = 16, probes: Int = ConfiguredIvfProbes,
                    seed: Long = 42L): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val wq = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    ivfCandidatePairs(embeddings, cells, probes, seed)
      .filter(col("sim") >= lo && col("sim") < hi)
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** ANN recall evaluation harness: per-query recall@k of the IVF search
    * against the exact brute-force ground truth — the acceptance gate every
    * ANN deployment runs before trusting an index (and after every probe /
    * cell retune). The candidate system is [[ivfTopK]] with the same
    * deterministic centroid sample; the compare is a (qid, nid) left join
    * of two k-row-per-query sets — eval-scale, not corpus-scale. Both legs
    * use the 6-decimal-rounded similarity with id tiebreak, so the truth
    * set (and therefore recall) is reproducible across engines.
    *
    * `queryPred` is the 100 TB lever: it restricts the PROBE side only —
    * ground truth for each sampled query is still ranked against the FULL
    * corpus, and the IVF index (centroids, cells) is still built on the
    * full corpus, so sampled recall is the production index's recall, not
    * a shrunken look-alike's. The brute leg's pair space becomes
    * |sample| x n instead of n^2. Law-pinned: sampled output ==
    * full-corpus output filtered to the sampled qids. */
  def annRecall(embeddings: DataFrame, k: Int, cells: Int = 16,
                probes: Int = ConfiguredIvfProbes, seed: Long = 42L,
                queryPred: Column = lit(true)): DataFrame = {
    val qids = broadcast(
      embeddings.filter(queryPred).select(col("vec_id").as("qid")))
    val e = prepared(embeddings)
    val a = e.join(qids, e("vec_id") === qids("qid"))
      .select(col("qid"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("nid"), col("v").as("vb"),
      col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    val truth = a.crossJoin(b).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim.as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"))
    val approx = ivfTopK(embeddings, k, cells, probes, seed)
      .join(qids, Seq("qid"))
      .select(col("qid"), col("nid"), lit(1L).as("hit"))
    truth.join(approx, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("qid"), col("k_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("k_truth").cast("double"), 6)
          .as("recall"))
  }

  /** LSH-bucketed embedding near-duplicate pairs — the 100 TB production
    * form of [[cosineNearDupPairs]]: candidate pairs come from an equi-join
    * on the sign-bit bucket key (shuffle carries (bucket, id, vec) and each
    * bucket's pair space is tiny), then the SAME thresholded cosine select
    * decides. Output is a subset of the exact all-pairs decision set;
    * recall rises with fewer planes or multiple seed rounds. */
  def lshNearDupPairs(embeddings: DataFrame, threshold: Double,
                      planes: Int = 8, seed: Long = 42L,
                      dim: Int = -1,
                      maxBucketSize: Int = Dedup.ConfiguredBucketSize): DataFrame = {
    val e = prepared(embeddings)
    val hp = hyperplanes(resolveDim(embeddings, dim), planes, seed)
    val withBucket = capBuckets(
      e.withColumn("bucket", lshBucket(col("v"), hp)),
      Dedup.resolveCap(embeddings, maxBucketSize))
    val a = withBucket.select(col("bucket"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), sim.as("sim"))
      .filter(col("sim") >= threshold)
  }
}
