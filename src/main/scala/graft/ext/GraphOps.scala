package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair tables the engine already
  * produces — PageRank (Brin & Page 1998) with fixed iteration count and
  * damping, run over an undirected similarity graph (near-dup pairs).
  * Centrality over the duplicate graph ranks the "most-copied" documents,
  * the corpus-curation counterpart of a citation rank.
  *
  * Scale shape: each iteration is edge-scale joins keyed by node id — the
  * SAME key every round, so the hash partitioning established by the
  * degree aggregate is reused across all iterations (no new shuffle key
  * anywhere). The node count is the only driver-side scalar (one count,
  * the [[CorpusStats.tfidfTopTerms]] precedent). Iterations are a FIXED
  * small constant — the deterministic-fixpoint discipline every solver in
  * this repo follows — so the plan is a statically unrolled chain, not a
  * data-dependent loop.
  */
object GraphOps {

  /** PageRank over an undirected pair table.
    *
    * @param pairs      (aCol, bCol) rows; symmetrized and deduped here,
    *                   so every node has out-degree >= 1 (no dangling
    *                   mass, no special-casing)
    * @param iterations fixed unrolled iteration count
    */
  def pagerank(pairs: DataFrame, aCol: String = "doc_a",
               bCol: String = "doc_b", iterations: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1, 10] (unrolled plan), got $iterations")
    // Materialize the edge list ONCE and cut its lineage: the unrolled
    // iterations reference e/deg/nodes 3x each, and without the
    // checkpoint every reference re-expands the whole upstream pair
    // derivation (an LSH candidate chain for the near-dup graph — the
    // initial plan carried 120 exchanges). Same per-round discipline as
    // [[Dedup.nearDupClusters]]'s label propagation.
    //
    // The checkpoint is taken HASH-PARTITIONED ON src (guide §2.4: every
    // operation downstream is keyed by node id): the degree aggregate,
    // the initial rank projection and each iteration's edge-rank join
    // all consume that one partitioning, so an iteration pays exactly
    // one exchange (the contribution aggregate keyed by dst) instead of
    // re-exchanging the edge list per round. Skew note: a hot node's
    // edges co-locating is inherent to ANY src-keyed join iteration —
    // the old shape had the same property inside each round's
    // ensure-requirements exchange; this just pays it once. The distinct
    // itself also rides the src partitioning (hash(src) satisfies the
    // (src, dst) clustering requirement) after map-side partial dedup.
    val spark = pairs.sparkSession
    // explicit partition count (REPARTITION_BY_NUM): AQE may coalesce a
    // count-less repartition(col), after which the checkpoint captures
    // UnknownPartitioning and every downstream consumer re-exchanges —
    // the very waste this partitioning exists to remove. Same count rule
    // as Tables.readRangedBy (locally = cores; on a cluster
    // shuffle.partitions dominates).
    val nPart = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    // The eager checkpoint runs under AQE disabled: an adaptive plan's
    // captured LogicalRDD reports UnknownPartitioning (observed on the
    // final plan even with REPARTITION_BY_NUM), which would force every
    // iteration to re-exchange. The checkpoint job itself is edge-scale
    // (near-dup pairs), so losing AQE for it costs nothing; the session
    // conf is restored immediately.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    val e = try {
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .repartition(nPart, col("src"))
        .distinct()
        .localCheckpoint(true)
    } finally spark.conf.set(aqeKey, aqePrev)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val nodes = deg.select(col("src").as("id"))
    val n = nodes.count().toDouble
    // teleport term rendered EXACTLY as the oracle computes it:
    // (1 - damping) first, then / n — same IEEE ops, same order
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("cin"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(teleport) +
          lit(damping) * coalesce(col("cin"), lit(0.0))).as("rank"))
    }
    ranks.select(col("id").as("doc_id"),
        round(col("rank"), 6).as("pagerank"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[pagerank]]: unrolled CTE chain over an edges CTE
    * named `__pr_e(src, dst)` that the caller prepends (already
    * symmetrized-and-deduped via UNION). All float literals render in
    * e-notation / as the same subtraction so DuckDB computes identical
    * doubles (plain `0.85` would type DECIMAL). */
  def pagerankOracleSql(iterations: Int = 3,
                        damping: Double = 0.85): String = {
    val d = graft.expr.E.formatDouble(damping)
    val chain = (1 to iterations).map { k =>
      s"""__pr_c$k AS (SELECT e.dst AS id, sum(r.rank / deg.deg) AS cin
         | FROM __pr_e e JOIN __pr_r${k - 1} r ON r.id = e.src
         | JOIN __pr_deg deg ON deg.src = e.src GROUP BY 1),
         | __pr_r$k AS (SELECT nd.id,
         |   ((1.0e0 - $d) / nn.n) + $d * coalesce(c.cin, 0.0e0) AS rank
         | FROM __pr_nodes nd CROSS JOIN __pr_n nn
         | LEFT JOIN __pr_c$k c USING (id))""".stripMargin
    }.mkString(", ")
    s""" __pr_deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
       |   FROM __pr_e GROUP BY 1),
       | __pr_nodes AS (SELECT src AS id FROM __pr_deg),
       | __pr_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM __pr_nodes),
       | __pr_r0 AS (SELECT id, 1.0e0 / nn.n AS rank
       |   FROM __pr_nodes CROSS JOIN __pr_n nn),
       | $chain
       | SELECT id AS "doc_id", round(rank, 6) AS pagerank
       | FROM __pr_r$iterations ORDER BY 1""".stripMargin.replace("\n", " ")
  }
}
