package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (Cormack, Clarke & Büttcher,
  * SIGIR 2009) of independent retriever rankings —
  * `fused(d) = Σ_r 1/(k0 + rank_r(d))` — the standard way to combine a
  * lexical (BM25) and a dense (embedding) retriever without score
  * calibration, since RRF consumes RANKS, not incomparable scores.
  *
  * Scale shape: each retriever already emits query-scale top-k rows, so
  * fusion is a union of (query, doc, rank) triples + one small groupBy
  * + a per-query rank window — nothing here ever touches the corpus;
  * the retrievers (Bm25.topK, denseRanking / the ANN family) own the
  * corpus-scale work. Determinism: contributions 1/(k0+rank) come from
  * integer ranks, and each (query, doc) pair receives at most one
  * contribution per retriever (≤ 2 here — a commutative two-term double
  * add, bit-identical on any engine/order), rounded to 9 before the
  * fused ranking with a doc_id tiebreak. */
object Hybrid {

  /** Fuse rankings (each `(query_id, doc_id, rk)`) into the top-`topK`
    * per query: `(query_id, rk, doc_id, rrf, n_retrievers)`. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val tagged = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rk")))
      .reduce(_ unionByName _)
    val fused = tagged
      .groupBy("query_id", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(k0.toDouble) + col("rk").cast("double"))), 9)
        .as("rrf"), count(lit(1)).as("n_retrievers"))
    fused
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("rrf").desc, col("doc_id"))))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf"),
        col("n_retrievers"))
  }

  /** Dense retriever leg: exact cosine top-`k` for query docs given by
    * id (query vector = that doc's embedding; the doc itself excluded).
    * Output `(query_id, doc_id, rk)`. Exactness baseline — at corpus
    * scale the ANN family (lshTopK / ivfPqTopK) produces the same
    * (query_id, doc_id, rk) shape. */
  def denseRanking(embeddings: DataFrame, queryIds: Seq[Long],
                   k: Int): DataFrame = {
    require(queryIds.nonEmpty)
    val e = embeddings.select(col("vec_id"),
        KMeansDet.quantize(col("embedding").cast("array<double>")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = e.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val sim = round(Similarity.dot(col("qv"), col("v")) /
      (col("qn") * col("nrm")), 6)
    q.join(e, col("vec_id") =!= col("query_id"))
      .withColumn("sim", sim)
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rk"))
  }

  /** DuckDB rendering of [[denseRanking]] as a CTE chain ending in
    * `denr(query_id, doc_id, rk)`. */
  def denseRankingStagesSql(queryIds: Seq[Long], k: Int): String =
    s"""dene AS (SELECT "vec_id",
       |   list_transform(CAST("embedding" AS DOUBLE[]),
       |     x -> round(x * ${KMeansDet.Scale}e0) / ${KMeansDet.Scale}e0) AS v
       |   FROM embeddings),
       | denn AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm
       |   FROM dene),
       | denq AS (SELECT "vec_id" AS query_id, v AS qv, nrm AS qn FROM denn
       |   WHERE "vec_id" IN (${queryIds.mkString(", ")})),
       | denr AS (SELECT query_id, doc_id, rk FROM (
       |   SELECT q.query_id, c."vec_id" AS doc_id,
       |     row_number() OVER (PARTITION BY q.query_id ORDER BY
       |       round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 6) DESC,
       |       c."vec_id") AS rk
       |   FROM denq q JOIN denn c ON c."vec_id" <> q.query_id)
       |   WHERE rk <= $k)""".stripMargin

  /** Full oracle for the fused hybrid: the BM25 leg (its complete
    * oracle SQL wrapped as a derived table — DuckDB allows a WITH inside
    * a subquery), the dense leg, and the RRF ranking. */
  def rrfOracleSql(bm25Sql: String, queryIds: Seq[Long], legK: Int,
                   topK: Int, k0: Int = 60): String =
    (s"""WITH lexr AS (SELECT query_id, "doc_id" AS doc_id, rk
       |   FROM ($bm25Sql)),
       | ${denseRankingStagesSql(queryIds, legK)},
       | u AS (SELECT * FROM lexr UNION ALL SELECT * FROM denr),
       | fused AS (SELECT query_id, doc_id,
       |     round(sum(1.0e0 / (${k0.toDouble}e0 + CAST(rk AS DOUBLE))), 9)
       |       AS rrf,
       |     count(*) AS n_retrievers
       |   FROM u GROUP BY 1, 2),
       | rnk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY rrf DESC, doc_id) AS rk FROM fused)
       | SELECT query_id AS "query_id", CAST(rk AS INTEGER) AS "rk",
       |   doc_id AS "doc_id",
       |   rrf AS "rrf", CAST(n_retrievers AS BIGINT) AS "n_retrievers"
       | FROM rnk WHERE rk <= $topK
       | ORDER BY "query_id", "rk"""").stripMargin.replace("\n", " ")
}
