package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the standard diversity stage between retrieval and a RAG
  * prompt: from a candidate pool, greedily pick the item maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` so near-duplicate passages
  * don't crowd the context window.
  *
  * The greedy loop is UNROLLED into the plan (selectK is prompt-slot
  * scale — 3..10 — so the unrolling is small and static): step 1 takes
  * the relevance argmax; each later step anti-joins the selected set,
  * computes each remaining candidate's max similarity to the selected
  * items, and takes the MMR argmax. Every join is qid-keyed, and every
  * post-candidate relation is (queries × poolK) rows — query-scale, not
  * corpus-scale; at 100 TB the candidate pool comes from the ANN stage
  * (lshTopK / ivfPqTopK) and this operator never touches the corpus.
  *
  * Determinism: similarities are exact-dyadic cosines rounded to 6
  * decimals BEFORE any comparison; λ is dyadic (0.5 by default) so MMR
  * scores are exact multiples of 5e-7 and argmax ties resolve by nid on
  * both engines. */
object Mmr {

  private def cos(a: Column, na: Column, b: Column, nb: Column): Column =
    round(Similarity.dot(a, b) / (na * nb), 6)

  /** Re-rank: for each query (rows of `embeddings` matching
    * `queryPred`), build the top-`poolK` cosine candidate pool over the
    * whole corpus (exactness baseline — swap in an ANN candidate set at
    * scale) and greedily select `selectK` items by MMR. Output:
    * (qid, rk, nid, score) with rk 1..selectK; score is the relevance
    * for rk=1 and the MMR value for later ranks. */
  def rerank(embeddings: DataFrame, queryPred: Column, poolK: Int,
             selectK: Int, lambda: Double = 0.5): DataFrame = {
    require(selectK >= 1 && selectK <= poolK,
      s"selectK $selectK must be in 1..poolK $poolK")
    val e = embeddings.select(col("vec_id"),
      KMeansDet.quantize(col("embedding").cast("array<double>")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = e.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("nid"), col("v").as("nv"),
      col("nrm").as("nn"))
    val w = Window.partitionBy("qid").orderBy(col("rel").desc, col("nid"))
    // Materialize the pool ONCE (queries x poolK rows — trivially small):
    // the unrolled greedy steps would otherwise each replay the corpus
    // cross-join + top-k window in the initial plan (measured 52
    // exchanges for selectK=3 vs 9 materialized). EAGER like tokenBudget.
    val cand = q.join(c, col("qid") =!= col("nid"))
      .withColumn("rel", cos(col("qv"), col("qn"), col("nv"), col("nn")))
      .withColumn("prk", row_number().over(w))
      .where(col("prk") <= poolK)
      .select(col("qid"), col("nid"), col("nv"), col("nn"), col("rel"))
      .localCheckpoint()
    // step 1: relevance argmax
    var selected = cand
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("qid"), lit(1).as("rk"), col("nid"), col("nv"),
        col("nn"), col("rel").as("score"))
    for (t <- 2 to selectK) {
      val selSide = selected.select(col("qid").as("s_qid"),
        col("nid").as("s_nid"), col("nv").as("s_v"), col("nn").as("s_n"))
      val rem = cand.join(selSide.select(col("s_qid").as("qid"),
          col("s_nid").as("nid")), Seq("qid", "nid"), "left_anti")
      val mmr = rem.join(selSide, col("qid") === col("s_qid"))
        .withColumn("ss", cos(col("nv"), col("nn"), col("s_v"), col("s_n")))
        .groupBy(col("qid"), col("nid"), col("nv"), col("nn"), col("rel"))
        .agg(max(col("ss")).as("maxss"))
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("maxss"))
      val pick = mmr.withColumn("mrk", row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))))
        .where(col("mrk") === 1)
        .select(col("qid"), lit(t).as("rk"), col("nid"), col("nv"),
          col("nn"), col("score"))
      // pin each step (queries x t rows): the next step's anti-join and
      // max-sim read a materialized selected set instead of replaying
      // the whole earlier-step lineage
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("qid"), col("rk"), col("nid"),
      round(col("score"), 6).as("score"))
  }

  /** DuckDB rendering of [[rerank]], step for step. `queryPredSql` is
    * the predicate over the `embeddings` table's columns. */
  def rerankOracleSql(queryPredSql: String, poolK: Int, selectK: Int,
                      lambda: Double = 0.5): String = {
    val lam = graft.expr.E.formatDouble(lambda)
    val oneMinus = graft.expr.E.formatDouble(1.0 - lambda)
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT "vec_id",
         |   list_transform(CAST("embedding" AS DOUBLE[]),
         |     x -> round(x * ${KMeansDet.Scale}e0) / ${KMeansDet.Scale}e0) AS v
         |   FROM embeddings),
         | en AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         | q AS (SELECT "vec_id" AS qid, v AS qv, nrm AS qn FROM en
         |   WHERE $queryPredSql),
         | cand AS (SELECT * FROM (SELECT q.qid, c."vec_id" AS nid,
         |     c.v AS nv, c.nrm AS nn,
         |     round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 6) AS rel,
         |     row_number() OVER (PARTITION BY q.qid ORDER BY
         |       round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 6) DESC,
         |       c."vec_id") AS prk
         |   FROM q JOIN en c ON c."vec_id" <> q.qid)
         |   WHERE prk <= $poolK),
         | sel1 AS (SELECT qid, 1 AS rk, nid, nv, nn, rel AS score
         |   FROM cand WHERE prk = 1)""".stripMargin)
    for (t <- 2 to selectK) {
      val selAll = (1 until t).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      sb.append(
        s""", selu${t - 1} AS ($selAll),
           | rem$t AS (SELECT c.* FROM cand c LEFT JOIN selu${t - 1} s
           |   ON s.qid = c.qid AND s.nid = c.nid WHERE s.nid IS NULL),
           | mmr$t AS (SELECT r.qid, r.nid, r.nv, r.nn, r.rel,
           |     $lam * r.rel - $oneMinus * max(
           |       round(list_dot_product(r.nv, s.nv) / (r.nn * s.nn), 6))
           |       AS score
           |   FROM rem$t r JOIN selu${t - 1} s ON s.qid = r.qid
           |   GROUP BY r.qid, r.nid, r.nv, r.nn, r.rel),
           | sel$t AS (SELECT qid, $t AS rk, nid, nv, nn, score FROM (
           |   SELECT *, row_number() OVER (PARTITION BY qid
           |     ORDER BY score DESC, nid) AS mrk FROM mmr$t) WHERE mrk = 1)"""
          .stripMargin)
    }
    val all = (1 to selectK).map(i => s"SELECT * FROM sel$i")
      .mkString(" UNION ALL ")
    sb.append(s""" SELECT qid AS "qid", rk AS "rk", nid AS "nid",
       | round(score, 6) AS "score" FROM ($all)
       | ORDER BY "qid", "rk"""".stripMargin)
    sb.toString.replace("\n", " ")
  }
}
