package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.{E, Pipeline, Stage, C, Lit, SLit, CastD, If, ILit}
import graft.expr.E._
import graft.ext.{Dedup, Similarity, TextAnalysis => TA}
import graft.Queries.Q

/** Beyond-reference operators for large-scale training-data pipelines
  * (dedup, similarity search, text analysis, event windows) wired as
  * driver-contract queries over the `documents` / `embeddings` / `events`
  * testdata tables.
  */
object ExtQueries {

  /** DuckDB rendering of [[Similarity.lshBucket]]: disjoint power-of-two
    * sign bits summed. Hyperplane literals are the SAME doubles baked into
    * the Spark plan (seeded PRNG + round-trip double formatting), so the
    * oracle computes identical projections. Dim fixed to the driver
    * testdata's 64 here — the Spark side infers it from the data. */
  private def lshBucketSql(planes: Int, seed: Long, dim: Int): String =
    Similarity.hyperplanes(dim, planes, seed).zipWithIndex.map { case (p, i) =>
      val arr = p.map(E.formatDouble).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Per-document scalar pipeline: one projection stage over `documents`. */
  private def docQ(name: String, cols: (String, E)*): Q = {
    val stages = Vector(Stage(Seq[(String, E)]("doc_id" -> C("doc_id")) ++ cols))
    Q(name,
      (s, dir) => Pipeline.applySpark(Tables.read(s, dir, "documents"), stages)
        .orderBy("doc_id"),
      Some(Pipeline.toSql("documents", stages, Seq("doc_id"))))
  }

  private val text: E = C("text")

  def all: Seq[Q] = Seq(
    // ---- text analysis (oracle-checked expressions) ---------------------
    docQ("q_text_quality",
      "n_chars" -> TA.charCount(text),
      "n_tokens" -> TA.tokenCount(text),
      "avg_token_len" -> TA.avgTokenLength(text),
      "stopword_ratio" -> TA.stopwordRatio(text),
      "quality" -> TA.qualityScore(text)),
    docQ("q_token_count", "n_tokens" -> TA.tokenCount(text),
      "n_tokens_bpe" -> E.round(TA.bpeTokenEstimate(text), 6)),
    docQ("q_lang_id", "lang_pred" -> TA.langId(text),
      "score_en" -> TA.langScore(text, "en"),
      "score_de" -> TA.langScore(text, "de")),
    docQ("q_doc_fingerprint",
      "fp" -> TA.fingerprint(text),
      "fp_norm" -> TA.normalizedFingerprint(text)),
    // ---- multimodal plumbing: opaque binary payload + typed metadata ----
    docQ("q_multimodal_meta",
      "payload_bytes" -> graft.expr.Raw(
        octet_length(col("text").cast("binary")).cast("double"),
        "CAST(octet_length(CAST(\"text\" AS BLOB)) AS DOUBLE)"),
      "payload_md5" -> md5S(text)),
    // ---- dedup ----------------------------------------------------------
    Q("q_dedup_exact",
      (s, dir) => Dedup.exact(Tables.read(s, dir, "documents")).orderBy("fp"),
      Some("""SELECT md5("text") AS "fp", min("doc_id") AS "keep_doc_id",
             | CAST(count(*) AS DOUBLE) AS "dup_count"
             | FROM documents GROUP BY 1 ORDER BY "fp"""".stripMargin
        .replace("\n", " "))),
    Q("q_dedup_minhash_sig", (s, dir) =>
      Dedup.minhashLsh(Tables.read(s, dir, "documents"))
        .select(col("doc_id"), col("sig").getItem(0).as("sig0"),
          xxhash64(concat_ws(",", col("sig"))).as("sig_hash"))
        .orderBy("doc_id"), None),
    Q("q_dedup_minhash_pairs", (s, dir) =>
      Dedup.minhashCandidates(Tables.read(s, dir, "documents"), k = 16, rowsPerBand = 2)
        .orderBy("doc_a", "doc_b"), None),
    Q("q_dedup_simhash", (s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(split(col("text"), " ")).as("simhash"))
        .orderBy("doc_id"), None),
    Q("q_dedup_ngram_jaccard", (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.read(s, dir, "documents"),
        threshold = 0.0, k = 16, rowsPerBand = 2)
        .select(col("doc_a"), col("doc_b"), org.apache.spark.sql.functions.round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b"), None),
    // Embedding-cosine near-dup: thresholded unordered pair set over the
    // embeddings table (the LSH-bucketed form is the 100 TB path).
    Q("q_dedup_embedding_cosine",
      (s, dir) => Similarity.cosineNearDupPairs(
          Tables.read(s, dir, "embeddings"), threshold = 0.35)
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v FROM embeddings),
             | n AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             | p AS (SELECT a."vec_id" AS id_a, b."vec_id" AS id_b,
             |   round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
             |   FROM n a JOIN n b ON a."vec_id" < b."vec_id")
             | SELECT id_a AS "id_a", id_b AS "id_b", sim AS "sim" FROM p
             | WHERE sim >= 0.35e0 ORDER BY "id_a", "id_b"""".stripMargin
        .replace("\n", " "))),
    // ---- similarity search ----------------------------------------------
    Q("q_knn_cosine_topk",
      (s, dir) => Similarity.bruteForceTopK(Tables.read(s, dir, "embeddings"), 5)
        .orderBy("qid", "nid"),
      Some("""WITH e AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v FROM embeddings),
             | n AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             | p AS (SELECT a."vec_id" AS qid, b."vec_id" AS nid,
             |   round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
             |   FROM n a JOIN n b ON a."vec_id" <> b."vec_id"),
             | r AS (SELECT qid, nid, sim,
             |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM p)
             | SELECT qid AS "qid", nid AS "nid", sim AS "sim" FROM r WHERE rk <= 5
             | ORDER BY qid, nid""".stripMargin.replace("\n", " "))),
    Q("q_knn_lsh", (s, dir) =>
      Similarity.lshTopK(Tables.read(s, dir, "embeddings"), 5).orderBy("qid", "nid"),
      Some("""WITH e AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v FROM embeddings),
             | n AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             | b AS (SELECT "vec_id", v, nrm, BUCKET AS bucket FROM n),
             | p AS (SELECT a."vec_id" AS qid, b2."vec_id" AS nid,
             |   round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) AS sim
             |   FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a."vec_id" <> b2."vec_id"),
             | r AS (SELECT qid, nid, sim,
             |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM p)
             | SELECT qid AS "qid", nid AS "nid", sim AS "sim" FROM r WHERE rk <= 5
             | ORDER BY qid, nid""".stripMargin.replace("\n", " ")
        .replace("BUCKET", lshBucketSql(8, 42L, 64)))),
    // IVF inverted-file ANN: data-adaptive cells (vs lshTopK's random
    // hyperplanes); probes its 2 nearest cells per query.
    Q("q_knn_ivf", (s, dir) =>
      Similarity.ivfTopK(Tables.read(s, dir, "embeddings"), 5)
        .orderBy("qid", "nid"),
      None),
    // SimHash banded near-dup pairs: full recall for hamming <= bands-1 by
    // pigeonhole; exact bit_count(xor) check on candidates only.
    Q("q_dedup_simhash_pairs", (s, dir) =>
      Dedup.simhashNearDupPairs(Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("text")), maxHamming = 3)
        .orderBy("doc_a", "doc_b"),
      None),
    // LSH-bucketed near-dup decision set: the production-scale form of
    // q_dedup_embedding_cosine (pairs are a subset of its exact output).
    Q("q_dedup_embedding_lsh",
      (s, dir) => Similarity.lshNearDupPairs(
          Tables.read(s, dir, "embeddings"), threshold = 0.35)
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT "vec_id", CAST("embedding" AS DOUBLE[]) AS v FROM embeddings),
             | n AS (SELECT "vec_id", v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             | b AS (SELECT "vec_id", v, nrm, BUCKET AS bucket FROM n),
             | p AS (SELECT a."vec_id" AS id_a, b2."vec_id" AS id_b,
             |   round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) AS sim
             |   FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a."vec_id" < b2."vec_id")
             | SELECT id_a AS "id_a", id_b AS "id_b", sim AS "sim" FROM p
             | WHERE sim >= 0.35e0 ORDER BY "id_a", "id_b"""".stripMargin
        .replace("\n", " ").replace("BUCKET", lshBucketSql(8, 42L, 64)))),
    // ---- event-stream batch equivalents ---------------------------------
    Q("q_events_hourly",
      (s, dir) => Tables.eventsWithMs(s, dir)
        .groupBy(expr("ms div 3600000").as("hour_bucket"), col("event_type"))
        .agg(count("*").as("n"), min("value").as("min_value"),
          max("value").as("max_value"))
        .orderBy("hour_bucket", "event_type"),
      Some("""SELECT CAST(epoch_ms("ts") // 3600000 AS BIGINT) AS "hour_bucket",
             | "event_type", count(*) AS "n", min("value") AS "min_value",
             | max("value") AS "max_value"
             | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        .replace("\n", " "))),
    Q("q_events_sessionize",
      (s, dir) => {
        val ems = Tables.eventsWithMs(s, dir)
          .select(col("user_id"), col("event_id"), col("ms"))
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        ems.withColumn("new_session",
            org.apache.spark.sql.functions.when(col("ms") - lag("ms", 1).over(w) > lit(1800000L), 1L)
              .otherwise(lit(0L)))
          .groupBy("user_id")
          .agg((sum("new_session") + lit(1L)).as("n_sessions"),
            count("*").as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH t AS (SELECT "user_id", "event_id", epoch_ms("ts") AS ms FROM events),
             | s AS (SELECT "user_id", CASE WHEN ms - lag(ms) OVER
             |   (PARTITION BY "user_id" ORDER BY ms, "event_id") > 1800000
             |   THEN 1 ELSE 0 END AS new_session FROM t)
             | SELECT "user_id", CAST(sum(new_session) + 1 AS BIGINT) AS "n_sessions",
             |   count(*) AS "n_events"
             | FROM s GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),
    // ---- scan/agg efficiency showcase -----------------------------------
    Q("q_agg_lineitem",
      (s, dir) => Tables.read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count("*").as("n"),
          countDistinct("l_partkey").as("n_parts"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT "l_returnflag", "l_linestatus", sum("l_quantity") AS "sum_qty",
             | count(*) AS "n", count(DISTINCT "l_partkey") AS "n_parts"
             | FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        .replace("\n", " "))),
    // ---- star-schema dimension rollup: the canonical at-scale join shape —
    // fact scan joined through three broadcast-sized dimensions (supplier ->
    // nation -> region), partial aggregation before the final shuffle.
    Q("q_region_rollup",
      (s, dir) => {
        import org.apache.spark.sql.functions.broadcast
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_quantity"))
        val sup = broadcast(Tables.read(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")))
        val nat = broadcast(Tables.read(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey")))
        val reg = broadcast(Tables.read(s, dir, "region")
          .select(col("r_regionkey"), col("r_name")))
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("double")).as("sum_qty"))
          .orderBy("r_name")
      },
      Some("""SELECT "r_name", count(*) AS "n_items",
             | sum(CAST("l_quantity" AS DOUBLE)) AS "sum_qty"
             | FROM lineitem
             | JOIN supplier ON "l_suppkey" = "s_suppkey"
             | JOIN nation ON "s_nationkey" = "n_nationkey"
             | JOIN region ON "n_regionkey" = "r_regionkey"
             | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")))
  )
}
