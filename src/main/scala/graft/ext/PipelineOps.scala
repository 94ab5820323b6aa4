package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline stages beyond similarity/dedup: benchmark
  * decontamination, deterministic weighted source mixing, repetition-based
  * quality filters, and the composed corpus-clean flagship. All stages are
  * deterministic (hash-driven sampling, no RNG state) so a 100 TB run is
  * reproducible and resumable, and every one carries a full DuckDB oracle
  * in [[graft.ExtQueries]].
  */
object PipelineOps {

  /** Benchmark decontamination: flag training documents sharing any word
    * n-shingle with an evaluation set (the standard n-gram-overlap
    * decontamination used for LLM training corpora).
    *
    * Scale shape: the eval side of the join is an evaluation benchmark —
    * thousands of documents, not billions — so its distinct shingle-hash
    * set is broadcast and the 100 TB training side never shuffles: one
    * scan, a per-row shingle explode, a broadcast semi-join, and a
    * partial-aggregated count per doc. Shuffled bytes are (doc_id,
    * n_shared) pairs only.
    *
    * @param docs     corpus with `doc_id` and `text`
    * @param evalPred predicate selecting the evaluation subset
    * @return one row per NON-eval doc: doc_id, n_shared (distinct shingle
    *         hashes shared with the eval set), contaminated (0/1)
    */
  def decontaminate(docs: DataFrame, evalPred: Column,
                    shingleSize: Int = 3): DataFrame = {
    val hashed = docs.select(col("doc_id"), evalPred.as("is_eval"),
      array_distinct(graft.expressions.VectorExpressions
        .shingleHashes(split(col("text"), " "), shingleSize)).as("hs"))
    val evalHashes = hashed.filter(col("is_eval"))
      .select(explode(col("hs")).as("h")).distinct()
    val train = hashed.filter(!col("is_eval"))
    val shared = train.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(evalHashes), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("contaminated"))
  }

  /** Uniform-in-[0,1) draw for a row key, deterministic across runs and
    * engines: the DualHash base60 of `key || salt`, reduced mod 1e6.
    * Million-bucket resolution keeps rate quantization below 1e-6 —
    * invisible next to sampling variance at any corpus size. */
  def hashUniform(key: Column, salt: String): Column =
    (Dedup.base60Col(concat(key.cast("string"), lit(salt))) % lit(1000000L))
      .cast("double") / lit(1000000.0)

  /** DuckDB rendering of [[hashUniform]] (same md5-base60 arithmetic). */
  def hashUniformSql(keyExpr: String, salt: String): String =
    s"(CAST(${DualHash.base60Sql(s"concat(CAST($keyExpr AS VARCHAR), '$salt')")} " +
      "% 1000000 AS DOUBLE) / 1000000.0)"

  /** Domain mixing: down/up-weight sources to target sampling rates with a
    * deterministic per-doc Bernoulli draw. `rates` maps source name ->
    * keep probability; absent sources use `default`. The draw is a pure
    * hash of (doc_id, salt): re-running the job, or running it on a
    * different cluster/partitioning, keeps exactly the same rows —
    * reproducible corpus mixing with no RNG state to checkpoint. One scan,
    * one filter, shuffle-free.
    */
  def weightedSample(docs: DataFrame, rates: Map[String, Double],
                     default: Double, salt: String = ":mix"): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs.filter(hashUniform(col("doc_id"), salt) < rate)
  }

  /** Temperature-rebalanced sampling toward uniform groups — the
    * multilingual-corpus rebalancing step (XLM-style `p_g ∝ n_g^α`),
    * DATA-DERIVED rates rather than [[weightedSample]]'s static map: the
    * largest group keeps `baseRate`, every smaller group is boosted by
    * `(n_max / n_g)^(1-α)` (clamped at 1), flattening the group
    * distribution as α drops.
    *
    * α is fixed at 1/2 so the boost is `sqrt(n_max / n_g)` — IEEE-754
    * sqrt is correctly rounded (unlike libm `pow`, whose last-ulp drift
    * differs across engines), and the formulation needs NO cross-group
    * float sum (a softmax-style normaliser would make the rates depend
    * on double summation order). Every rate is therefore bit-identical
    * on any engine, partitioning or rerun, and the hash-Bernoulli draw
    * keeps row selection deterministic like the other samplers.
    *
    * Scale shape: one map-side-combinable count per group, a one-row max,
    * and a broadcast of the (group, rate) dimension onto the corpus scan
    * — no data-scale shuffle. Group cardinality is domain/language-scale
    * by definition. */
  def temperatureSample(docs: DataFrame, groupCol: String, idCol: String,
                        baseRate: Double, salt: String = ":temp"): DataFrame = {
    require(baseRate > 0 && baseRate <= 1,
      s"baseRate must be in (0, 1], got $baseRate")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // n_max as a GLOBAL window over the counts table instead of a
    // separate one-row aggregate + crossJoin: the single-partition
    // window is bounded by group cardinality (language/domain-scale by
    // contract), and it keeps the whole rate derivation ONE linear chain
    // — the aggregate-branch form re-ran the corpus group-count scan for
    // the max (the join's inferred isnotnull pushed only into the rates
    // branch, so the two branches never shared their exchange).
    val rates = counts
      .withColumn("__nmax", max(col("__n")).over(Window.partitionBy()))
      .select(col(groupCol), least(lit(1.0), lit(baseRate) *
        sqrt(col("__nmax").cast("double") / col("__n").cast("double")))
        .as("__rate"))
    docs.join(broadcast(rates), groupCol)
      .where(hashUniform(col(idCol), salt) < col("__rate"))
      .withColumn("sample_rate", round(col("__rate"), 6))
      .drop("__rate")
  }

  /** DuckDB rendering of [[temperatureSample]] over `tableSql` (same
    * count → max → sqrt-boost → hash-Bernoulli arithmetic). */
  def temperatureSampleOracleSql(tableSql: String, groupCol: String,
                                 idCol: String, baseRate: Double,
                                 salt: String = ":temp"): String = {
    val b = graft.expr.E.formatDouble(baseRate)
    val u = hashUniformSql(s""""$idCol"""", salt)
    s"""WITH __c AS (SELECT "$groupCol", count(*) AS __n FROM $tableSql
       |   GROUP BY 1),
       | __m AS (SELECT max(__n) AS __nmax FROM __c),
       | __r AS (SELECT "$groupCol", least(1.0e0, $b *
       |     sqrt(CAST(__nmax AS DOUBLE) / CAST(__n AS DOUBLE))) AS __rate
       |   FROM __c CROSS JOIN __m)
       | SELECT d.*, round(__rate, 6) AS sample_rate
       | FROM $tableSql d JOIN __r USING ("$groupCol")
       | WHERE $u < __rate""".stripMargin.replace("\n", " ")
  }

  /** Per-group standardization + outlier flag: z-score a numeric column
    * against its GROUP's mean/stddev (per-language document lengths are
    * the canonical case — a 300-char zh document is normal where a
    * 300-char en document is a fragment) and flag |z| > cutoff. The
    * filter behind per-language length gates, run with group-relative
    * thresholds instead of one global cut.
    *
    * Scale shape: one map-side-combinable (mean, stddev) agg per group,
    * broadcast back onto the corpus scan — no data-scale shuffle; group
    * cardinality is language/domain-scale. Degenerate groups (stddev 0,
    * single row) emit z = 0 and never flag.
    *
    * z is rounded to 6 decimals (the group moments are double sums whose
    * partial-agg order differs between engines); the flag compares the
    * ROUNDED z against the cutoff so the boundary decision is identical
    * on both engines too. */
  def groupZScore(docs: DataFrame, groupCol: String, valueCol: String,
                  cutoff: Double = 2.0): DataFrame = {
    val stats = docs.groupBy(col(groupCol)).agg(
      avg(col(valueCol).cast("double")).as("__mu"),
      coalesce(stddev_samp(col(valueCol).cast("double")), lit(0.0))
        .as("__sd"))
    docs.join(broadcast(stats), groupCol)
      .withColumn("z", round(
        when(col("__sd") > 0.0,
          (col(valueCol).cast("double") - col("__mu")) / col("__sd"))
          .otherwise(lit(0.0)), 6))
      .withColumn("is_outlier",
        when(abs(col("z")) > cutoff, 1L).otherwise(0L))
      .drop("__mu", "__sd")
  }

  /** DuckDB mirror of [[groupZScore]] — same sample stddev, same rounded
    * boundary. Emits `SELECT d.*, z, is_outlier`. */
  def groupZScoreOracleSql(tableSql: String, groupCol: String,
                           valueCol: String, cutoff: Double = 2.0): String = {
    val c = graft.expr.E.formatDouble(cutoff)
    s"""WITH __s AS (SELECT "$groupCol",
       |     avg(CAST("$valueCol" AS DOUBLE)) AS __mu,
       |     coalesce(stddev_samp(CAST("$valueCol" AS DOUBLE)), 0.0e0) AS __sd
       |   FROM $tableSql GROUP BY 1),
       | __z AS (SELECT d.*, round(CASE WHEN __sd > 0.0e0
       |     THEN (CAST("$valueCol" AS DOUBLE) - __mu) / __sd
       |     ELSE 0.0e0 END, 6) AS z
       |   FROM $tableSql d JOIN __s USING ("$groupCol"))
       | SELECT *, CAST(CASE WHEN abs(z) > $c THEN 1 ELSE 0 END AS BIGINT)
       |   AS is_outlier FROM __z""".stripMargin.replace("\n", " ")
  }

  /** Token-budget subset selection: keep documents in deterministic
    * priority order (hash of doc_id — a reproducible shuffle of the
    * corpus) until the running token total reaches `budgetTokens` — the
    * "give me exactly N tokens" stage of assembling a training mix.
    *
    * The naive form is a single global cumulative-sum window, which Spark
    * executes on ONE partition — a non-starter at 100 TB. This is the
    * scale-correct two-phase equivalent:
    *
    *  1. bucket docs by priority range (`buckets` ranges), aggregate token
    *     sums per bucket — a tiny table (≤ `buckets` rows) collected to
    *     the driver to locate the budget-crossing bucket and its prefix
    *     offset;
    *  2. buckets strictly before the crossing are kept whole (no window at
    *     all); only the one crossing bucket — 1/`buckets` of the corpus —
    *     runs a per-bucket cumulative window, partitioned so it never
    *     gathers to a single task beyond that slice.
    *
    * The result is row-identical to the global window (bucket index is
    * monotone in priority, ties broken by doc_id), which is exactly what
    * the DuckDB oracle computes.
    *
    * NOTE: unlike most transforms here, this call is EAGER — locating the
    * budget-crossing bucket runs the per-bucket aggregation (a Spark job)
    * at call time and snapshots the input as of that run. Compose it at
    * the end of a pipeline, not inside a lazily re-planned view.
    *
    * @param nTokens the token accounting — whitespace count by default;
    *   pass e.g. [[Bpe.tokenCount]] to denominate the budget in real BPE
    *   tokens (still a per-row projection: the scale shape is unchanged)
    * @return kept docs: doc_id, n_tokens, pri (the priority draw, rounded)
    */
  def tokenBudget(docs: DataFrame, budgetTokens: Long, salt: String = ":budget",
                  buckets: Int = 1024,
                  nTokens: Column =
                    size(split(col("text"), " ")).cast("long")): DataFrame = {
    val base = docs.select(col("doc_id"),
        nTokens.as("n_tokens"),
        hashUniform(col("doc_id"), salt).as("pri"))
      .withColumn("bucket", floor(col("pri") * buckets).cast("long"))
    val sums = base.groupBy("bucket").agg(sum("n_tokens").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var running = 0L
    var cut = -1L
    var offset = 0L
    for (b <- 0L until buckets.toLong if cut < 0) {
      val t = sums.getOrElse(b, 0L)
      if (running + t > budgetTokens) { cut = b; offset = running }
      else running += t
    }
    val out =
      if (cut < 0) base // whole corpus fits the budget
      else {
        val whole = base.filter(col("bucket") < cut)
        val w = Window.partitionBy("bucket").orderBy("pri", "doc_id")
        val boundary = base.filter(col("bucket") === cut)
          .withColumn("cum", sum("n_tokens").over(w))
          .filter(col("cum") + lit(offset) <= budgetTokens)
        whole.unionByName(boundary.drop("cum"))
      }
    out.select(col("doc_id"), col("n_tokens"), round(col("pri"), 6).as("pri"))
  }

  /** Concat-and-chunk sequence packing — the standard pretraining layout:
    * documents are laid end-to-end in a deterministic shuffled order
    * (hash priority, ties by doc_id) and the resulting token stream is
    * cut into fixed `seqLen` training sequences. Emits one row per
    * (document, sequence) overlap with the document's offset and token
    * count inside that sequence — the index a sequence-builder needs to
    * materialize packed batches without ever shuffling text.
    *
    * The global token cumsum uses the same two-phase bucket scheme as
    * [[tokenBudget]]: per-bucket totals → driver prefix (`buckets`
    * longs) → per-bucket windows joined to a broadcast offset table.
    * Row-identical to the literal global window (bucket index is monotone
    * in priority) with no single-task stage. The explode is bounded: a
    * document spans at most ceil(n/seqLen)+1 sequences, and every
    * shuffled row carries (doc_id, 3 longs), never text.
    *
    * NOTE: EAGER like [[tokenBudget]] — the per-bucket prefix sums run as
    * a Spark job at call time, snapshotting the input.
    */
  def seqPack(docs: DataFrame, seqLen: Long, salt: String = ":pack",
              buckets: Int = 1024,
              nTokens: Column =
                size(split(col("text"), " ")).cast("long")): DataFrame = {
    val base = docs.select(col("doc_id"),
        nTokens.as("n_tokens"),
        hashUniform(col("doc_id"), salt).as("pri"))
      .withColumn("bucket", floor(col("pri") * buckets).cast("long"))
    val sums = base.groupBy("bucket").agg(sum("n_tokens").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = Array.iterate((0L, 0L), buckets) { case (b, acc) =>
      (b + 1, acc + sums.getOrElse(b, 0L))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("bucket", "off")
    val w = Window.partitionBy("bucket").orderBy("pri", "doc_id")
    val spans = base
      .withColumn("cumb", sum("n_tokens").over(w))
      .join(broadcast(offDf), Seq("bucket"))
      .withColumn("en", col("cumb") + col("off"))
      .withColumn("st", col("en") - col("n_tokens"))
    spans
      .select(col("doc_id"), col("st"), col("en"),
        explode(sequence(
          floor(col("st") / lit(seqLen.toDouble)).cast("long"),
          floor((col("en") - 1) / lit(seqLen.toDouble)).cast("long")))
          .as("seq_id"))
      .withColumn("seq0", col("seq_id") * seqLen)
      .select(col("doc_id"), col("seq_id"),
        (greatest(col("st"), col("seq0")) - col("seq0")).as("off_in_seq"),
        (least(col("en"), col("seq0") + seqLen) -
          greatest(col("st"), col("seq0"))).as("n_in_seq"))
  }

  /** DuckDB mirror of [[seqPack]]: the literal global cumsum window plus
    * a lateral generate_series over the spanned sequence ids. */
  def seqPackOracleSql(seqLen: Long, salt: String = ":pack",
                       nTokensSql: String =
                         "CAST(len(string_split(\"text\", ' ')) AS BIGINT)")
      : String = {
    val u = hashUniformSql("\"doc_id\"", salt)
    val L = s"${seqLen}"
    s"""WITH b AS (SELECT "doc_id",
       | $nTokensSql AS n,
       | $u AS pri FROM documents),
       | c AS (SELECT "doc_id", n, sum(n) OVER
       |   (ORDER BY pri, "doc_id" ROWS UNBOUNDED PRECEDING) AS cum FROM b),
       | e AS (SELECT "doc_id", CAST(cum - n AS BIGINT) AS st,
       |   CAST(cum AS BIGINT) AS en FROM c),
       | x AS (SELECT "doc_id", st, en,
       |   unnest(generate_series(CAST(floor(st / ${L}.0e0) AS BIGINT),
       |     CAST(floor((en - 1) / ${L}.0e0) AS BIGINT))) AS seq FROM e)
       | SELECT "doc_id", seq AS "seq_id",
       |   greatest(st, seq * $L) - seq * $L AS "off_in_seq",
       |   least(en, (seq + 1) * $L) - greatest(st, seq * $L) AS "n_in_seq"
       | FROM x ORDER BY "seq_id", "doc_id"""".stripMargin.replace("\n", " ")
  }

  /** PII patterns for [[scrubPii]]. Deliberately conservative,
    * well-understood regexes (emails, dotted-quad IPs, phone-like digit
    * runs) — the shapes production corpus scrubbers start from. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d() -]{6,}\\d"

  /** PII redaction: replace emails / IPv4s / phone-like runs with typed
    * placeholder tokens and count each category. A pure per-row codegen'd
    * projection — shuffle-free, order-insensitive, safe at any scale.
    * Emails are scrubbed first (an address would otherwise feed partial
    * matches to the IP/phone patterns). The synthetic test corpus
    * contains no PII, so this stage is verified by `PiiScrubSpec` on
    * constructed rows rather than a driver query. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    docs
      .withColumn("n_emails", regexp_count(t0, lit(EmailRe)))
      .withColumn("n_ips", regexp_count(t1, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(t2, lit(PhoneRe)))
      .withColumn(textCol, t3)
  }

  /** Overlapping token-window chunking — the RAG / long-context prep
    * stage: each document becomes ceil-spaced windows of `chunkSize`
    * tokens advancing by `stride` (overlap = chunkSize - stride), the
    * last window shortened to the document end. Pure per-row explode:
    * no shuffle at all, chunk count per doc is bounded by
    * n/stride + 1, and the output carries the chunk text a retrieval
    * indexer embeds next. */
  def chunkOverlap(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize > stride,
      "chunkSize must exceed stride so windows cover every token")
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("kmax", when(col("n") <= chunkSize, lit(0L)).otherwise(
        floor((col("n") - chunkSize + stride - 1) / lit(stride.toDouble))
          .cast("long")))
    base
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), col("kmax"))).as("chunk_id"))
      .withColumn("st", col("chunk_id") * stride)
      .select(col("doc_id"), col("chunk_id"),
        least(col("n") - col("st"), lit(chunkSize.toLong)).as("n_chunk"),
        array_join(slice(col("t"), (col("st") + 1).cast("int"),
          lit(chunkSize)), " ").as("chunk"))
  }

  /** DuckDB mirror of [[chunkOverlap]] (unnest(generate_series) explode,
    * list_slice window, identical ceil arithmetic). */
  def chunkOverlapOracleSql(chunkSize: Int, stride: Int): String =
    s"""WITH b AS (SELECT "doc_id", string_split("text", ' ') AS t,
       |   CAST(len(string_split("text", ' ')) AS BIGINT) AS n FROM documents),
       | k AS (SELECT "doc_id", t, n, CASE WHEN n <= $chunkSize THEN 0
       |   ELSE CAST(floor((n - $chunkSize + $stride - 1) / ${stride}.0e0) AS BIGINT)
       |   END AS kmax FROM b),
       | x AS (SELECT "doc_id", t, n,
       |   unnest(generate_series(0, kmax)) AS chunk_id FROM k)
       | SELECT "doc_id", chunk_id AS "chunk_id",
       |   least(n - chunk_id * $stride, $chunkSize) AS "n_chunk",
       |   array_to_string(list_slice(t, CAST(chunk_id * $stride + 1 AS BIGINT),
       |     CAST(least(chunk_id * $stride + $chunkSize, n) AS BIGINT)), ' ')
       |     AS "chunk"
       | FROM x ORDER BY "doc_id", chunk_id""".stripMargin.replace("\n", " ")

  /** Default cap on the hot-segment dictionary materialized to the driver
    * by [[segmentDedup]]. Below it the dictionary rides a broadcast
    * `Set[Long]` probed by a per-row projection (zero shuffle); above it
    * the rewrite switches to [[scrubSegmentsJoin]], which never touches
    * the driver. 2^20 longs is ~8 MB — comfortably a broadcast, never an
    * OOM. */
  val DefaultMaxHotSegments: Int = 1 << 20

  /** Spark conf key overriding [[DefaultMaxHotSegments]] at deploy time
    * (same pattern as [[Dedup.MaxBucketSizeConfKey]]): the crossover
    * between the literal-broadcast and join rewrites depends on driver
    * memory and corpus boilerplate rate, so a 100 TB job must be able to
    * tune it without recompiling. */
  val MaxHotSegmentsConfKey = "spark.graft.segmentDedup.maxHotSegments"

  private def resolveMaxHotSegments(docs: DataFrame): Int =
    docs.sparkSession.conf.getOption(MaxHotSegmentsConfKey).map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$MaxHotSegmentsConfKey must be a non-negative integer, got '$v'")
      }
      require(n >= 0, s"$MaxHotSegmentsConfKey must be >= 0, got $n")
      n
    }.getOrElse(DefaultMaxHotSegments)

  /** Non-overlapping `segLen`-token segments of `text` as an array column
    * (shared by both rewrite paths). */
  private def segmentsCol(segLen: Int): Column = {
    val toks = split(col("text"), " ")
    val nSeg = ceil(size(toks) / lit(segLen.toDouble)).cast("int")
    transform(sequence(lit(0), nSeg - 1), k =>
      array_join(slice(toks, k * segLen + 1, lit(segLen)), " "))
  }

  /** Corpus-wide duplicated-passage removal (the RefinedWeb / C4 "line
    * dedup" stage, expressed over fixed-width token segments because the
    * corpus is single-line): cut each document into non-overlapping
    * `segLen`-token segments, find segments occurring in at least
    * `minDocs` DISTINCT documents, and rewrite every document with those
    * boilerplate segments removed.
    *
    * Scale shape — the text never shuffles in pass 1: per-doc DISTINCT
    * segment hashes (longs, not text) explode into a partial-aggregated
    * doc-frequency count, yielding the boilerplate dictionary. The
    * rewrite then takes one of two shapes, decided by a BOUNDED probe of
    * the dictionary size (`limit(cap + 1)` — the driver never
    * materializes more than `cap + 1` longs, so the guard protects the
    * driver rather than reporting an OOM after the fact):
    *
    *  - dictionary <= `maxHotSegments` (the usual case — boilerplate is
    *    headers/footers/licence blocks, small by construction): broadcast
    *    `Set[Long]` probed by a per-row projection, zero shuffle
    *    ([[scrubSegments]]);
    *  - dictionary larger (pathological boilerplate-heavy crawl): a
    *    join-based rewrite that keeps the dictionary distributed end to
    *    end — no driver materialization at any size
    *    ([[scrubSegmentsJoin]]).
    *
    * `maxHotSegments` defaults to [[MaxHotSegmentsConfKey]] /
    * [[DefaultMaxHotSegments]]; pass an explicit value to pin a path.
    *
    * @return doc_id, n_segs, n_removed, text_clean
    */
  def segmentDedup(docs: DataFrame, segLen: Int = 3, minDocs: Int = 2,
                   maxHotSegments: Int = -1): DataFrame = {
    require(segLen >= 1, "segLen must be positive")
    require(minDocs >= 2, "minDocs < 2 would remove every segment")
    val cap =
      if (maxHotSegments >= 0) maxHotSegments else resolveMaxHotSegments(docs)
    val hotDf = docs
      .select(explode(array_distinct(
        transform(segmentsCol(segLen), s => Dedup.base60Col(s)))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val probe = hotDf.limit(cap + 1).collect()
    if (probe.length <= cap)
      scrubSegments(docs, probe.map(_.getLong(0)).toSet, segLen)
    else
      scrubSegmentsJoin(docs, hotDf, segLen)
  }

  /** The rewrite stage of [[segmentDedup]] on its own: scrub a known
    * hot-segment dictionary from each document. Stateless per-row once the
    * dictionary is broadcast, so it lifts unchanged to Structured
    * Streaming — the batch-mined boilerplate set applied at the ingest
    * edge, exactly like the decontamination probe. */
  def scrubSegments(docs: DataFrame, hotSet: Set[Long], segLen: Int): DataFrame = {
    val segs = segmentsCol(segLen)
    val bc = docs.sparkSession.sparkContext.broadcast(hotSet)
    val clean = udf((ss: Seq[String]) => {
      val hot = bc.value
      var removed = 0L
      val b = new StringBuilder
      ss.foreach { s =>
        if (hot.contains(DualHash.base60(s))) removed += 1L
        else { if (b.nonEmpty) b.append(' '); b.append(s) }
      }
      (ss.size.toLong, removed, b.toString)
    })
    docs.select(col("doc_id"), clean(segs).as("r"))
      .select(col("doc_id"), col("r._1").as("n_segs"),
        col("r._2").as("n_removed"), col("r._3").as("text_clean"))
  }

  /** Join-based rewrite of [[segmentDedup]] for dictionaries too large to
    * broadcast as a literal set — the dictionary stays distributed end to
    * end (no `collect()` anywhere):
    *
    *  1. explode each document's segment POSITIONS with their hashes —
    *     the exchange carries (doc_id, k, h) triples, never segment text;
    *  2. join those triples against the hot-hash DataFrame (AQE picks a
    *     broadcast when the dictionary turns out small, a shuffled hash
    *     join otherwise) and collect the hit positions per doc — one row
    *     per affected document, holding a small int array;
    *  3. left-join the marks back to the corpus on doc_id and drop the
    *     marked positions with a codegen'd array filter.
    *
    * Step 3 shuffles the corpus once by doc_id — the unavoidable price of
    * a dictionary that cannot ride a broadcast; the common small-dict
    * case never takes this path. Rebuilding `hotDf` here re-runs the
    * doc-frequency aggregation (the probe in [[segmentDedup]] saw only
    * its first `cap + 1` rows); one extra pass on the rare path beats
    * persisting an unbounded hash set.
    */
  def scrubSegmentsJoin(docs: DataFrame, hotDf: DataFrame,
                        segLen: Int): DataFrame = {
    val hashes = transform(segmentsCol(segLen), s => Dedup.base60Col(s))
    val marks = docs
      .select(col("doc_id"), posexplode(hashes).as(Seq("k", "h")))
      .join(hotDf, "h")
      .groupBy("doc_id").agg(collect_set(col("k")).as("rm"))
    val segs = segmentsCol(segLen)
    docs.join(marks, Seq("doc_id"), "left")
      .select(col("doc_id"), segs.as("segs"), col("rm"))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        coalesce(size(col("rm")), lit(0)).cast("long").as("n_removed"),
        array_join(filter(col("segs"), (_, i) =>
          col("rm").isNull || !array_contains(col("rm"), i)), " ")
          .as("text_clean"))
  }

  /** DuckDB mirror of [[segmentDedup]]: identical segmentation, the same
    * base60 doc-frequency count, and a join-based rewrite (the oracle can
    * afford the join; the Spark side broadcasts instead). */
  def segmentDedupOracleSql(segLen: Int, minDocs: Int): String = {
    val L = segLen
    val b60 = DualHash.base60Sql("segs[k]")
    s"""WITH tok AS (SELECT "doc_id", string_split("text", ' ') AS toks
       |   FROM documents),
       | seg AS (SELECT "doc_id",
       |   list_transform(range(0, CAST(ceil(len(toks) / ${L}.0e0) AS BIGINT)),
       |     k -> array_to_string(list_slice(toks, k * $L + 1,
       |       least(k * $L + $L, len(toks))), ' ')) AS segs FROM tok),
       | ex AS (SELECT "doc_id", segs,
       |   unnest(generate_series(1, len(segs))) AS k FROM seg),
       | eh AS (SELECT "doc_id", k, segs[k] AS s, $b60 AS h FROM ex),
       | cnt AS (SELECT h, count(DISTINCT "doc_id") AS nd FROM eh GROUP BY 1),
       | hot AS (SELECT h FROM cnt WHERE nd >= $minDocs)
       | SELECT eh."doc_id",
       |   CAST(count(*) AS BIGINT) AS "n_segs",
       |   CAST(sum(CASE WHEN hot.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |     AS "n_removed",
       |   coalesce(string_agg(CASE WHEN hot.h IS NULL THEN s END,
       |     ' ' ORDER BY k), '') AS "text_clean"
       | FROM eh LEFT JOIN hot ON eh.h = hot.h
       | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
  }

  /** Leakage-safe train/val/test assignment: the split hash is keyed by
    * the document's NEAR-DUP CLUSTER label, not its own id, so two
    * near-duplicate documents can never land on opposite sides of the
    * split — the eval-set leakage that per-doc hashing (and every
    * RNG-based splitter) permits whenever the corpus still contains
    * near-dups (Lee et al. 2022, arXiv:2107.06499 §6.2 measure exactly
    * this train/test overlap). Singleton documents are their own
    * cluster (label = own id), so on a fully-deduped corpus this
    * degrades to [[splitAssign]]'s per-doc behavior.
    *
    * Scale shape: [[Dedup.nearDupClusters]]'s banded (id, label) passes
    * dominate; the split itself adds ONE hash projection on the label
    * table — no extra shuffle, text never moves. At the default
    * `threshold = 0.0` every LSH band collision is an edge and the
    * clusterer skips the shingle-set verification joins entirely (the
    * conservative reading: ANY plausible near-dup pair is kept on the
    * same side — over-grouping can never leak, it only makes the split
    * slightly coarser); raise `threshold` to verify candidates with the
    * exact n-gram Jaccard before they can link clusters. Deterministic
    * like [[splitAssign]]: adding documents can merge clusters (which
    * moves a cluster only if its min-id label changes) but never
    * re-rolls the dice on untouched clusters. */
  def leakageSafeSplit(docs: DataFrame, trainFrac: Double = 0.9,
                       valFrac: Double = 0.05, salt: String = ":split",
                       k: Int = 16, rowsPerBand: Int = 4,
                       threshold: Double = 0.0): DataFrame =
    leakageSafeSplitFromLabels(
      Dedup.nearDupClusters(docs, threshold = threshold, k = k,
        rowsPerBand = rowsPerBand),
      trainFrac, valFrac, salt)

  /** The split arithmetic of [[leakageSafeSplit]] over an EXISTING
    * `labels(doc_id, cluster_id)` table — the form a 100 TB pipeline
    * actually runs: the cluster labels are built once
    * ([[Dedup.persistedLabels]]) and every consumer (split, survivor
    * selection, report) keys off the artifact instead of re-running the
    * MinHash→LSH→CC chain. One hash projection, no shuffle. */
  def leakageSafeSplitFromLabels(labels: DataFrame, trainFrac: Double,
                                 valFrac: Double,
                                 salt: String): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      "need 0 < trainFrac, 0 <= valFrac, trainFrac + valFrac < 1")
    val u = hashUniform(col("cluster_id"), salt)
    labels.select(col("doc_id"), col("cluster_id"), round(u, 6).as("u"),
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test").as("split"))
  }

  /** DuckDB mirror of [[leakageSafeSplit]]'s split arithmetic over a
    * `labels(doc_id, cluster_id)` relation the caller provides (the
    * recursive connected-components CTE q_dedup_clusters already
    * renders). */
  def leakageSafeSplitOracleSql(labelsRel: String, trainFrac: Double,
                                valFrac: Double, salt: String): String = {
    val u = hashUniformSql("\"cluster_id\"", salt)
    val tf = graft.expr.E.formatDouble(trainFrac)
    val tv = graft.expr.E.formatDouble(trainFrac + valFrac)
    s"""SELECT "doc_id", "cluster_id", round($u, 6) AS "u",
       | CASE WHEN $u < $tf THEN 'train'
       |   WHEN $u < $tv THEN 'val'
       |   ELSE 'test' END AS "split"
       | FROM $labelsRel ORDER BY "doc_id"""".stripMargin.replace("\n", " ")
  }

  /** Deterministic train/val/test assignment by document-id hash — the
    * split stage of corpus assembly. A pure per-row projection
    * (shuffle-free); the same document lands in the same split on every
    * run, cluster, and partitioning, and adding documents never moves an
    * existing one between splits (the property RNG-based splitting
    * lacks). */
  def splitAssign(docs: DataFrame, trainFrac: Double = 0.9,
                  valFrac: Double = 0.05, salt: String = ":split"): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      "need 0 < trainFrac, 0 <= valFrac, trainFrac + valFrac < 1")
    val u = hashUniform(col("doc_id"), salt)
    docs.select(col("doc_id"), round(u, 6).as("u"),
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test").as("split"))
  }

  /** DuckDB mirror of [[splitAssign]]. */
  def splitAssignOracleSql(trainFrac: Double, valFrac: Double,
                           salt: String): String = {
    val u = hashUniformSql("\"doc_id\"", salt)
    val tf = graft.expr.E.formatDouble(trainFrac)
    val tv = graft.expr.E.formatDouble(trainFrac + valFrac)
    s"""SELECT "doc_id", round($u, 6) AS "u",
       | CASE WHEN $u < $tf THEN 'train'
       |   WHEN $u < $tv THEN 'val'
       |   ELSE 'test' END AS "split"
       | FROM documents ORDER BY "doc_id"""".stripMargin.replace("\n", " ")
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * Gopher-style "top word" repetition signal. Computed with array
    * higher-order functions (no explode, no shuffle): per-doc cost is
    * O(distinct x tokens), fine for bounded document length; corpora with
    * multi-megabyte outliers should length-truncate upstream (the
    * quality-filter stage already drops such docs).
    */
  def topWordFrac(tokens: Column): Column = {
    val top = array_max(transform(array_distinct(tokens),
      t => size(filter(tokens, x => x === t))))
    round(top.cast("double") / size(tokens).cast("double"), 6)
  }

  /** Word bigrams as an array column (n=2 sibling of [[Dedup.shingles]];
    * a 1-token doc yields its single token, mirroring the shingle CTE's
    * greatest(len-1, 1) floor). */
  def bigrams(tokens: Column): Column = {
    val idx = sequence(lit(0), greatest(size(tokens) - lit(2), lit(0)))
    transform(idx, i => concat_ws(" ", slice(tokens, i + lit(1), lit(2))))
  }

  /** Fraction of bigrams that are repeats of an earlier bigram — the
    * Gopher-style duplicate-n-gram repetition signal. */
  def dupBigramFrac(tokens: Column): Column = {
    val bg = bigrams(tokens)
    round(lit(1.0) - size(array_distinct(bg)).cast("double") /
      size(bg).cast("double"), 6)
  }

  /** Distribution-matched importance resampling (the DSIR shape — Xie et
    * al. 2023, arXiv:2302.03169 — over an explicit bucket feature): keep a
    * deterministic subset of `docs` whose distribution over `bucketCol`
    * matches the distribution of the rows satisfying `targetPred` (the
    * in-corpus proxy for the target domain). Per bucket b the raw
    * importance ratio is (t_b/M)/(c_b/N); dividing by the max ratio turns
    * it into the acceptance probability of the LARGEST subset with exact
    * target proportions in expectation, and the accept draw is the same
    * deterministic [[hashUniform]] Bernoulli the rest of the sampling
    * family uses — rerun-stable, growth-stable, no RNG state.
    *
    * Scale shape: two map-side-combinable bucket-count aggregates (bucket
    * cardinality rows, not data rows), a ONE-row max, and a broadcast
    * bucket→rate join back onto the scan — the corpus shuffles nothing.
    * Buckets where the target has no mass get rate 0 (dropped entirely),
    * matching the exact-proportion contract.
    *
    * Input/output contract: the accept draw hashes `keyCol` (default
    * `doc_id` — pass the input's stable unique id if it is named
    * differently), and the result carries EVERY input column plus the
    * appended `bucket` and `accept_p` columns; the input must not
    * already have columns of those names (checked, rather than silently
    * overwritten). */
  def distributionMatch(docs: DataFrame, bucketCol: Column,
                        targetPred: Column,
                        salt: String = ":dmatch",
                        keyCol: Column = col("doc_id")): DataFrame = {
    require(!docs.columns.contains("bucket") &&
        !docs.columns.contains("accept_p"),
      "distributionMatch appends 'bucket' and 'accept_p' columns; " +
        "rename the input's columns of those names first")
    val base = docs.withColumn("bucket", bucketCol)
    // ONE corpus-scale aggregation carries both distributions (the
    // target's bucket counts as a conditional sum), and the totals
    // derive from it at bucket scale — the stats side reads the corpus
    // exactly once; the keep-filter join below is the only other scan
    val counts = base.groupBy("bucket").agg(
      count(lit(1)).as("c_b"),
      sum(when(targetPred, 1L).otherwise(0L)).as("t_b"))
    // totals and max as GLOBAL windows over the bucket-count table — ONE
    // linear chain instead of agg branches crossJoined back (each branch
    // re-ran the corpus bucket-count scan; r16 runtime audit). The
    // single-partition windows are bounded by bucket cardinality (length
    // buckets — bounded small by construction), and both share one
    // SinglePartition exchange. Sums of longs and max of doubles are
    // order-independent, so every value is identical to the agg form.
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // m > 0 guard on the ratio itself: ANSI mode (Spark 4 default)
    // raises DIVIDE_BY_ZERO on the 0-denominator division outright, so
    // the empty-target case must short-circuit BEFORE dividing
    val rate = counts
      .withColumn("n", sum(col("c_b")).over(whole))
      .withColumn("m", sum(col("t_b")).over(whole))
      .select(col("bucket"),
        when(col("m") > 0,
          (col("t_b").cast("double") * col("n").cast("double"))
            / (col("m").cast("double") * col("c_b").cast("double")))
          .otherwise(lit(0.0)).as("ratio"))
    // rmax > 0 guard: with an EMPTY target (m = 0, every t_b = 0) the
    // ratios are 0/0 = NaN, and an unguarded accept_p = NaN would keep
    // every row (hash < NaN is true under Spark's NaN-sorts-greatest
    // semantics) — the exact opposite of "match an empty target". Pin
    // accept_p to 0 instead: nothing to match -> empty resample.
    val acc = rate
      .withColumn("rmax", max(col("ratio")).over(whole))
      .select(col("bucket"),
        when(col("rmax") > 0, col("ratio") / col("rmax"))
          .otherwise(lit(0.0)).as("accept_p"))
    base.join(broadcast(acc), Seq("bucket"))
      .filter(hashUniform(keyCol, salt) < col("accept_p"))
  }
}
