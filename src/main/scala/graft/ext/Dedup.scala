package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability for the LSH bucket-size caps: every dropped row is
  * counted through `Dataset.observe` (zero extra passes over the data) and
  * surfaced by a query-execution listener — no silent truncation. An
  * oversized bucket is a degenerate band value (e.g. the band every
  * short/empty doc shares), not near-dup signal, but the drop must be
  * visible to the operator. */
object DedupMetrics {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private[ext] val MetricPrefix = "graft_lsh_drops_"
  private val counter = new java.util.concurrent.atomic.AtomicLong()
  private val dropped = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val sessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Unique observation name per call site (duplicate observation names in
    * one query are an analysis error). */
  private[ext] def nextName(tag: String): String =
    s"$MetricPrefix${tag}_${counter.incrementAndGet()}"

  /** Total rows dropped from oversized buckets for a tag ("minhash" /
    * "simhash") since the last [[reset]] — test hook + ops counter. */
  def totalDropped(tag: String): Long =
    Option(dropped.get(tag)).map(_.longValue).getOrElse(0L)
  def reset(): Unit = dropped.clear()

  private[ext] def ensure(spark: SparkSession): Unit = sessions.synchronized {
    if (sessions.add(spark)) spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(MetricPrefix)) {
            val tag = name.stripPrefix(MetricPrefix).takeWhile(_ != '_')
            val n = if (row.isNullAt(0)) 0L else row.getLong(0)
            if (n > 0) {
              dropped.merge(tag, java.lang.Long.valueOf(n),
                (a: java.lang.Long, b: java.lang.Long) =>
                  java.lang.Long.valueOf(a.longValue + b.longValue))
              log.warn(s"$tag LSH: dropped $n row(s) in oversized buckets " +
                "(> maxBucketSize) — degenerate band values, not near-dup signal")
            }
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
  }
}

/** Deduplication operators for web-scale corpora, Spark-first:
  *
  *  - exact: hash-groupBy on a content fingerprint (one shuffle on a short
  *    hash key — never on the full text).
  *  - MinHash + LSH: per-row signatures via higher-order functions (no
  *    UDF, no shuffle), then band-bucket explode + groupBy — the classic
  *    shingle -> minhash -> band -> bucket-join pipeline. At 100 TB the
  *    shuffle carries only (band_key, doc_id), not documents.
  *  - SimHash: 64-bit per-row signature; near-dups share signatures under
  *    small Hamming distance.
  *  - n-gram Jaccard: verification metric on candidate pairs.
  */
object Dedup {

  /** Default cap on LSH bucket size for batch candidate generation. A
    * bucket above this is a degenerate band value whose pair space is
    * quadratic in one task — the classic LSH skew blowup at 100 TB.
    * Mirrors the streaming twin's `maxPerBucket`. 512 keeps the sf0.01
    * oracle corpus (500 docs) provably uncapped. */
  val DefaultMaxBucketSize: Int = 512

  /** Spark conf key overriding [[DefaultMaxBucketSize]] at deploy time —
    * the right cap depends on the corpus (band width, doc count, dup
    * rate), so a 100 TB job must be able to tune it without recompiling.
    * The [[DedupMetrics]] `observe` counters are the monitoring hook for
    * choosing a value. */
  val MaxBucketSizeConfKey = "spark.graft.dedup.maxBucketSize"

  /** Sentinel default for `maxBucketSize` parameters: resolve from
    * [[MaxBucketSizeConfKey]], falling back to [[DefaultMaxBucketSize]]. */
  val ConfiguredBucketSize: Int = -1

  private[graft] def resolveCap(docs: DataFrame, cap: Int): Int =
    if (cap != ConfiguredBucketSize) cap
    else docs.sparkSession.conf.getOption(MaxBucketSizeConfKey).map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$MaxBucketSizeConfKey must be a positive integer, got '$v'")
      }
      require(n > 0, s"$MaxBucketSizeConfKey must be positive, got $n")
      n
    }.getOrElse(DefaultMaxBucketSize)

  /** Exact dedup: keep the smallest doc_id per fingerprint, count members.
    * Shuffles md5(16B)+id, not text. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(md5(col("text").cast("binary")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count("*").cast("double").as("dup_count"))

  /** Incremental (cross-corpus) exact dedup — the resumable-ingestion
    * stage: from a batch of NEW documents, keep one representative per
    * fingerprint (smallest doc_id) and drop anything whose fingerprint
    * already exists in the previously ingested corpus. Per kept doc,
    * report how many batch members it represented.
    *
    * Scale shape: the within-batch pass is [[exact]]'s groupBy (shuffles
    * fp+id, never text); the cross-corpus pass is a left-anti join on the
    * 16-byte fingerprint against the existing corpus's fingerprint
    * column — at 100 TB that existing side is the compact fp index kept
    * from prior runs (or re-derived by a scan), and the join shuffles
    * fingerprints only. AQE broadcasts it when the index is small.
    *
    * @param newDocs  batch with `doc_id` and `text`
    * @param existing prior corpus with `text` (only its fingerprints are
    *                 used)
    */
  def incrementalExact(newDocs: DataFrame, existing: DataFrame): DataFrame = {
    val existingFp = existing
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
    exact(newDocs)
      .join(existingFp, Seq("fp"), "left_anti")
  }

  /** Word shingles of size n as an array column (built from the token array
    * with higher-order functions — stays in whole-stage codegen). */
  def shingles(tokens: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(tokens) - lit(n), lit(0)))
    transform(idx, i => concat_ws(" ", slice(tokens, i + lit(1), lit(n))))
  }

  /** MinHash signature: one-pass native expression (k seed families over
    * word 3-shingles; see [[graft.expressions.MinHashSig]] — the
    * higher-order-function formulation re-inlined the shingle pipeline into
    * every hash family). */
  def minhashSignature(tokens: Column, k: Int, shingleSize: Int = 3): Column =
    graft.expressions.VectorExpressions.minhashSig(tokens, k, shingleSize)

  /** doc_id + minhash signature (k hashes) + LSH band keys (k/rows bands of
    * `rowsPerBand` hashes, each folded to one bucket key with the
    * [[DualHash]] modular combine — same arithmetic the DuckDB oracle
    * runs). */
  def minhashLsh(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4): DataFrame =
    docs.select(col("doc_id"),
        minhashSignature(split(col("text"), " "), k).as("sig"))
      .select(col("doc_id"), col("sig"),
        bandsOf(col("sig"), k, rowsPerBand).as("bands"))

  /** The LSH band-key array for a MinHash signature column — shared by
    * [[minhashLsh]] and the streaming assignment twin (which must carry
    * event-time columns [[minhashLsh]]'s projection would drop). */
  private[graft] def bandsOf(sig: Column, k: Int, rowsPerBand: Int): Column =
    array((0 until k / rowsPerBand).map { b =>
      DualHash.combineCol(lit(b.toLong), (0 until rowsPerBand).map(r =>
        sig.getItem(b * rowsPerBand + r)))
    }: _*)

  /** Candidate near-dup pairs: documents sharing at least one LSH bucket.
    * One shuffle of (band, bucket, doc_id); pairs generated per bucket from
    * the grouped id list (no self-join). Buckets larger than
    * `maxBucketSize` are dropped BEFORE the id list is built (window count
    * over the bucket key — spills, never collects the oversized list), with
    * the dropped row count observed and logged via [[DedupMetrics]]: an
    * oversized bucket is a degenerate band value whose pair space would be
    * quadratic in one task at 100 TB, not near-dup signal. */
  def minhashCandidates(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4,
                        maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    val cap = resolveCap(docs, maxBucketSize)
    DedupMetrics.ensure(docs.sparkSession)
    val lsh = minhashLsh(docs, k, rowsPerBand)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    val sized = lsh
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .observe(DedupMetrics.nextName("minhash"),
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("dropped"))
    val buckets = sized
      .filter(col("bucket_n") > 1 && col("bucket_n") <= cap)
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    // all i<j pairs from each bucket's sorted id list
    val pairs = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2),
        greatest(size(col("ids")) - i - lit(1), lit(0))),
        b => struct(a.as("a"), b.as("b")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** 60-bit SimHash from the token array: per-bit majority vote of the
    * [[DualHash]] md5 base hash per token, as a native one-pass expression
    * ([[graft.expressions.SimHash64]] — the HOF formulation re-evaluates
    * the hash lambda per bit after projection collapse). */
  def simhash(tokens: Column): Column =
    graft.expressions.VectorExpressions.simhash64(tokens)

  /** Spark-builtin column form of the [[DualHash]] base hash: md5 hex →
    * first 15 nibbles as a long. Same value as `DualHash.base60` and the
    * DuckDB `base60Sql` rendering. */
  private[graft] def base60Col(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The column-HOF SimHash formulation — kept as the equivalence oracle
    * for [[simhash]] in ExtOpsSpec (identical hashes and vote semantics,
    * one array pass per bit). */
  private[graft] def simhashHof(tokens: Column): Column = {
    val hashes = transform(tokens, t => base60Col(t))
    val bits = (0 until graft.expressions.SimHash64.Bits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-duplicate pairs via banding: split the 64-bit signature
    * lanes (bits 60-63 always clear — see [[graft.expressions.SimHash64]])
    * into `bands` equal bit-bands; by pigeonhole, any pair with Hamming
    * distance < `bands` shares at least one identical band, so the
    * candidate join is an equi-join on (band index, band value) — shuffle
    * carries (band, value, doc_id) only — and the exact Hamming check
    * (codegen'd bit_count(xor)) runs on candidates only. Standard
    * production SimHash dedup shape; guarantees full recall for
    * maxHamming <= bands - 1. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                          bands: Int = 4,
                          maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    require(maxHamming < bands, s"pigeonhole needs maxHamming < bands")
    val cap = resolveCap(docs, maxBucketSize)
    DedupMetrics.ensure(docs.sparkSession)
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = docs.select(col("doc_id"),
      simhash(split(col("text"), " ")).as("sig"))
    val bandedAll = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask)).as("value"))): _*))
        .as("bv"))
      .select(col("doc_id"), col("sig"), col("bv.band"), col("bv.value"))
    // cap the (band, value) hot keys before the equi-join — same rationale
    // and observability as minhashCandidates
    val banded = bandedAll
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "value")))
      .observe(DedupMetrics.nextName("simhash"),
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("dropped"))
      .filter(col("bucket_n") <= cap)
      .drop("bucket_n")
    val a = banded.select(col("band"), col("value"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("value"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "value"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two token-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** n-gram Jaccard near-dup pairs: candidates from MinHash LSH, verified
    * with exact shingle-set Jaccard >= threshold. The verify join re-reads
    * only candidate docs (semi-join pattern). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        k: Int = 16, rowsPerBand: Int = 4,
                        maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    val sets = docs.select(col("doc_id"),
      graft.expressions.VectorExpressions
        .shingleHashes(split(col("text"), " "), 3).as("sh"))
    val cands = minhashCandidates(docs, k, rowsPerBand, maxBucketSize)
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected pair graph: every node gets
    * `cluster_id` = the minimum doc_id reachable from it — the dedup
    * DECISION step (keep one doc per cluster) that turns pairwise near-dup
    * verdicts into group assignments.
    *
    * Iterative min-label propagation with per-round localCheckpoint (cuts
    * the exploding lineage iterative plans otherwise build). Rounds needed
    * = component diameter; dedup components are near-cliques by
    * construction (every member pair passed the same similarity test), so
    * convergence is a handful of rounds. At 100 TB each round shuffles
    * (doc_id, label) + the edge list only — never documents — and the
    * label sum is a cheap monotone convergence witness (labels only ever
    * decrease). */
  def clusterPairs(nodes: DataFrame, pairs: DataFrame,
                   maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = nodes.select(col("doc_id"),
      col("doc_id").cast("long").as("cluster_id")).localCheckpoint(true)
    def labelSum(df: DataFrame): Long =
      df.agg(sum("cluster_id")).head().getLong(0)
    // The block-manager handle behind an eager localCheckpoint: unpersist
    // it once the NEXT round's checkpoint has materialised, or a
    // billion-id job pins one full (doc_id, label) copy per round until
    // the ContextCleaner happens to GC it.
    def checkpointRdd(df: DataFrame) = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbr = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = labels.union(nbr)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val s = labelSum(next) // action: `next`'s checkpoint is materialised
      checkpointRdd(labels).foreach(_.unpersist(blocking = false))
      converged = s == prevSum
      prevSum = s
      labels = next
      it += 1
    }
    edges.unpersist()
    labels
  }

  /** Near-duplicate clusters over a document table: MinHash-LSH candidates
    * verified by shingle Jaccard >= `threshold`, then [[clusterPairs]].
    * Output (doc_id, cluster_id); `doc_id == cluster_id` marks the kept
    * canonical doc of each cluster. */
  def nearDupClusters(docs: DataFrame, threshold: Double,
                      k: Int = 16, rowsPerBand: Int = 4,
                      maxIters: Int = 20): DataFrame = {
    // threshold <= 0 accepts EVERY candidate (jaccard is never negative),
    // so the shingle-set verification joins would compute a similarity
    // only to compare it against a bound it always clears — skip straight
    // to the banded candidates and spare two corpus-keyed joins (the
    // leakage-safe splitter's default path).
    val edges =
      if (threshold <= 0.0) minhashCandidates(docs, k, rowsPerBand)
      else ngramJaccardPairs(docs, threshold, k, rowsPerBand)
    clusterPairs(docs.select(col("doc_id")),
      edges.select(col("doc_a"), col("doc_b")),
      maxIters)
  }

  /** Incremental near-dup cluster ASSIGNMENT — the daily-ingest sibling
    * of [[incrementalExact]] and the natural consumer of the persisted
    * label artifact ([[persistedLabels]]): each NEW document joins an
    * EXISTING near-dup cluster when LSH + Jaccard evidence links it
    * there (ties broken toward the minimum cluster label, the CC
    * convention), else it founds its own cluster (label = own id).
    *
    * Scale shape: band rows for both sides shuffle (band, bucket, id)
    * only — text never moves; the probe join is an equi-join on the
    * bucket key with the existing side's oversized buckets capped (the
    * same degenerate-band discipline as [[minhashCandidates]], observed
    * via [[DedupMetrics]]); the Jaccard verify joins shingle-hash sets
    * back for CANDIDATES only; the label lookup is an id-keyed join
    * against the artifact. Unlike a full re-cluster, existing labels
    * never move — the stability contract an incremental pipeline needs
    * (a new batch can merge two old clusters only on the next full
    * rebuild, the standard daily-assign/weekly-rebuild trade).
    *
    * Output: (doc_id, cluster_id, n_matches) for every new doc —
    * n_matches counts the verified existing near-dups (0 = founder). */
  def assignToClusters(newDocs: DataFrame, existing: DataFrame,
                       labels: DataFrame, threshold: Double,
                       k: Int = 16, rowsPerBand: Int = 4,
                       maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    val (bands, sets) = assignIndex(existing, k, rowsPerBand)
    assignWithIndex(newDocs, bands, sets, labels, threshold, k,
      rowsPerBand, maxBucketSize)
  }

  /** The existing-corpus side of the assignment probe, as two relations:
    * band rows (eid, band, bucket) and shingle-hash sets (eid, sb) —
    * computed live here, persisted by [[persistedAssignIndex]]. */
  private[graft] def assignIndex(existing: DataFrame, k: Int,
                                 rowsPerBand: Int): (DataFrame, DataFrame) = (
    minhashLsh(existing, k, rowsPerBand)
      .select(col("doc_id").as("eid"),
        posexplode(col("bands")).as(Seq("band", "bucket"))),
    existing.select(col("doc_id").as("eid"),
      graft.expressions.VectorExpressions
        .shingleHashes(split(col("text"), " "), 3).as("sb")))

  /** The persisted probe index for the incremental-assignment job — the
    * other half of the daily-ingest artifact pair (labels come from
    * [[persistedLabels]]): the existing corpus's band rows and shingle
    * sets are built ONCE per (corpus fingerprint, params) and served as
    * parquet, so the daily batch never recomputes corpus-scale
    * signatures. Longs round-trip parquet exactly — assignment output is
    * bit-identical to the live index. */
  def persistedAssignIndex(existing: DataFrame, key: String, k: Int,
                           rowsPerBand: Int): (DataFrame, DataFrame) = {
    val fp = corpusFingerprint(existing)
    val full = s"$key|fp=$fp|k=$k|b=$rowsPerBand"
    val path = Artifacts.pathFor("assignidx", full) { p =>
      val (bands, sets) = assignIndex(existing, k, rowsPerBand)
      bands.write.mode("overwrite").parquet(s"$p/bands")
      sets.write.mode("overwrite").parquet(s"$p/sets")
    }
    val spark = existing.sparkSession
    (spark.read.parquet(s"$path/bands"), spark.read.parquet(s"$path/sets"))
  }

  /** [[assignToClusters]] over an EXPLICIT probe index (live or
    * persisted): bands (eid, band, bucket), sets (eid, sb). Enriches the
    * raw index into the serve relation in-plan (cap window + per-doc
    * band-state groupBys) and runs the join-only [[assignServe]] —
    * callers holding a [[persistedServeIndex]] artifact should call
    * [[assignServe]] directly and skip the corpus-scale enrichment. */
  def assignWithIndex(newDocs: DataFrame, bands: DataFrame,
                      sets: DataFrame, labels: DataFrame,
                      threshold: Double, k: Int = 16, rowsPerBand: Int = 4,
                      maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    val cap = resolveCap(newDocs, maxBucketSize)
    assignServe(newDocs, serveIndexFrom(bands, sets, labels, cap),
      threshold, k, rowsPerBand)
  }

  /** The ENRICHED capped probe relation the assignment job serves from —
    * one row per surviving (cap-filtered) existing band row, with every
    * per-doc state the serving plan needs CO-LOCATED on the row:
    *
    *   (eid, band, bucket,
    *    esurv  — the doc's sorted surviving band indexes,
    *    ebands — the doc's FULL band-value array (bucket per band),
    *    sb     — the doc's shingle-hash set,
    *    cluster_id — the doc's near-dup label)
    *
    * `esurv`/`ebands` feed the in-row pair-ownership rule (a pair
    * colliding in several bands is kept exactly once, by its minimal
    * colliding band among the EXISTING doc's surviving bands — ranging
    * over surviving bands keeps parity with the capped batch path, which
    * still surfaces a pair through a later band after its minimal band's
    * bucket was capped away); `sb` feeds the Jaccard verify; `cluster_id`
    * the label lookup. Materialising this at BUILD time is what makes
    * serving join-only: the r14 shape re-derived the cap window and both
    * per-doc groupBys from raw band rows on EVERY serving run — three
    * corpus-scale shuffles per daily batch / per micro-batch for state
    * that never changes between rebuilds. The sb duplication (once per
    * surviving band row, <= k/rowsPerBand copies) is the price of a
    * single-join serve; it buys a plan with zero corpus-scale
    * windows/groupBys, which PlanAuditSpec pins.
    *
    * `observed` wires the cap-drop counter through [[DedupMetrics]]
    * (batch builds); the streaming live path passes false — observation
    * there would ride a micro-batch execution instead of a batch build. */
  private[graft] def serveIndexFrom(bands: DataFrame, sets: DataFrame,
                                    labels: DataFrame, cap: Int,
                                    observed: Boolean = true): DataFrame = {
    val sized = bands.withColumn("bn",
      count(lit(1)).over(Window.partitionBy("band", "bucket")))
    val withDrops =
      if (!observed) sized
      else {
        DedupMetrics.ensure(bands.sparkSession)
        sized.observe(DedupMetrics.nextName("assign"),
          sum(when(col("bn") > cap, 1L).otherwise(0L)).as("dropped"))
      }
    val surviving = withDrops.filter(col("bn") <= cap)
      .select("eid", "band", "bucket")
    val esurv = surviving.groupBy("eid")
      .agg(sort_array(collect_list(col("band"))).as("esurv"))
    val ebandsTbl = bands.groupBy("eid")
      .agg(transform(
        array_sort(collect_list(struct(col("band"), col("bucket")))),
        s => s.getField("bucket")).as("ebands"))
    surviving
      .join(esurv, "eid")
      .join(ebandsTbl, "eid")
      .join(sets, "eid")
      .join(labels.select(col("doc_id").as("eid"), col("cluster_id")), "eid")
  }

  /** Content fingerprint of a label table — folded into the serve-index
    * artifact key so a label rebuild (or a different threshold's labels)
    * never serves a stale index. Same shape as [[corpusFingerprint]]. */
  private[graft] def labelsFingerprint(labels: DataFrame): String = {
    val r = labels.agg(
      count(lit(1)),
      coalesce(max(col("doc_id").cast("long")), lit(-1L)),
      coalesce(bit_xor(xxhash64(col("doc_id"), col("cluster_id"))), lit(0L)))
      .head
    s"${r.getLong(0)}:${r.getLong(1)}:${java.lang.Long.toHexString(r.getLong(2))}"
  }

  /** The persisted ENRICHED serve index ([[serveIndexFrom]]) — built ONCE
    * per (corpus fingerprint, labels fingerprint, params) and served as
    * parquet, so the assignment job ([[assignServe]], batch or streaming)
    * is a parquet scan + bucket-keyed equi-join with ZERO corpus-scale
    * windows or groupBys per serving run. The cap is a BUILD parameter
    * (folded into the key): bucket-cap discipline is a property of the
    * index, decided when it is built, not re-derived per query. Longs,
    * ints, and arrays thereof round-trip parquet exactly, so assignment
    * output is bit-identical to the live chain. */
  def persistedServeIndex(existing: DataFrame, labels: DataFrame,
                          key: String, k: Int, rowsPerBand: Int,
                          maxBucketSize: Int = ConfiguredBucketSize): DataFrame = {
    val cap = resolveCap(existing, maxBucketSize)
    val fp = corpusFingerprint(existing)
    val lfp = labelsFingerprint(labels)
    val full = s"$key|fp=$fp|lfp=$lfp|k=$k|b=$rowsPerBand|cap=$cap"
    val path = Artifacts.pathFor("assignserve", full) { p =>
      val (bands, sets) = assignIndex(existing, k, rowsPerBand)
      serveIndexFrom(bands, sets, labels, cap)
        .write.mode("overwrite").parquet(s"$p/serve")
    }
    existing.sparkSession.read.parquet(s"$path/serve")
  }

  /** Join-only incremental assignment over the enriched serve relation
    * ([[serveIndexFrom]] / [[persistedServeIndex]]) — the serving plan a
    * daily batch actually pays: new-side signatures (per-row projection),
    * one (band, bucket) equi-join against the serve relation, the in-row
    * ownership filter + Jaccard verify, and one query-scale aggregation.
    * No window, no corpus-scale groupBy — PlanAuditSpec pins both.
    * Candidates failing the verify are NULLED rather than filtered so a
    * doc whose every candidate fails still reaches the aggregate and
    * founds its own cluster (min/count skip nulls) — the same shape as
    * the streaming twin, whose parity laws pin the semantics. */
  def assignServe(newDocs: DataFrame, serve: DataFrame, threshold: Double,
                  k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val toks = split(col("text"), " ")
    val nb = newDocs.select(col("doc_id").as("nid"),
        graft.expressions.VectorExpressions.shingleHashes(toks, 3).as("sa"),
        bandsOf(minhashSignature(toks, k), k, rowsPerBand).as("nbands"))
      .select(col("nid"), col("sa"), col("nbands"),
        posexplode(col("nbands")).as(Seq("band", "bucket")))
    val joined = nb.join(serve, Seq("band", "bucket"), "left")
    // ownership: only the pair's minimal colliding band among the
    // existing doc's surviving bands keeps the row (exactly one row per
    // verified pair reaches the aggregate)
    val minBand = element_at(filter(col("esurv"),
      i => element_at(col("nbands"), i + 1) ===
        element_at(col("ebands"), i + 1)), 1)
    val verifies = col("eid").isNotNull &&
      jaccard(col("sa"), col("sb")) >= threshold
    joined
      .filter(col("eid").isNull || col("band") === minBand)
      .select(col("nid"),
        when(verifies, col("eid")).as("meid"),
        when(verifies, col("cluster_id")).as("mcl"))
      .groupBy("nid")
      .agg(min(col("mcl")).as("cl"), count(col("meid")).as("nm"))
      .select(col("nid").as("doc_id"),
        coalesce(col("cl"), col("nid").cast("long")).as("cluster_id"),
        col("nm").as("n_matches"))
  }

  /** Rebuild-drift audit for incremental assignment — the number that
    * answers "rebuild now?" in the daily-assign/weekly-rebuild trade
    * ([[assignToClusters]]'s stability contract: existing labels never
    * move, so a new batch can only ever JOIN old clusters — two old
    * clusters bridged by new evidence stay split until the next full
    * re-cluster). Given the incremental labeling (existing labels ∪
    * assignment output) and a full-rebuild labeling of the SAME corpus,
    * reports how far the incremental partition has drifted:
    *
    *   n_docs / n_changed / changed_share — docs whose cluster would
    *     change under a rebuild (partition drift, see below);
    *   n_clusters_inc / n_clusters_full — partition sizes;
    *   n_merges — cluster-merge events a rebuild would perform
    *     (distinct (full, inc) cluster pairs minus distinct full
    *     clusters: each full cluster containing k incremental clusters
    *     contributes k−1 merges).
    *
    * Both labelings are re-canonicalised to min-member-id per cluster
    * before comparing, so the report measures PARTITION drift, not
    * label-string drift (an incrementally assigned doc keeps its old
    * cluster's label even when a new smaller id joined the cluster — a
    * raw label compare would flag that as change with identical
    * membership).
    *
    * Scale shape: two label-scale canonicalisation aggregates + id-keyed
    * joins, then ONE aggregate over (doc_id, c_inc, c_full) rows — the
    * multi-distinct is Spark's Expand-based two-phase rewrite (shuffled
    * by distinct value, map-side partials), never a single-reducer
    * funnel; ids only, text never moves. */
  def rebuildDrift(inc: DataFrame, full: DataFrame): DataFrame = {
    // Canonical label = min member id per cluster, computed as a WINDOW
    // min over the cluster_id partitioning instead of the r15-draft
    // aggregate + join-back: identical values (deterministic min), one
    // cluster_id exchange per side instead of two (guide §2.4 — the
    // window reuses the one partitioning a groupBy+join pair paid twice).
    //
    // Equivalence caveat (r15 advice): the old groupBy+INNER-join shape
    // dropped rows with a null cluster_id, while Window.partitionBy
    // groups nulls together and keeps them under a shared canonical
    // label. Every labeling source today is non-null by construction
    // (assignToClusters coalesces), so the forms agree; the isNotNull
    // filter pins that contract so a future nullable source cannot
    // silently change the drift counts.
    def canon(df: DataFrame, out: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      df.where(col("cluster_id").isNotNull)
        .select(col("doc_id"),
          min(col("doc_id").cast("long"))
            .over(Window.partitionBy(col("cluster_id"))).as(out))
    }
    val j = canon(inc, "c_inc").join(canon(full, "c_full"), "doc_id")
    j.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("c_inc") =!= col("c_full"), 1L).otherwise(0L))
          .as("n_changed"),
        countDistinct(col("c_inc")).as("n_clusters_inc"),
        countDistinct(col("c_full")).as("n_clusters_full"),
        (countDistinct(col("c_full"), col("c_inc")) -
          countDistinct(col("c_full"))).as("n_merges"))
      .select(col("n_docs"), col("n_changed"),
        round(col("n_changed").cast("double") / col("n_docs").cast("double"),
          6).as("changed_share"),
        col("n_clusters_inc"), col("n_clusters_full"), col("n_merges"))
  }

  /** Cheap content fingerprint of a document corpus: row count, max
    * doc_id, and the XOR of per-row xxhash64(doc_id, text). One narrow
    * scan (only the two columns the dedup chain consumes), no shuffle
    * beyond the one-row aggregate; XOR makes it order- and
    * partitioning-independent. Mirrors [[Pq.corpusFingerprint]]: this is
    * what lets the artifact key notice an in-place corpus rewrite instead
    * of serving stale labels. */
  private[graft] def corpusFingerprint(docs: DataFrame): String = {
    val r = docs.agg(
      count(lit(1)),
      coalesce(max(col("doc_id").cast("long")), lit(-1L)),
      coalesce(bit_xor(xxhash64(col("doc_id"), col("text"))), lit(0L)))
      .head
    s"${r.getLong(0)}:${r.getLong(1)}:${java.lang.Long.toHexString(r.getLong(2))}"
  }

  /** The persisted near-dup label table for (docs-at-`key`, params) —
    * built ONCE per (corpus fingerprint, params) per JVM by
    * [[nearDupClusters]] and written as parquet; every later call (and
    * every downstream consumer — report, survivor selection,
    * leakage-safe split) pays only a parquet scan of (doc_id,
    * cluster_id). This is the cross-query artifact a 100 TB pipeline
    * builds in one job and serves to every step that needs "which
    * cluster is this doc in": re-running the MinHash→LSH→CC chain per
    * consumer repeats the corpus-scale shuffles for identical output.
    * Results are bit-identical to the live chain (ids and labels are
    * integers; parquet round-trips them exactly), so oracle SQL is
    * unchanged. Keying/cleanup semantics are [[Artifacts]]'s (corpus
    * fingerprint folded in; per-JVM token; full-string memo). */
  def persistedLabels(docs: DataFrame, key: String, threshold: Double,
                      k: Int = 16, rowsPerBand: Int = 4,
                      maxIters: Int = 20): DataFrame = {
    val fp = corpusFingerprint(docs)
    val full = s"$key|fp=$fp|t=$threshold|k=$k|b=$rowsPerBand|it=$maxIters"
    val path = Artifacts.pathFor("deduplab", full)(p =>
      nearDupClusters(docs, threshold, k, rowsPerBand, maxIters)
        .write.mode("overwrite").parquet(s"$p/labels"))
    docs.sparkSession.read.parquet(s"$path/labels")
  }

  /** The persisted Jaccard-verified near-dup PAIR set — the edge-list
    * sibling of [[persistedLabels]] for consumers that need the graph
    * (e.g. PageRank over the near-dup graph) rather than its components.
    * Jaccard doubles round-trip parquet exactly, so downstream
    * unrounded-threshold filters see the same values as the live
    * [[ngramJaccardPairs]] chain. */
  def persistedPairs(docs: DataFrame, key: String, threshold: Double,
                     k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val fp = corpusFingerprint(docs)
    val full = s"$key|fp=$fp|t=$threshold|k=$k|b=$rowsPerBand"
    val path = Artifacts.pathFor("deduppairs", full)(p =>
      ngramJaccardPairs(docs, threshold, k, rowsPerBand)
        .write.mode("overwrite").parquet(s"$p/pairs"))
    docs.sparkSession.read.parquet(s"$path/pairs")
  }
}
