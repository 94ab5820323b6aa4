package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, DedupMetrics, Similarity}

/** Behavioural tests for dedup + similarity on constructed corpora. */
class ExtOpsSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"), // near dup
    (4L, "completely different text about spark query engines and columnar storage"),
    (5L, "another unrelated document mentioning joins aggregates and shuffles only")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the min id") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 4) // 5 docs, one exact dup pair
    val dup = out.find(_.getAs[Double]("dup_count") == 2.0).get
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("minhash LSH surfaces exact and near dup candidates, not unrelated") {
    val pairs = Dedup.minhashCandidates(docs, k = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup missed: $pairs")
    // near-dup 1-3 differs in 1 of 13 tokens: high jaccard, should bucket
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs.toString)
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, verified pairs only") {
    val out = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12)
    out.get((1L, 3L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("simhash: identical texts share signatures, different texts do not") {
    val sigs = docs.select($"doc_id", Dedup.simhash(split($"text", " ")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("brute-force cosine top-k finds the aligned vector first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(vecs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(1L) == 2L && top1(2L) == 1L)
  }

  test("LSH top-k similarities agree with brute force on shared pairs") {
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(64)(j =>
        (math.sin(i * 64 + j) + (if (i % 4 == j % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(vecs, 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(vecs, 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    for ((pair, sim) <- lsh if bf.contains(pair))
      assert(math.abs(bf(pair) - sim) < 1e-9, pair.toString)
  }

  test("LSH near-dup pairs are a subset of exact cosine pairs, non-64 dim works") {
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(48)(j => // deliberately not 64: dim is inferred
        (math.sin(i * 48 + j) + (if (i % 4 == j % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(vecs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && lsh.nonEmpty)
    assert(lsh.subsetOf(exact), s"${lsh -- exact} not in exact set")
    val recall = lsh.size.toDouble / exact.size
    info(f"lsh near-dup recall = $recall%.2f (${lsh.size}/${exact.size})")
    assert(recall > 0.2)
  }

  test("DotProduct fails fast on vector length mismatch") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("length mismatch")))
  }

  test("IVF top-k similarities agree with brute force on shared pairs") {
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(48)(j =>
        (math.sin(i * 48 + j) + (if (i % 4 == j % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(vecs, 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(vecs, 5, cells = 8, probes = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // every query vector must get neighbours (probing its own home cell)
    assert(ivf.map(_._1._1).distinct.length == 40)
    for ((pair, sim) <- ivf if bf.contains(pair))
      assert(math.abs(bf(pair) - sim) < 1e-9, pair.toString)
  }

  test("dedup report conservation: docs partition into the histogram and " +
      "removable = docs - clusters") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "the quick brown fox jumps over the lazy dog again tomorrow"),
      (4L, "completely different content about spark and shuffles here"),
      (5L, "another unrelated document mentioning joins and windows only"))
      .toDF("doc_id", "text")
    val labels = graft.ext.Dedup.nearDupClusters(docs,
      threshold = 0.0, k = 16, rowsPerBand = 2)
    val hist = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = hist.map { case (sz, n) => sz * n }.sum
    val nClusters = hist.map(_._2).sum
    val nRemovable = hist.map { case (sz, n) => (sz - 1) * n }.sum
    assert(nDocs == 5L, s"histogram must partition all docs: $nDocs")
    assert(nRemovable == nDocs - nClusters,
      s"removable $nRemovable != docs $nDocs - clusters $nClusters")
    // the three near-dup texts cluster together on this fixture
    assert(hist.exists { case (sz, _) => sz >= 2 }, hist.mkString(","))
  }

  test("annRecall query sampling restricts the probe side only: sampled " +
      "output equals the full-corpus output filtered to the sampled qids") {
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(48)(j =>
        (math.sin(i * 48 + j) + (if (i % 4 == j % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    def render(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val full = render(Similarity.annRecall(vecs, k = 5, cells = 8,
      probes = 2))
    assert(full.size == 40 && full.forall(r => r._2 == 5L))
    val sampled = render(Similarity.annRecall(vecs, k = 5, cells = 8,
      probes = 2, queryPred = col("vec_id") % 5 === 0))
    assert(sampled == full.filter(_._1 % 5 == 0),
      "sampled recall must be the production index's recall on those qids")
    // the IVF approximation is imperfect but sane on this fixture
    assert(full.exists(_._4 < 1.0) || full.forall(_._4 == 1.0))
    assert(full.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("DualHash base60 matches DuckDB's hex-cast and Spark's conv/md5") {
    // Reference value from DuckDB:
    //   CAST(concat('0x', substr(md5('hello'), 1, 15)) AS BIGINT)
    assert(graft.ext.DualHash.base60("hello") == 419982666956583591L)
    // Spark-builtin column rendering agrees (incl. empty + multibyte)
    val df = Seq("hello", "", "a b c", "的是").toDF("s")
    for (r <- df.select($"s", Dedup.base60Col($"s").as("h")).collect())
      assert(r.getLong(1) == graft.ext.DualHash.base60(r.getString(0)),
        s"mismatch for '${r.getString(0)}'")
  }

  test("native MinHashSig equals the HOF md5/affine formulation") {
    import graft.ext.DualHash
    val hofSig = {
      val bases = transform(Dedup.shingles(split($"text", " "), 3),
        sh => Dedup.base60Col(sh))
      array((0 until 16).map(i => array_min(transform(bases, x =>
        (lit(DualHash.famA(i)) * (x % lit(DualHash.P)) + lit(DualHash.famB(i)))
          % lit(DualHash.P)))): _*)
    }
    val rows = docs.select(
      Dedup.minhashSignature(split($"text", " "), 16).as("native"),
      hofSig.as("hof")).collect()
    for (r <- rows)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("native SimHash64 equals the column-HOF formulation bit-for-bit") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "x"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        Dedup.simhash(split(col("text"), " ")).as("native"),
        Dedup.simhashHof(split(col("text"), " ")).as("hof"))
      .collect()
    for (r <- both)
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}")
  }

  test("simhash banded pairs have FULL recall for hamming <= bands-1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content about spark catalyst expressions"),
      (5L, "totally unrelated words concerning volcanic melt compositions")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth from the signatures themselves
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash(split(col("text"), " ")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs == want, s"got $pairs want $want")
    assert(pairs.contains((1L, 2L))) // exact dup pair must be found
  }

  test("LSH bucket cap resolves from spark conf without recompiling") {
    // 30 identical docs: every band has a 30-member degenerate bucket.
    val degenerate = (101L to 130L).map(i => (i, "tiny doc same text every time"))
      .toDF("doc_id", "text")
    val mixed = docs.union(degenerate)
    try {
      // cap below the degenerate bucket size -> its pairs are dropped
      spark.conf.set(Dedup.MaxBucketSizeConfKey, "16")
      val capped = Dedup.minhashCandidates(mixed).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!capped.exists(p => p._1 > 100L || p._2 > 100L),
        s"conf cap ignored: degenerate pairs ${capped.size}")
      assert(capped.contains((1L, 2L)), capped.toString)
      // cap above it -> the degenerate pairs flow again
      spark.conf.set(Dedup.MaxBucketSizeConfKey, "64")
      val open = Dedup.minhashCandidates(mixed).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(open.exists(p => p._1 > 100L && p._2 > 100L), open.size.toString)
    } finally spark.conf.unset(Dedup.MaxBucketSizeConfKey)
    // unset again -> back to the compiled default (512: everything flows)
    val dflt = Dedup.minhashCandidates(mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt.exists(p => p._1 > 100L && p._2 > 100L))
  }

  test("batch LSH bucket cap bounds degenerate bands and records the drop") {
    // 1000 identical short docs: one degenerate bucket per band whose pair
    // space would be ~500k pairs per band without the cap
    val degenerate = (101L to 1100L).map(i => (i, "tiny doc same text every time"))
      .toDF("doc_id", "text")
    val mixed = docs.union(degenerate)
    DedupMetrics.reset()

    val minhashPairs = Dedup.minhashCandidates(mixed, k = 16, rowsPerBand = 4,
      maxBucketSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bounded: nothing from the degenerate block survives, normal dups do
    assert(minhashPairs.contains((1L, 2L)), minhashPairs.toString)
    assert(!minhashPairs.exists(p => p._1 > 100L || p._2 > 100L),
      s"degenerate-bucket pairs leaked: ${minhashPairs.size}")

    val simhashPairs = Dedup.simhashNearDupPairs(mixed, maxHamming = 3,
      bands = 4, maxBucketSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simhashPairs.contains((1L, 2L)), simhashPairs.toString)
    assert(!simhashPairs.exists(p => p._1 > 100L || p._2 > 100L),
      s"degenerate-bucket pairs leaked: ${simhashPairs.size}")

    // the drop is observed and counted — no silent truncation (the
    // QueryExecutionListener fires asynchronously: poll briefly)
    def awaitDropped(tag: String, atLeast: Long): Long = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = DedupMetrics.totalDropped(tag)
      while (n < atLeast && System.nanoTime() < deadline) {
        Thread.sleep(50); n = DedupMetrics.totalDropped(tag)
      }
      n
    }
    assert(awaitDropped("minhash", 1000L) >= 1000L,
      s"minhash dropped = ${DedupMetrics.totalDropped("minhash")}")
    assert(awaitDropped("simhash", 1000L) >= 1000L,
      s"simhash dropped = ${DedupMetrics.totalDropped("simhash")}")

    // default cap leaves the normal corpus untouched (oracle unchanged)
    DedupMetrics.reset()
    val defaultPairs = Dedup.minhashCandidates(docs, k = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaultPairs.contains((1L, 2L)))
    Thread.sleep(500) // give the async listener a chance to (not) fire
    assert(DedupMetrics.totalDropped("minhash") == 0L)
  }

  test("embedding LSH bucket cap bounds a degenerate constant-vector cluster") {
    // 200 identical embeddings share one bucket (every projection has the
    // same sign): a quadratic pair space in one task without the cap
    val base = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)), (2L, Array(0.99, 0.1, 0.0, 0.0)),
      (3L, Array(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val degenerate = (101L to 300L)
      .map(i => (i, Array(0.5, 0.5, 0.5, 0.5))).toDF("vec_id", "embedding")
    val mixed = base.union(degenerate)
    DedupMetrics.reset()
    val capped = Similarity.lshNearDupPairs(mixed, threshold = 0.9,
      maxBucketSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 > 100L || p._2 > 100L),
      s"degenerate-bucket pairs leaked: ${capped.size}")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var n = DedupMetrics.totalDropped("emblsh")
    while (n < 200L && System.nanoTime() < deadline) {
      Thread.sleep(50); n = DedupMetrics.totalDropped("emblsh")
    }
    assert(n >= 200L, s"emblsh dropped = $n")
    // default cap (512) leaves the corpus untouched: near-dup pair flows
    val open = Similarity.lshNearDupPairs(mixed, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(open.contains((1L, 2L)), open.toString)
  }

  test("clusterPairs: labels = min reachable id; chain converges in diameter rounds") {
    val nodes = (1L to 10L).toDF("doc_id")
    // path 1-2-3-4-5 (diameter 4), cyclic triangle 6-7-8, singletons 9, 10
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("doc_a", "doc_b")
    val labels = Dedup.clusterPairs(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L, 10L -> 10L), labels.toString)

    // a path of diameter 8 must be fully labelled within 8 propagation
    // rounds (label 1 walks one hop per round)
    val chainNodes = (1L to 9L).toDF("doc_id")
    val chainPairs = (1L to 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val chain = Dedup.clusterPairs(chainNodes, chainPairs, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chain.values.forall(_ == 1L), chain.toString)
  }

  test("clusterPairs releases each round's checkpoint: persistent RDDs stay bounded") {
    val sc = spark.sparkContext
    // a diameter-8 chain forces 8+ propagation rounds; each round
    // checkpoints a labels copy that MUST be unpersisted when the next
    // round's checkpoint lands, leaving at most edges + final labels (+
    // whatever was persisted before the call) in the block manager.
    val before = sc.getPersistentRDDs.size
    val nodes = (1L to 9L).toDF("doc_id")
    val pairs = (1L to 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.clusterPairs(nodes, pairs, maxIters = 12)
    assert(labels.collect().map(_.getLong(1)).forall(_ == 1L))
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 1,
      s"persistent RDDs grew $before -> $after; per-round checkpoints leaked")
  }

  test("clusterPairs agrees with driver-side union-find on a hashed random graph") {
    val n = 200
    // deterministic pseudo-random edge list (hash arithmetic, no RNG)
    val edges = (0 until 300).map { i =>
      val a = (i.toLong * 48271 % n) + 1
      val b = (i.toLong * 69621 % n) + 1
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    // union-find with path compression as the independent oracle
    val parent = Array.tabulate(n + 1)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
    val expected = (1 to n).map { i =>
      val root = find(i)
      i.toLong -> (1 to n).filter(j => find(j) == root).min.toLong
    }.toMap
    val got = Dedup.clusterPairs((1L to n.toLong).toDF("doc_id"),
        edges.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("nearDupClusters keeps one canonical doc per near-dup group") {
    val out = Dedup.nearDupClusters(docs, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1, 2 exact dups (and 3 a near dup): one cluster rooted at 1
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(4L) == 4L && out(5L) == 5L)
    val canonical = out.filter { case (id, c) => id == c }.keySet
    assert(canonical.contains(1L) && !canonical.contains(2L))
  }

  test("text quality expressions evaluate on constructed docs") {
    import graft.expr.{E, C}
    import graft.ext.{TextAnalysis => TA}
    val out = docs.select($"doc_id",
      E.toColumn(TA.tokenCount(C("text"))).as("n"),
      E.toColumn(TA.stopwordCount(C("text"))).as("sw"),
      E.toColumn(TA.langId(C("text"))).as("lang")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(out(1L)._1 == 14.0) // 14 tokens
    assert(out(1L)._2 == 3.0) // 'the' x3
    assert(out(1L)._3 == "en")
  }

  test("Scd2.snapshotMerge: hand-computed interval rows for every change " +
      "kind; nulls compare null-safe") {
    val base = Seq[(Long, String, Option[Double])](
      (1L, "A", Some(10.0)),   // unchanged
      (2L, "B", Some(20.0)),   // changed (price)
      (3L, "C", None),         // unchanged with a null attr
      (4L, "D", Some(40.0))    // removed
    ).toDF("k", "status", "price")
    val next = Seq[(Long, String, Option[Double])](
      (1L, "A", Some(10.0)),
      (2L, "B", Some(25.0)),
      (3L, "C", None),
      (5L, "E", Some(50.0))    // added
    ).toDF("k", "status", "price")
    // columns: k, status, price, valid_from, valid_to, change
    val out = graft.ext.Scd2.snapshotMerge(base, next, "k",
        Seq("status", "price"), t0 = 100L, t1 = 200L)
      .collect()
      .map(r => (r.getLong(0), r.getString(5), r.getString(1),
        Option(r.get(2)), r.getLong(3), Option(r.get(4))))
      .toSet
    assert(out == Set(
      (1L, "unchanged",   "A", Some(10.0), 100L, None),
      (2L, "changed_old", "B", Some(20.0), 100L, Some(200L)),
      (2L, "changed_new", "B", Some(25.0), 200L, None),
      (3L, "unchanged",   "C", None,       100L, None),
      (4L, "removed",     "D", Some(40.0), 100L, Some(200L)),
      (5L, "added",       "E", Some(50.0), 200L, None)), out.toString)
  }

  test("Quantize.int8: codes bounded, zero vectors safe, dequantized " +
      "cosine within 1% of the f64 cosine on the corpus") {
    import graft.ext.{Quantize, Similarity}
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Quantize.int8(emb)
    // bounds: |code| <= 127 everywhere
    val oob = q.select(explode(col("codes")).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(oob == 0L, s"$oob codes out of [-127, 127]")
    // zero vector: all-zero codes, zero error
    val z = Quantize.int8(
      Seq((0L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")).head
    assert(z.getSeq[Int](2).forall(_ == 0) && z.getDouble(3) == 0.0)
    // semantic fidelity: cosine(recon_a, recon_b) ~ cosine(a, b)
    val recon = q.select(col("vec_id"),
      transform(col("codes"),
        c => c.cast("double") * col("scale") / lit(127.0)).as("embedding"))
    def topPairs(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df.limit(60), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val exact = topPairs(emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")))
    val approx = topPairs(recon)
    val shared = exact.keySet intersect approx.keySet
    assert(shared.size >= exact.size / 2, "recon top-k diverged wholesale")
    for (k <- shared)
      assert(math.abs(exact(k) - approx(k)) <= 0.01,
        s"pair $k cosine ${exact(k)} vs recon ${approx(k)}")
  }

  test("Scd2.snapshotMerge: duplicate keys fail loudly instead of " +
      "cross-producting corrupt intervals; checkUnique=false skips probes") {
    val base = Seq((1L, "A"), (1L, "A'"), (2L, "B")).toDF("k", "status")
    val next = Seq((1L, "A"), (2L, "B")).toDF("k", "status")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Scd2.snapshotMerge(base, next, "k", Seq("status"),
        t0 = 1L, t1 = 2L)
    }
    assert(e.getMessage.contains("not unique"))
    // the escape hatch still plans (caller vouches for the key)
    graft.ext.Scd2.snapshotMerge(next, next, "k", Seq("status"),
      t0 = 1L, t1 = 2L, checkUnique = false).collect()
  }
}
