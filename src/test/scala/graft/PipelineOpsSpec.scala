package graft

import org.apache.spark.sql.functions._
import graft.ext.PipelineOps

/** Behavioural tests for the training-data pipeline stages
  * (decontamination, domain mixing, repetition filters). */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  lazy val corpus = Seq(
    // doc 0 = "eval" doc under the %50 predicate used below
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "src0"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "src0"), // full overlap
    (2L, "alpha beta gamma something else entirely here now", "src1"), // partial
    (3L, "totally disjoint words with no shared shingles at all", "src1"),
    (4L, "spark spark spark spark spark spark spark spark spark one", "src2") // repetitive
  ).toDF("doc_id", "text", "source")

  test("decontaminate flags exact and partial shingle overlap, not disjoint docs") {
    val out = PipelineOps.decontaminate(corpus, col("doc_id") % 50 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // eval doc 0 excluded
    // doc 1 duplicates doc 0: shares all 6 of its distinct 3-shingles
    assert(out(1L) == ((6L, 1L)), out.toString)
    // doc 2 shares exactly the "alpha beta gamma" shingle
    assert(out(2L) == ((1L, 1L)), out.toString)
    assert(out(3L) == ((0L, 0L)), out.toString)
    assert(out(4L) == ((0L, 0L)), out.toString)
  }

  test("weightedSample is deterministic and monotone in the rate") {
    val lo = PipelineOps.weightedSample(corpus, Map.empty, default = 0.3)
      .select("doc_id").as[Long].collect().toSet
    val lo2 = PipelineOps.weightedSample(corpus, Map.empty, default = 0.3)
      .select("doc_id").as[Long].collect().toSet
    val hi = PipelineOps.weightedSample(corpus, Map.empty, default = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(lo == lo2)              // rerun keeps exactly the same rows
    assert(lo.subsetOf(hi))        // raising the rate only adds rows
    val all = PipelineOps.weightedSample(corpus, Map.empty, default = 1.0)
    assert(all.count() == 5)       // rate 1.0 keeps everything
  }

  test("weightedSample applies per-source rates over the default") {
    // src2 rate 1.0 forces doc 4 in; src0/src1 rate 0.0 forces docs 0-3 out
    val kept = PipelineOps.weightedSample(corpus,
        Map("src0" -> 0.0, "src1" -> 0.0, "src2" -> 1.0), default = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L), kept.toString)
  }

  test("repetition metrics: uniform text low, degenerate text high") {
    val m = corpus.select(col("doc_id"),
        PipelineOps.topWordFrac(split(col("text"), " ")).as("twf"),
        PipelineOps.dupBigramFrac(split(col("text"), " ")).as("dbf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(0L)._1 == 0.125)   // 8 distinct tokens of 8
    assert(m(0L)._2 == 0.0)     // all 7 bigrams distinct
    assert(m(4L)._1 == 0.9)     // "spark" is 9 of 10 tokens
    // 9 bigrams, distinct = {"spark spark", "spark one"} -> 1 - 2/9
    assert(math.abs(m(4L)._2 - (1.0 - 2.0 / 9.0)) < 1e-6)
  }

  test("tokenBudget matches the naive global cumulative sum at any budget") {
    val n = 300
    val docs = spark.range(n).selectExpr("id AS doc_id",
      // 3..12 tokens per doc, deterministic
      "concat('w', array_join(transform(sequence(1, CAST(3 + id % 10 AS INT)), x -> 'w'), ' ')) AS text",
      "'srcX' AS source")
    // naive reference: global sort by (pri, doc_id), running sum
    val rows = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        PipelineOps.hashUniform(col("doc_id"), ":budget").as("pri"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._3, r._1))
    def naive(budget: Long): Set[Long] = {
      var cum = 0L
      rows.iterator.takeWhile { r => cum += r._2; cum <= budget }
        .map(_._1).toSet
    }
    for (budget <- Seq(0L, 10L, 500L, 1200L, 100000L)) {
      val got = PipelineOps.tokenBudget(docs, budget, buckets = 16)
        .select("doc_id").as[Long].collect().toSet
      assert(got == naive(budget), s"budget $budget")
    }
  }

  test("segmentDedup removes exactly the cross-document passages") {
    val shared = "common header line one two three"  // 6 tokens = 2 segments
    val c = Seq(
      (0L, s"$shared ua ub uc ud ue uf"),
      (1L, s"$shared va vb vc vd ve vf"),
      (2L, "entirely different words without any repeats here")
    ).toDF("doc_id", "text")
    val out = PipelineOps.segmentDedup(c, segLen = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // docs 0/1 share the two 3-token segments of `shared`; the tails differ
    assert(out(0L) == ((4L, 2L, "ua ub uc ud ue uf")), out.toString)
    assert(out(1L) == ((4L, 2L, "va vb vc vd ve vf")), out.toString)
    // doc 2 shares nothing: rebuilt text is byte-identical to the original
    assert(out(2L) ==
      ((3L, 0L, "entirely different words without any repeats here")))
  }

  test("segmentDedup: clean docs rebuild byte-identical at every segLen") {
    val lone = Seq((7L, "one two three four five six seven")).toDF("doc_id", "text")
    for (l <- Seq(1, 2, 3, 5, 50)) {
      val r = PipelineOps.segmentDedup(lone, segLen = l, minDocs = 2).head()
      assert(r.getLong(2) == 0L && r.getString(3) == "one two three four five six seven",
        s"segLen $l")
    }
  }

  test("segmentDedup removed counts agree with an independent frequency count") {
    val out = PipelineOps.segmentDedup(corpus.select("doc_id", "text"),
      segLen = 2, minDocs = 2)
    // docs 0 and 1 are identical 8-token texts: all 4 segments of each are
    // shared, so both are fully scrubbed; doc 2 opens with the same
    // "alpha beta" segment so loses exactly that one; doc 4's repeated
    // "spark spark" segment lives in ONE doc only (doc frequency, not
    // occurrence count) so nothing is removed from it
    val m = out.collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(m(0L) == ((4L, "")) && m(1L) == ((4L, "")), m.toString)
    assert(m(2L) == ((1L, "gamma something else entirely here now")), m.toString)
    assert(m(3L)._1 == 0L && m(4L)._1 == 0L, m.toString)
  }

  test("segmentDedup large-dictionary join path matches the broadcast-set " +
      "path row-for-row and never collects to the driver") {
    val c = corpus.select("doc_id", "text")
    val viaSet = PipelineOps.segmentDedup(c, segLen = 2, minDocs = 2,
      maxHotSegments = 1 << 20)
    // cap 0: every dictionary is "too large", forcing the join rewrite
    val viaJoin = PipelineOps.segmentDedup(c, segLen = 2, minDocs = 2,
      maxHotSegments = 0)
    assert(viaJoin.orderBy("doc_id").collect().toSeq ==
      viaSet.orderBy("doc_id").collect().toSeq)
    // path pinning: the literal path is a pure projection (no join at
    // all); the join path rewrites through real joins and must never
    // degrade to a nested-loop/cartesian shape
    val setPlan = viaSet.queryExecution.executedPlan.toString
    val joinPlan = viaJoin.queryExecution.executedPlan.toString
    assert(!setPlan.contains("Join"), setPlan)
    assert(joinPlan.contains("Join"), joinPlan)
    assert(!joinPlan.contains("CartesianProduct") &&
      !joinPlan.contains("BroadcastNestedLoopJoin"), joinPlan)
  }

  test("segmentDedup cap resolves from spark.graft.segmentDedup.maxHotSegments") {
    val c = corpus.select("doc_id", "text")
    spark.conf.set(PipelineOps.MaxHotSegmentsConfKey, "0")
    try {
      val out = PipelineOps.segmentDedup(c, segLen = 2, minDocs = 2)
      assert(out.queryExecution.executedPlan.toString.contains("Join"),
        "conf cap 0 must route to the join rewrite")
      assert(out.count() == 5)
      spark.conf.set(PipelineOps.MaxHotSegmentsConfKey, "banana")
      intercept[IllegalArgumentException] {
        PipelineOps.segmentDedup(c, segLen = 2, minDocs = 2)
      }
    } finally spark.conf.unset(PipelineOps.MaxHotSegmentsConfKey)
  }

  test("splitAssign is deterministic, exhaustive, and growth-stable") {
    val docs = spark.range(1000).select(col("id").as("doc_id"))
    val a = PipelineOps.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = PipelineOps.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "same corpus must split identically on re-run")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.85 && frac < 0.95, s"train fraction $frac")
    // growing the corpus never moves an existing doc between splits
    val grown = PipelineOps.splitAssign(
        spark.range(2000).select(col("id").as("doc_id"))).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.forall { case (id, s) => grown(id) == s })
  }

  test("leakageSafeSplit: near-dup pairs never straddle the split; " +
      "singletons split by their own id hash") {
    // docs 10/11 are near-dups (shared shingles), 12/13/14 are singletons
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "the quick brown fox jumps over the lazy dog again tonight"),
      (12L, "completely different text about distributed query planning"),
      (13L, "yet another unrelated document with its own vocabulary set"),
      (14L, "entirely separate words covering unrelated topics throughout")
    ).toDF("doc_id", "text")
    val out = PipelineOps.leakageSafeSplit(docs, k = 16, rowsPerBand = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L))
    // the near-dup pair shares one cluster, hence one split
    assert(out(10L)._1 == 10L && out(11L)._1 == 10L,
      s"near-dups must share the min-id cluster label: $out")
    assert(out(10L)._2 == out(11L)._2,
      s"near-dups must land in the same split: $out")
    // singletons: cluster label is the own id, so the assignment equals
    // splitAssign's per-doc hash — the documented degradation law
    val perDoc = PipelineOps.splitAssign(
        docs.filter(col("doc_id") >= 12L).select(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    Seq(12L, 13L, 14L).foreach { id =>
      assert(out(id)._1 == id, s"singleton $id must label itself")
      assert(out(id)._2 == perDoc(id),
        s"singleton $id must match the per-doc split: $out vs $perDoc")
    }
  }

  test("temperatureSample: largest group keeps baseRate, smaller groups " +
      "boosted monotonically, selection partition-invariant") {
    import org.apache.spark.sql.functions._
    // groups of 400 / 100 / 25 docs: boost factors 1, 2, 4 exactly
    // (sqrt of 1, 4, 16) — the α = 1/2 law on a fixture where sqrt is
    // integer-exact
    val docs = ((0 until 400).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (2000 until 2025).map(i => (i.toLong, "small")))
      .toDF("doc_id", "grp")
    val out = PipelineOps.temperatureSample(docs, "grp", "doc_id",
      baseRate = 0.2)
    val rates = out.select("grp", "sample_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("big") == 0.2)
    assert(rates("mid") == 0.4)
    assert(rates("small") == 0.8)
    // deterministic under partitioning
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = PipelineOps.temperatureSample(docs.repartition(11), "grp",
      "doc_id", baseRate = 0.2).select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // the boost actually flattens: kept fractions ordered small > mid > big
    val kept = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("small").toDouble / 25 > kept("big").toDouble / 400,
      s"small kept ${kept("small")}/25 should beat big ${kept("big")}/400")
  }

  test("groupZScore: hand-computed z per group; outlier flag on the " +
      "rounded boundary") {
    // group a: nine 0s and one 9 -> mean 0.9, sample sd sqrt(8.1) = 2.846;
    // z(9) = 2.846 > 2 flags, z(0) = -0.316 does not. group b: constant.
    val df = ((1L to 9L).map(i => (i, "a", 0L)) ++ Seq((10L, "a", 9L),
      (11L, "b", 5L), (12L, "b", 5L))).toDF("doc_id", "lang", "n")
    val out = PipelineOps.groupZScore(df, "lang", "n")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("z"), r.getAs[Long]("is_outlier")))).toMap
    val sd = math.sqrt(8.1)
    assert(out(10L) == ((math.rint((9 - 0.9) / sd * 1e6) / 1e6, 1L)))
    assert(out(1L) == ((math.rint((0 - 0.9) / sd * 1e6) / 1e6, 0L)))
    // constant group: sd = 0 -> z = 0, never flagged
    assert(out(11L) == ((0.0, 0L)) && out(12L) == ((0.0, 0L)))
  }

  test("groupZScore: single-row group is degenerate (null stddev -> z 0)") {
    val df = Seq((1L, "solo", 42L), (2L, "pair", 1L), (3L, "pair", 3L))
      .toDF("doc_id", "lang", "n")
    val out = PipelineOps.groupZScore(df, "lang", "n")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("z"), r.getAs[Long]("is_outlier")))).toMap
    assert(out(1L) == ((0.0, 0L)))
    // pair group: sd = sqrt(2), z = ±0.707107
    assert(out(2L)._1 == -0.707107 && out(3L)._1 == 0.707107)
  }

  test("distributionMatch: max-ratio bucket keeps everything, zero-target " +
      "buckets drop entirely, and the kept distribution tracks the target") {
    val rnd = new scala.util.Random(5)
    // bucket 0: rare in target; bucket 1: common; bucket 2: absent from it
    val rows = (0 until 3000).map { i =>
      val b = i % 3
      val isTarget = b match {
        case 0 => rnd.nextDouble() < 0.1
        case 1 => rnd.nextDouble() < 0.6
        case _ => false
      }
      (i.toLong, if (isTarget) "en" else "xx", b.toLong)
    }
    val df = rows.toDF("doc_id", "lang", "b")
    val kept = PipelineOps.distributionMatch(df, col("b"),
        col("lang") === "en")
      .select(col("doc_id"), col("bucket"), col("accept_p")).collect()
    val byBucket = kept.groupBy(_.getLong(1)).map { case (b, rs) =>
      b -> (rs.length, rs.head.getDouble(2))
    }
    // zero-target bucket is gone
    assert(!byBucket.contains(2L), s"bucket 2 survived: $byBucket")
    // the max-ratio bucket (1: highest target share) keeps ALL its rows
    assert(byBucket(1L)._2 == 1.0, s"bucket 1 accept_p ${byBucket(1L)._2}")
    assert(byBucket(1L)._1 == 1000, s"bucket 1 kept ${byBucket(1L)._1}")
    // achieved proportions track the target's bucket shares
    val tgt = rows.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, rs) => b -> rs.size.toDouble }
    val tgtShare0 = tgt(0L) / (tgt(0L) + tgt(1L))
    val keptTotal = kept.length.toDouble
    val gotShare0 = byBucket(0L)._1 / keptTotal
    assert(math.abs(gotShare0 - tgtShare0) < 0.05,
      s"kept share $gotShare0 vs target share $tgtShare0")
    // EMPTY target: nothing to match -> empty resample, never a NaN
    // accept_p silently keeping the full corpus
    val none = PipelineOps.distributionMatch(df, col("b"),
      col("lang") === "nope").count()
    assert(none == 0L, s"empty target kept $none rows")
  }

  test("hashUniform draws are uniform-ish and salt-decorrelated") {
    val n = 2000
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val u = ids.select(
        PipelineOps.hashUniform(col("doc_id"), ":a").as("ua"),
        PipelineOps.hashUniform(col("doc_id"), ":b").as("ub"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val meanA = u.map(_._1).sum / n
    assert(math.abs(meanA - 0.5) < 0.05, s"mean $meanA")
    assert(u.forall { case (a, b) => a >= 0.0 && a < 1.0 && b >= 0.0 && b < 1.0 })
    // different salts give (near-)independent draws: agreement on < below
    // 0.5 +/- noise, not ~1.0
    val agree = u.count { case (a, b) => (a < 0.3) == (b < 0.3) }.toDouble / n
    assert(agree < 0.8, s"salts correlated: $agree")
  }
}
