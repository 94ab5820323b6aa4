package graft

import org.apache.spark.sql.functions._
import graft.ext.{InvertedIndex, Sampling}

/** Behavioural laws for weighted reservoir sampling and the
  * inverted-index builder. */
class SamplingIndexSpec extends SparkSpec {

  import spark.implicits._

  test("weighted reservoir: inclusion frequency tracks weight across salts") {
    // two weight classes, 10:1 — across many independent salted draws the
    // heavy items must be selected far more often (A-Res law: inclusion
    // probability proportional to weight). Deterministic per salt.
    val docs = (0L until 200L)
      .map(i => (i, if (i < 100L) 10L else 1L)).toDF("doc_id", "w")
    val picks = (0 until 20).flatMap { s =>
      Sampling.weightedReservoir(docs, k = 20, "doc_id", "w", salt = s":r$s")
        .collect().map(_.getLong(0))
    }
    val heavy = picks.count(_ < 100L)
    val light = picks.size - heavy
    info(s"heavy picks $heavy vs light $light over 20 salts")
    // E[heavy share] = 10/11 ~ 0.909 of 400 picks; require a wide floor
    assert(heavy > 6 * light,
      s"weight-10 items must dominate the sample: $heavy vs $light")
    // determinism + partition invariance: same salt, any layout
    def ids(np: Int) = Sampling.weightedReservoir(
      docs.repartition(np), k = 20, "doc_id", "w").collect()
      .map(_.getLong(0)).toSeq
    assert(ids(1) == ids(13))
  }

  test("weighted reservoir: k bounds the sample; zero-ish weights lose") {
    val docs = (0L until 50L)
      .map(i => (i, if (i == 7L) 1000000L else 1L)).toDF("doc_id", "w")
    val got = Sampling.weightedReservoir(docs, k = 5, "doc_id", "w")
      .collect()
    assert(got.length == 5)
    // ln(u)/w -> 0- as w grows: the million-weight item is near-certain
    assert(got.map(_.getLong(0)).contains(7L),
      "the overwhelming-weight item must be sampled")
  }

  test("weighted reservoir: non-positive weights are filtered, never " +
      "ranked (a negative weight would otherwise sort FIRST)") {
    val docs = Seq((1L, 5L), (2L, -100L), (3L, 0L), (4L, 3L), (5L, 1L))
      .toDF("doc_id", "w")
    val got = Sampling.weightedReservoir(docs, k = 3, "doc_id", "w")
      .collect().map(_.getLong(0)).toSet
    // ln(u)/(-100) > 0 > ln(u)/w for all valid w: unfiltered, doc 2 wins
    // deterministically; ln(u)/0 = -Inf would silently bury doc 3
    assert(got == Set(1L, 4L, 5L),
      s"only the positive-weight rows may be sampled: $got")
  }

  test("inverted index: df bounds cut, digest pins postings, " +
      "partition-invariant") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta stop"),
      (3L, "alpha stop stop"),
      (4L, "alpha delta")).toDF("doc_id", "text")
    // alpha df=4, beta df=2, stop df=2, gamma/delta df=1
    val idx = InvertedIndex.postings(docs, minDf = 2L, maxDf = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx.keySet == Set("beta", "stop"),
      s"minDf=2 kills hapax, maxDf=3 kills the stopword-like alpha: $idx")
    val (dfB, tfB, _) = idx("beta")
    assert(dfB == 2L && tfB == 3L) // doc1 tf=2 + doc2 tf=1
    // digest = md5 of the sorted doc:tf entries, layout-independent
    val again = InvertedIndex.postings(docs.repartition(7),
        minDf = 2L, maxDf = 3L)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(again("beta") == idx("beta")._3 && again("stop") == idx("stop")._3)
    // and it pins CONTENT: a different tf for the same df changes it
    val mutated = Seq(
      (1L, "alpha beta beta beta gamma"), // beta tf 2 -> 3
      (2L, "alpha beta stop"),
      (3L, "alpha stop stop"),
      (4L, "alpha delta")).toDF("doc_id", "text")
    val mut = InvertedIndex.postings(mutated, minDf = 2L, maxDf = 3L)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(mut("beta") != idx("beta")._3, "digest must see tf changes")
  }

  test("stratified sample: exactly min(k, stratum size) per stratum, " +
      "partition-invariant, append-stable") {
    val docs = (0L until 200L).map(i =>
      (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "zh"))
      .toDF("doc_id", "lang") // 120 en, 60 de, 20 zh
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", k = 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val byStratum = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byStratum == Map("en" -> 30, "de" -> 30, "zh" -> 20),
      s"per-stratum allocation wrong: $byStratum")
    // layout invariance: the draw is a pure hash of (id, salt)
    val again = Sampling.stratifiedSample(docs.repartition(13), "lang",
        "doc_id", k = 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again.toSet == got.toSet, "sample must be layout-invariant")
    // append stability: adding rows can only displace by out-ranking —
    // the surviving intersection keeps its membership
    val appended = docs.union(
      (200L until 260L).map(i => (i, "en")).toDF("doc_id", "lang"))
    val after = Sampling.stratifiedSample(appended, "lang", "doc_id",
        k = 30).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val beforeEn = got.filter(_._1 == "en").map(_._2).toSet
    val afterEn = after.filter(_._1 == "en").map(_._2)
    // every pre-append member still present was NOT displaced arbitrarily:
    // the kept set is exactly the old members minus those out-ranked
    assert(afterEn.intersect(beforeEn).subsetOf(beforeEn) &&
      after.filter(_._1 == "de").map(_._2) ==
        got.filter(_._1 == "de").map(_._2).toSet,
      "untouched strata must keep their exact sample under append")
  }

  test("PSI drift: identical slices score 0, disjoint slices score " +
      "high, spine buckets always present, values clamp into the last") {
    import graft.ext.Drift
    val docs = (0L until 300L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // en ~ uniform [0, 300); de shifted [300, 600) for the drift case
      val v = if (lang == "en") (i * 7) % 300 else 300 + (i * 7) % 300
      (i, lang, v)
    }.toDF("doc_id", "lang", "v")
    // identical: compare en with itself
    val same = Drift.psi(docs, "v", col("lang") === "en",
        col("lang") === "en", bucketWidth = 64, nBuckets = 8)
      .collect()
    assert(same.length == 8, "every spine bucket must be present")
    assert(same.forall(_.getDouble(6) == 0.0),
      s"identical slices must score PSI 0: ${same.map(_.getDouble(6)).toSeq}")
    // disjoint value ranges: conventional "investigate" is 0.2; these
    // score far beyond it
    val drift = Drift.psi(docs, "v", col("lang") === "en",
        col("lang") === "de", bucketWidth = 64, nBuckets = 8)
      .collect()
    assert(drift.head.getDouble(6) > 1.0,
      s"disjoint distributions must score high: ${drift.head.getDouble(6)}")
    // clamp: de values reach 599 // 64 = 9 > 7 — they land in bucket 7
    val last = drift.find(_.getLong(0) == 7L).get
    assert(last.getLong(2) > 0, "over-range values must clamp into the last bucket")
  }
}
