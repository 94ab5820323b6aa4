package graft

import org.apache.spark.sql.functions._
import graft.ext.{PipelineOps, SemDedup, Similarity}

/** Behavioural laws for SemDeDup and concat-and-chunk sequence packing. */
class SemDedupPackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.read(spark, sf, "documents")
  private lazy val emb = Tables.read(spark, sf, "embeddings")

  // ---- SemDedup ----------------------------------------------------------

  test("semdedup pairs are a subset of the exact all-pairs cosine set") {
    val sem = SemDedup.pairs(emb, k = 4, iters = 2, threshold = 0.35)
      .select(col("keep_id").as("id_a"), col("drop_id").as("id_b"))
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.35)
      .select("id_a", "id_b")
    assert(sem.exceptAll(exact).isEmpty,
      "a within-cluster pair must also clear the exact global threshold")
    assert(sem.count() > 0, "corpus should contain semantic near-dups")
  }

  test("semdedup survivors = all ids minus ids with a lower-id near-dup") {
    val pairs = SemDedup.pairs(emb, k = 4, iters = 2, threshold = 0.35)
    val dropped = pairs.select(col("drop_id")).distinct().count()
    val surv = SemDedup.survivors(emb, k = 4, iters = 2, threshold = 0.35)
    assert(surv.count() + dropped == emb.count())
    // no survivor appears as a drop_id
    assert(surv.join(pairs, surv("vec_id") === pairs("drop_id")).isEmpty)
  }

  test("semdedup cap bounds the candidate block") {
    val capped = SemDedup.pairs(emb, k = 4, iters = 2, threshold = -1.0,
      cap = 10)
    // with threshold -1 every in-cluster pair survives; cap=10 means each
    // cluster contributes at most C(10,2)=45 pairs, 4 clusters <= 180
    assert(capped.count() <= 180)
  }

  test("semdedup cluster cap resolves from spark.graft.semdedup.clusterCap") {
    spark.conf.set(SemDedup.ClusterCapConfKey, "10")
    try {
      // same bound as the explicit cap=10 case: conf value must be live
      val capped = SemDedup.pairs(emb, k = 4, iters = 2, threshold = -1.0)
      assert(capped.count() <= 180)
      spark.conf.set(SemDedup.ClusterCapConfKey, "0")
      intercept[IllegalArgumentException] {
        SemDedup.pairs(emb, k = 4, iters = 2, threshold = -1.0)
      }
    } finally spark.conf.unset(SemDedup.ClusterCapConfKey)
  }

  // ---- ANN recall gate ----------------------------------------------------

  /** recall@5 of an approximate (qid, nid) set against the brute-force
    * truth: averaged per-query overlap fraction. */
  private def recallAt5(approx: Array[(Long, Long)],
                        truth: Map[Long, Set[Long]]): Double = {
    val byQ = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.iterator.map { case (q, t) =>
      (byQ.getOrElse(q, Set.empty) & t).size
    }.sum
    hits.toDouble / truth.iterator.map(_._2.size).sum
  }

  test("ANN recall gate: lshTopK and ivfTopK hold their recall@5 floors " +
      "against brute force on the embeddings fixture") {
    // The fixture's 64-dim embeddings are near-random (no cluster
    // structure), the hardest case for partition-based ANN: recall tracks
    // the probed fraction of the corpus. Measured curve (n=500):
    //   IVF cells=4 probes=3 -> 0.865   cells=16 probes=2 -> 0.332
    //   LSH planes=2 -> 0.380           planes=8 -> 0.022
    // Floors sit under those with headroom; they are quality budgets —
    // a change that breaks the bucket key or centroid assignment drops
    // recall to the random-candidates baseline (~probed fraction) and
    // fails here, not in production.
    val truth = Similarity.bruteForceTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rIvfQuality = recallAt5(Similarity.ivfTopK(emb, 5, cells = 4,
      probes = 3).collect().map(r => (r.getLong(0), r.getLong(1))), truth)
    val rIvfDefault = recallAt5(Similarity.ivfTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))), truth)
    val rLsh = recallAt5(Similarity.lshTopK(emb, 5, planes = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))), truth)
    info(f"ivf(4,3)=$rIvfQuality%.3f ivf(16,2)=$rIvfDefault%.3f " +
      f"lsh(planes=2)=$rLsh%.3f")
    assert(rIvfQuality >= 0.75, f"ivfTopK(cells=4,probes=3) $rIvfQuality%.3f < 0.75")
    // default (16,2) probes 1/8 of the corpus; random candidates would
    // score ~0.125 — 0.25 separates working from broken
    assert(rIvfDefault >= 0.25, f"ivfTopK defaults $rIvfDefault%.3f < 0.25")
    assert(rLsh >= 0.3, f"lshTopK(planes=2) $rLsh%.3f < 0.3")
  }

  // ---- product quantization laws ----------------------------------------

  test("PQ codes are valid, deterministic, and qerr shrinks with K") {
    import graft.ext.Pq
    val cb4 = Pq.train(emb, m = 2, k = 4, iters = 2, dim = 64)
    val enc = Pq.encode(emb, cb4)
    val stats = enc.agg(min("code_0"), max("code_0"), min("code_1"),
      max("code_1"), min("qerr"), sum("qerr")).head()
    assert(stats.getInt(0) >= 0 && stats.getInt(1) < 4)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < 4)
    assert(stats.getDouble(4) >= 0.0, "squared error cannot be negative")
    // determinism under partitioning: the dyadic-exact fit + argmin must
    // not care how the data is split
    val cbRep = Pq.train(emb.repartition(7), m = 2, k = 4, iters = 2, dim = 64)
    assert(cb4.flatten.flatten.toSeq == cbRep.flatten.flatten.toSeq,
      "codebooks changed under repartitioning")
    // more centroids -> total reconstruction error cannot grow (each
    // subspace's K=8 fit starts from the same 8-vector init superset and
    // every vector picks its argmin centroid)
    val cb8 = Pq.train(emb, m = 2, k = 8, iters = 2, dim = 64)
    val err8 = Pq.encode(emb, cb8).agg(sum("qerr")).head().getDouble(0)
    val err4 = stats.getDouble(5)
    info(f"total qerr: K=4 -> $err4%.1f, K=8 -> $err8%.1f")
    assert(err8 <= err4,
      f"K=8 reconstruction error $err8%.1f exceeds K=4's $err4%.1f")
  }

  test("ADC distance obeys the PQ triangle bound: |sqrt(adc) - " +
      "sqrt(true_d2)| <= sqrt(qerr of the neighbor), every pair") {
    import graft.ext.Pq
    // The PQ correctness THEOREM (L2 triangle inequality with the
    // reconstructed neighbor): adc(q,n) = d2(q, recon(n)), so its root
    // deviates from the true distance's root by at most the neighbor's
    // reconstruction distance sqrt(qerr_n). Data-independent — unlike a
    // top-k overlap gate, which the near-random fixture makes
    // uninformative (K^M = 16 distinct ADC values per query collapse
    // ranking to the tie-break; on clusterable data, where qerr -> 0,
    // this same bound forces ADC -> exact and overlap -> 1).
    val cb = Pq.train(emb, m = 2, k = 4, iters = 2, dim = 64)
    val adc = Pq.adcTopK(emb, cb, k = 5, planes = 2)
    val qerrs = Pq.encode(emb, cb).select(col("vec_id").as("nid"),
      col("qerr"))
    val b = emb.select(col("vec_id"),
      graft.ext.KMeansDet.quantize(col("embedding").cast("array<double>"))
        .as("v"))
    val joined = adc
      .join(b.select(col("vec_id").as("qid"), col("v").as("qv")), "qid")
      .join(b.select(col("vec_id").as("nid"), col("v").as("nv")), "nid")
      .join(qerrs, "nid")
      .withColumn("true_d2", Similarity.dot(col("qv"), col("qv")) -
        lit(2.0) * Similarity.dot(col("qv"), col("nv")) +
        Similarity.dot(col("nv"), col("nv")))
    val viol = joined.where(
      abs(sqrt(col("adist")) - sqrt(col("true_d2"))) >
        sqrt(col("qerr")) + lit(1e-3)).count()
    val n = joined.count()
    info(s"triangle bound checked on $n ADC pairs, $viol violations")
    assert(n > 0, "no ADC pairs produced — fixture degenerate")
    assert(viol == 0, s"$viol of $n pairs violate the PQ triangle bound")
  }

  test("ivfTopK recall@5 is monotone in the probe count") {
    val truth = Similarity.bruteForceTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = Seq(2, 4, 8).map { p =>
      p -> recallAt5(Similarity.ivfTopK(emb, 5, cells = 8, probes = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))), truth)
    }
    info(rs.map { case (p, r) => f"probes=$p -> $r%.3f" }.mkString(", "))
    rs.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra, f"recall fell from $ra%.3f (probes=$pa) to $rb%.3f (probes=$pb)")
    }
  }

  test("ivfTopK probe count resolves from spark.graft.ann.ivfProbes and " +
      "more probes never lose recall") {
    val truth = Similarity.bruteForceTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rDefault = recallAt5(Similarity.ivfTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))), truth)
    spark.conf.set(Similarity.IvfProbesConfKey, "16")
    try {
      // probing every cell makes the search exhaustive: recall must not drop
      val rAll = recallAt5(Similarity.ivfTopK(emb, 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))), truth)
      info(f"probes=2 recall $rDefault%.3f -> probes=16 recall $rAll%.3f")
      assert(rAll >= rDefault)
      assert(rAll >= 0.999, f"16-of-16 probes must be exhaustive, got $rAll%.3f")
      spark.conf.set(Similarity.IvfProbesConfKey, "zero")
      intercept[IllegalArgumentException] { Similarity.ivfTopK(emb, 5) }
    } finally spark.conf.unset(Similarity.IvfProbesConfKey)
  }

  // ---- seqPack -----------------------------------------------------------

  private lazy val packed = PipelineOps.seqPack(docs, 512L)

  test("seqPack conserves every document's tokens") {
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("n_in_seq").as("packed_tokens"))
    val truth = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bad = perDoc.join(truth, "doc_id")
      .filter(col("packed_tokens") =!= col("n_tokens"))
    assert(bad.isEmpty, "token counts must survive packing exactly")
  }

  test("every sequence except the last is exactly full") {
    val perSeq = packed.groupBy("seq_id").agg(sum("n_in_seq").as("filled"))
    val lastSeq = perSeq.agg(max("seq_id")).head.getLong(0)
    val notFull = perSeq.filter(col("seq_id") < lastSeq &&
      col("filled") =!= 512L)
    assert(notFull.isEmpty, "interior sequences must be packed to seqLen")
  }

  test("offsets tile each sequence without gaps or overlaps") {
    // within a sequence, sorting chunks by offset must give contiguous
    // [off, off+n) intervals starting at 0
    val rows = packed.select("seq_id", "off_in_seq", "n_in_seq")
      .collect().groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      val sorted = rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      sorted.foldLeft(0L) { case (cursor, (off, n)) =>
        assert(off == cursor, s"gap/overlap at offset $off (expected $cursor)")
        off + n
      }
    }
  }

  test("seqPack output carries no text column") {
    assert(!packed.columns.contains("text"))
  }
}
