package graft

import org.apache.spark.sql.functions._
import graft.ext.{PipelineOps, Sketches}

/** Laws for overlapping chunking and the KMV distinct sketch. */
class ChunkSketchSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.read(spark, sf, "documents")

  // ---- chunkOverlap ------------------------------------------------------

  private lazy val chunks = PipelineOps.chunkOverlap(docs, 64, 48)

  test("chunking covers every token: stitching strided chunks rebuilds the doc") {
    // drop the overlapping head (chunkSize-stride tokens) of every chunk
    // after the first, concatenate in chunk order -> original text
    val rebuilt = chunks
      .withColumn("part", when(col("chunk_id") === 0, col("chunk"))
        .otherwise(array_join(
          slice(split(col("chunk"), " "), 64 - 48 + 1, 48), " ")))
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct(col("chunk_id"),
        col("part")))).getField("part"), " ").as("rebuilt"))
    val bad = rebuilt.join(docs.select("doc_id", "text"), "doc_id")
      .filter(col("rebuilt") =!= col("text"))
    assert(bad.isEmpty, "stitched chunks must reproduce the document")
  }

  test("interior chunks are exactly chunkSize tokens and stride apart") {
    val interior = chunks.join(
      chunks.groupBy("doc_id").agg(max("chunk_id").as("last")), "doc_id")
      .filter(col("chunk_id") < col("last"))
      .filter(col("n_chunk") =!= 64L)
    assert(interior.isEmpty)
  }

  test("short documents produce exactly one chunk") {
    val short = docs.filter(size(split(col("text"), " ")) <= 64)
    val n = PipelineOps.chunkOverlap(short, 64, 48)
      .groupBy("doc_id").count().filter(col("count") =!= 1L)
    assert(n.isEmpty)
    assert(short.count() > 0, "corpus should contain short docs")
  }

  // ---- KMV sketch --------------------------------------------------------

  test("KMV estimate is invariant under repartitioning (merge order)") {
    val h = Tables.read(spark, sf, "lineitem")
      .select(Sketches.hashUnit(col("l_orderkey"), ":kmv").as("h"))
    val ests = Seq(1, 7, 32).map { p =>
      h.repartition(p).agg(Sketches.kmvEstimate(col("h"), 128)).head.getDouble(0)
    }
    assert(ests.distinct.size == 1,
      s"order-independent state must give one estimate, got $ests")
  }

  test("KMV is exact below k") {
    val small = (1 to 57).toDF("id")
      .select(Sketches.hashUnit(col("id"), ":t").as("h"))
    val est = small.agg(Sketches.kmvEstimate(col("h"), 128)).head.getDouble(0)
    assert(est == 57.0)
  }

  test("KMV duplicate keys do not inflate the estimate") {
    val dups = (1 to 57).flatMap(i => Seq.fill(5)(i)).toDF("id")
      .select(Sketches.hashUnit(col("id"), ":t").as("h"))
    val est = dups.agg(Sketches.kmvEstimate(col("h"), 128)).head.getDouble(0)
    assert(est == 57.0)
  }

  test("KMV relative error stays inside 4 standard deviations") {
    val li = Tables.read(spark, sf, "lineitem")
    val r = li.select(Sketches.hashUnit(col("l_orderkey"), ":kmv").as("h"),
        col("l_orderkey"))
      .agg(Sketches.kmvEstimate(col("h"), 256).as("est"),
        countDistinct("l_orderkey").cast("double").as("exact"))
      .head
    val (est, exact) = (r.getDouble(0), r.getDouble(1))
    val sigma = 1.0 / math.sqrt(255.0)
    assert(math.abs(est - exact) / exact < 4 * sigma,
      s"est $est vs exact $exact")
  }

  // ---- KMV quantile sketch ----------------------------------------------

  private def qsketch(df: org.apache.spark.sql.DataFrame, k: Int,
                      qs: Seq[Double]): Seq[Double] = {
    val r = df.agg(Sketches.kmvQuantiles(col("h"), col("v"), k, qs).as("q")).head
    r.getSeq[Double](0)
  }

  test("HLL estimate is bit-invariant under repartitioning (merge order)") {
    val li = Tables.read(spark, sf, "lineitem")
    val ests = Seq(1, 7, 32).map { p =>
      li.repartition(p)
        .agg(Sketches.hllEstimate(col("l_orderkey"), ":hll", 8).as("h"))
        .select(col("h._1"), col("h._2")).head
    }.map(r => (r.getDouble(0), r.getLong(1)))
    assert(ests.distinct.size == 1,
      s"max-merge registers + exact power-of-two sum must be " +
        s"order-independent, got $ests")
  }

  test("HLL duplicate keys do not move the sketch; registers match a " +
      "driver-side md5 reference") {
    val ids = (1 to 500)
    val once = ids.toDF("id")
    val dups = ids.flatMap(i => Seq.fill(4)(i)).toDF("id")
    def est(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.hllEstimate(col("id"), ":t", 8).as("h"))
        .select(col("h._1"), col("h._2")).head
    assert(est(once) == est(dups))
    // driver-side reference sketch over the same md5-prefix hash
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = Array.fill(256)(0)
    ids.foreach { i =>
      val hex = md.digest(s"$i:t".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      val reg = (h >>> 44).toInt
      val w = h & ((1L << 44) - 1)
      val rho = if (w == 0) 45 else 45 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(reg)) regs(reg) = rho
    }
    val s = regs.foldLeft(0.0)((a, r) => a + math.pow(2.0, -r))
    val v = regs.count(_ == 0)
    val e = Sketches.Hll.alpha(256) * 256 * 256 / s
    val expect = if (e <= 640.0 && v > 0) 256 * math.log(256.0 / v) else e
    val got = est(once)
    assert(got.getDouble(0) == expect && got.getLong(1) == v.toLong,
      s"engine sketch ${got} != reference ($expect, $v)")
  }

  test("HLL relative error stays inside 4 standard deviations; " +
      "linear-counting regime is near-exact on small sets") {
    val n = Tables.read(spark, sf, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    val est = Tables.read(spark, sf, "lineitem")
      .agg(Sketches.hllEstimate(col("l_orderkey"), ":hll", 8).as("h"))
      .select(col("h._1")).head.getDouble(0)
    val sd = 1.04 / math.sqrt(256.0)
    assert(math.abs(est - n) / n <= 4 * sd,
      s"HLL est $est vs exact $n outside 4 sigma ($sd)")
    // 60 distinct keys at m=256 sits deep in the linear-counting regime:
    // expected error is that of occupancy estimation, well under 4 sigma
    val smallEst = (1 to 60).toDF("id")
      .agg(Sketches.hllEstimate(col("id"), ":t2", 8).as("h"))
      .select(col("h._1")).head.getDouble(0)
    assert(math.abs(smallEst - 60.0) <= 10.0,
      s"linear counting estimate $smallEst too far from 60")
  }

  test("quantile sketch with k >= n is the exact nearest-rank quantile") {
    // values 1..100 shuffled by hash; any k >= 100 sees them all
    val d = (1 to 100).toDF("id").select(
      Sketches.hashUnit(col("id"), ":q").as("h"), col("id").cast("double").as("v"))
    val got = qsketch(d, 128, Seq(0.25, 0.5, 0.75, 0.9, 1.0))
    // nearest-rank on the full set: index ceil(q*100) of 1..100
    assert(got == Seq(25.0, 50.0, 75.0, 90.0, 100.0), got.toString)
  }

  test("quantile sketch is invariant under repartitioning (merge order)") {
    val d = Tables.read(spark, sf, "documents").select(
      Sketches.hashUnit(col("doc_id"), ":qsk").as("h"),
      size(split(col("text"), " ")).cast("double").as("v"))
    val res = Seq(1, 7, 32).map(p => qsketch(d.repartition(p), 64, Seq(0.5, 0.9)))
    assert(res.distinct.size == 1, s"merge order changed the sample: $res")
  }

  test("quantile sketch breaks hash collisions by min value, any arrival order") {
    // a 52-bit key-hash collision (same h, different v) is ~n^2/2^53
    // theoretical, but determinism must not depend on arrival order:
    // the buffer keeps the MIN value for the slot either way
    val agg = new Sketches.KMVQuantiles(8, Seq(1.0))
    val collide = Seq((0.25, 7.0), (0.25, 3.0), (0.5, 9.0))
    val fwd = collide.foldLeft(agg.zero)(agg.reduce)
    val rev = collide.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(fwd == rev, s"$fwd vs $rev")
    assert(fwd == Vector((0.25, 3.0), (0.5, 9.0)), fwd.toString)
    // and merge of disagreeing partials resolves the same way
    val b1 = agg.reduce(agg.zero, (0.25, 7.0))
    val b2 = agg.reduce(agg.zero, (0.25, 3.0))
    assert(agg.merge(b1, b2) == agg.merge(b2, b1))
    assert(agg.merge(b1, b2) == Vector((0.25, 3.0)))
  }

  test("quantile sketch estimates stay inside the 4-sigma rank band") {
    val vals = Tables.read(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("double").as("v"))
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val d = Tables.read(spark, sf, "documents").select(
      Sketches.hashUnit(col("doc_id"), ":qsk").as("h"),
      size(split(col("text"), " ")).cast("double").as("v"))
    val k = 128
    val got = qsketch(d, k, Seq(0.25, 0.5, 0.75))
    for ((q, est) <- Seq(0.25, 0.5, 0.75).zip(got)) {
      val sd = math.sqrt(q * (1 - q) / k)
      val lo = vals(math.max(0, math.ceil((q - 4 * sd) * n).toInt - 1))
      val hi = vals(math.min(n - 1, math.ceil((q + 4 * sd) * n).toInt - 1))
      assert(est >= lo && est <= hi, s"q=$q est=$est outside [$lo, $hi]")
    }
  }

  // ---- mergeable artifacts ----------------------------------------------

  test("HLL registers round-trip through parquet; merged rollup estimate " +
      "is bit-identical to the single-pass estimate") {
    val li = Tables.read(spark, sf, "lineitem")
    val single = li
      .agg(Sketches.hllEstimate(col("l_orderkey"), ":rt", 8).as("h"))
      .select(col("h._1"), col("h._2")).head
    val dir = java.nio.file.Files.createTempDirectory("hll_rt").toString
    // one artifact row per "day partition" (stand-in: l_returnflag)
    li.groupBy(col("l_returnflag"))
      .agg(Sketches.hllRegisters(col("l_orderkey"), ":rt", 8).as("regs"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Sketches.hllMergeRegisters(col("regs"), 8).as("m"))
      .select(Sketches.hllEstimateFromRegisters(col("m"), 8).as("h"))
      .select(col("h._1"), col("h._2")).head
    assert(merged == single,
      s"rollup estimate $merged != single-pass $single")
  }

  test("KMV state round-trips through parquet; merged rollup estimate " +
      "is bit-identical to the single-pass estimate") {
    val li = Tables.read(spark, sf, "lineitem")
    val single = li
      .select(Sketches.hashUnit(col("l_orderkey"), ":rt").as("h"))
      .agg(Sketches.kmvEstimate(col("h"), 256).as("e")).head.getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("kmv_rt").toString
    li.groupBy(col("l_returnflag"))
      .agg(Sketches.kmvState(
        Sketches.hashUnit(col("l_orderkey"), ":rt"), 256).as("st"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Sketches.kmvMergeState(col("st"), 256).as("m"))
      .select(Sketches.kmvEstimateFromState(col("m"), 256)).head.getDouble(0)
    assert(merged == single, s"rollup estimate $merged != single-pass $single")
  }

  test("quantile-sketch states round-trip through parquet; merged rollup " +
      "quantiles are bit-identical to the single-pass sketch") {
    val base = Tables.read(spark, sf, "documents").select(
      col("doc_id"),
      Sketches.hashUnit(col("doc_id"), ":qrt").as("h"),
      size(split(col("text"), " ")).cast("double").as("v"))
    val single = base.agg(Sketches.kmvQuantiles(col("h"), col("v"), 64,
      Seq(0.25, 0.5, 0.9)).as("q")).head.getSeq[Double](0)
    val dir = java.nio.file.Files.createTempDirectory("qsk_rt").toString
    base.groupBy((col("doc_id") % 8).as("part"))
      .agg(Sketches.kmvQuantilesState(col("h"), col("v"), 64).as("st"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Sketches.kmvQuantilesMergeState(col("st"), 64).as("st"))
      .select(Sketches.kmvQuantilesFromState(col("st"), Seq(0.25, 0.5, 0.9)))
      .head.getSeq[Double](0)
    assert(merged == single, s"rollup quantiles $merged != single $single")
  }

  test("CMS sketches round-trip through parquet; merged rollup estimates " +
      "are bit-identical to the single-pass sketch (linearity)") {
    import graft.ext.{CountMin, Dedup}
    val (d, w) = (3, 64)
    val hashed = Tables.read(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("tok"), Dedup.base60Col(col("tok")).as("h"))
    val single = hashed.agg(CountMin.sketch(col("h"), d, w)).head.getSeq[Long](0)
    val dir = java.nio.file.Files.createTempDirectory("cms_rt").toString
    hashed.groupBy((col("doc_id") % 8).as("part"))
      .agg(CountMin.sketch(col("h"), d, w).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(CountMin.mergeSketch(col("sk"), d, w)).head.getSeq[Long](0)
    assert(merged == single, "merged CMS counters != single-pass counters")
  }

  test("theta set algebra: exact below k (full-overlap, disjoint, " +
      "partial), and within 4 sigma against exact counts on the corpus") {
    import org.apache.spark.sql.Row
    def states(aIds: Seq[Int], bIds: Seq[Int], k: Int) = {
      val a = aIds.toDF("id")
        .agg(Sketches.kmvState(Sketches.hashUnit(col("id"), ":th"), k).as("a"))
      val b = bIds.toDF("id")
        .agg(Sketches.kmvState(Sketches.hashUnit(col("id"), ":th"), k).as("b"))
      a.crossJoin(b).select(
        Sketches.kmvIntersectEstimate(col("a"), col("b"), k).as("i"),
        Sketches.kmvDiffEstimate(col("a"), col("b"), k).as("d")).head
    }
    // below k both states are the exact distinct hash sets
    assert(states(1 to 50, 1 to 50, 128) == Row(50.0, 0.0))
    assert(states(1 to 50, 51 to 90, 128) == Row(0.0, 50.0))
    assert(states(1 to 50, 26 to 90, 128) == Row(25.0, 25.0))
    // corpus-scale accuracy: parts ordered in lineitem (true containment)
    val k = 256
    val part = Tables.read(spark, sf, "part")
    val li = Tables.read(spark, sf, "lineitem")
    val exactParts = part.select("p_partkey").distinct().count().toDouble
    val exactOrdered = part.select(col("p_partkey"))
      .join(li.select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey")).count().toDouble
    val r = part
      .agg(Sketches.kmvState(
        Sketches.hashUnit(col("p_partkey"), ":th2"), k).as("a"))
      .crossJoin(li.agg(Sketches.kmvState(
        Sketches.hashUnit(col("l_partkey"), ":th2"), k).as("b")))
      .select(
        Sketches.kmvIntersectEstimate(col("a"), col("b"), k).as("i"),
        Sketches.kmvDiffEstimate(col("a"), col("b"), k).as("d")).head
    // theta sampling error: sigma ~ sqrt(n/theta)/... use the KMV bound
    // on the union scale: 4 * (union/sqrt(k-1)) absolute slack
    val slack = 4.0 * (exactParts / math.sqrt(k - 1.0))
    assert(math.abs(r.getDouble(0) - exactOrdered) <= slack,
      s"intersect est ${r.getDouble(0)} vs exact $exactOrdered (±$slack)")
    assert(math.abs(r.getDouble(1) - (exactParts - exactOrdered)) <= slack,
      s"diff est ${r.getDouble(1)} vs exact ${exactParts - exactOrdered}")
  }

  test("null keys are skipped by both sketches (no crash, estimate " +
      "matches the non-null subset)") {
    val withNulls = ((1 to 400).map(i => Some(i)) ++ Seq.fill(50)(None))
      .toDF("id")
    val clean = (1 to 400).toDF("id")
    def hll(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.hllEstimate(col("id"), ":n", 8).as("h"))
        .select(col("h._1"), col("h._2")).head
    assert(hll(withNulls) == hll(clean))
    def kmv(df: org.apache.spark.sql.DataFrame) =
      df.select(Sketches.hashUnit(col("id"), ":n").as("h"))
        .agg(Sketches.kmvEstimate(col("h"), 64)).head.getDouble(0)
    assert(kmv(withNulls) == kmv(clean))
  }

  test("alpha is piecewise per Flajolet 2007: small-m constants at " +
      "p = 4/5/6, practical form above") {
    assert(Sketches.Hll.alpha(16) == 0.673)
    assert(Sketches.Hll.alpha(32) == 0.697)
    assert(Sketches.Hll.alpha(64) == 0.709)
    assert(Sketches.Hll.alpha(256) == 0.7213 / (1.0 + 1.079 / 256))
    // and the engine honours it end-to-end: p=4 estimate vs a driver-side
    // reference sketch built with alpha_16 = 0.673
    val ids = (1 to 2000)
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = Array.fill(16)(0)
    ids.foreach { i =>
      val hex = md.digest(s"$i:a4".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      val reg = (h >>> 48).toInt
      val w = h & ((1L << 48) - 1)
      val rho =
        if (w == 0) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(reg)) regs(reg) = rho
    }
    val expect = Sketches.Hll.estimate(regs, 16)
    val got = ids.toDF("id")
      .agg(Sketches.hllEstimate(col("id"), ":a4", 4).as("h"))
      .select(col("h._1"), col("h._2")).head
    assert((got.getDouble(0), got.getLong(1)) == expect,
      s"p=4 engine sketch $got != reference $expect")
  }
}
