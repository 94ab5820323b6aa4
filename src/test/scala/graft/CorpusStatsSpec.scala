package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{CorpusStats, KMeansDet}

/** Behavioural tests for the corpus-statistics ops and the deterministic
  * fixed-point k-means.
  */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.read(spark, sf, "documents")
  private lazy val emb = Tables.read(spark, sf, "embeddings")

  test("groupedTopK is row-identical to the single global window") {
    val base = docs.select(col("doc_id"), col("lang"),
      col("n_chars").cast("double").as("score"))
    val salted = CorpusStats.groupedTopK(base, Seq(col("lang")),
      Seq(col("score").desc, col("doc_id")), col("doc_id"), k = 7)
      .select("lang", "doc_id", "score", "rk")
    val w = Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
    val global = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7).select("lang", "doc_id", "score", "rk")
    assert(salted.exceptAll(global).isEmpty && global.exceptAll(salted).isEmpty)
  }

  test("tfidf: rarer term outranks commoner term at equal tf") {
    val d = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val top = CorpusStats.tfidfTopTerms(d, k = 3)
      .filter(col("doc_id") === 1L).orderBy("rk")
      .collect().map(_.getAs[String]("term"))
    // beta (df=1) must outrank alpha (df=3) for doc 1
    assert(top.head == "beta", top.mkString(","))
  }

  test("lang quantiles are ordered and counts sum to the corpus") {
    val rows = CorpusStats.langQuantiles(docs).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("kmeans assigns every vector to a valid cluster and improves inertia") {
    val one = KMeansDet.fit(emb, k = 4, iters = 1)
    val two = KMeansDet.fit(emb, k = 4, iters = 2)
    assert(one.count() == emb.count())
    val cids = two.select("cid").distinct().as[Int].collect().toSet
    assert(cids.subsetOf((0 until 4).toSet) && cids.nonEmpty)
    val i1 = one.agg(sum("dist2")).head.getDouble(0)
    val i2 = two.agg(sum("dist2")).head.getDouble(0)
    assert(i2 <= i1 + 1e-9, s"inertia worsened: $i1 -> $i2")
  }

  test("kmeans is bit-identical across partitionings") {
    val a = KMeansDet.fit(emb, k = 4, iters = 2).orderBy("vec_id").collect()
    val b = KMeansDet.fit(emb.repartition(17, col("vec_id")), k = 4, iters = 2)
      .orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  test("kmeans matches a driver-side reference implementation exactly") {
    val pts = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val s = KMeansDet.Scale
    val q = pts.map { case (id, v) => id -> v.map(x => math.rint(x * s) / s) }
    // math.rint is half-even; Spark round is half-up — safe here because
    // float*2^18 lands exactly on .5 only for floats on the half-grid,
    // none of which occur in this fixture (asserted below).
    q.foreach(_._2.foreach(x => assert(math.abs(x * s - math.floor(x * s)) != 0.5)))
    var cents = q.take(4).map(_._2.clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var acc = 0.0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    var assignRef: Map[Long, Int] = Map.empty
    for (_ <- 1 to 2) {
      assignRef = q.map { case (id, v) =>
        id -> cents.zipWithIndex.minBy { case (c, j) => (d2(v, c), j) }._2
      }.toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        val members = q.filter(p => assignRef(p._1) == j).map(_._2)
        if (members.isEmpty) old
        else Array.tabulate(old.length) { d =>
          val sumL = members.map(v => (v(d) * s).toLong).sum
          math.floor(sumL.toDouble / members.length + 0.5) / s
        }
      }
      // final assignment after the last update
      assignRef = q.map { case (id, v) =>
        id -> cents.zipWithIndex.minBy { case (c, j) => (d2(v, c), j) }._2
      }.toMap
    }
    val got = KMeansDet.fit(emb, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == assignRef)
  }

  // ---- sourceOverlap -----------------------------------------------------

  test("sourceOverlap: identical sources estimate 1, disjoint estimate 0") {
    val c = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "A"),
      (1L, "alpha beta gamma delta epsilon zeta", "B"),   // B == A
      (2L, "one two three four five six seven eight", "C") // C disjoint
    ).toDF("doc_id", "text", "source")
    val m = CorpusStats.sourceOverlap(c, perms = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("A", "B")) == 1.0, m.toString)
    assert(m(("A", "C")) == 0.0 && m(("B", "C")) == 0.0, m.toString)
  }

  test("sourceOverlap estimates track exact shingle Jaccard on the corpus") {
    // exact per-source distinct 3-shingle sets, driver-side
    val sets = docs.collect().map(r =>
        r.getAs[String]("source") ->
          r.getAs[String]("text").split(" ").sliding(3).map(_.mkString(" ")).toSet)
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    val est = CorpusStats.sourceOverlap(docs, perms = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(est.size == sets.size * (sets.size - 1) / 2)
    // MinHash se ~ sqrt(J(1-J)/32) <= 0.0884; allow 4 sigma + estimator grain
    for (((a, b), e) <- est) {
      val j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      assert(math.abs(e - j) <= 4 * 0.0884 + 1.0 / 32,
        s"($a,$b): est $e vs exact $j")
      assert(e >= 0.0 && e <= 1.0)
    }
  }

  test("vocabOov: frequency cut with term tie-break; exact OOV counts") {
    // counts: common x6, mid x4; rare1/rare2 x2 each tie at the v=3
    // boundary -> rare1 wins by term order
    val c = Seq(
      (1L, "common common mid rare1 rare2"),
      (2L, "common common mid rare1 rare2"),
      (3L, "common common mid mid")
    ).toDF("doc_id", "text")
    val out = CorpusStats.vocabOov(c, v = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // vocab = {common, mid, rare1}; OOV = rare2 only
    assert(out(1L) == ((5L, 1L, 0.2)))
    assert(out(2L) == ((5L, 1L, 0.2)))
    assert(out(3L) == ((4L, 0L, 0.0)))
  }

  test("vocabOov: v >= distinct vocabulary means zero OOV everywhere") {
    val c = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val out = CorpusStats.vocabOov(c, v = 100).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }
}
