package graft

import org.apache.spark.sql.functions._
import graft.ext.Mmr

/** Behavioural laws for the MMR diversified re-ranker. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // query 0 plus: a, b (EXACT duplicate of a), c (equal relevance but
  // ORTHOGONAL to a — the diversity win), d (irrelevant, orthogonal to
  // everything). poolK covers them all.
  private lazy val emb = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),          // query
    (1L, Seq(0.7, 0.7, 0.0, 0.0)),          // a
    (2L, Seq(0.7, 0.7, 0.0, 0.0)),          // b = dup of a
    (3L, Seq(0.7, -0.7, 0.0, 0.0)),         // c: same rel, sim(c,a)=0
    (4L, Seq(0.0, 0.0, 1.0, 0.0)))          // d: rel 0, diverse
    .toDF("vec_id", "embedding")

  private def run(lambda: Double) =
    Mmr.rerank(emb, col("vec_id") === 0L, poolK = 4, selectK = 3,
        lambda = lambda)
      .orderBy("rk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))

  test("lambda=1 reduces MMR to pure relevance ranking") {
    val got = run(1.0).map(_._2)
    // relevance order: a (nid 1, tie with b broken by nid), b, c
    assert(got.toSeq == Seq(1L, 2L, 3L), got.mkString(","))
  }

  test("lambda=0.5 demotes the exact duplicate below the diverse item") {
    val got = run(0.5)
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 4L),
      s"expected the dup (nid 2) pushed out of the top-3: ${got.mkString(",")}")
    // the duplicate's would-be MMR score at step 2 is 0.5*rel - 0.5*1.0
    // (max sim to the selected identical vector is exactly 1) — strictly
    // below c's; scores are monotone nonincreasing down the ranking
    assert(got.map(_._3).toSeq.reverse == got.map(_._3).toSeq.reverse.sorted,
      s"MMR scores must be nonincreasing: ${got.map(_._3).mkString(",")}")
  }

  test("selected ids are distinct per query and ranks are 1..selectK") {
    val rows = run(0.5)
    assert(rows.map(_._2).distinct.length == rows.length)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
  }
}
