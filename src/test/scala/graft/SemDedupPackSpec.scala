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
