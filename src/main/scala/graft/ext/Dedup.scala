package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Exact dedup: keep the smallest doc_id per fingerprint, count members.
    * Shuffles md5(16B)+id, not text. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(md5(col("text").cast("binary")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count("*").cast("double").as("dup_count"))

  /** Word shingles of size n as an array column (built from the token array
    * with higher-order functions — stays in whole-stage codegen). */
  def shingles(tokens: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(tokens) - lit(n), lit(0)))
    transform(idx, i => concat_ws(" ", slice(tokens, i + lit(1), lit(n))))
  }

  /** MinHash signature: for each of k seeds, min over shingle hashes.
    * xxhash64(seed, shingle) gives k independent hash families. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** doc_id + minhash signature (k hashes) + LSH band keys (k/rows bands of
    * `rowsPerBand` hashes, each hashed to one bucket key). */
  def minhashLsh(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val nBands = k / rowsPerBand
    val sig = docs
      .select(col("doc_id"),
        shingles(split(col("text"), " "), 3).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))
    val bands = array((0 until nBands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
        col("sig").getItem(b * rowsPerBand + r)): _*)
    }: _*)
    sig.select(col("doc_id"), col("sig"), bands.as("bands"))
  }

  /** Candidate near-dup pairs: documents sharing at least one LSH bucket.
    * Shuffle payload is (band, bucket, doc_id) only. */
  def minhashCandidates(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val lsh = minhashLsh(docs, k, rowsPerBand)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    lsh.as("a").join(lsh.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash from the token array: per-bit majority vote of token
    * hashes, as pure column expressions (bit tests via shiftright & 1). */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
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
                        k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_distinct(shingles(split(col("text"), " "), 3)).as("sh"))
    val cands = minhashCandidates(docs, k, rowsPerBand)
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
