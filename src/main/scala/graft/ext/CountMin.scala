package graft.ext

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
  * fixed-size frequency estimates with one-sided error —
  * `exact <= est <= exact + eps * N` where `eps ~ e / w`, each row an
  * independent bound and the final estimate their min.
  *
  * Built as a mergeable [[Aggregator]] over [[DualHash]] base hashes, so
  * at 100 TB the sketch costs one partial aggregation (a `d*w`-long
  * array per partition, merged pairwise) and a single-row exchange —
  * the same bounded-state shape as [[Sketches.KMV]]. Every bucket index
  * is `family(r, h) % w` over the shared md5-base60 arithmetic, which
  * the DuckDB oracle reproduces term for term: even hash collisions are
  * identical on both engines, so sketch ESTIMATES (not just bounds)
  * hash-match exactly.
  */
object CountMin {

  /** The sketch: input = base60 token hash, state = d*w counters
    * (row-major), output = the flattened counter array. */
  class CMS(d: Int, w: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")

    def zero: Array[Long] = new Array[Long](d * w)

    def reduce(b: Array[Long], h: Long): Array[Long] = {
      var r = 0
      while (r < d) {
        b(r * w + (DualHash.family(r, h) % w).toInt) += 1L
        r += 1
      }
      b
    }

    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    def finish(b: Array[Long]): Seq[Long] = b.toSeq

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Sketch aggregate column over a base60-hash column. */
  def sketch(h: Column, d: Int, w: Int): Column = udaf(new CMS(d, w)).apply(h)

  /** Merge of STORED sketch arrays (array<bigint> columns): element-wise
    * sum — CMS counters are pure linear counts, so the merged sketch is
    * bit-identical to one built over the concatenated streams. This is
    * the mergeable-artifact half (write per-partition sketches to
    * parquet, roll them up at read time), same surface as
    * [[Sketches.hllMergeRegisters]] / [[Sketches.kmvMergeState]];
    * [[estimate]] already reads from any stored array column. */
  class CMSMerge(d: Int, w: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Merge aggregate over stored sketch-array columns. */
  def mergeSketch(sketchArr: Column, d: Int, w: Int): Column =
    udaf(new CMSMerge(d, w)).apply(sketchArr)

  /** Point estimate from a sketch array column for a base60-hash column:
    * min over rows of the addressed counter (codegen'd `element_at` /
    * `least`, no UDF). */
  def estimate(sketchArr: Column, h: Column, d: Int, w: Int): Column = {
    val cells = (0 until d).map { r =>
      val bucket = (lit(DualHash.famA(r)) * (h % lit(DualHash.P)) +
        lit(DualHash.famB(r))) % lit(DualHash.P) % lit(w.toLong)
      element_at(sketchArr, (lit(r.toLong * w) + bucket + lit(1L)).cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** DuckDB rendering of [[estimate]]'s bucket sums for row `r` as a CTE
    * body: per-bucket occurrence counts over `hRel` (a relation exposing
    * one base60 hash `h` per token OCCURRENCE). */
  def bucketSumsSql(r: Int, w: Int, hRel: String): String =
    s"SELECT ${DualHash.familySql(r, "h")} % $w AS b, count(*) AS c " +
      s"FROM $hRel GROUP BY 1"

  /** Scalar estimate for a hash expression against the row-`r` bucket
    * sums CTE named `sumsRel`; missing buckets (no occurrences hashed
    * there) read as 0. */
  def estimateSql(r: Int, w: Int, sumsRel: String, hExpr: String): String =
    s"COALESCE((SELECT c FROM $sumsRel " +
      s"WHERE b = ${DualHash.familySql(r, hExpr)} % $w), 0)"
}
