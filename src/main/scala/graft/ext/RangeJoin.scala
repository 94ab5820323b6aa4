package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic interval (range) join — `left.val ∈ [right.lo, right.hi)` —
  * realised as a bucketed equi-join so Catalyst never falls back to a
  * BroadcastNestedLoopJoin on the theta predicate.
  *
  * Shape: each interval is exploded to the fixed-width buckets it covers
  * (`floor(lo/w) .. floor(hi/w)`), each left row computes its single
  * bucket `floor(val/w)`, and the two sides meet in a hash equi-join on
  * the bucket id with the exact range predicate re-applied as a residual
  * filter. A left row's bucket intersects an interval's covered-bucket
  * list at most once, so the join introduces no duplicates and needs no
  * distinct.
  *
  * At 100 TB this is the scale-safe plan: the probe side shuffles (or
  * broadcasts, when the interval table is dimension-sized — Catalyst
  * picks) on a dense integer key, and the residual filter touches only
  * bucket-collocated candidates. The explode factor is
  * `(hi - lo) / bucketWidth` per interval, guarded by
  * `spark.graft.rangejoin.maxBucketsPerInterval` (default 4096) with a
  * hard in-plan `assert_true` — a mis-sized width fails fast with a
  * named error instead of silently materialising a quadratic bucket
  * list. Pick `bucketWidth` near the median interval length: one bucket
  * per interval-length unit of width keeps both the explode factor and
  * the residual false-positive rate O(1).
  *
  * Reference analogue: MagmaPandas realises its only range semantics as
  * pandas index slicing (`calibration_range` checks,
  * `thermometers/melt.py` window filters); the generic operator is
  * beyond-reference surface for the pipeline library.
  */
object RangeJoin {

  /** Conf key bounding the per-interval explode factor. */
  val MaxBucketsKey = "spark.graft.rangejoin.maxBucketsPerInterval"

  private def maxBuckets(df: DataFrame): Long =
    df.sparkSession.conf.get(MaxBucketsKey, "4096").toLong

  /** Inner range join: rows of `left` paired with every `intervals` row
    * whose `[loCol, hiCol)` contains `left.valCol`. Output columns =
    * left columns ++ interval columns (bucket key dropped); callers
    * project/aggregate on top.
    *
    * @param bucketWidth positive bucket width in the value's units.
    */
  def rangeJoin(left: DataFrame, valCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val cap = maxBuckets(left)
    val lo = col(loCol)
    val hi = col(hiCol)
    val bLo = floor(lo / lit(bucketWidth)).cast("long")
    val bHi = floor(hi / lit(bucketWidth)).cast("long")
    // The guard lives in a filter (never pruned, unlike a dropped
    // column): assert_true yields NULL when the predicate holds and
    // throws with the message otherwise, so `.isNull` is vacuously true
    // on every surviving row.
    val guarded = intervals.where(
      assert_true(bHi - bLo < lit(cap),
        concat(lit(s"rangeJoin: interval [" ), lo.cast("string"),
          lit(", "), hi.cast("string"),
          lit(s") spans more than $cap buckets of width $bucketWidth; " +
            s"raise $MaxBucketsKey or widen bucketWidth"))).isNull)
    val exploded = guarded.withColumn("_graft_bucket",
      explode(sequence(bLo, bHi)))
    val probe = left.withColumn("_graft_bucket",
      floor(col(valCol) / lit(bucketWidth)).cast("long"))
    probe.join(exploded, Seq("_graft_bucket"))
      .where(col(valCol) >= lo && col(valCol) < hi)
      .drop("_graft_bucket")
  }

  /** Auto-width range join: picks `bucketWidth` from the intervals
    * themselves, so callers stop guessing (a guess that is too narrow
    * trips the explode cap; too wide degenerates to a near-cross-join of
    * residual filtering). One cheap aggregate job over the interval
    * (dimension) side computes:
    *
    *  - the approximate median interval length — one bucket per median
    *    length keeps both the explode factor and the residual
    *    false-positive rate O(1) per interval;
    *  - the max interval length, and clamps the width to
    *    `maxLen / maxBucketsPerInterval` so the longest interval can
    *    never exceed the explode-cap guard — skewed length
    *    distributions (many points, one huge span) pick a width that is
    *    safe by construction instead of failing fast.
    *
    * The width only tunes the plan; the result set is width-invariant
    * (the residual filter re-applies the exact predicate), so the
    * approximate percentile needs no determinism guarantee. */
  def rangeJoinAuto(left: DataFrame, valCol: String,
                    intervals: DataFrame, loCol: String,
                    hiCol: String): DataFrame = {
    val len = col(hiCol).cast("double") - col(loCol).cast("double")
    val row = intervals.agg(
      percentile_approx(len, lit(0.5), lit(10000)).as("med"),
      max(len).as("mx")).head()
    val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val mx = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    // cap - 2: rangeJoin guards bHi - bLo < cap, and floor misalignment
    // can add one bucket beyond len / width. Clamped to >= 1: a conf cap
    // of <= 2 would otherwise divide by zero (Infinity width, degenerate
    // single bucket) or flip the divisor negative and silently fall back
    // to the median width — which can then trip the very explode guard
    // this clamp exists to avoid.
    val div = math.max(1L, maxBuckets(intervals) - 2)
    val width = math.max(math.max(med, mx / div), 1e-9)
    rangeJoin(left, valCol, intervals, loCol, hiCol, width)
  }

  /** Inner interval-OVERLAP join: pairs of a left and a right interval
    * with non-empty intersection — `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅`, i.e.
    * `lLo < rHi && rLo < lHi` — optionally restricted to equal `keys`.
    *
    * Both sides explode to the fixed-width buckets they cover and meet in
    * a hash equi-join on (keys, bucket). Unlike the point-in-interval
    * join, an overlapping pair can share MANY buckets; the usual fix — a
    * `distinct` on the output — is a full extra shuffle of the result.
    * Instead each pair is kept only in its CANONICAL bucket: the bucket
    * containing `greatest(lLo, rLo)`, the overlap's left edge, which
    * lies in exactly one bucket that both sides provably cover. Dedup
    * falls out of arithmetic; the plan stays scan → explode → one hash
    * join → residual filter, with no exchange on the (potentially much
    * larger) pair output.
    *
    * With `keys` this is the scale shape for "which readings overlap
    * which maintenance windows per machine": co-partition by key, bucket
    * only within a key's timeline.
    *
    * Column names must be disjoint across the two sides (alias first). */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          bucketWidth: Double,
                          keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns $overlap appear on both sides; alias them first")
    val cap = maxBuckets(left)
    def explodeSide(df: DataFrame, lo: String, hi: String): DataFrame = {
      val bLo = floor(col(lo) / lit(bucketWidth)).cast("long")
      val bHi = floor(col(hi) / lit(bucketWidth)).cast("long")
      df.where(
          assert_true(bHi - bLo < lit(cap),
            concat(lit("intervalOverlapJoin: interval ["), col(lo).cast("string"),
              lit(", "), col(hi).cast("string"),
              lit(s") spans more than $cap buckets of width $bucketWidth; " +
                s"raise $MaxBucketsKey or widen bucketWidth"))).isNull)
        .withColumn("_graft_bucket", explode(sequence(bLo, bHi)))
    }
    explodeSide(left, lLo, lHi)
      .join(explodeSide(right, rLo, rHi), keys :+ "_graft_bucket")
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("_graft_bucket") ===
          floor(greatest(col(lLo), col(rLo)) / lit(bucketWidth)).cast("long"))
      .drop("_graft_bucket")
  }

  /** DuckDB oracle rendering of [[intervalOverlapJoin]]: the direct theta
    * join (DuckDB plans an IE-join). `selectList` projects the join (the
    * join keys appear on both sides, so `*` would collide). */
  def intervalOverlapOracleSql(selectList: String,
                               leftSql: String, lLo: String, lHi: String,
                               rightSql: String, rLo: String, rHi: String,
                               keys: Seq[String] = Nil): String = {
    val keyEq = keys.map(k => s"l.$k = r.$k AND ").mkString
    s"SELECT $selectList FROM $leftSql l JOIN $rightSql r ON " +
      s"${keyEq}l.$lLo < r.$rHi AND r.$rLo < l.$lHi"
  }

  /** DuckDB oracle rendering: the direct theta join (DuckDB plans a
    * native IE-join for it), semantically identical to the bucketed
    * plan. `leftSql`/`intervalsSql` are relation expressions (table or
    * parenthesised subquery). */
  def rangeJoinOracleSql(leftSql: String, valExpr: String,
                         intervalsSql: String, loExpr: String,
                         hiExpr: String): String =
    s"SELECT * FROM $leftSql l JOIN $intervalsSql r ON " +
      s"l.$valExpr >= r.$loExpr AND l.$valExpr < r.$hiExpr"
}
