package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data layout for
  * scan pruning, the `OPTIMIZE ZORDER BY` trick from the lakehouse table
  * formats re-expressed as a plain column + range repartition.
  *
  * Why this matters at 100 TB: min/max column statistics prune parquet
  * files only along the SORT dimension — a corpus sorted by `lang` skips
  * nothing for a `n_chars` predicate. Interleaving the bits of several
  * dimensions into one key and range-partitioning by it gives every file
  * a tight min/max envelope in EVERY interleaved dimension at once
  * (locality degrades gracefully: d dimensions cost ~1/d of each
  * dimension's resolution). The key is computed with pure codegen'd bit
  * arithmetic — no UDF — so it rides whole-stage codegen, and
  * [[clusterByZ]] is one range shuffle, exactly what a nightly layout
  * job wants.
  *
  * Bit interleave, not a space-filling-curve library: bit j of dimension
  * i lands at position `j * n + i` (dimension 0 in the LOW bit — ties
  * break on the first column listed). Values are masked to the low
  * `bits` bits after clamping negatives to 0, so callers bucketize
  * however they like (clamp, quantile, hash) before interleaving.
  *
  * The reference (MagmaPandas) has no layout analogue — single-node
  * pandas never prunes files; beyond-reference pipeline surface.
  */
object ZOrder {

  /** Maximum total interleaved width: n * bits must fit a signed long. */
  private val MaxTotalBits = 63

  private def requireFits(n: Int, bits: Int): Unit = {
    require(n > 0, "zValue needs at least one dimension")
    require(bits > 0 && n * bits <= MaxTotalBits,
      s"$n dims x $bits bits = ${n * bits} > $MaxTotalBits interleaved bits")
  }

  /** Non-negative `bits`-wide view of a dimension: negatives clamp to 0,
    * overflow clamps to the mask (a saturating bucketizer, so outliers
    * cluster at the edges instead of wrapping around to the origin).
    * `floor` before the long cast: Spark's cast truncates doubles toward
    * zero while DuckDB's CAST AS BIGINT rounds to nearest, so without it
    * the two renderings diverge on fractional inputs — floor pins both
    * engines to the same bucket for ANY numeric dimension expression. */
  private def clamp(c: Column, bits: Int): Column = {
    val mask = (1L << bits) - 1
    least(greatest(floor(c).cast("long"), lit(0L)), lit(mask))
  }

  private def clampSql(e: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    s"least(greatest(CAST(floor($e) AS BIGINT), 0), $mask)"
  }

  /** Morton key of `cols`, each contributing its low `bits` bits.
    * Bit-by-bit interleave as one codegen'd expression; identical
    * arithmetic to [[zValueSql]], which is what lets registry queries
    * hash-match a DuckDB oracle on the exact key values. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    requireFits(cols.length, bits)
    val n = cols.length
    val clamped = cols.map(clamp(_, bits))
    val terms = for {
      j <- 0 until bits
      (c, i) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** DuckDB rendering of [[zValue]] — same clamp, same bit positions. */
  def zValueSql(exprs: Seq[String], bits: Int = 16): String = {
    requireFits(exprs.length, bits)
    val n = exprs.length
    val clamped = exprs.map(clampSql(_, bits))
    val terms = for {
      j <- 0 until bits
      (e, i) <- clamped.zipWithIndex
    } yield s"((($e >> $j) & 1) << ${j * n + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Reference interleave for tests: plain Scala, bit by bit. */
  private[graft] def zValueRef(vals: Seq[Long], bits: Int): Long = {
    requireFits(vals.length, bits)
    val mask = (1L << bits) - 1
    val clamped = vals.map(v => math.min(math.max(v, 0L), mask))
    var z = 0L
    for (j <- 0 until bits; (v, i) <- clamped.zipWithIndex)
      z |= ((v >> j) & 1L) << (j * vals.length + i)
    z
  }

  /** The layout job: one range shuffle on the Morton key (plus a final
    * in-partition sort), after which each output partition — and each
    * parquet file a writer emits from it — covers a compact Z-curve
    * segment, i.e. a tight min/max box in every clustered dimension. */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int = 16,
                 numPartitions: Option[Int] = None): DataFrame = {
    val z = zValue(cols, bits).as("__graft_z")
    val withZ = df.withColumn("__graft_z", z)
    val parted = numPartitions
      .map(p => withZ.repartitionByRange(p, col("__graft_z")))
      .getOrElse(withZ.repartitionByRange(col("__graft_z")))
    parted.sortWithinPartitions("__graft_z").drop("__graft_z")
  }
}
