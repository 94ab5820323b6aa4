package graft.ext

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketches as typed Spark [[Aggregator]]s.
  *
  * The point at 100 TB: a KMV (k-minimum-values) distinct-count sketch
  * aggregates map-side to a bounded k-value state and merges
  * associatively, so estimating distinct cardinality costs one partial
  * aggregation — never the full shuffle of distinct keys that
  * count(DISTINCT) pays. Unlike HLL (Spark's approx_count_distinct,
  * whose register layout no external oracle reproduces), KMV over a
  * deterministic hash has an ORDER-INDEPENDENT state — the k smallest
  * distinct hash values are the same set under any partitioning, merge
  * tree, or task retry — so the estimate is bit-for-bit reproducible and
  * the DuckDB oracle (DISTINCT → ORDER BY → LIMIT k) hash-matches it
  * exactly. Estimator: (k-1)/h_(k) for uniform hashes on (0,1]
  * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007).
  */
object Sketches {

  /** 13 hex digits = 52 bits: the hash integer stays exactly
    * representable in a double, and the (0,1] normalization divides by a
    * power of two — both engines compute the identical value. */
  val HexDigits = 13
  val Denom: Double = 4503599627370496.0 // 2^52

  def hashUnit(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, HexDigits),
      16, 10).cast("double") + lit(1.0)) / lit(Denom)

  def hashUnitSql(keyExpr: String, salt: String): String =
    s"(CAST(CAST(concat('0x', substr(md5(concat(CAST($keyExpr AS VARCHAR), " +
      s"'$salt')), 1, $HexDigits)) AS BIGINT) AS DOUBLE) + 1.0e0) / " +
      s"${Denom.toLong}.0e0"

  /** KMV state = the k smallest DISTINCT hash values seen, kept sorted
    * ascending. reduce is O(1) for the overwhelmingly common case (value
    * above the current k-th minimum once the buffer fills). NULL keys
    * hash to NaN (see [[kmvEstimate]]) and are skipped — the same
    * null-ignoring semantics as count(DISTINCT) and the DuckDB oracle,
    * whose DISTINCT hash stream silently drops the NULL row. */
  class KMV(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    require(k >= 2, "KMV needs k >= 2")

    def zero: Seq[Double] = Vector.empty

    def reduce(b: Seq[Double], a: Double): Seq[Double] =
      if (a.isNaN) b // null key sentinel: not a distinct value
      else if (b.size >= k && a >= b.last) b
      else insert(b, a)

    def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
      b2.foldLeft(b1)(reduce)

    private def insert(b: Seq[Double], a: Double): Seq[Double] = {
      val i = b.search(a).insertionPoint
      if (i < b.size && b(i) == a) b // duplicate hash: already counted
      else {
        val nb = (b.take(i) :+ a) ++ b.drop(i)
        if (nb.size > k) nb.take(k) else nb
      }
    }

    def finish(b: Seq[Double]): Seq[Double] = b

    def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Merge of stored KMV states (array<double> columns): the k-min set
    * of a union of streams is the k-min of the per-stream k-min sets, so
    * folding stored states through the same insert path reproduces the
    * single-pass state EXACTLY — the mergeable-artifact half of the
    * sketch (write per-partition states to parquet, roll them up later;
    * see [[kmvState]]/[[kmvEstimateFromState]]). */
  class KMVMerge(k: Int)
      extends Aggregator[Seq[Double], Seq[Double], Seq[Double]] {
    private val kmv = new KMV(k)
    def zero: Seq[Double] = Vector.empty
    def reduce(b: Seq[Double], a: Seq[Double]): Seq[Double] = kmv.merge(b, a)
    def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
      kmv.merge(b1, b2)
    def finish(b: Seq[Double]): Seq[Double] = b
    def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** The stored-state form of the sketch: the sorted k-min hash set as an
    * array<double> column — write it per day/partition, [[kmvMergeState]]
    * it at rollup, read the estimate with [[kmvEstimateFromState]]. */
  def kmvState(h: Column, k: Int): Column =
    udaf(new KMV(k)).apply(coalesce(h, lit(Double.NaN)))

  /** Merge stored KMV states (exact: same state as one pass, see
    * [[KMVMerge]]). */
  def kmvMergeState(state: Column, k: Int): Column =
    udaf(new KMVMerge(k)).apply(state)

  /** The (k−1)/h_(k) estimator read off a stored state — pure column
    * arithmetic, bit-identical to the single-pass estimate. */
  def kmvEstimateFromState(state: Column, k: Int): Column =
    when(size(state) < k, size(state).cast("double"))
      .otherwise(lit((k - 1).toDouble) / element_at(state, -1))

  /** The sketch as an untyped aggregate column over a hashUnit column.
    * NULL hashes (null keys) are skipped, matching the oracle's
    * DISTINCT-stream semantics. */
  def kmvEstimate(h: Column, k: Int): Column =
    kmvEstimateFromState(kmvState(h, k), k)

  /** Theta-sketch-style set algebra over two STORED KMV states (Beyer et
    * al. SIGMOD 2007 §4; the DataSketches theta framework is the same
    * construction): let θ_X be state X's k-th minimum (or 1.0 when the
    * state holds fewer than k values — then it is the EXACT distinct
    * set), and θ = min(θ_A, θ_B). Every distinct hash below θ was
    * retained by BOTH sketches, so {h ∈ A∩B : h < θ} is an exact uniform
    * sample of the true intersection at sampling rate θ:
    *   |A ∩ B| ≈ |{h ∈ A ∩ B : h < θ}| / θ,
    * and |A \\ B| ≈ |{h ∈ A : h < θ, h ∉ B}| / θ. Deterministic — pure
    * arithmetic on the two sorted arrays (array_intersect/except +
    * filter), no re-scan of either corpus: the 100 TB form of "how big
    * is the overlap between yesterday's and today's url sets" from two
    * kilobyte artifacts. Unlike [[kmvOverlapOracleSql]]'s
    * inclusion-exclusion (which needs a union PASS over both streams),
    * this reads stored states only. */
  def kmvTheta(state: Column, k: Int): Column =
    when(size(state) < k, lit(1.0)).otherwise(element_at(state, -1))

  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmvTheta(a, k), kmvTheta(b, k))
    val common = size(filter(array_intersect(a, b), h => h < theta))
    common.cast("double") / theta
  }

  def kmvDiffEstimate(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmvTheta(a, k), kmvTheta(b, k))
    val only = size(filter(array_except(a, b), h => h < theta))
    only.cast("double") / theta
  }

  // ---- HyperLogLog ------------------------------------------------------

  /** The 52-bit hash as a raw integer (same md5 prefix as [[hashUnit]],
    * un-normalised) — the register/rank source for [[Hll]]. */
  def hashBits52(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, HexDigits),
      16, 10).cast("long")

  def hashBits52Sql(keyExpr: String, salt: String): String =
    s"CAST(concat('0x', substr(md5(concat(CAST($keyExpr AS VARCHAR), " +
      s"'$salt')), 1, $HexDigits)) AS BIGINT)"

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
    * bit-reproducible, externally-checkable register layout — the thing
    * Spark's own approx_count_distinct deliberately doesn't offer (its
    * HLL++ buffer is an internal format no oracle reproduces; this one is
    * 2^p integer registers over the documented 52-bit md5 hash, so DuckDB
    * rebuilds the identical registers in SQL and the estimate
    * hash-matches).
    *
    * Register arithmetic: `reg` = top p hash bits, `w` = low (52−p)
    * bits, rank ρ = 1-based position of w's leftmost 1-bit =
    * (53−p) − bitLength(w), with ρ = 53−p for w = 0 — all integer ops
    * rendered identically in both engines (`bin()` string length).
    *
    * Determinism under any merge tree: registers combine by max
    * (associative/commutative/idempotent), and the estimator's
    * Σ 2^−ρ is EXACT in double arithmetic — every term is a power of
    * two ≥ 2^−(53−p) and every partial sum is a multiple of that lsb
    * bounded by 2^p, so at p = 8 a partial sum needs ≤ 8+45 = 53
    * significand bits: no rounding ever occurs and summation order
    * cannot matter. The state is 2^p ints (1 KiB at p = 8) with
    * map-side partial merge — at 100 TB one single-row exchange, vs
    * KMV's k doubles; HLL's σ ≈ 1.04/√m trades ~35% worse accuracy per
    * byte of state for O(1) reduce cost and the industry-standard
    * mergeable format. Small-range correction: linear counting
    * m·ln(m/V) when E ≤ 2.5m and zero registers remain (the classic
    * bias regime); no large-range correction is needed under a 52-bit
    * hash. */
  class Hll(p: Int)
      extends Aggregator[(Int, Int), Array[Int], (Double, Long)] {
    require(p >= 4 && p <= 12, "Hll needs 4 <= p <= 12")
    private val m = 1 << p

    def zero: Array[Int] = new Array[Int](m)

    // mutable in-place update — the Aggregator contract permits reusing
    // the buffer, and a per-row Vector copy (2^p elements) would be the
    // aggregate loop's dominant allocation at real row counts. A
    // negative register is the NULL-key sentinel (see [[hllEstimate]]):
    // skipped, matching count(DISTINCT)/approx_count_distinct and the
    // oracle's null-dropping group-by spine.
    def reduce(b: Array[Int], a: (Int, Int)): Array[Int] = {
      if (a._1 >= 0 && a._2 > b(a._1)) b(a._1) = a._2
      b
    }

    def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

    def finish(b: Array[Int]): (Double, Long) = Hll.estimate(b, m)

    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    def outputEncoder: Encoder[(Double, Long)] = ExpressionEncoder()
  }

  /** [[Hll]] that finishes with its REGISTERS instead of the estimate —
    * the storable artifact form (array<int> column; 2^p ints). Write one
    * per day/partition, [[hllMergeRegisters]] them at rollup, read the
    * estimate with [[hllEstimateFromRegisters]]; max-merge associativity
    * makes the rollup estimate bit-identical to a single pass. */
  class HllSketch(p: Int) extends Aggregator[(Int, Int), Array[Int], Seq[Int]] {
    private val hll = new Hll(p)
    def zero: Array[Int] = hll.zero
    def reduce(b: Array[Int], a: (Int, Int)): Array[Int] = hll.reduce(b, a)
    def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = hll.merge(b1, b2)
    def finish(b: Array[Int]): Seq[Int] = b.toIndexedSeq
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  /** Register-wise max over stored register arrays (array<int> columns). */
  class HllMerge(p: Int) extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
    private val m = 1 << p
    def zero: Array[Int] = new Array[Int](m)
    def reduce(b: Array[Int], a: Seq[Int]): Array[Int] = {
      var i = 0
      while (i < m) { val r = a(i); if (r > b(i)) b(i) = r; i += 1 }
      b
    }
    def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Int]): Seq[Int] = b.toIndexedSeq
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  object Hll {
    /** α_m (Flajolet et al. 2007, §4): the small-m constants 0.673 /
      * 0.697 / 0.709 for m = 16/32/64, the practical closed form for
      * m ≥ 128. */
    def alpha(m: Int): Double = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }

    /** The shared estimator: raw E = α·m·m / Σ2^−ρ with the
      * linear-counting fallback m·ln(m/V) when E ≤ 2.5m and zero
      * registers remain. One code path for [[Hll.finish]] and the
      * driver-side spec references; [[hllEstimateFromRegisters]] mirrors
      * the identical constant and operation order in columns. */
    def estimate(regs: Array[Int], m: Int): (Double, Long) = {
      var s = 0.0
      var v = 0
      var i = 0
      while (i < m) {
        val r = regs(i)
        s += math.pow(2.0, -r)
        if (r == 0) v += 1
        i += 1
      }
      val e = alpha(m) * m * m / s
      val est =
        if (e <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else e
      (est, v.toLong)
    }
  }

  /** (reg, rank) input columns for [[Hll]] from a [[hashBits52]] hash. */
  def hllRegRank(h: Column, p: Int): (Column, Column) = {
    val low = 52 - p
    val w = h.bitwiseAND(lit((1L << low) - 1L))
    val reg = shiftright(h, low).cast("int")
    val rank = when(w === 0L, lit(low + 1))
      .otherwise(lit(low + 1) - length(bin(w))).cast("int")
    (reg, rank)
  }

  /** NULL-key-safe (reg, rank): a null key's md5 is null, which the
    * non-nullable tuple encoder would reject at runtime — map it to the
    * (−1, 0) sentinel the aggregator skips instead, so null keys are
    * ignored exactly as the oracle (whose null register falls off the
    * range(0, m) spine) and approx_count_distinct ignore them. */
  private def hllInput(key: Column, salt: String, p: Int): (Column, Column) = {
    val (reg, rank) = hllRegRank(hashBits52(key, salt), p)
    (coalesce(reg, lit(-1)), coalesce(rank, lit(0)))
  }

  /** The sketch as an untyped aggregate column: struct(est, n_zero). */
  def hllEstimate(key: Column, salt: String, p: Int): Column = {
    val (reg, rank) = hllInput(key, salt, p)
    udaf(new Hll(p), ExpressionEncoder[(Int, Int)]()).apply(reg, rank)
  }

  /** The registers as a storable aggregate column (array<int>, 2^p
    * elements) — the mergeable-artifact form of [[hllEstimate]]. */
  def hllRegisters(key: Column, salt: String, p: Int): Column = {
    val (reg, rank) = hllInput(key, salt, p)
    udaf(new HllSketch(p), ExpressionEncoder[(Int, Int)]()).apply(reg, rank)
  }

  /** Merge stored register arrays (register-wise max — associative,
    * commutative, idempotent: any merge tree gives the same state). */
  def hllMergeRegisters(regs: Column, p: Int): Column =
    udaf(new HllMerge(p)).apply(regs)

  /** struct(est_distinct, n_zero) read off a stored register array —
    * pure column arithmetic (Σ2^−ρ is exact in doubles, so this is
    * bit-identical to [[Hll.estimate]] on the same registers). */
  def hllEstimateFromRegisters(regs: Column, p: Int): Column = {
    val m = 1 << p
    val s = aggregate(regs, lit(0.0),
      (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
    val v = size(filter(regs, _ === 0))
    val e = lit(Hll.alpha(m) * m * m) / s
    val est = when(e <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double"))).otherwise(e)
    struct(est.as("_1"), v.cast("long").as("_2"))
  }

  /** DuckDB mirror of [[hllEstimate]]: identical register build
    * (integer shift/mask + bin-string bit length), max per register over
    * a dense range(0, m) spine, the exact Σ 2^−ρ, and the same
    * estimator with linear-counting fallback. */
  def hllOracleSql(table: String, keyExpr: String, salt: String,
                   p: Int): String = {
    val m = 1 << p
    val low = 52 - p
    val mask = (1L << low) - 1L
    val aLit = graft.expr.E.formatDouble(Hll.alpha(m))
    val m2 = graft.expr.E.formatDouble(m.toDouble * m)
    s"""WITH hv AS (SELECT ${hashBits52Sql(keyExpr, salt)} AS h FROM $table),
       | rr AS (SELECT h >> $low AS reg, h & $mask AS w FROM hv),
       | mx AS (SELECT reg, max(CASE WHEN w = 0 THEN ${low + 1}
       |   ELSE ${low + 1} - length(bin(w)) END) AS rho FROM rr GROUP BY 1),
       | regs AS (SELECT r.range AS reg, coalesce(mx.rho, 0) AS rho
       |   FROM range(0, $m) r LEFT JOIN mx ON mx.reg = r.range),
       | s AS (SELECT sum(power(2.0e0, -rho)) AS s,
       |   sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v FROM regs)
       | SELECT round(CASE WHEN $aLit * $m2 / s <= ${2.5 * m}e0 AND v > 0
       |     THEN $m.0e0 * ln($m.0e0 / v) ELSE $aLit * $m2 / s END, 6)
       |   AS "est_distinct", CAST(v AS BIGINT) AS "n_zero"
       | FROM s""".stripMargin.replace("\n", " ")
  }

  /** Quantile sketch on the same KMV backbone: the k rows with the
    * smallest key hashes form a deterministic uniform sample (the k-min
    * set is partitioning/merge-order independent, exactly like [[KMV]]),
    * and quantiles are read off the sample by nearest rank
    * (index ceil(q*m) of the value-sorted sample). Bounded mergeable
    * state — approximate quantiles over 100 TB cost one partial
    * aggregation, never a global sort — and unlike approx_percentile's
    * heap-order-dependent GK sketch, the result is bit-reproducible and
    * the DuckDB oracle (ORDER BY hash LIMIT k → same rank arithmetic)
    * hash-matches it. Error is the sampling error of k uniform draws
    * (~1/(2*sqrt(k)) rank error at k=128; ChunkSketchSpec pins a 4σ
    * accuracy law against the exact quantiles). */
  class KMVQuantiles(k: Int, qs: Seq[Double])
      extends Aggregator[(Double, Double), Seq[(Double, Double)], Seq[Double]] {
    require(k >= 2, "KMVQuantiles needs k >= 2")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")

    def zero: Seq[(Double, Double)] = Vector.empty

    def reduce(b: Seq[(Double, Double)],
               a: (Double, Double)): Seq[(Double, Double)] =
      if (b.size >= k && a._1 >= b.last._1) b else insert(b, a)

    def merge(b1: Seq[(Double, Double)],
              b2: Seq[(Double, Double)]): Seq[(Double, Double)] =
      b2.foldLeft(b1)(reduce)

    private def insert(b: Seq[(Double, Double)],
                       a: (Double, Double)): Seq[(Double, Double)] = {
      val i = b.indexWhere(_._1 >= a._1) match {
        case -1 => b.size
        case j  => j
      }
      if (i < b.size && b(i)._1 == a._1) {
        // same key hash (a 52-bit collision, odds ~n^2/2^53): one sample
        // slot, and keep the MIN value so the state stays merge-order
        // independent (total order via Double.compare; the oracle's
        // DISTINCT ON (h) ... ORDER BY h, v picks the same row)
        if (java.lang.Double.compare(a._2, b(i)._2) < 0) b.updated(i, a)
        else b
      } else {
        val nb = (b.take(i) :+ a) ++ b.drop(i)
        if (nb.size > k) nb.take(k) else nb
      }
    }

    def finish(b: Seq[(Double, Double)]): Seq[Double] = {
      val vals = b.map(_._2).sorted
      val m = vals.size
      if (m == 0) qs.map(_ => Double.NaN)
      else qs.map { q =>
        val idx = math.min(m - 1, math.max(0, math.ceil(q * m).toInt - 1))
        vals(idx)
      }
    }

    def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** The quantile sketch as an untyped aggregate column over
    * (hashUnit, value) pairs. */
  def kmvQuantiles(h: Column, v: Column, k: Int, qs: Seq[Double]): Column =
    udaf(new KMVQuantiles(k, qs),
      ExpressionEncoder[(Double, Double)]()).apply(h, v)

  /** [[KMVQuantiles]] finishing with its STATE — the k rows with the
    * smallest key hashes as an array<struct<_1:double,_2:double>> column:
    * the storable artifact form of the quantile sketch (write one per
    * partition, [[kmvQuantilesMergeState]] at rollup, read quantiles with
    * [[kmvQuantilesFromState]]). The k-min sample is merge-path
    * independent, so the rollup state is bit-identical to one pass. */
  class KMVQuantilesState(k: Int)
      extends Aggregator[(Double, Double), Seq[(Double, Double)],
        Seq[(Double, Double)]] {
    private val q = new KMVQuantiles(k, Seq(0.5))
    def zero: Seq[(Double, Double)] = Vector.empty
    def reduce(b: Seq[(Double, Double)],
               a: (Double, Double)): Seq[(Double, Double)] = q.reduce(b, a)
    def merge(b1: Seq[(Double, Double)],
              b2: Seq[(Double, Double)]): Seq[(Double, Double)] =
      q.merge(b1, b2)
    def finish(b: Seq[(Double, Double)]): Seq[(Double, Double)] = b
    def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
  }

  /** Merge of stored quantile-sketch states. */
  class KMVQuantilesMerge(k: Int)
      extends Aggregator[Seq[(Double, Double)], Seq[(Double, Double)],
        Seq[(Double, Double)]] {
    private val q = new KMVQuantiles(k, Seq(0.5))
    def zero: Seq[(Double, Double)] = Vector.empty
    def reduce(b: Seq[(Double, Double)],
               a: Seq[(Double, Double)]): Seq[(Double, Double)] =
      q.merge(b, a)
    def merge(b1: Seq[(Double, Double)],
              b2: Seq[(Double, Double)]): Seq[(Double, Double)] =
      q.merge(b1, b2)
    def finish(b: Seq[(Double, Double)]): Seq[(Double, Double)] = b
    def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
  }

  def kmvQuantilesState(h: Column, v: Column, k: Int): Column =
    udaf(new KMVQuantilesState(k),
      ExpressionEncoder[(Double, Double)]()).apply(h, v)

  def kmvQuantilesMergeState(state: Column, k: Int): Column =
    udaf(new KMVQuantilesMerge(k)).apply(state)

  /** Nearest-rank quantiles read off a stored state with pure column
    * arithmetic: value-sort the sample (`array_sort` on `_2` with `_1`
    * tiebreak is unnecessary — values sort totally as doubles after the
    * min-value collision rule), index ceil(q·m). Bit-identical to
    * [[KMVQuantiles.finish]] on the same state. */
  def kmvQuantilesFromState(state: Column, qs: Seq[Double]): Column = {
    val vals = array_sort(transform(state, s => s.getField("_2")))
    val m = size(vals)
    val reads = qs.map { q =>
      when(m === 0, lit(Double.NaN)).otherwise(
        element_at(vals,
          least(m, greatest(lit(1), ceil(lit(q) * m).cast("int")))))
    }
    array(reads: _*)
  }

  /** DuckDB mirror: k smallest key hashes → value-sorted sample → the
    * identical nearest-rank read-off, one aliased column per quantile. */
  def kmvQuantilesOracleSql(table: String, keyExpr: String, valExpr: String,
                            salt: String, k: Int,
                            qs: Seq[(Double, String)]): String = {
    val cols = qs.map { case (q, name) =>
      val qLit = graft.expr.E.formatDouble(q)
      s"""round(max(CASE WHEN rn = least(m, greatest(1,
         | CAST(ceil($qLit * m) AS BIGINT))) THEN v END), 6) AS "$name""""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")
    s"""WITH b AS (SELECT DISTINCT ON (h) ${hashUnitSql(keyExpr, salt)} AS h,
       | $valExpr AS v FROM $table ORDER BY h, v),
       | tk AS (SELECT h, v FROM b ORDER BY h LIMIT $k),
       | r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
       |   count(*) OVER () AS m FROM tk)
       | SELECT $cols FROM r""".stripMargin.replace("\n", " ")
  }

  /** DuckDB mirror: distinct hashes → k smallest → same estimator. */
  def kmvOracleSql(table: String, keyExpr: String, salt: String,
                   k: Int): String =
    s"""WITH h AS (SELECT DISTINCT ${hashUnitSql(keyExpr, salt)} AS h
       | FROM $table),
       | tk AS (SELECT h FROM h ORDER BY h LIMIT $k),
       | s AS (SELECT count(*) AS nk, max(h) AS th FROM tk)
       | SELECT round(CASE WHEN nk < $k THEN CAST(nk AS DOUBLE)
       |   ELSE ${k - 1}.0e0 / th END, 6) AS "est_distinct"
       | FROM s""".stripMargin.replace("\n", " ")

  /** DuckDB rendering of the KMV inclusion-exclusion overlap estimate
    * ([[q_kmv_overlap]]'s oracle): per-side k-min estimates plus the
    * union-stream estimate, `overlap = a + b - union` on the RAW
    * estimates, all four rounded only at output. `aRel`/`bRel` are
    * relation expressions each exposing a `_k` key column. */
  def kmvOverlapOracleSql(aRel: String, bRel: String, salt: String,
                          k: Int): String = {
    def est(rel: String, name: String) =
      s"""${name}h AS (SELECT DISTINCT ${hashUnitSql("_k", salt)} AS h
         | FROM $rel t(_k)),
         | ${name}tk AS (SELECT h FROM ${name}h ORDER BY h LIMIT $k),
         | ${name}_est AS (SELECT CASE WHEN count(*) < $k
         |   THEN CAST(count(*) AS DOUBLE)
         |   ELSE ${k - 1}.0e0 / max(h) END AS est FROM ${name}tk)"""
        .stripMargin.replace("\n", " ")
    s"""WITH ${est(aRel, "a")}, ${est(bRel, "b")},
       | ${est(s"(SELECT _k FROM $aRel t(_k) UNION ALL SELECT _k FROM $bRel t(_k))", "u")}
       | SELECT round(a.est, 6) AS "est_a", round(b.est, 6) AS "est_b",
       |   round(u.est, 6) AS "est_union",
       |   round(a.est + b.est - u.est, 6) AS "est_overlap"
       | FROM a_est a, b_est b, u_est u""".stripMargin.replace("\n", " ")
  }
}
