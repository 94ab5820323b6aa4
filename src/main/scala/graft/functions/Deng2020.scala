package graft.functions

/** Deng et al. (2020) Fe3+/Fe2+ model (reference
  * `Fe_redox/Fe3Fe2_models.py:419-761`): Gibbs polynomial + a 4th-order
  * Birch-Murnaghan EOS volume solve per pressure-grid point, thermal
  * pressure coefficient, trapezoid integral of dV over P, Margules
  * activities, and the outer per-row Fe3Fe2 fixed point. Parameters are the
  * "12.5molpc" fit from Deng's published code.
  *
  * dVdP depends only on (T, P): memoised per executor so the EOS work
  * collapses to distinct-condition cardinality.
  */
object Deng2020 {

  /** Memo-cache observability (round-7 bench: a 42 s cold outlier on
    * `q_fe3fe2_deng2020` was undiagnosable because the EOS memo fill was
    * invisible). Spark accumulators, not JVM statics, so executor-side
    * increments flow back to the driver with task completion on a real
    * cluster; `attach` is called by Verify/Bench after session build, and
    * the solver closure re-publishes the captured instance on the executor
    * (`ensure`, re-armed per task) so remote JVMs increment a copy that is
    * still owned by a running task — multi-executor counts are
    * approximate, local-mode counts exact (see [[ensureMetrics]]). When
    * never attached, the hot path pays one volatile null-check. */
  final case class CacheMetrics(
      volHits: org.apache.spark.util.LongAccumulator,
      volMisses: org.apache.spark.util.LongAccumulator,
      volFillNanos: org.apache.spark.util.LongAccumulator,
      dvdpHits: org.apache.spark.util.LongAccumulator,
      dvdpMisses: org.apache.spark.util.LongAccumulator,
      dvdpFillNanos: org.apache.spark.util.LongAccumulator)
      extends Serializable {
    def render: String =
      f"deng2020 volCache hits=${volHits.value} misses=${volMisses.value} " +
        f"fill=${volFillNanos.value / 1e9}%.2fs; " +
        f"dVdPCache hits=${dvdpHits.value} misses=${dvdpMisses.value} " +
        f"fill=${dvdpFillNanos.value / 1e9}%.2fs"
  }

  @volatile private var cacheMetrics: CacheMetrics = _

  def attachMetrics(spark: org.apache.spark.sql.SparkSession): CacheMetrics = {
    val sc = spark.sparkContext
    val m = CacheMetrics(
      sc.longAccumulator("graft.deng2020.volCache.hits"),
      sc.longAccumulator("graft.deng2020.volCache.misses"),
      sc.longAccumulator("graft.deng2020.volCache.fillNanos"),
      sc.longAccumulator("graft.deng2020.dVdPCache.hits"),
      sc.longAccumulator("graft.deng2020.dVdPCache.misses"),
      sc.longAccumulator("graft.deng2020.dVdPCache.fillNanos"))
    cacheMetrics = m
    m
  }

  def currentMetrics: Option[CacheMetrics] = Option(cacheMetrics)

  /** Executor-side republish of a closure-captured instance. The static
    * points at the copy of a RUNNING task: a completion listener clears it
    * when the owning task finishes, so the next task republishes its own
    * live copy instead of incrementing an accumulator whose value already
    * shipped to the driver. Increments racing a task's completion can drop
    * — multi-executor counts are approximate (observability, not
    * accounting); local mode is exact because attachMetrics installed the
    * driver's originals and this method never fires. */
  private[graft] def ensureMetrics(m: CacheMetrics): Unit =
    if (cacheMetrics == null) {
      cacheMetrics = m
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        if (cacheMetrics eq m) cacheMetrics = null
      }
    }

  val R = 8.31446261815324
  val Avogadro = 6.02214076e23
  private val tRef = 3000.0
  private val a3ToCm3 = 1e-24

  /** EOS + thermal-pressure parameter sets keyed by melt-Fe content
    * (`Fe3Fe2_models.py:462-504`, the un-rounded values from Deng's
    * published code). Tuples: (eosFe2, eosFe3, thermFe2, thermFe3,
    * formulaUnits); eos = (V_0, K_0, Kprime_0, Kprime_prime_0),
    * therm = (a, b, c). */
  private val paramSets: Map[String,
      ((Double, Double, Double, Double), (Double, Double, Double, Double),
       (Double, Double, Double), (Double, Double, Double), Double)] = Map(
    "12.5molpc" -> (
      (1180.114014, 26.94713861, 2.802531871, 0.012313472),
      (1204.763652, 23.19530062, 3.216089358, 0.009340183),
      (35.79397483, 71.10313668, 36.59545225),
      (34.52616394, 68.64429623, 35.27069116), 2.0),
    "25molpc" -> (
      (1192.011066, 23.95435759, 3.32104996, -0.008912497),
      (1256.727179, 16.12613905, 4.584011905, -0.177152954),
      (31.34712676, 62.48520005, 32.4675829),
      (30.38414264, 59.10950152, 29.64971394), 4.0))

  /** Birch-Murnaghan 4th order, Katsura & Tange (2019) eq. 27
    * (`EOSs/birch_murnaghan.py:6-42`); returns pressure in K_0's units. */
  def birchMurnaghan4(v: Double, p: (Double, Double, Double, Double)): Double = {
    val (v0, k0, kp, kpp) = p
    val x = v0 / v
    val part1 = 1.5 * k0 * (math.pow(x, 7.0 / 3.0) - math.pow(x, 5.0 / 3.0))
    val part2 = 1.0 + 0.75 * (kp - 4.0) * (math.pow(x, 2.0 / 3.0) - 1.0)
    val part3 = (9.0 * kp * kp - 63.0 * kp + 9.0 * k0 * kpp + 143.0) / 24.0
    val part4 = math.pow(math.pow(x, 2.0 / 3.0) - 1.0, 2.0)
    part1 * (part2 + part3 * part4)
  }

  private def thermalPressureCoeff(v: Double, v0: Double,
                                   t: (Double, Double, Double)): Double = {
    val (a, b, c) = t
    (a - b * (v / v0) + c * math.pow(v / v0, 2.0)) / 1000.0
  }

  /** Volume (cm3 per mole Fe) at (T, P) for the Fe2/Fe3 endmember: EOS +
    * thermal-pressure term solved for V (`Fe3Fe2_models.py:624-671`). */
  def volume(tK: Double, pBar: Double, fe3: Boolean,
             meltFe: String = "12.5molpc"): Double = {
    val (eosFe2, eosFe3, thermFe2, thermFe3, formulaUnits) = paramSets(meltFe)
    val eos = if (fe3) eosFe3 else eosFe2
    val therm = if (fe3) thermFe3 else thermFe2
    val pGPa = pBar / 1e4
    def f(v: Double): Double =
      birchMurnaghan4(v, eos) +
        thermalPressureCoeff(v, eos._1, therm) * (tK - tRef) - pGPa
    val vInit = eos._1 - 6.0 * pGPa
    val s = Solver.secant(f, vInit, vInit * 1.01, tol = 1e-10)
    // divergence fallback: 60 fixed bisection steps on the old Brent
    // bracket — deterministic, so the DuckDB oracle ([[graft.DengSql]])
    // mirrors both solver paths exactly (NaN when unbracketed)
    val vSol =
      if (s.isFinite && s > 0 && math.abs(f(s)) < 1e-8) s
      else {
        val lo0 = eos._1 * 0.3
        val hi0 = eos._1 * 2.0
        if (!(f(lo0) > 0.0) || !(f(hi0) < 0.0)) Double.NaN
        else {
          var lo = lo0
          var hi = hi0
          var it = 0
          while (it < 60) {
            val mid = (lo + hi) * 0.5
            if (f(mid) > 0.0) lo = mid else hi = mid
            it += 1
          }
          (lo + hi) * 0.5
        }
      }
    vSol / formulaUnits * Avogadro * a3ToCm3
  }

  /** trapezoid integral of dV (m3) over P (Pa) from 1 bar to P_bar with a
    * 500-bar grid (`Fe3Fe2_models.py:702-733`). */
  private val dVdPCache =
    new java.util.concurrent.ConcurrentHashMap[(Double, Double, String), java.lang.Double]()

  /** Volume at integration-grid points, cached per (T, P, endmember): the
    * grid is a fixed 500-bar lattice and the driver tables carry ~250
    * distinct temperatures, so across rows the same solves recur
    * constantly (~10k distinct entries at sf0.1 vs ~200 fresh EOS solves
    * per row without the cache). */
  private val volCache =
    new java.util.concurrent.ConcurrentHashMap[(Double, Double, Boolean, String), java.lang.Double]()
  // computeIfAbsent, not get/put: with plain get/put every task on a cold
  // executor solves the SAME grid volumes concurrently before the first
  // put lands (32 threads x ~11k entries = O(distinct x cores) duplicate
  // EOS solves, the 3.6 s first-run spike the round-4 probe measured).
  // computeIfAbsent serialises per key, so cold cost is paid once per
  // executor; the lock is per hash bin and the steady state is pure reads.
  private def volumeCached(tK: Double, p: Double, fe3: Boolean,
                           meltFe: String): Double = {
    if (volCache.size() > 500000) volCache.clear()
    val m = cacheMetrics
    if (m == null)
      volCache.computeIfAbsent((tK, p, fe3, meltFe),
        _ => volume(tK, p, fe3, meltFe)).doubleValue
    else {
      // `filled` distinguishes a real fill from a computeIfAbsent that
      // found the key (or lost the per-bin race to a concurrent filler —
      // counted as a hit, because this thread did no EOS work)
      var filled = false
      val v = volCache.computeIfAbsent((tK, p, fe3, meltFe), { _ =>
        filled = true
        val t0 = System.nanoTime()
        val r = volume(tK, p, fe3, meltFe)
        m.volFillNanos.add(System.nanoTime() - t0)
        r
      })
      if (filled) m.volMisses.add(1) else m.volHits.add(1)
      v.doubleValue
    }
  }

  def dVdP(tK: Double, pBar: Double, meltFe: String = "12.5molpc"): Double = {
    if (dVdPCache.size() > 100000) dVdPCache.clear()
    val m = cacheMetrics
    var filled = false
    // Key by the GRID LENGTH, not the raw pressure: the trapezoid runs
    // over the fixed 500-bar lattice points below pBar+step, so every
    // pBar mapping to the same point count yields the bit-identical
    // integral. Keying by raw pBar made the distinct-key count the
    // table's continuous-pressure cardinality (~600k at sf0.1), which
    // blew the 100k cap and turned the cache into clear-all thrash —
    // the round-7 "42 s cold" outlier, measured by the fill metrics as
    // 2.3M misses / 92 s of fill. Grid lengths number ~dozens, so the
    // key space is now bounded by |T| x |lengths| regardless of scale.
    // The length is computed with the SAME takeWhile float walk as the
    // fill below — no closed-form boundary drift.
    val step = 5e2
    val nGrid = Iterator.iterate(1.0)(_ + step)
      .takeWhile(_ < pBar + step).size
    val out = dVdPCache.computeIfAbsent((tK, nGrid.toDouble, meltFe), { _ =>
      filled = true
      val t0 = System.nanoTime()
      val grid = Iterator.iterate(1.0)(_ + step).take(nGrid).toArray
      val dv = grid.map(p => (volumeCached(tK, p, fe3 = true, meltFe) -
        volumeCached(tK, p, fe3 = false, meltFe)) * 1e-6)
      var integral = 0.0
      var i = 1
      while (i < grid.length) {
        integral += 0.5 * (dv(i) + dv(i - 1)) * (grid(i) - grid(i - 1)) * 1e5
        i += 1
      }
      if (m != null) m.dvdpFillNanos.add(System.nanoTime() - t0)
      integral
    }).doubleValue
    if (m != null) { if (filled) m.dvdpMisses.add(1) else m.dvdpHits.add(1) }
    out
  }

  /** Gibbs free energy at reference P (`Fe3Fe2_models.py:599-612`). */
  def gibbs0(tK: Double): Double =
    -331035.9211346371 - 190.3795512883899 * tK +
      14.785873706952849 * tK * math.log(tK) -
      0.0016487959655627517 * tK * tK + 9348044.389346942 / tK +
      10773.299613088355 * math.sqrt(tK)

  private val margules = Map("Mg" -> 68629.0, "Si" -> 4601.0, "Al" -> 40923.0,
    "Ca" -> -58109.0, "Na" -> 0.0, "K" -> -59584.0, "P" -> 0.0, "Ti" -> 0.0)
  private val feMargules = -14210.0

  /** Full deng2020: per-row fixed point on eq. 3
    * (`Fe3Fe2_models.py:565-597`); dVdP/gibbs0 hoisted per (T,P) and the
    * non-Fe Margules sum per row (r-invariant — see
    * [[Fe3Fe2Iterative.CatBase]]); each trial is pure scalar math. */
  def fe3Fe2(mol: Map[String, Double], tK: Double, pBar: Double,
             fO2: Double, meltFe: String = "12.5molpc"): Double = {
    val g0 = gibbs0(tK)
    val vdp = dVdP(tK, pBar, meltFe)
    val b = Fe3Fe2Iterative.catBase(mol)
    val sumMargules = margules.map { case (n, m) => b(n) * m }.sum
    val gTerm = -(g0 + vdp) / (R * tK)
    val lnfO2Quarter = math.log(fO2) / 4.0
    def g(r: Double): Double = {
      val lnA = (sumMargules + b.feMinusFe3(r) * feMargules) / (R * tK)
      math.exp(gTerm - lnA + lnfO2Quarter) - r
    }
    val s = Solver.secant(g, 0.3, 0.31, tol = 1e-10)
    if (s.isFinite && s > 0.0 && math.abs(g(s)) < 1e-8) s
    else {
      // g is strictly decreasing in r (feMinusFe3 decreasing x negative
      // Margules coefficient): 60 fixed bisection steps replace the Brent
      // fallback so the DuckDB oracle mirrors both paths
      if (!(g(1e-8) > 0.0) || !(g(100.0) < 0.0)) Double.NaN
      else {
        var lo = 1e-8
        var hi = 100.0
        var it = 0
        while (it < 60) {
          val mid = (lo + hi) * 0.5
          if (g(mid) > 0.0) lo = mid else hi = mid
          it += 1
        }
        (lo + hi) * 0.5
      }
    }
  }
}
