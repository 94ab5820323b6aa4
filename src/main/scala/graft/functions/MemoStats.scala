package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Deng2020-style memo observability, generalised for the fO2 EOS solvers
  * (round-9: `bench_ab/r8_deng_cache_study.md` proved a thrashing memo is
  * invisible without hit/miss/fill counters — IwFull/QfmFull now export
  * the same accumulators Deng2020 does). Attached by Verify/Bench after
  * session build; local-mode counts are exact (UDFs run in the driver
  * JVM), multi-executor counts need a per-task republish like
  * [[Deng2020.ensureMetrics]] — these caches skip that and simply report
  * nothing on remote executors (observability, not accounting). */
final case class MemoStats(name: String,
    hits: LongAccumulator, misses: LongAccumulator,
    fillNanos: LongAccumulator, evicted: LongAccumulator)
    extends Serializable {
  def render: String =
    f"$name hits=${hits.value} misses=${misses.value} " +
      f"fill=${fillNanos.value / 1e9}%.2fs evicted=${evicted.value}"

  /** One JSON object, for embedding in the Bench artifact. */
  def json: String =
    f"""{"hits":${hits.value},"misses":${misses.value},""" +
      f""""fill_s":${fillNanos.value / 1e9}%.3f,"evicted":${evicted.value}}"""
}

object MemoStats {
  def attach(spark: SparkSession, name: String): MemoStats = {
    val sc = spark.sparkContext
    MemoStats(name,
      sc.longAccumulator(s"graft.$name.hits"),
      sc.longAccumulator(s"graft.$name.misses"),
      sc.longAccumulator(s"graft.$name.fillNanos"),
      sc.longAccumulator(s"graft.$name.evicted"))
  }
}

/** Bounded per-executor memo with PARTIAL eviction — the scale-safe
  * replacement for the `if (size > cap) clear()` pattern.
  *
  * Why not clear-all: on a cap breach it throws away the ENTIRE working
  * set, so a steady stream of fresh keys degenerates to a full refill
  * every `cap` lookups — the failure mode the round-8 deng study measured
  * at ~95 s/pass (2.3M misses) before its re-key fix.
  *
  * Why not true LRU: access-order bookkeeping on the hot path needs a
  * lock (LinkedHashMap) or per-read CAS traffic, serialising the 32
  * reader threads whose whole point is lock-free steady-state reads.
  *
  * Partial eviction keeps `ConcurrentHashMap.computeIfAbsent` semantics
  * (cold fills paid once per executor, per-bin locking only on fill) and,
  * on breach, drops ~1/8 of entries in iterator order — effectively
  * random replacement. Under a working set W > cap the hit rate degrades
  * to ~cap/W instead of collapsing to ~0, and every eviction is counted
  * in the attached [[MemoStats]], so a thrashing cache is visible in the
  * Bench artifact instead of a silent time bomb. */
final class Memo[K, V](cap: Int) {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  @volatile private var stats: MemoStats = _
  private val evicting = new java.util.concurrent.atomic.AtomicBoolean(false)

  def attach(s: MemoStats): Unit = stats = s
  def size: Int = m.size()

  /** Read-only membership probe (spec hook — no fill, no eviction). */
  private[graft] def contains(k: K): Boolean = m.containsKey(k)

  def getOrFill(k: K)(fill: => V): V = {
    // Single-evictor guard: in the thrashing regime (near-unique keys,
    // every lookup a miss) ALL reader threads observe size > cap at once;
    // without the CAS each would run its own evictSome pass — n_threads x
    // cap/8 entries dropped per breach (the r9 sf0.1 bench artifact showed
    // iw.fO2Cache evicted=8.5M against only 2.2M inserts: concurrent
    // iterators double-counting each other's removals). One thread evicts,
    // the rest proceed; size overshoots by at most the in-flight fills.
    if (m.size() > cap && evicting.compareAndSet(false, true))
      try evictSome() finally evicting.set(false)
    val st = stats
    if (st == null) m.computeIfAbsent(k, _ => fill)
    else {
      var filled = false
      val v = m.computeIfAbsent(k, { _ =>
        filled = true
        val t0 = System.nanoTime()
        val r = fill
        st.fillNanos.add(System.nanoTime() - t0)
        r
      })
      if (filled) st.misses.add(1) else st.hits.add(1)
      v
    }
  }

  /** Read-only lookup: a hit is served from the map, a miss computes
    * WITHOUT inserting — the formulation for near-unique key streams
    * (the fO2 auto-probe's dedup=false regime), where insertion buys no
    * future hits and the write+evict churn is pure overhead (r14 bench:
    * iw.fO2Cache 2.98M evictions against a ~0.15 steady-state hit rate).
    * Hits/misses/fill time still feed the attached [[MemoStats]];
    * evictions cannot occur. */
  def getNoInsert(k: K)(fill: => V): V = {
    val v = m.get(k)
    val st = stats
    if (v != null) { if (st != null) st.hits.add(1); v }
    else if (st == null) fill
    else {
      st.misses.add(1)
      val t0 = System.nanoTime()
      val r = fill
      st.fillNanos.add(System.nanoTime() - t0)
      r
    }
  }

  private def evictSome(): Unit = {
    // Evict down to cap - cap/8 from the CURRENT size, not a fixed cap/8:
    // with the single-evictor guard the other threads keep inserting while
    // this pass runs, and when fills are cheap (or threads many) a fixed
    // quota falls behind and the map runs away past the cap. Sizing the
    // pass from the observed overshoot makes each pass catch up in one go;
    // at the normal breach (size = cap + 1) this is the same ~cap/8 drop
    // as before.
    val it = m.keySet().iterator()
    var n = math.max(math.max(1, cap / 8), m.size() - (cap - cap / 8))
    var dropped = 0L
    while (n > 0 && it.hasNext) { it.next(); it.remove(); n -= 1; dropped += 1 }
    val st = stats
    if (st != null) st.evicted.add(dropped)
  }
}
