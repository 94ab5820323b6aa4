package graft

import org.apache.spark.sql.functions._
import graft.ext.Skew

/** Salted-join law: row-equivalence with the plain join, and the hot key
  * actually scatters across salt partitions. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows where one key holds 80% of the big side — the shape that
  // puts 80% of a shuffle partition's work in one task
  lazy val big = spark.range(10000).select(
    when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
    col("id").as("row_id"))
  lazy val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "attr").collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"),
        saltParts = 8, bigSalt = Skew.saltFrom(col("row_id")))
      .select("k", "row_id", "attr").collect().toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("the hot key scatters across salt values; small side replicates") {
    val saltParts = 8
    val scattered = big
      .withColumn("salt", pmod(Skew.saltFrom(col("row_id")), lit(saltParts)))
      .filter(col("k") === 7L)
      .groupBy("salt").count().collect().map(r => r.getLong(1))
    assert(scattered.length == saltParts, s"only ${scattered.length} salts hit")
    // uniform-ish: no salt holds more than 2x its fair share of the hot key
    val total = scattered.sum
    assert(scattered.max <= 2 * total / saltParts,
      s"skew survived salting: ${scattered.toSeq}")
  }

  test("degenerate salts (function of the join key) are the documented trap") {
    // salting by the join key itself re-concentrates the hot key: every
    // k=7 row lands on ONE salt — the anti-pattern the scaladoc forbids
    val bad = big
      .withColumn("salt", pmod(Skew.saltFrom(col("k")), lit(8)))
      .filter(col("k") === 7L)
      .select("salt").distinct().count()
    assert(bad == 1L)
  }

  test("diagnose surfaces the planted hot key with its exact share and " +
      "skew ratio") {
    val d = Skew.diagnose(big, Seq("k"), topK = 3).orderBy("rank").collect()
    assert(d.head.getLong(1) == 7L, "rank 1 must be the planted hot key")
    val cnt = d.head.getLong(2)
    val exact = big.filter(col("k") === 7L).count()
    assert(cnt == exact)
    assert(math.abs(d.head.getDouble(3) - exact.toDouble / 10000) < 1e-6)
    // skew_ratio = cnt / (total / nkeys); with ~21 distinct keys the hot
    // key sits far above AQE's default skewedPartitionFactor of 5
    assert(d.head.getDouble(4) > 5.0,
      s"planted hot key's skew_ratio ${d.head.getDouble(4)} should scream")
  }

  // ---- compaction planner ------------------------------------------------

  // files: two partitions, sizes 1..40 scaled — includes one oversized
  // file (bigger than the whole target) that must get its own bin
  private lazy val files = (1L to 40L).map { i =>
    (i, if (i % 2 == 0) "a" else "b",
      if (i == 10L) 5000L else (i * 37) % 400 + 10)
  }.toDF("fid", "part", "bytes")
  private val target = 1000L

  test("compaction bins conserve bytes and stay contiguous from 0") {
    import graft.ext.Compaction
    val p = Compaction.plan(files, "fid", "bytes", target, Seq("part"))
    assert(p.agg(sum("bytes")).head().getLong(0) ==
      files.agg(sum("bytes")).head().getLong(0))
    for (part <- Seq("a", "b")) {
      val bins = p.filter(col("part") === part)
        .select("bin").distinct().as[Int].collect().sorted
      assert(bins.head == 0 && bins.sameElements(bins.head to bins.last),
        s"partition $part bins not contiguous: ${bins.mkString(",")}")
    }
  }

  test("no bin exceeds target + its largest file; oversized file is alone " +
      "in its bins' overage") {
    import graft.ext.Compaction
    val s = Compaction.planSummary(files, "fid", "bytes", target, Seq("part"))
      .collect()
    val maxFile = 5000L
    s.foreach { r =>
      assert(r.getLong(3) <= target + maxFile,
        s"bin ${r.get(0)}/${r.get(1)} holds ${r.getLong(3)} bytes")
    }
    // the bound is tight for bins without the oversized file
    val normal = s.filter(_.getLong(3) <= target + 400 + 10)
    assert(normal.length >= s.length - 2,
      "only bins touching the oversized file may exceed target + max normal file")
  }

  test("compaction plan is invariant under input partitioning") {
    import graft.ext.Compaction
    def run(np: Int) =
      Compaction.plan(files.repartition(np), "fid", "bytes", target,
        Seq("part")).orderBy("fid").collect().toSeq
    assert(run(1) == run(13))
  }

  test("global compaction (no partitionCols): two-phase plan is " +
      "row-identical to the literal global window") {
    import graft.ext.Compaction
    // expected = the naive single global window, simulated here by
    // binning over a forced single partition column
    val expected = Compaction.plan(
        files.withColumn("one", lit(1)), "fid", "bytes", target, Seq("one"))
      .drop("one").orderBy("fid").collect().toSeq
    val got = Compaction.plan(files, "fid", "bytes", target)
      .orderBy("fid").collect().toSeq
    assert(got == expected, "two-phase global binning diverged")
    // and invariant under input partitioning (range bucketing re-derives)
    val got13 = Compaction.plan(files.repartition(13), "fid", "bytes", target)
      .orderBy("fid").collect().toSeq
    assert(got13 == expected)
  }

  test("global compaction plans NO empty-partition (single-task) window") {
    import graft.ext.Compaction
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Compaction.plan(files, "fid", "bytes", target)
      .queryExecution.executedPlan
    // AQE wraps each stage; descend into the adaptive input plans
    val roots = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.inputPlan }
    val windows = roots.flatMap(_.collect { case w: WindowExec => w })
    assert(windows.nonEmpty, "two-phase cumsum still runs per-bucket windows")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"found a global (empty partitionSpec) window:\n$w")
    }
  }
}
