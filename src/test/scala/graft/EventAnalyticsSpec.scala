package graft

import graft.ext.EventAnalytics

/** Hand-built funnel / retention fixtures where every conversion decision
  * is checkable by inspection. */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ms")

  private val Steps = Seq("view", "click", "purchase")

  test("funnel: full conversion, stalls, missing anchor, strict order") {
    val events = ev(
      // user 1: converts fully in order
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // user 2: purchase BEFORE any click -> stalls at step 1 (strict order)
      (2L, "view", 0L), (2L, "purchase", 5L),
      // user 3: no view anywhere -> not in the funnel at all
      (3L, "click", 0L), (3L, "purchase", 1L),
      // user 4: click lands outside the anchor window -> stalls at step 1
      (4L, "view", 0L), (4L, "click", 5000L))
    val out = EventAnalytics.funnel(events, Steps, windowMs = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == ((3L, Some(0L), Some(10L), Some(20L))))
    assert(out(2L) == ((1L, Some(0L), None, None)))
    assert(out(4L) == ((1L, Some(0L), None, None)))
  }

  test("funnel: same-millisecond step counts (>=); window clamps to anchor") {
    val events = ev(
      // user 1: view and click share a timestamp -> click converts
      (1L, "view", 5L), (1L, "click", 5L), (1L, "purchase", 6L),
      // user 2: click inside the window, purchase past anchor+W (anchor
      // is t1, NOT t2) -> stalls at step 2
      (2L, "view", 0L), (2L, "click", 90L), (2L, "purchase", 150L))
    val out = EventAnalytics.funnel(events, Steps, windowMs = 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1)))).toMap
    assert(out(1L) == 3L)
    assert(out(2L) == 2L)
  }

  test("funnel: first-touch anchoring uses the EARLIEST step-1 event") {
    // the late view at 200 would let the click convert, but first-touch
    // anchors at 0 and the window (100) has closed
    val events = ev(
      (1L, "view", 0L), (1L, "view", 200L), (1L, "click", 250L))
    val out = EventAnalytics.funnel(events, Steps, windowMs = 100L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 0L)
  }

  test("window-form funnel equals the chained-join reference, fixtures " +
      "and real events") {
    val fixture = ev(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "view", 0L), (2L, "purchase", 5L),
      (3L, "click", 0L), (3L, "purchase", 1L),
      (4L, "view", 5L), (4L, "click", 5L), (4L, "purchase", 200L))
    for (w <- Seq(1L, 100L, 1000000L)) {
      assert(EventAnalytics.funnel(fixture, Steps, w).collect().toSeq ==
        EventAnalytics.funnelChained(fixture, Steps, w).collect().toSeq,
        s"window $w")
    }
    val real = Tables.eventsWithMs(spark, "/root/testdata/sf0.001")
    assert(EventAnalytics.funnel(real, Steps, 3600000L).collect().toSeq ==
      EventAnalytics.funnelChained(real, Steps, 3600000L).collect().toSeq)
  }

  test("activeUsers: WAU windows hand-checked; silent days show dau 0") {
    val day = 10L
    // (user, day) activity: user 1 on days 0 and 2; user 2 on day 0 only
    // (two events same day -> the dedup must count it once)
    val events = ev(
      (1L, "view", 1L), (1L, "view", 25L),
      (2L, "view", 3L), (2L, "click", 7L))
    val out = EventAnalytics.activeUsers(events, windowDays = 3, dayMs = day)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // trailing-3 windows: d0 {1,2}; d1 covers day 0 {1,2}; d2 {1,2};
    // d3 covers day 2 {1}; d4 {1}
    assert(out == Map(
      0L -> ((2L, 2L)), 1L -> ((0L, 2L)), 2L -> ((1L, 2L)),
      3L -> ((0L, 1L)), 4L -> ((0L, 1L))))
  }

  test("sessionStats: gap splits sessions; rollups exact") {
    val events = Seq(
      (1L, 10L, 0L, 1.5), (1L, 11L, 10L, 2.5), (1L, 12L, 100L, 4.0),
      (2L, 20L, 5L, 1.0)
    ).toDF("user_id", "event_id", "ms", "value")
    val out = EventAnalytics.sessionStats(events, gapMs = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == Map(
      (1L, 0L) -> ((0L, 10L, 2L, 4.0)),   // events at 0 and 10 merge
      (1L, 1L) -> ((100L, 100L, 1L, 4.0)), // 90ms gap opens session 1
      (2L, 0L) -> ((5L, 5L, 1L, 1.0))))
  }

  test("pagerank: hand-computed path graph; symmetry and mass") {
    import graft.ext.GraphOps
    // path a(1) - b(2) - c(3): deg a=1 b=2 c=1, n=3, teleport 0.15/3
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r1 = GraphOps.pagerank(pairs, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // one round: a = c = 0.05 + 0.85 * (1/3)/2; b = 0.05 + 0.85 * 2/3
    assert(r1(1L) == 0.191667 && r1(3L) == 0.191667, r1.toString)
    assert(r1(2L) == 0.616667, r1.toString)
    val r3 = GraphOps.pagerank(pairs, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r3(1L) == r3(3L), "path symmetry must survive iteration")
    assert(r3(2L) > r3(1L), "the hub must outrank the leaves")
    assert(math.abs(r3.values.sum - 1.0) < 1e-4,
      s"rank mass must stay ~1, got ${r3.values.sum}")
  }

  test("retention cohorts: day-0 row is cohort size; offsets exact") {
    val day = 10L // tiny "day" so fixtures stay readable
    val events = ev(
      // cohort day 0: users 1, 2. user 1 active days 0, 1, 3; user 2 day 0
      (1L, "view", 1L), (1L, "view", 12L), (1L, "view", 33L),
      (2L, "view", 5L),
      // cohort day 2: user 3, active days 2 and 3
      (3L, "view", 21L), (3L, "view", 30L))
    val out = EventAnalytics.retentionCohorts(events, dayMs = day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (2L, 0L) -> 1L, (2L, 1L) -> 1L))
  }
}
