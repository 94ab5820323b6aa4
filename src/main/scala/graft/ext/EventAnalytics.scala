package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-funnel and cohort-retention analytics over the events stream —
  * the product-analytics pair every event warehouse runs nightly
  * (conversion funnels, cohort retention matrices), expressed so the
  * fact table shuffles on `user_id` ONCE and every later stage reuses
  * that partitioning.
  *
  * Scale shape (both operators):
  *  - the only corpus-scale shuffle keys events by user_id (a
  *    map-side-combinable min/count agg);
  *  - every subsequent join is user_id == user_id against a per-user
  *    aggregate, so Catalyst reuses the hash partitioning instead of
  *    re-shuffling the facts (the chained steps add ZERO data-scale
  *    exchanges beyond the first — pinned in PlanAuditSpec's budgets);
  *  - nothing broadcasts user-cardinality state and nothing collects.
  */
object EventAnalytics {

  /** Funnel steps must be >= 2 and DISTINCT: with a repeated step name
    * the batch chained-min lets one event satisfy two steps via `>=`
    * while an ordered scan consumes it once — the forms (and the
    * streaming twin) would diverge. No real funnel repeats a step. */
  private[graft] def requireFunnelSteps(steps: Seq[String]): Unit = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
  }

  /** steps_reached: 1 + the count of non-null later-step times. Shared by
    * both batch forms so the semantics cannot drift apart. */
  private def reachExpr(steps: Seq[String]) =
    steps.indices.tail.map(i =>
      when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)

  /** Strict-order, first-touch funnel: step 1 anchors at the user's
    * FIRST step-1 event; each later step takes the user's first matching
    * event at-or-after the previous step's time, all within `windowMs`
    * of the anchor. Emits one row per user who reached step 1:
    * (user_id, steps_reached, t1 .. tK) with unreached step times null.
    *
    * Same-timestamp events count toward the next step (>=, the standard
    * product-analytics convention — a click logged in the same
    * millisecond as the view still converts).
    *
    * Formulation: each step time is a conditional-min WINDOW aggregate
    * over the user partition (t2 = min click ms with ms >= t1, where t1
    * is itself the previous window column), so the whole K-step chain is
    * K unbounded-frame Window nodes sharing ONE user_id exchange and ONE
    * scan of the events table — versus the textbook K chained
    * filter-aggregate-join passes ([[funnelChained]], kept as the
    * row-equivalence reference), which scan the fact table K+1 times.
    * The per-user rollup then rides the same partitioning. */
  def funnel(events: DataFrame, steps: Seq[String],
             windowMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFunnelSteps(steps)
    val w = Window.partitionBy("user_id")
    val e = events.select(col("user_id"), col("event_type"), col("ms"))
    val withTimes = steps.zipWithIndex.tail.foldLeft(
      e.withColumn("t1",
        min(when(col("event_type") === steps.head, col("ms"))).over(w))) {
      case (df, (step, i)) =>
        df.withColumn(s"t${i + 1}",
          min(when(col("event_type") === step &&
              col("ms") >= col(s"t$i") &&
              col("ms") <= col("t1") + lit(windowMs), col("ms"))).over(w))
    }
    val reach = reachExpr(steps)
    val aggs = min(reach).as("steps_reached") +:
      steps.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    withTimes.filter(col("t1").isNotNull)
      .groupBy("user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("user_id")
  }

  /** The textbook chained filter-aggregate-join funnel — K+1 fact-table
    * scans, kept as the independent row-equivalence reference for
    * [[funnel]] (`EventAnalyticsSpec` pins both forms identical). */
  private[graft] def funnelChained(events: DataFrame, steps: Seq[String],
                                   windowMs: Long): DataFrame = {
    requireFunnelSteps(steps)
    val e = events.select(col("user_id"), col("event_type"), col("ms"))
    val s1 = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ms")).as("t1"))
    val chained = steps.zipWithIndex.tail.foldLeft(s1) {
      case (prev, (step, i)) =>
        val tPrev = s"t$i"
        val tCur = s"t${i + 1}"
        val hit = e.filter(col("event_type") === step)
          .join(prev, "user_id")
          .filter(col("ms") >= col(tPrev) &&
            col("ms") <= col("t1") + lit(windowMs))
          .groupBy("user_id")
          .agg(min(col("ms")).as(tCur))
        // left join keeps users who stalled at the previous step
        prev.join(hit, Seq("user_id"), "left")
    }
    val reach = reachExpr(steps)
    chained
      .select(col("user_id") +: reach.as("steps_reached") +:
        steps.indices.map(i => col(s"t${i + 1}")): _*)
      .orderBy("user_id")
  }

  /** DuckDB mirror of [[funnel]] (same >= chaining and window clamp).
    * `msExpr` is the BIGINT epoch-ms rendering of the timestamp. */
  def funnelOracleSql(table: String, steps: Seq[String], windowMs: Long,
                      msExpr: String = "epoch_ms(\"ts\")"): String = {
    val e = s"""__e AS (SELECT "user_id", "event_type", $msExpr AS ms FROM $table)"""
    val s1 =
      s"""__s1 AS (SELECT "user_id", min(ms) AS t1 FROM __e
         | WHERE "event_type" = '${steps.head}' GROUP BY 1)""".stripMargin
    val chain = steps.zipWithIndex.tail.map { case (step, i) =>
      val prev = s"__s$i"
      val cur = s"__s${i + 1}"
      s"""__h${i + 1} AS (SELECT e."user_id", min(e.ms) AS t${i + 1}
         | FROM __e e JOIN $prev p USING ("user_id")
         | WHERE e."event_type" = '$step' AND e.ms >= p.t$i
         |   AND e.ms <= p.t1 + $windowMs GROUP BY 1),
         | $cur AS (SELECT p.*, h.t${i + 1} FROM $prev p
         | LEFT JOIN __h${i + 1} h USING ("user_id"))""".stripMargin
    }
    val reach = steps.indices.tail
      .map(i => s"(CASE WHEN t${i + 1} IS NOT NULL THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val tCols = steps.indices.map(i => s"t${i + 1}").mkString(", ")
    (Seq(s"WITH $e", s1) ++ chain).mkString(", ").replace("\n", " ") +
      s""" SELECT "user_id", CAST(1 + $reach AS BIGINT) AS steps_reached,
         | $tCols FROM __s${steps.size} ORDER BY "user_id"""".stripMargin
        .replace("\n", " ")
  }

  /** Cohort retention matrix: users cohorted by the UTC day of their
    * first event; one row per (cohort_day, day_offset) with the count of
    * distinct users active at that offset. Day 0 row therefore equals
    * cohort size, and retention@k = n_active(k) / n_active(0).
    */
  def retentionCohorts(events: DataFrame,
                       dayMs: Long = 86400000L): DataFrame = {
    // cohort day as a window min over ONE user_id exchange (guide §2.4)
    // instead of a per-user aggregate joined back — the join form paid a
    // second scan of the fact table plus its own user_id exchange for the
    // fact side. The isNotNull filter reproduces the old INNER join's
    // null-key semantics exactly (a window would otherwise group all
    // null users together); user_id is non-null in the events contract,
    // so the filter is a no-op guard, not a behavior change.
    val ue = events.select(col("user_id"),
        expr(s"ms div $dayMs").as("day"))
      .where(col("user_id").isNotNull)
    val cohort = min(col("day")).over(Window.partitionBy("user_id"))
    ue.withColumn("cohort_day", cohort)
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Rolling distinct-active-user counts: per UTC day, the distinct
    * users active that day (DAU) and over the trailing `windowDays`
    * (WAU with the default 7). Rolling DISTINCT does not decompose into
    * a sliding sum, so the standard exact rewrite applies: dedup to
    * (user, day) FIRST — the only corpus-scale agg — then explode each
    * active-day into the `windowDays` window-end days it contributes to
    * (a fixed small factor over the already-day-deduped rows, never over
    * raw events) and count distinct users per window end. Days beyond
    * the last activity are reported too (their windows are genuinely
    * still populated); days with no activity in range show dau = 0.
    */
  def activeUsers(events: DataFrame, windowDays: Int = 7,
                  dayMs: Long = 86400000L): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val ud = events
      .select(col("user_id"), expr(s"ms div $dayMs").as("day"))
      .distinct()
    // ud is already distinct (user, day): a plain count IS the distinct
    // user count — countDistinct here would plan a redundant expand pass
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
          .as("day"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("wau"))
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
      .orderBy("day")
  }

  /** DuckDB mirror of [[activeUsers]]. */
  def activeUsersOracleSql(table: String, windowDays: Int = 7,
                           dayMs: Long = 86400000L,
                           msExpr: String = "epoch_ms(\"ts\")"): String =
    s"""WITH __ud AS (SELECT DISTINCT "user_id", $msExpr // $dayMs AS day
       |   FROM $table),
       | __dau AS (SELECT day, CAST(count(DISTINCT "user_id") AS BIGINT)
       |   AS dau FROM __ud GROUP BY 1),
       | __wau AS (SELECT day + off AS day,
       |   CAST(count(DISTINCT "user_id") AS BIGINT) AS wau
       |   FROM __ud CROSS JOIN generate_series(0, ${windowDays - 1}) t(off)
       |   GROUP BY 1)
       | SELECT day, coalesce(dau, 0) AS dau, wau
       | FROM __wau LEFT JOIN __dau USING (day) ORDER BY day""".stripMargin
      .replace("\n", " ")

  /** Per-session statistics: gaps-and-islands session assignment (a new
    * session opens after `gapMs` of inactivity) followed by a per-session
    * rollup — start/end, event count, summed value. The batch mirror of
    * [[graft.streaming.StreamingOps.sessionize]] at session granularity
    * (the existing `q_events_sessionize` reports per-user counts only).
    * One user-keyed shuffle; the window and the rollup both ride it.
    */
  def sessionStats(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    events.select(col("user_id"), col("event_id"), col("ms"), col("value"))
      .withColumn("ns",
        when(col("ms") - lag(col("ms"), 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** DuckDB mirror of [[sessionStats]] — identical (ms, event_id) window
    * order and island arithmetic. */
  def sessionStatsOracleSql(table: String, gapMs: Long = 1800000L,
                            msExpr: String = "epoch_ms(\"ts\")"): String =
    s"""WITH __e AS (SELECT "user_id", "event_id", $msExpr AS ms, "value"
       |   FROM $table),
       | __n AS (SELECT *, CASE WHEN ms - lag(ms) OVER
       |     (PARTITION BY "user_id" ORDER BY ms, "event_id") > $gapMs
       |   THEN 1 ELSE 0 END AS ns FROM __e),
       | __s AS (SELECT *, sum(ns) OVER (PARTITION BY "user_id"
       |   ORDER BY ms, "event_id" ROWS BETWEEN UNBOUNDED PRECEDING AND
       |   CURRENT ROW) AS session_id FROM __n)
       | SELECT "user_id", CAST(session_id AS BIGINT) AS session_id,
       |   min(ms) AS start_ms, max(ms) AS end_ms,
       |   CAST(count(*) AS BIGINT) AS n_events,
       |   round(sum("value"), 6) AS total_value
       | FROM __s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      .replace("\n", " ")

  /** DuckDB mirror of [[retentionCohorts]]. Spark's integer `div` and
    * DuckDB's `//` are both exact BIGINT division — no float quotient
    * anywhere near the day bucketing. */
  /** First/last-touch attribution: every conversion (`convType` event)
    * is credited to the earliest and latest touch event (`touchTypes`)
    * of the same user within `lookbackMs` at-or-before the conversion —
    * the two canonical single-touch marketing attribution models.
    *
    * Shape: ONE user_id exchange carrying two RANGE-framed windows
    * (min/max of a packed `ms*8+code` long over the lookback frame) —
    * no self-join of conversions against touches, which is the textbook
    * form and shuffles the event table twice. Packing makes the frame
    * aggregate a plain long min/max: first-touch ties at the same ms
    * resolve to the LOWEST type code, last-touch to the highest —
    * deterministic and identical in SQL.
    *
    * Output: (event_id, user_id, ms, first_touch, last_touch), one row
    * per conversion; nulls when no touch lies in the window. */
  def attribution(events: DataFrame, touchTypes: Seq[String],
                  convType: String = "purchase",
                  lookbackMs: Long = 259200000L): DataFrame = {
    require(touchTypes.nonEmpty && touchTypes.size < 8,
      s"1..7 touch types required, got $touchTypes")
    require(!touchTypes.contains(convType),
      s"conversion type $convType cannot also be a touch type")
    val code = touchTypes.zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (acc, (t, i)) =>
        when(col("event_type") === t, lit(i.toLong + 1L)).otherwise(acc)
      }
    val w = Window.partitionBy("user_id").orderBy(col("ms"))
      .rangeBetween(-lookbackMs, 0)
    def decode(packed: Column): Column = touchTypes.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (acc, (t, i)) =>
        when(packed % 8 === (i + 1).toLong, lit(t)).otherwise(acc)
      }
    events
      .withColumn("__packed", when(code.isNotNull, col("ms") * 8 + code))
      .withColumn("__ft", min(col("__packed")).over(w))
      .withColumn("__lt", max(col("__packed")).over(w))
      .where(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("ms"),
        decode(col("__ft")).as("first_touch"),
        decode(col("__lt")).as("last_touch"))
  }

  /** DuckDB rendering of [[attribution]] over the raw events `table`
    * (ms derived like the other event oracles). */
  def attributionOracleSql(table: String, touchTypes: Seq[String],
                           convType: String = "purchase",
                           lookbackMs: Long = 259200000L,
                           msExpr: String = "epoch_ms(\"ts\")"): String = {
    val code = touchTypes.zipWithIndex.map { case (t, i) =>
      s"""WHEN "event_type" = '$t' THEN ${i + 1}""" }.mkString(" ")
    val dec = (p: String) => touchTypes.zipWithIndex.map { case (t, i) =>
      s"WHEN ($p % 8) = ${i + 1} THEN '$t'" }.mkString(" ")
    s"""WITH __e0 AS (SELECT "event_id", "user_id", "event_type",
       |     $msExpr AS ms FROM $table),
       | __e AS (SELECT *, (CASE WHEN (CASE $code END) IS NOT NULL
       |     THEN ms * 8 + (CASE $code END) END) AS packed FROM __e0),
       | __f AS (SELECT *,
       |   min(packed) OVER (PARTITION BY "user_id" ORDER BY ms
       |     RANGE BETWEEN $lookbackMs PRECEDING AND CURRENT ROW) AS ft,
       |   max(packed) OVER (PARTITION BY "user_id" ORDER BY ms
       |     RANGE BETWEEN $lookbackMs PRECEDING AND CURRENT ROW) AS lt
       |   FROM __e)
       | SELECT "event_id", "user_id", ms,
       |   (CASE ${dec("ft")} END) AS first_touch,
       |   (CASE ${dec("lt")} END) AS last_touch
       | FROM __f WHERE "event_type" = '$convType'""".stripMargin
      .replace("\n", " ")
  }

  def retentionCohortsOracleSql(table: String, dayMs: Long = 86400000L,
                                msExpr: String = "epoch_ms(\"ts\")"): String =
    s"""WITH __u AS (SELECT "user_id", $msExpr // $dayMs AS day FROM $table),
       | __f AS (SELECT "user_id", min(day) AS cohort_day FROM __u GROUP BY 1)
       | SELECT cohort_day, day - cohort_day AS day_offset,
       |   CAST(count(DISTINCT "user_id") AS BIGINT) AS n_active
       | FROM __u JOIN __f USING ("user_id")
       | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")
}
