package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the payload of the latest
  * right row with the same keys and `rightTime <= leftTime` (the classic
  * point-in-time / attribution join: event → most recent prior purchase,
  * trade → prevailing quote, reading → last calibration).
  *
  * Spark has no ASOF join operator (DuckDB, Pandas and kdb do), and the
  * naive renderings are scale traps: an inequality theta-join plans as a
  * broadcast-nested-loop (O(n·m) per key), and the
  * "window over a joined explosion" form shuffles every candidate pair.
  * This is the scale-correct SINGLE-SHUFFLE rendering — no join node in
  * the plan at all:
  *
  *  1. tag both sides and union them (right payload columns ride as
  *     nulls on left rows and vice versa — columnar nulls are free);
  *  2. hash-partition by the keys and sort each partition by
  *     (time, side) — right rows sort BEFORE left rows at equal
  *     timestamps, which is exactly the inclusive `<=` semantics;
  *  3. a running `last(struct(payload), ignoreNulls)` window (unbounded
  *     preceding → current row) carries the latest right payload forward
  *     into every left row — one struct, so the winning right row arrives
  *     atomically even when some of its payload fields are null;
  *  4. keep the left rows.
  *
  * One exchange of (keys, time, payload) — never a pair explosion — and
  * the window is a running frame, evaluated in a single forward pass per
  * partition. Skew bounds are those of the key distribution, identical
  * to the sessionize operator's.
  *
  * Determinism: the right side must be unique per (keys, rightTime) —
  * two right rows tied on key+time have no defined "latest" (DuckDB's
  * ASOF join picks one arbitrarily too). Pass `tieBreak` columns to
  * collapse ties INSIDE the one shuffle: they extend the window sort, so
  * the running last() lands on the greatest tie-break row with no extra
  * window pass ([[latestPerKeyTime]] remains as the standalone
  * pre-collapse for callers that need the deduplicated right side
  * itself, at the cost of its own (keys, time) shuffle).
  */
object AsOfJoin {

  /** Deterministic tie collapse: keep, per (keys, time), the row with the
    * greatest `tieBreak` column. Use on the right side before [[asof]]
    * when key+time duplicates are possible. */
  def latestPerKeyTime(right: DataFrame, keys: Seq[String], time: String,
                       tieBreak: String): DataFrame = {
    val w = Window.partitionBy((keys :+ time).map(col): _*)
      .orderBy(col(tieBreak).desc)
    right.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  /** @param left     probe side; all its columns survive
    * @param right    reference side; must be unique per (keys, rightTime)
    * @param keys     equi-join key column names (present on both sides)
    * @param leftTime left event-time column name
    * @param rightTime right event-time column name (same orderable type)
    * @param payload  right columns carried to the output (null when no
    *                 right row precedes the left row); names must not
    *                 collide with left columns
    * @param tieBreak right columns ordering key+time ties: the row
    *                 sorting LAST (greatest values, ascending order) wins,
    *                 matching [[latestPerKeyTime]]'s keep-greatest — but
    *                 resolved inside the operator's single shuffle
    * @return left.* ++ payload, one output row per left row
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val lcols = left.columns.toSeq
    require(payload.nonEmpty, "asof needs at least one payload column")
    require(!payload.exists(lcols.contains),
      s"payload ${payload.filter(lcols.contains)} collide with left columns")
    require(keys.nonEmpty, "asof needs at least one key column")
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // tie-break columns ride as null on left rows; they only order rows
    // within (__t, __side=0) groups, where they are never null
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t") +: col("__side") +:
        tieBreak.indices.map(i => col(s"__tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the payload as ONE struct, not per-column last(): independent
    // per-column carries would mix values from DIFFERENT right rows when
    // the winning row holds a null in one payload column (ignoreNulls
    // skips just that column back to an older row) — and would diverge
    // from StreamingOps.streamingAsOf, which emits its state row
    // atomically. The struct is null on left rows (the `when`), non-null
    // on every right row even if its fields are null, so last(ignoreNulls)
    // lands on the winning right row as a unit.
    val carried = u.withColumn("__pay",
      last(when(col("__side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(lcols.map(col) ++
        payload.map(p => col("__pay").getField(p).as(p)): _*)
  }
}
