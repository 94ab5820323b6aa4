package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{Fo2Dedup, IwFull, QfmFull}

/** Formulation-invariance law for the conf-keyed fO2 dedup path
  * ([[graft.functions.Fo2Dedup]]): the distinct+broadcast-join plan must
  * return exactly the per-row memoised UDF's rows — including repeated
  * (T, P) conditions (the dedup's whole point) and null conditions (the
  * null-safe `<=>` join keys; a plain equi-join would DROP those rows). */
class Fo2DedupSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 1473.15, 2000.0),
      (2L, 1473.15, 2000.0), // repeated condition — must not collapse rows
      (3L, 1573.15, 5000.0),
      (4L, null, 3000.0),    // null T — null-safe join must keep the row
      (5L, 1623.15, null))   // null P
      .toDF("id", "T_K", "P_bar")
  }

  private def collectBoth(f: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): (Seq[Row], Seq[Row]) = {
    val off = f(fixture).orderBy("id").collect().toSeq
    spark.conf.set(Fo2Dedup.DedupKey, "true")
    val on =
      try f(fixture).orderBy("id").collect().toSeq
      finally spark.conf.unset(Fo2Dedup.DedupKey)
    (off, on)
  }

  test("withQfm: dedup-on rows equal memo-path rows (nulls, repeats)") {
    val (off, on) = collectBoth(df =>
      QfmFull.withQfm(df, "T_K", "P_bar", logshift = 0.3))
    assert(on == off)
    assert(on.size == 5, "null conditions must survive the join-back")
  }

  test("withIw: dedup-on rows equal memo-path rows (nulls, repeats)") {
    val (off, on) = collectBoth(df =>
      IwFull.withIw(df, "T_K", "P_bar", logshift = -0.5))
    assert(on == off)
    assert(on.size == 5)
  }

  test("Memo partial eviction drops ~cap/8, keeps the rest, counts drops") {
    val m = new graft.functions.Memo[Int, Int](cap = 64)
    val st = graft.functions.MemoStats.attach(spark, "spec.memo")
    m.attach(st)
    for (i <- 0 until 65) m.getOrFill(i)(i)
    assert(m.size == 65, "eviction fires on the NEXT lookup past the cap")
    m.getOrFill(999)(999) // size > cap -> evict 64/8 = 8, then insert
    assert(m.size == 65 - 8 + 1, s"size after partial eviction: ${m.size}")
    assert(st.evicted.value == 8L)
    assert(st.misses.value == 66L && st.hits.value == 0L)
    // 57 of the 65 original keys survive — clear-all would have kept 0
    val survivors = (0 until 65).count(m.contains)
    assert(survivors == 65 - 8,
      s"$survivors survivors; partial eviction must keep the working set")
  }

  test("dedupBroadcast=false falls back to a non-broadcast join, same rows") {
    spark.conf.set(Fo2Dedup.DedupKey, "true")
    spark.conf.set(Fo2Dedup.BroadcastKey, "false")
    try {
      val rows = QfmFull.withQfm(fixture, "T_K", "P_bar")
        .orderBy("id").collect().toSeq
      assert(rows.size == 5)
      assert(rows.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L, 5L))
    } finally {
      spark.conf.unset(Fo2Dedup.DedupKey)
      spark.conf.unset(Fo2Dedup.BroadcastKey)
    }
  }
}
