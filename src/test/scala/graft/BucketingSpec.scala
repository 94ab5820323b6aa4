package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusIO

/** The co-located-join layout: two tables bucketed by the same key into
  * the same bucket count join with no shuffle on either side — the
  * pre-shuffled layout a 100 TB fact-to-fact join needs (a runtime
  * shuffle of either side at that scale dwarfs the join itself). */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed-by-key tables join with no exchange on either side") {
    val facts = (1L to 1000L).map(i => (i, i % 7, s"v$i")).toDF("k", "grp", "payload")
    val dims = (1L to 500L).map(i => (i, i * 2.0)).toDF("k", "score")
    CorpusIO.writeBucketed(facts, "graft_bucketed_facts", Seq("k"), 8)
    CorpusIO.writeBucketed(dims, "graft_bucketed_dims", Seq("k"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the assertion targets the shuffle-free SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_facts")
        .join(spark.table("graft_bucketed_dims"), "k")
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      // the same join from plain (unbucketed) frames DOES shuffle — the
      // layout, not the data size, is what removed the exchanges
      val unbucketed = facts.join(dims, "k")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val a = (1L to 100L).map(i => (i, i)).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, -i)).toDF("k", "vb")
    CorpusIO.writeBucketed(a, "graft_bucketed_a8", Seq("k"), 8)
    CorpusIO.writeBucketed(b, "graft_bucketed_b4", Seq("k"), 4)
    try {
      val joined = spark.table("graft_bucketed_a8")
        .join(spark.table("graft_bucketed_b4"), "k")
      assert(joined.count() == 100) // correctness holds regardless of layout
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a8")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b4")
    }
  }
}
