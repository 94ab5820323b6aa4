package graft

/** Physical-plan regression net: walks EVERY registered query's executed
  * plan (planning only — nothing runs) and rejects the anti-patterns that
  * silently kill 100 TB scalability, so a refactor cannot reintroduce
  * them unnoticed:
  *
  *  - CartesianProduct / BroadcastNestedLoopJoin anywhere except the
  *    documented all-pairs exactness kernels and deliberate
  *    small-broadcast crossJoins;
  *  - broadcast of an unbounded (non-dimension) side — approximated here
  *    by rejecting BroadcastExchange fed by a fact-table scan aggregate
  *    chain (the distinct+broadcast shape removed in round 2).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose pair space is deliberately quadratic (exactness
    * baselines) or that broadcast a deliberately tiny side via crossJoin. */
  private val allowedNestedLoop = Set(
    "q_knn_cosine_topk",       // brute-force exactness baseline
    "q_dedup_embedding_cosine", // exact all-pairs decision kernel
    "q_knn_ivf")               // centroid assignment: cells x dim broadcast

  test("no accidental cartesian or nested-loop joins across the registry") {
    val offenders = Queries.all.flatMap { q =>
      val plan =
        try q.build(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: $e" }
      if (plan.startsWith("PLANNING FAILED"))
        Some(q.name -> plan.take(200))
      else {
        val nested = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (nested && !allowedNestedLoop.contains(q.name))
          Some(q.name -> "cartesian/nested-loop join in plan")
        else None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the distinct+broadcast shape stays out of the fO2 buffer queries") {
    for (name <- Seq("q_fo2_qfm_full", "q_fo2_iw_full")) {
      val plan = Queries.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"), s"$name broadcasts")
      assert(!plan.contains("HashAggregate"), s"$name aggregates (distinct?)")
    }
  }
}
