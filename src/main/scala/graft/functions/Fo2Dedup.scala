package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col}

/** Plan-level (T, P) deduplication for the EOS-solver fO2 buffers —
  * SURVEY §2.7's prescription ("fO2 depends only on (T, P, buffer,
  * shift): `distinct()` → compute → join back"), behind a conf flag.
  *
  * The two formulations and when each wins at 100 TB:
  *
  *  - **per-row memoised UDF** (default): ONE narrow stage, zero
  *    shuffle; solver cost is paid per distinct condition per executor,
  *    bounded by the memo cap with partial eviction ([[Memo]]). Right
  *    when conditions are near-unique (continuous instrument readings:
  *    distinct ≈ rows, so no dedup can win and a join-back would shuffle
  *    the full-width fact table) or when the fact side dominates cost.
  *  - **dedup-in-plan** (`spark.graft.fo2.dedupConditions=true`): project
  *    (T, P), `distinct` (a narrow two-column shuffle), run the solver
  *    UDF once per condition CLUSTER-WIDE, broadcast the solved
  *    dimension back onto the fact table — no fact-table shuffle, no
  *    per-executor recompute, no cache to thrash. Right when (T, P) is
  *    grid-like (the common physics case: instruments step temperature/
  *    pressure on a lattice), where distinct cardinality is thousands
  *    regardless of row count. If the distinct set outgrows driver
  *    memory, set `spark.graft.fo2.dedupBroadcast=false` to fall back to
  *    a shuffle join (the fact-side exchange is then the explicit price).
  *
  * Correctness is formulation-invariant: the SAME udf runs either way,
  * the join keys are null-safe (`<=>`), and every fact row matches
  * exactly one distinct condition — verified by `Fo2DedupSpec` and
  * plan-pinned by `PlanAuditSpec`. */
object Fo2Dedup {

  /** Conf flag: compute buffer fO2 over distinct (T, P) and join back. */
  val DedupKey = "spark.graft.fo2.dedupConditions"

  /** Conf flag: broadcast the solved condition dimension (default true);
    * false falls back to a shuffle join for huge distinct sets. */
  val BroadcastKey = "spark.graft.fo2.dedupBroadcast"

  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get(DedupKey, "false").toBoolean

  /** `df` + column `as` = `f(tCol, pCol)` computed once per distinct
    * (T, P) condition in the plan. */
  def withDeduped(df: DataFrame, tCol: String, pCol: String, as: String)
                 (f: (Column, Column) => Column): DataFrame = {
    val conds = df.select(col(tCol).as("__fo2_t"), col(pCol).as("__fo2_p"))
      .distinct()
    val solved0 = conds.withColumn(as, f(col("__fo2_t"), col("__fo2_p")))
    val doBcast = df.sparkSession.conf.get(BroadcastKey, "true").toBoolean
    val solved = if (doBcast) broadcast(solved0) else solved0
    df.join(solved,
        col(tCol) <=> col("__fo2_t") && col(pCol) <=> col("__fo2_p"), "left")
      .drop("__fo2_t", "__fo2_p")
  }
}
