package graft

import org.apache.spark.sql.Row
import graft.expr._
import graft.expr.E._

/** The CSE pass must be a pure refactoring: expanded stages evaluate to
  * exactly the values of the original stage. This guards the one blind spot
  * of the DuckDB gate — engine and oracle both consume the rewritten
  * stages, so a rewrite bug would be wrong-but-consistent there. */
class CseSpec extends SparkSpec {

  private val den: E = C("a") / Lit(60.0) + C("b") / Lit(71.8) + C("c") / Lit(40.3)

  private val stage = Stage(Seq(
    "a_n" -> (C("a") / Lit(60.0)) / den,
    "b_n" -> (C("b") / Lit(71.8)) / den,
    "c_n" -> (C("c") / Lit(40.3)) / den,
    "flag" -> If((den > Lit(1.0)) && (C("a") > C("b")), den * Lit(2.0), -den),
    "plain" -> (C("a") + Lit(1.0))))

  test("expand hoists the repeated denominator") {
    val stages = Cse.expand(stage)
    assert(stages.size >= 2, "expected a prelude stage")
    val hoisted = stages.init.flatMap(_.cols.map(_._1)).filter(_.startsWith("_cse"))
    assert(hoisted.nonEmpty)
    // final stage keeps the original output columns, no temps leak
    assert(stages.last.cols.map(_._1) == stage.cols.map(_._1))
  }

  test("expanded stages evaluate bit-identically to the original stage") {
    import spark.implicits._
    val df = Seq((48.2, 9.1, 7.7), (51.0, 11.2, 4.4), (45.5, 0.0, 16.0))
      .toDF("a", "b", "c")
    def run(stages: Seq[Stage]): Seq[Row] =
      Pipeline.applySpark(df, stages).collect().toSeq
    val plain = run(Seq(stage))
    val expanded = run(Cse.expand(stage))
    assert(plain == expanded) // exact Row equality: identical doubles
  }

  test("cse'd sql and spark agree on a staged conversion query") {
    // q_moles goes through Staged (hence Cse) — its SQL must keep rendering
    // a consistent WITH-chain after expansion.
    val sql = Queries.oracleSql("q_moles")
    assert(sql.contains("WITH") && sql.toLowerCase.contains("_cse"))
  }
}
