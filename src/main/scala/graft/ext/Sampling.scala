package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted reservoir sampling — Efraimidis & Spirakis 2006 "Weighted
  * random sampling with a reservoir" (A-Res): draw u ~ U(0,1) per item,
  * rank by key u^(1/w), keep the top k. P(item in sample) is then
  * proportional to its weight without ever materializing a cumulative
  * distribution — the standard way to draw a weighted subset of an
  * unmergeable stream/corpus in one pass.
  *
  * Two departures from the textbook, both for engine-exactness:
  *
  *  - u is the [[PipelineOps.hashUniform]] draw (pure hash of the id +
  *    salt), so the sample is reproducible across runs, partitionings
  *    and engines — no RNG state, the same property every other sampler
  *    here has;
  *  - items are ranked by ln(u)/w rather than u^(1/w): ln is monotone,
  *    so the top-k set is IDENTICAL, but it avoids libm `pow`, whose
  *    last-ulp drift differs across engines (the same reasoning that
  *    fixed temperatureSample's boost at sqrt) — ln parity between the
  *    engines is already load-bearing in the Gaussian draws.
  *
  * Scale shape: one narrow projection + a distributed top-k
  * (TakeOrderedAndProject: per-partition heaps of k, driver merges k per
  * partition — never a global sort, never a full shuffle). k is
  * sample-scale; weights are read in-row. */
object Sampling {

  /** Top-`k` rows by the A-Res key. Output: the row's id + weight + the
    * rounded ranking key (ties broken by id, so the boundary is
    * deterministic even after rounding).
    *
    * Non-positive weights are FILTERED, not ranked: A-Res is only defined
    * for w > 0 — w = 0 gives key ln(u)/0 = -Inf (never sampled, silently)
    * and w < 0 flips the key's sign so the row would deterministically
    * sort FIRST, the inverse of weighted-sampling semantics. Dropping
    * them (in both engines) is the standard treatment: weight 0 means
    * "never sample", and a negative weight is malformed input that must
    * not outrank every valid row. */
  def weightedReservoir(df: DataFrame, k: Int, idCol: String,
                        weightCol: String,
                        salt: String = ":res"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val key = ln(PipelineOps.hashUniform(col(idCol), salt)) /
      col(weightCol).cast("double")
    df.where(col(weightCol).cast("double") > 0)
      .select(col(idCol), col(weightCol),
        round(key, 9).as("res_key"))
      .orderBy(col("res_key").desc, col(idCol))
      .limit(k)
  }

  /** Stratified sampling: the top `k` rows PER STRATUM by the
    * hash-uniform draw — the corpus-rebalancing primitive (equal-size
    * per-language/per-source subsets for training-mixture construction,
    * eval-set carving, per-source audits). Deterministic like every
    * sampler here: the draw is a pure hash of (id, salt), so the sample
    * is reproducible across runs, partitionings and engines, and
    * stable under corpus append (a new row only enters the sample by
    * out-ranking the boundary, never by reshuffling ranks).
    *
    * Scale shape: one narrow projection + [[CorpusStats.groupedTopK]]'s
    * two-phase salted rank — per-(stratum, salt-bucket) heads first, so
    * no task ever buffers a whole stratum (strata are data-scale: "all
    * English documents" is most of a web corpus). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int, salt: String = ":strat"): DataFrame = {
    require(k > 0, s"per-stratum sample size must be positive, got $k")
    val u = round(PipelineOps.hashUniform(col(idCol), salt), 9)
    CorpusStats.groupedTopK(
        df.select(col(stratumCol).as("stratum"), col(idCol),
          u.as("smp_key")),
        group = Seq(col("stratum")),
        order = Seq(col("smp_key"), col(idCol)),
        salt = hash(col(idCol)), k = k)
      .select(col("stratum"), col(idCol), col("smp_key"), col("rk"))
  }

  /** DuckDB rendering of [[stratifiedSample]] over `tableSql`. */
  def stratifiedSampleOracleSql(tableSql: String, stratumCol: String,
                                idCol: String, k: Int,
                                salt: String = ":strat"): String = {
    val u = PipelineOps.hashUniformSql(s""""$idCol"""", salt)
    s"""WITH u AS (SELECT "$stratumCol" AS stratum, "$idCol",
       |   round($u, 9) AS smp_key FROM $tableSql),
       | r AS (SELECT stratum, "$idCol", smp_key,
       |   row_number() OVER (PARTITION BY stratum
       |     ORDER BY smp_key, "$idCol") AS rk FROM u)
       | SELECT stratum AS "stratum", "$idCol", smp_key AS "smp_key",
       |   rk AS "rk" FROM r WHERE rk <= $k""".stripMargin.replace("\n", " ")
  }

  /** DuckDB rendering of [[weightedReservoir]] over `tableSql`. */
  def weightedReservoirOracleSql(tableSql: String, k: Int, idCol: String,
                                 weightCol: String,
                                 salt: String = ":res"): String = {
    val u = PipelineOps.hashUniformSql(s""""$idCol"""", salt)
    s"""SELECT "$idCol", "$weightCol",
       | round(ln($u) / CAST("$weightCol" AS DOUBLE), 9) AS res_key
       | FROM $tableSql
       | WHERE CAST("$weightCol" AS DOUBLE) > 0
       | ORDER BY res_key DESC, "$idCol" LIMIT $k""".stripMargin
      .replace("\n", " ")
  }
}
