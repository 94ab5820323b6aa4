package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.VectorExpressions

/** The spark.sql.extensions route: the shared test session is built with
  * `spark.sql.extensions=graft.GraftExtensions` (see [[SparkSpec]]), the
  * same conf a cluster deployment passes to spark-submit — so these
  * queries prove the injected plain-SQL kernels resolve and match the
  * Column API bit-for-bit. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  test("injected SQL functions match the Column API bit-for-bit") {
    assert(spark.conf.get("spark.sql.extensions") == "graft.GraftExtensions")

    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 32.0)

    val text = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(
      s"SELECT graft_minhash_sig(split('$text', ' '), 8, 3) AS sig, " +
        s"graft_simhash64(split('$text', ' ')) AS sim, " +
        s"graft_shingle_hashes(split('$text', ' '), 3) AS sh")
      .collect()(0)
    import org.apache.spark.sql.functions.{split, lit}
    val viaCol = spark.range(1).select(
        VectorExpressions.minhashSig(split(lit(text), " "), 8, 3).as("sig"),
        VectorExpressions.simhash64(split(lit(text), " ")).as("sim"),
        VectorExpressions.shingleHashes(split(lit(text), " "), 3).as("sh"))
      .collect()(0)
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
  }

  test("non-literal hyper-parameters are rejected by function name") {
    val err = intercept[Exception] {
      spark.range(1).createOrReplaceTempView("graft_ext_t")
      spark.sql("SELECT graft_minhash_sig(split('a b', ' '), CAST(id AS INT), 3) " +
        "FROM graft_ext_t").collect()
    }
    assert(err.getMessage.contains("graft_minhash_sig"), err.getMessage)
  }

  test("wrong arity is rejected with usage text") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(err.getMessage.contains("graft_dot"), err.getMessage)
  }
}
