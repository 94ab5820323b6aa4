#!/usr/bin/env python3
"""PySpark smoke test for the graft SQL surface.

Proves the stated "PySpark DataFrame API" approach works against this
engine with zero Python-side shims: a stock pyspark session pointed at
the compiled classes, with

  spark.sql.extensions=graft.GraftExtensions

gets the native codegen'd kernels (graft_dot / graft_minhash_sig /
graft_simhash64 / graft_shingle_hashes) as plain SQL functions, and the
solver-backed scalar UDFs register through the same
graft.api.SqlFunctions.register entry point a Scala caller uses (invoked
here over py4j, as a JDBC/thrift bootstrap would).

Assertions are cross-surface value matches, not smoke-only row counts:
the SQL kernel results are checked against the identical computation
expressed in pyspark.sql.functions (dot product) and against the Scala
objects called directly over py4j (QFM fO2), so a drift between the
Python-visible surface and the Scala engine fails loudly.

Run:  python3 tools/pyspark_smoke.py        (after `sbt compile`)
"""
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")


def main() -> int:
    if not os.path.isdir(CLASSES):
        print(f"FAIL: {CLASSES} missing - run `sbt compile` first")
        return 1
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("graft-pyspark-smoke")
        .config("spark.driver.extraClassPath", CLASSES)
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    failures = []

    def check(name, got, want, exact=True):
        ok = (got == want) if exact else (
            abs(got - want) <= 1e-12 * max(1.0, abs(want)))
        print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r} want={want!r}")
        if not ok:
            failures.append(name)

    # 1. graft_dot from SQL == the same dot product built from stock
    #    pyspark functions on a generated column (codegen path vs builtin).
    df = spark.range(1, 6).select(
        F.expr("transform(sequence(1, 4), i -> cast(id * i as double))").alias("a"),
        F.expr("transform(sequence(1, 4), i -> cast(id + i as double))").alias("b"),
    )
    got = df.select(
        F.expr("graft_dot(a, b)").alias("g"),
        F.aggregate(
            F.zip_with("a", "b", lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("w"),
    ).collect()
    check("graft_dot == zip_with/aggregate dot",
          [r["g"] for r in got], [r["w"] for r in got])
    check("graft_dot literal", spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) v"
    ).head()["v"], 32.0)

    # 2. MinHash signature: shape + determinism + shingle sensitivity.
    sig = spark.sql(
        "SELECT graft_minhash_sig(split('the quick brown fox jumps', ' '), 16, 2) v"
    ).head()["v"]
    sig2 = spark.sql(
        "SELECT graft_minhash_sig(split('the quick brown fox jumps', ' '), 16, 2) v"
    ).head()["v"]
    check("graft_minhash_sig length", len(sig), 16)
    check("graft_minhash_sig deterministic", list(sig), list(sig2))

    # 3. SimHash: deterministic, and permuting tokens preserves the
    #    bag-of-shingles-free hash only for identical token sequences.
    s1, s2 = [
        spark.sql(f"SELECT graft_simhash64(split('{t}', ' ')) v").head()["v"]
        for t in ("alpha beta gamma", "alpha beta delta")
    ]
    check("graft_simhash64 discriminates", s1 != s2, True)

    # 4. Shingle hash set is sorted distinct.
    sh = spark.sql(
        "SELECT graft_shingle_hashes(split('a b a b a b c', ' '), 2) v"
    ).head()["v"]
    check("graft_shingle_hashes sorted distinct",
          list(sh), sorted(set(sh)))

    # 5. Solver UDFs registered through the Scala entry point, checked
    #    against the Scala object called directly over py4j.
    spark._jvm.graft.api.SqlFunctions.register(spark._jsparkSession)
    got_qfm = spark.sql("SELECT qfm_log10_fo2(1473.15d, 2000.0d) v").head()["v"]
    want_qfm = math.log10(
        spark._jvm.graft.functions.QfmFull.fO2(1473.15, 2000.0, 0.0))
    check("qfm_log10_fo2 SQL == Scala QfmFull.fO2", got_qfm, want_qfm,
          exact=False)
    got_iw = spark.sql("SELECT iw_log10_fo2(1673.15d, 10000.0d) v").head()["v"]
    want_iw = math.log10(
        spark._jvm.graft.functions.IwFull.fO2(1673.15, 10000.0, 0.0))
    check("iw_log10_fo2 SQL == Scala IwFull.fO2", got_iw, want_iw, exact=False)

    # 6. The join library over py4j: the as-of join called exactly as a
    #    thin Python binding would call it (Scala DataFrames + Seq
    #    marshalling), checked against a hand-computed expectation.
    ju = spark._jvm.org.apache.spark.api.python.PythonUtils
    from pyspark.sql import DataFrame as PyDF
    probes = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 2, 7)], "id long, k long, t long")
    refs = spark.createDataFrame(
        [(1, 4, 100.0), (1, 9, 200.0), (2, 8, 300.0)],
        "k long, t long, price double")
    j_out = spark._jvm.graft.ext.AsOfJoin.asof(
        probes._jdf, refs._jdf, ju.toSeq(["k"]), "t", "t",
        ju.toSeq(["price"]), ju.toSeq([]))
    rows = {r["id"]: r["price"]
            for r in PyDF(j_out, spark).collect()}
    check("AsOfJoin.asof over py4j",
          rows, {1: 100.0, 2: 200.0, 3: None})

    spark.stop()
    if failures:
        print(f"SMOKE FAILED: {failures}")
        return 1
    print("SMOKE OK: pyspark surface matches the Scala engine")
    return 0


if __name__ == "__main__":
    sys.exit(main())
