#!/usr/bin/env python3
"""Fixture test for tools/check.py's type-aware gate.

Round 7 shipped two queries whose values matched the oracle exactly but
whose DuckDB output type was HUGEINT (arrow decimal128(38,0)) against
Spark's int64 — check.py PASSed them (Python `Decimal(n) == n`) while the
driver's type-sensitive hash failed them. This selftest pins the fix:

  1. a deliberately HUGEINT-typed oracle against an int64 spark dump
     must FAIL (exit 1);
  2. the same oracle wrapped in CAST(... AS BIGINT) must PASS (exit 0);
  3. the documented tolerances (string vs large_string) must NOT fail.

Usage: python3 tools/check_selftest.py   (exit 0 = selftest green)
"""
import contextlib
import io
import os
import shutil
import sys
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def run_case(name, spark_table, oracle_sql, want_exit):
    tmp = tempfile.mkdtemp(prefix="graft_selftest_")
    try:
        sfdir = os.path.join(tmp, "sf")
        outdir = os.path.join(tmp, "out")
        os.makedirs(sfdir)
        os.makedirs(os.path.join(outdir, "q_fixture"))
        # every table check.py views must exist; point them all at one file
        seed = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
        for t in check.TABLES:
            pq.write_table(seed, os.path.join(sfdir, f"{t}.parquet"))
        pq.write_table(spark_table,
                       os.path.join(outdir, "q_fixture", "part-0.parquet"))
        with open(os.path.join(outdir, "oracle_sql.json"), "w") as f:
            import json
            json.dump({"q_fixture": oracle_sql}, f)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got = check.main(outdir, sfdir)
        ok = got == want_exit
        print(f"{'PASS' if ok else 'FAIL'} selftest[{name}]: "
              f"check.main exit {got}, wanted {want_exit}")
        if not ok:
            print(buf.getvalue())
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    int64_sum = pa.table({"s": pa.array([6], type=pa.int64())})
    cases = [
        # DuckDB sum(BIGINT) -> HUGEINT -> decimal128(38,0): must now FAIL
        # on type even though the value (6) is equal.
        ("hugeint_vs_int64", int64_sum,
         "SELECT sum(k) AS s FROM orders", 1),
        # The shipped idiom: CAST(sum(...) AS BIGINT) -> int64: must PASS.
        ("cast_bigint", int64_sum,
         "SELECT CAST(sum(k) AS BIGINT) AS s FROM orders", 0),
        # Tolerance list: large_string vs string is rendering-only.
        ("large_string_tolerated",
         pa.table({"v": pa.array(["a"], type=pa.large_string())}),
         "SELECT 'a' AS v", 0),
    ]
    bad = [n for (n, t, q, w) in cases if not run_case(n, t, q, w)]
    # sanity: duckdb really does type bare sum(BIGINT) as HUGEINT — if a
    # future duckdb changes this, the first case would pass vacuously.
    hug = duckdb.connect().execute(
        "SELECT sum(x) FROM (SELECT CAST(1 AS BIGINT) x)").fetch_arrow_table()
    if not pa.types.is_decimal(hug.column(0).type):
        print("WARN duckdb no longer types sum(BIGINT) as HUGEINT; "
              "case 1 is vacuous")
    print("selftest:", "OK" if not bad else f"FAILED {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
