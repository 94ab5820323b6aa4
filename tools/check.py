#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output against
the DuckDB oracle SQL and compare per-query (schema, rows, values).

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.001
"""
import json
import math
import os
import sys
import threading
import time

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# A generated oracle that DuckDB cannot bind/optimize in reasonable time
# (e.g. a lateral-alias chain the binder expands exponentially) must show
# up as a named FAIL, not hang the whole gate — that failure mode zeroed
# one driver round before the per-query cap existed.
TIMEOUT_S = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "120"))


def run_with_timeout(con, sql):
    """Execute sql, interrupting the connection after TIMEOUT_S seconds."""
    result = {}

    def work():
        try:
            result["table"] = con.execute(sql).fetch_arrow_table()
        except Exception as exc:  # surfaced by the caller
            result["error"] = exc

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(TIMEOUT_S)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        raise TimeoutError(f"oracle exceeded {TIMEOUT_S:.0f}s (interrupted)")
    if "error" in result:
        raise result["error"]
    return result["table"]


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{outdir}/{name}")
        except Exception as exc:
            print(f"FAIL {name}: no spark output ({exc})")
            n_fail += 1
            continue
        t0 = time.monotonic()
        try:
            want = run_with_timeout(con, sql)
        except Exception as exc:
            print(f"FAIL {name}: oracle sql error: {exc}")
            n_fail += 1
            continue
        oracle_s = time.monotonic() - t0
        # A slow-but-passing oracle is the round-5 hang in embryo: surface
        # it long before it reaches the driver's (uncapped) gate.
        if oracle_s > 10.0:
            print(f"WARN {name}: oracle took {oracle_s:.1f}s")
        g_cols = sorted(got.column_names)
        w_cols = sorted(want.column_names)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {want.num_rows}")
            n_fail += 1
            continue
        bad = None
        for c in g_cols:
            gv = got.column(c).to_pylist()
            wv = want.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if a == b:
                    continue
                if (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and math.isnan(a)
                    and math.isnan(b)
                ):
                    continue
                bad = (c, i, a, b)
                break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            rel = abs(a - b) / max(abs(a), abs(b), 1e-300) if isinstance(a, float) and isinstance(b, float) else None
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r} rel={rel}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows, {len(g_cols)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
