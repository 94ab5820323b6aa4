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
import pyarrow as pa
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


def canon_type(t) -> str:
    """Canonical Arrow type name, folding only the differences that the
    driver's hash is known NOT to care about. Everything else must match
    exactly: the driver's dual-engine hash is type-sensitive, and a DuckDB
    HUGEINT (arrow decimal128(38,0)) against Spark's int64 cost round 7 two
    red rows even though every value was equal — this function is what keeps
    the local gate as strict as the driver's.

    Documented tolerances (rendering-only differences):
      - string == large_string (duckdb emits either by version/size)
      - binary == large_binary
      - timestamp unit (us vs ns) and timezone presence
      - list == large_list (element types still compared, recursively)
    """
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        fields = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{fields}>"
    return str(t)


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
        type_bad = None
        for c in g_cols:
            gt = got.schema.field(c).type
            wt = want.schema.field(c).type
            if canon_type(gt) != canon_type(wt):
                type_bad = (c, gt, wt)
                break
        if type_bad:
            c, gt, wt = type_bad
            print(f"FAIL {name}: col {c} type spark={gt} != duck={wt} "
                  f"(driver hash is type-sensitive)")
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
