#!/usr/bin/env python3
"""Synthesize a LARGER deterministic dataset from an existing testdata SF by
replicating every table k times with shifted integer keys — for SCALING
measurements only (guide §1: validate that a restructure's speedup is not a
small-SF artifact). Key shifts break the oracle's derived-value contract
(sample_id uniqueness, modulo-derived compositions differ per copy), so the
output is never used for correctness runs; the driver's oracle gate always
runs on the pristine SFs.

Usage: python3 tools/make_scale_data.py /root/testdata/sf0.1 /root/scale/sf1 10
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC, DST, K = sys.argv[1], sys.argv[2], int(sys.argv[3])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# per-table integer key columns to shift per copy (offset = i * span where
# span = 4 * max(key) rounded up — keeps copies disjoint); string/array
# payloads are replicated verbatim
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

import os

os.makedirs(DST, exist_ok=True)
for t in TABLES:
    src = f"{SRC}/{t}.parquet"
    tab = pq.read_table(src)
    keys = SHIFT_KEYS.get(t, [])
    if not keys or K == 1:
        pq.write_table(tab, f"{DST}/{t}.parquet")
        print(f"{t}: copied ({tab.num_rows} rows)")
        continue
    spans = {}
    for kcol in keys:
        mx = pc.max(tab.column(kcol)).as_py() or 0
        spans[kcol] = 4 * (mx + 1)
    parts = []
    for i in range(K):
        cols = []
        for name in tab.column_names:
            col = tab.column(name)
            if name in spans and i > 0:
                col = pc.add(col, i * spans[name])
            cols.append(col)
        parts.append(pa.table(cols, names=tab.column_names))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{t}.parquet")
    print(f"{t}: {tab.num_rows} -> {out.num_rows} rows")
