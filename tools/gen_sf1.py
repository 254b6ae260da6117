#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset for the BENCHLOG scaling probe by
replicating sf0.1 ten times with consistent key shifts (REPL * 10M on
every entity/foreign key, so joins keep their selectivity and no
replica's keys collide with another's). Dimension tables (region,
nation) are NOT replicated — at any SF they stay bounded.

Measurement tooling only (driver-side duckdb): the probe compares
t(sf1)/t(sf0.1) per query family; it feeds no correctness gate.

Usage: python3 tools/gen_sf1.py [outdir=/tmp/sf1] [replicas=10]
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SHIFT = 10_000_000

# table -> columns to shift per replica (entity + foreign keys).
SHIFTED = {
    "events": ["user_id", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "region": [],   # dims: copied once, unshifted
    "nation": [],
}

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for t, keys in SHIFTED.items():
    src = f"{SRC}/{t}.parquet"
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if not keys:
        con.sql(f"COPY (SELECT * FROM '{src}') TO '{OUT}/{t}.parquet'")
    else:
        sel = ", ".join(
            f"{c} + r.r * {SHIFT} AS {c}" if c in keys else c for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}', "
            f"(SELECT unnest(range({R})) AS r) r) "
            f"TO '{OUT}/{t}.parquet'")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
