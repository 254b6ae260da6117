#!/usr/bin/env python3
"""Sweep every declared query's output on BOTH engines for -0.0 cells —
the bit-level zero class the driver's hash distinguishes but Python's ==
does not. Usage:
  python3 tools/negzero_sweep.py <sfdir> <verify_out_dir>
Prints `side query column` for every column containing a negative zero.
Exit 1 if any hit (after the round-7 normalization there should be none).
"""
import sys, glob, json, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def negzero_cols(df):
    hits = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # decimals / lists / strings: scan floats inside lists only
            for v in s:
                if isinstance(v, (list, np.ndarray)):
                    a = np.asarray(v, dtype=object)
                    fl = [x for x in a.ravel()
                          if isinstance(x, (float, np.floating))]
                    if any(x == 0.0 and np.signbit(x) for x in fl):
                        hits.append(c)
                        break
        elif np.issubdtype(s.dtype, np.floating):
            v = s.to_numpy()
            if np.any((v == 0.0) & np.signbit(v)):
                hits.append(c)
    return hits


bad = 0
for name in sorted(oracle):
    try:
        d = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ERR  duck  {name}: {e}")
        bad += 1
        continue
    for c in negzero_cols(d):
        print(f"HIT  duck  {name} {c}")
        bad += 1
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"ERR  spark {name}: no output")
        bad += 1
        continue
    s = pd.concat([pd.read_parquet(f) for f in files])
    for c in negzero_cols(s):
        print(f"HIT  spark {name} {c}")
        bad += 1
print(f"\n{bad} negative-zero hits")
sys.exit(1 if bad else 0)
