#!/usr/bin/env python3
"""Self-test for the compare.py zero-sign canon: build a fixture where
the Spark-side parquet holds +0.0 and the oracle SQL yields -0.0, and
assert the gate FAILS (pre-round-7 it silently passed — the r6 q210
blind spot). Run: python3 tools/test_compare_negzero.py
"""
import json, os, subprocess, sys, tempfile

import pandas as pd

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with tempfile.TemporaryDirectory() as td:
    sfdir = os.path.join(td, "sf")
    outdir = os.path.join(td, "out")
    os.makedirs(sfdir)
    os.makedirs(os.path.join(outdir, "qz_negzero"))
    # a dummy table so compare.py's view loop has something to mount
    pd.DataFrame({"x": [1]}).to_parquet(f"{sfdir}/dummy.parquet")
    # spark side: +0.0
    pd.DataFrame({"v": [0.0]}).to_parquet(
        f"{outdir}/qz_negzero/part-0.parquet")
    # oracle side: a sign-preserving round that lands on -0.0
    json.dump({"qz_negzero": "SELECT round(-1e-9, 6) AS v"},
              open(f"{outdir}/oracle_sql.json", "w"))
    r = subprocess.run(
        [sys.executable, f"{root}/tools/compare.py", sfdir, outdir],
        capture_output=True, text=True)
    assert r.returncode == 1, f"gate must fail on -0.0 vs +0.0:\n{r.stdout}"
    assert "FAIL qz_negzero" in r.stdout, r.stdout
    # and the same value with matching signs must pass
    json.dump({"qz_negzero": "SELECT round(1e-9, 6) AS v"},
              open(f"{outdir}/oracle_sql.json", "w"))
    r2 = subprocess.run(
        [sys.executable, f"{root}/tools/compare.py", sfdir, outdir],
        capture_output=True, text=True)
    assert r2.returncode == 0, f"matching +0.0 must pass:\n{r2.stdout}"
    # Decimal pairing (the r7 ADVICE gap): a Spark-side -0.0 double vs a
    # DuckDB DECIMAL zero must fail (sign tags differ), while +0.0 vs
    # the same DECIMAL zero must pass.
    json.dump({"qz_negzero": "SELECT 0.000000::DECIMAL(18,6) AS v"},
              open(f"{outdir}/oracle_sql.json", "w"))
    pd.DataFrame({"v": [-0.0]}).to_parquet(
        f"{outdir}/qz_negzero/part-0.parquet")
    r3 = subprocess.run(
        [sys.executable, f"{root}/tools/compare.py", sfdir, outdir],
        capture_output=True, text=True)
    assert r3.returncode == 1, f"-0.0 vs DECIMAL 0 must fail:\n{r3.stdout}"
    pd.DataFrame({"v": [0.0]}).to_parquet(
        f"{outdir}/qz_negzero/part-0.parquet")
    r4 = subprocess.run(
        [sys.executable, f"{root}/tools/compare.py", sfdir, outdir],
        capture_output=True, text=True)
    assert r4.returncode == 0, f"+0.0 vs DECIMAL 0 must pass:\n{r4.stdout}"
print("OK: compare.py distinguishes -0.0 from +0.0 (float AND decimal "
      "pairings) and passes matching zeros")
