"""Strict oracle check: like the driver, compares Spark parquet dumps vs
DuckDB oracle SQL with BITWISE float equality (what a value hash needs),
after sorting columns by name and rows by the non-float key columns.

Usage: python3 tools/strict_oracle.py <sfdir> <verify_outdir>
"""
import duckdb, json, sys, glob, os
import pandas as pd, numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    sdf = pd.read_parquet(spark_files[0])
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sdf)} duck={len(ddf)}")
        fails += 1; continue
    keys = [c for c in sdf.columns
            if not np.issubdtype(sdf[c].dtype, np.floating)] or list(sdf.columns)
    sdf = sdf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    ddf = ddf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        # the driver's hash stringifies values, so int64 123 vs float64
        # 123.0 (e.g. an uncast DuckDB HUGEINT) is a MISMATCH even when
        # numerically equal — require both sides float or neither
        if np.issubdtype(a.dtype, np.floating) != np.issubdtype(b.dtype, np.floating):
            bad.append((c, f"dtype spark={a.dtype} duck={b.dtype}", None))
        elif np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            a = a.astype(float).to_numpy(); b = b.astype(float).to_numpy()
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
            if not eq.all():
                with np.errstate(invalid="ignore"):
                    mx = float(np.nanmax(np.abs(a - b)))
                bad.append((c, int((~eq).sum()), mx))
        else:
            sa, sb = a.astype(str), b.astype(str)
            if not (sa == sb).all():
                bad.append((c, int((sa != sb).sum()), None))
    if bad:
        print(f"{name}: BITWISE MISMATCH {bad} ({len(sdf)} rows)"); fails += 1
    else:
        print(f"{name}: OK ({len(sdf)} rows)")
print(f"--- {len(oracle) - fails}/{len(oracle)} strict-OK")
sys.exit(1 if fails else 0)
