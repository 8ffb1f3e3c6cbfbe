import duckdb, json, sys, glob, os
import pandas as pd, numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_smoke"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
for name, sql in oracle.items():
    if only is not None and name not in only:
        continue
    spark_files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not spark_files:
        print(f"{name}: NO SPARK OUTPUT"); continue
    # read EVERY part file: a multi-part output read via its first part
    # alone would silently truncate and report spurious mismatches
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files],
                    ignore_index=True)
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); continue
    # driver-style compare: sort columns by name, compare shapes then values
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(sdf.columns)} duck={list(ddf.columns)}"); continue
    if len(sdf) != len(ddf):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sdf)} duck={len(ddf)}"); continue
    # sort rows deterministically: non-float key columns first
    keys = [c for c in sdf.columns if not np.issubdtype(sdf[c].dtype, np.floating)] or list(sdf.columns)
    sdf = sdf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    ddf = ddf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            a = a.astype(float); b = b.astype(float)
            ok = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not ok.all():
                bad.append((c, int((~ok).sum()), float(np.nanmax(np.abs(a-b)))))
        else:
            try:
                if not (a.astype(str) == b.astype(str)).all():
                    bad.append((c, int((a.astype(str) != b.astype(str)).sum()), None))
            except Exception as e:
                bad.append((c, -1, str(e)))
    print(f"{name}: {'OK' if not bad else 'VALUE MISMATCH ' + str(bad)} ({len(sdf)} rows)")
