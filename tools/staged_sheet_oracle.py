"""Staged replay of the summary/returns sheet oracles (SURVEY S5 #12).

The sheet twins melt 5-8 component oracles long; the fully-nested SQL
re-evaluates each component subquery once PER MELTED METRIC, which
spills past the container's disk budget at the 10x panel-probe scale.
This runner materializes each component ONCE to parquet (from
<verify_outdir>/sheet_components.json, dumped by graft.Verify), melts
from the materialized tables, and strict-compares against the Spark
dump with the same bitwise rules as strict_oracle.py.

Usage: python3 tools/staged_sheet_oracle.py <sfdir> <verify_outdir> [sheet...]
"""
import duckdb, json, sys, glob, os, shutil
import pandas as pd, numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
sheets = sys.argv[3:] or ["q_summary_sheet", "q_returns_sheet"]

stage = os.path.join("tmp", "staged_components")
shutil.rmtree(stage, ignore_errors=True)
os.makedirs(stage, exist_ok=True)
os.makedirs(os.path.join("tmp", "ducktmp"), exist_ok=True)

con = duckdb.connect()
con.execute(f"SET temp_directory='{os.path.abspath('tmp/ducktmp')}'")
con.execute("SET memory_limit='24GB'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

comps = json.load(open(f"{out}/sheet_components.json"))
fails = 0
for sheet in sheets:
    spark_files = glob.glob(f"{out}/{sheet}/*.parquet")
    if not spark_files:
        print(f"{sheet}: NO SPARK OUTPUT"); fails += 1; continue
    branches = []
    for i, c in enumerate(comps[sheet]):
        p = os.path.abspath(f"{stage}/{sheet}_{i}.parquet")
        con.execute(f"COPY ({c['sql']}) TO '{p}' (FORMAT PARQUET)")
        print(f"{sheet}: staged component {c['section']} ({i + 1}/{len(comps[sheet])})")
        for m in c["metrics"]:
            branches.append(
                f"SELECT '{c['section']}' AS section, {c['key']} AS k, "
                f"'{m}' AS metric, {m}::DOUBLE AS value "
                f"FROM read_parquet('{p}')")
    sql = "\nUNION ALL\n".join(branches) + "\nORDER BY section, k, metric"
    ddf = con.execute(sql).df()
    sdf = pd.read_parquet(spark_files[0])
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"{sheet}: SCHEMA MISMATCH spark={list(sdf.columns)} "
              f"duck={list(ddf.columns)}")
        fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"{sheet}: ROWCOUNT MISMATCH spark={len(sdf)} duck={len(ddf)}")
        fails += 1; continue
    keys = [c for c in sdf.columns
            if not np.issubdtype(sdf[c].dtype, np.floating)] or list(sdf.columns)
    sdf = sdf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    ddf = ddf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
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
        print(f"{sheet}: BITWISE MISMATCH {bad} ({len(sdf)} rows)"); fails += 1
    else:
        print(f"{sheet}: OK ({len(sdf)} rows, staged)")
print(f"--- {len(sheets) - fails}/{len(sheets)} staged strict-OK")
sys.exit(1 if fails else 0)
