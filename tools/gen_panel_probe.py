"""Panel-family decade-probe generator (SURVEY.md SS5 probe #12).

Builds a factor panel one decade above sf0.1 (5.33M (date, asset) panel
rows, 10,000 assets, ~12 years of ship days) by replicating sf0.1's
lineitem 10x with genuinely different values per replica:

  - replica k remaps l_suppkey -> l_suppkey + k*1000 (new assets),
  - rotates l_quantity on the 1..50 grid (prices shift: the price
    series is qty-keyed, Pipelines.prices),
  - rotates l_extendedprice cents modulo a prime (revenues/factors
    genuinely shift, still exact 2-decimal fixed-point),
  - replicas 5..9 also shift l_shipdate forward by (k-4)*366 days
    (more distinct dates and calendar months for the time-bucketed
    analytics).

supplier is replicated the same way with s_nationkey rotated mod 25 so
group maps shift too. All other tables are copied verbatim.

Usage: python3 tools/gen_panel_probe.py [outdir]   (default tmp/panelprobe)
Then:  SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify <outdir> <dumpdir> q_... "
       python3 tools/strict_oracle.py <outdir> <dumpdir>
"""
import duckdb, os, shutil, sys

SF = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "tmp/panelprobe"
os.makedirs(OUT, exist_ok=True)

for t in ["region", "nation", "customer", "part", "orders", "events",
          "documents", "embeddings"]:
    src = f"{SF}/{t}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{OUT}/{t}.parquet")

con = duckdb.connect()
reps = ",".join(str(k) for k in range(10))

con.execute(f"""
COPY (
  SELECT
    l_orderkey, l_partkey,
    CAST(l_suppkey + k * 1000 AS BIGINT) AS l_suppkey,
    l_linenumber,
    CAST(((CAST(l_quantity AS BIGINT) - 1 + 3 * k) % 50) + 1 AS DOUBLE)
      AS l_quantity,
    CAST(((CAST(round(l_extendedprice * 100, 0) AS BIGINT) + k * 123457)
          % 9999991) + 100 AS DOUBLE) / 100.0 AS l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus,
    CASE WHEN k >= 5
         THEN l_shipdate + INTERVAL ((k - 4) * 366) DAY
         ELSE l_shipdate END AS l_shipdate
  FROM read_parquet('{SF}/lineitem.parquet')
  CROSS JOIN (SELECT unnest([{reps}]) AS k)
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT
    CAST(s_suppkey + k * 1000 AS BIGINT) AS s_suppkey,
    s_name,
    CAST((CAST(s_nationkey AS BIGINT) + k) % 25 AS INTEGER) AS s_nationkey,
    s_acctbal
  FROM read_parquet('{SF}/supplier.parquet')
  CROSS JOIN (SELECT unnest([{reps}]) AS k)
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
""")

n, = con.execute(f"""SELECT count(*) FROM (
  SELECT DISTINCT date_trunc('day', l_shipdate), l_suppkey
  FROM read_parquet('{OUT}/lineitem.parquet'))""").fetchone()
d, = con.execute(f"""SELECT count(DISTINCT date_trunc('day', l_shipdate))
  FROM read_parquet('{OUT}/lineitem.parquet')""").fetchone()
print(f"panel rows: {n}, distinct dates: {d}, assets: 10000")
