#!/usr/bin/env python3
"""Append the current bench_result.json to BENCH_SUMMARY.jsonl.

The driver-captured BENCH_r{N}.json files truncate to a tail window
(`parsed: null`), so round-over-round comparison used to depend on
whichever queries happened to land in both tails. This keeps a durable
committed row per round: total, per-query count, failures, a stable
hash of the full per-query map, and the map itself.

Usage: python tools/bench_summary.py <round> [bench_result.json]
       python tools/bench_summary.py --medians [last_n]

`--medians` reports each query's MEDIAN across the last N summary rows
next to its latest value (ratio flagged when latest > 2x median), plus
a median-reconstructed total — so one noisy microVM window cannot
distort round-over-round comparison (VERDICT r12 task 6: the committed
round-12 row carried a 10.09s q_factor_returns_gn against a 1.3s
stable cost).
"""
import hashlib
import json
import statistics
import sys


def medians(last_n: int) -> None:
    rows = []
    with open("BENCH_SUMMARY.jsonl") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    rows = rows[-last_n:] if last_n > 0 else rows
    latest = rows[-1]
    per_query = {}
    for r in rows:
        for q, v in r.get("queries", {}).items():
            per_query.setdefault(q, []).append(float(v))
    med_total = 0.0
    outliers = []
    for q in sorted(per_query):
        med = statistics.median(per_query[q])
        if q != "warmup":
            med_total += med
        cur = latest.get("queries", {}).get(q)
        if cur is not None and med > 0.05 and cur > 2.0 * med:
            outliers.append((q, cur, med))
    print(f"rows considered: {len(rows)} (latest round "
          f"{latest.get('round')}, {latest.get('n_queries')} queries)")
    print(f"latest total {latest.get('total_sec')}s vs "
          f"median-reconstructed total {med_total:.1f}s")
    if outliers:
        print("latest-row outliers (> 2x cross-row median — host noise, "
              "not regressions, unless they persist):")
        for q, cur, med in sorted(outliers, key=lambda t: -t[1] / t[2]):
            print(f"  {q}: {cur:.2f}s vs median {med:.2f}s "
                  f"({cur / med:.1f}x)")
    else:
        print("no latest-row outliers past 2x the cross-row median")


def main() -> None:
    if sys.argv[1] == "--medians":
        medians(int(sys.argv[2]) if len(sys.argv) > 2 else 0)
        return
    rnd = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "bench_result.json"
    with open(src) as f:
        bench = json.load(f)
    queries = bench.get("queries", {})
    canon = json.dumps(
        {k: round(float(v), 3) for k, v in sorted(queries.items())},
        separators=(",", ":"))
    row = {
        "round": rnd,
        "sf": bench.get("sf"),
        "runs": bench.get("runs"),
        "total_sec": round(float(bench.get("value", 0.0)), 3),
        "warmup_sec": round(float(queries.get("warmup", 0.0)), 3),
        "n_queries": len([k for k in queries if k != "warmup"]),
        "failures": bench.get("failures", {}),
        "query_map_sha1": hashlib.sha1(canon.encode()).hexdigest()[:16],
        "queries": {k: round(float(v), 3) for k, v in sorted(queries.items())},
    }
    with open("BENCH_SUMMARY.jsonl", "a") as f:
        f.write(json.dumps(row, separators=(",", ":")) + "\n")
    print(f"round {rnd}: total {row['total_sec']}s over "
          f"{row['n_queries']} queries (warmup {row['warmup_sec']}s), "
          f"failures {row['failures']}")


if __name__ == "__main__":
    main()
