#!/usr/bin/env python3
"""Append the current bench_result.json to BENCH_SUMMARY.jsonl.

The driver-captured BENCH_r{N}.json files truncate to a tail window
(`parsed: null`), so round-over-round comparison used to depend on
whichever queries happened to land in both tails. This keeps a durable
committed row per round: total, per-query count, failures, a stable
hash of the full per-query map, and the map itself.

Usage: python tools/bench_summary.py <round> [bench_result.json]
"""
import hashlib
import json
import sys


def main() -> None:
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
