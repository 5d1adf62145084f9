#!/usr/bin/env python3
"""Check a graft Bench JSON line against the BASELINE.md budget rule.

Usage: python3 tools/check_budget.py BENCH.json [--per-query 6.0] [--total 95.0]

Exit 0 when every query is within the per-query budget and the catalog
total is within the total budget; exit 1 otherwise, listing offenders.
Negative times mean the query FAILED in Bench (always a violation).
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--per-query", type=float, default=6.0)
    ap.add_argument("--total", type=float, default=95.0)
    args = ap.parse_args()

    with open(args.bench_json) as f:
        bench = json.load(f)

    queries = bench["queries"]
    bad = []
    for name, sec in sorted(queries.items()):
        if sec < 0:
            bad.append(f"FAILED  {name}")
        elif sec > args.per_query:
            bad.append(f"SLOW    {name}: {sec:.2f}s > {args.per_query}s")
    total = sum(s for s in queries.values() if s > 0)
    if total > args.total:
        bad.append(f"TOTAL   {total:.1f}s > {args.total}s")

    print(f"queries={len(queries)} total={total:.1f}s "
          f"max={max(queries.values()):.2f}s budget: per-query<={args.per_query}s total<={args.total}s")
    if bad:
        print("\n".join(bad))
        return 1
    print("BUDGET OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
