#!/usr/bin/env python3
"""Check a graft Bench JSON line against the BASELINE.md budget rule.

Usage: python3 tools/check_budget.py BENCH.json [--per-query SEC] [--total SEC]
           [--bytes-vs PREV.json [--bytes-tol 0.02]] [--margin 0.10]

Exit 0 when every query is within the per-query budget and the catalog
total is within the total budget; exit 1 otherwise, listing offenders.
Negative times mean the query FAILED in Bench (always a violation).

Defaults come FROM THE BENCH JSON itself (r19): a Bench line carries
"budget_scale" and the per-class "budget_total" (scaled), so the
round-end command is just `check_budget.py BENCH.json --margin 0.10`.
Explicit --per-query/--total (UNSCALED; they are multiplied by the
line's budget_scale) override — and are the only way to check an old
line that predates the self-describing fields (then per-query defaults
to 6 and total to nQueries*95/90, the pre-r19 flat model).

--bytes-vs PREV.json: the mechanical TOTAL-violation adjudication the
r16 review did by hand — diff shuffle_write_bytes per cell against a
prior round's bench line. Bytes are box-independent and rep-stable, so
a TOTAL violation whose cells are byte-identical to the prior round is
probe-mistracking on a phasing box, not a regression. Flags every
common cell whose byte delta exceeds --bytes-tol (default 2%), and
lists added/removed cells separately (never a failure by themselves).
Byte drift makes the exit code 1 only together with a budget
violation; on a green budget it is informational.

--margin FRAC: also report (and fail below) the TOTAL headroom margin,
(budget - total) / budget. The r16 lesson: a catalog living AT the
budget line passes or fails on probe luck; the round target is >=10%.
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--per-query", type=float, default=None,
                    help="unscaled per-query budget (default 6, scaled by the line's budget_scale)")
    ap.add_argument("--total", type=float, default=None,
                    help="unscaled total budget (default: the line's per-class budget_total)")
    ap.add_argument("--bytes-vs", metavar="PREV_JSON",
                    help="prior-round bench line to byte-diff against")
    ap.add_argument("--bytes-tol", type=float, default=0.02,
                    help="relative shuffle_write_bytes delta that counts as drift")
    ap.add_argument("--margin", type=float, default=None,
                    help="required TOTAL headroom fraction, e.g. 0.10")
    args = ap.parse_args()

    with open(args.bench_json) as f:
        bench = json.load(f)
    if "queries" not in bench and isinstance(bench.get("parsed"), dict):
        bench = bench["parsed"]  # a driver BENCH_r{N}.json wrapper
    if "queries" not in bench:
        print(f"{args.bench_json}: no per-query map (driver tail truncated?) — "
              "check BENCH_LOCAL.json instead")
        return 1

    queries = bench["queries"]
    scale = bench.get("budget_scale", 1.0)
    per_query = (args.per_query if args.per_query is not None else 6.0) * scale
    if args.total is not None:
        total_budget = args.total * scale
    elif "budget_total" in bench:
        total_budget = bench["budget_total"]  # already scaled by Bench
    else:
        total_budget = len(bench["queries"]) * 95.0 / 90.0 * scale
    bad = []
    for name, sec in sorted(queries.items()):
        if sec < 0:
            bad.append(f"FAILED  {name}")
        elif sec > per_query:
            bad.append(f"SLOW    {name}: {sec:.2f}s > {per_query:.1f}s")
    total = sum(s for s in queries.values() if s > 0)
    if total > total_budget:
        bad.append(f"TOTAL   {total:.1f}s > {total_budget:.1f}s")

    margin = (total_budget - total) / total_budget
    print(f"queries={len(queries)} total={total:.1f}s "
          f"max={max(queries.values()):.2f}s scale={scale:.2f} "
          f"budget: per-query<={per_query:.1f}s "
          f"total<={total_budget:.1f}s margin={margin:+.1%}")
    if args.margin is not None and margin < args.margin:
        bad.append(f"MARGIN  {margin:+.1%} < required {args.margin:.0%}")

    if args.bytes_vs:
        with open(args.bytes_vs) as f:
            prev = json.load(f)
        cur_b = bench.get("shuffle_write_bytes", {})
        prev_b = prev.get("shuffle_write_bytes", {})
        common = sorted(set(cur_b) & set(prev_b))
        added = sorted(set(cur_b) - set(prev_b))
        removed = sorted(set(prev_b) - set(cur_b))
        drift = []
        identical = 0
        for name in common:
            a, b = prev_b[name], cur_b[name]
            if a == b:
                identical += 1
                continue
            rel = abs(b - a) / max(a, b, 1)
            if rel > args.bytes_tol:
                drift.append(f"BYTES   {name}: {a} -> {b} ({rel:+.1%})")
        print(f"bytes-vs {args.bytes_vs}: {len(common)} common cells, "
              f"{identical} byte-IDENTICAL, {len(drift)} drifted >"
              f"{args.bytes_tol:.0%}, {len(added)} added, {len(removed)} removed")
        for line in drift:
            print(line)
        if added:
            print("added:   " + " ".join(added))
        if removed:
            print("removed: " + " ".join(removed))
        if bad and not drift:
            print("ADJUDICATION: budget violation with zero byte drift on common "
                  "cells — probe-mistracking class (r16 convention), not a "
                  "code regression. Re-run on a quiet box before concluding.")
        # drift alone never fails the check: deliberate redesigns move bytes
        # and are adjudicated in the round notes, not by this tool

    if bad:
        print("\n".join(bad))
        return 1
    print("BUDGET OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
