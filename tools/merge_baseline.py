#!/usr/bin/env python3
"""Refresh tools/bench_baseline.json from round-end quiet Bench runs.

Usage: python3 tools/merge_baseline.py RUN1.json [RUN2.json ...]
           [--baseline tools/bench_baseline.json] [--out tools/bench_baseline.json]

The baseline is the TOTAL re-adjudication's quiet-box reference
(Bench.readBaseline): bytes identify a cell's plan, seconds are the
quiet per-cell floor. The merge rule (the round-end workflow step,
SCALE.md "Round-end baseline refresh"):

- The NEW runs define the cell set and each cell's canonical bytes
  (the byte value of the run holding the per-cell MIN seconds across
  the new runs). A cell the new runs lack is DROPPED (renamed/removed
  from the catalog).
- A prior baseline entry is min-merged IN only when its bytes match
  the new canonical bytes within the eligibility band (±0.5%, the
  Bench.bytesMatch rule): same plan, so an older quieter floor is
  still a valid floor. Changed-plan cells take the new runs' values
  only — a stale floor from a different plan must not survive
  (the r19 e13 lesson: its baseline entry was 15% stale and the cell
  could never re-adjudicate).

Seconds are stored RAW (unscaled): the baseline is only used for
relative inflation ranking (sec > base*1.4 + 0.2), so mild box scale
in the source runs only makes re-adjudication more conservative.
"""
import argparse
import json


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    if "queries" not in doc or "shuffle_write_bytes" not in doc:
        raise SystemExit(f"{path}: not a full Bench line (queries/bytes missing)")
    return doc


def bytes_match(a, b):
    return abs(a - b) <= max(1, a // 200)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--baseline", default="tools/bench_baseline.json")
    ap.add_argument("--out", default="tools/bench_baseline.json")
    args = ap.parse_args()

    runs = [load(p) for p in args.runs]
    try:
        with open(args.baseline) as f:
            old = json.load(f)
    except FileNotFoundError:
        old = {"queries": {}, "shuffle_write_bytes": {}, "runs_merged": 0}

    queries, bytes_ = {}, {}
    kept_old = 0
    for name in sorted(set().union(*(r["queries"] for r in runs))):
        cands = [(r["queries"][name], r["shuffle_write_bytes"].get(name, -1))
                 for r in runs if name in r["queries"] and r["queries"][name] > 0]
        if not cands:
            continue
        # a candidate with bytes -1 (cell absent from that run's bytes
        # map) must never become the baseline entry: Bench.bytesMatch
        # never matches -1 against a real byte count, so the cell would
        # be PERMANENTLY ineligible for TOTAL re-adjudication — exactly
        # the silent-ineligibility class the ±0.5% band fix eliminated.
        # Prefer byte-carrying runs; fail loudly if none carries bytes.
        byted = [c for c in cands if c[1] >= 0]
        if not byted:
            raise SystemExit(
                f"{name}: present in the runs' queries map but NO run carries "
                "its shuffle_write_bytes — merging bytes=-1 would leave the "
                "cell permanently re-adjudication-ineligible; fix the run "
                "artifact (use full Bench lines, not summaries)")
        sec, b = min(byted)
        old_sec = old.get("queries", {}).get(name)
        old_b = old.get("shuffle_write_bytes", {}).get(name)
        if (old_sec is not None and old_b is not None and old_sec > 0 and
                bytes_match(old_b, b) and old_sec < sec):
            sec = old_sec  # same plan, older quieter floor
            kept_old += 1
        queries[name] = sec
        bytes_[name] = b
    dropped = sorted(set(old.get("queries", {})) - set(queries))

    out = {
        "comment": ("quiet-box per-cell baseline for Bench TOTAL re-adjudication "
                    "(bytes identify the plan; seconds = per-cell MIN over same-code "
                    "round-end runs, prior floors kept where bytes match ±0.5%). "
                    "Refresh whenever the catalog or a cell plan changes "
                    "(tools/merge_baseline.py)."),
        "runs_merged": old.get("runs_merged", 0) + len(runs),
        "queries": queries,
        "shuffle_write_bytes": bytes_,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{args.out}: {len(queries)} cells from {len(args.runs)} run(s); "
          f"{kept_old} prior floors kept (byte-matched), "
          f"{len(dropped)} dropped: {' '.join(dropped) or '-'}")


if __name__ == "__main__":
    main()
