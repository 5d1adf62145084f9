#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares (column names sorted, rows sorted, values
hashed). Exit non-zero on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare; keep full float precision
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object and len(col) and isinstance(col.iloc[0], (bytes, bytearray)):
            out[c] = col.apply(lambda b: b.hex() if b is not None else None)
        elif col.dtype == object and len(col) and isinstance(
                col.iloc[0], (list, tuple, np.ndarray)):
            # array cells are unhashable -> sort_values raises; use a
            # stable string form instead
            out[c] = col.apply(lambda v: None if v is None else json.dumps(
                [x.item() if hasattr(x, "item") else x for x in v]))
        elif str(col.dtype).startswith("datetime"):
            out[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == np.float32:
            out[c] = col.astype(np.float64)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passes, skips = [], [], []
    for name in sorted(oracles):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            continue
        # everything per-query inside try: one bad query (duckdb error,
        # unsortable column, schema surprise) records a failure instead of
        # aborting the whole gate run
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            exp = con.execute(oracles[name]).df()
            g, e = normalize(got), normalize(exp)
        except Exception as ex:
            failures.append((name, f"error: {ex}"))
            continue
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns differ: spark={list(g.columns)} duck={list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"row count differ: spark={len(g)} duck={len(e)}"))
            continue
        diff_cols = []
        try:
            for c in g.columns:
                a, b = g[c], e[c]
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    an, bn = a.isna(), b.isna()
                    same = (an == bn).all() and (a[~an].values == b[~bn].values).all()
                else:
                    same = a.astype(str).equals(b.astype(str))
                if not same:
                    diff_cols.append(c)
        except Exception as ex:
            failures.append((name, f"compare error: {ex}"))
            continue
        if diff_cols:
            failures.append((name, f"value mismatch in {diff_cols}"))
            for c in diff_cols[:2]:
                mask = ~(g[c].astype(str) == e[c].astype(str))
                print(f"  [{name}] col {c} first diffs:")
                print("   spark:", g[mask][c].head(3).tolist())
                print("   duck :", e[mask][c].head(3).tolist())
        else:
            passes.append(name)
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
        skips.append((name, n))
    print(f"\nPASS {len(passes)}: {passes}")
    for name, n in skips:
        print(f"ROWS-ONLY {name}: {n} rows")
    if failures:
        print(f"FAIL {len(failures)}:")
        for name, why in failures:
            print(f"  {name}: {why}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
