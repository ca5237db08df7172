#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name + rows by all columns, and
compares values exactly. Prints PASS/FAIL per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"[FAIL] {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    ok = a.astype(object).where(pd.notna(a), None).equals(
                        b.astype(object).where(pd.notna(b), None))
            except Exception as ex:
                ok = False
                mismatch = f"{c}: compare error {ex}"
            if not ok:
                bad = (a != b) if a.dtype.kind != "O" else (a.astype(str) != b.astype(str))
                idx = bad[bad].index[:3].tolist() if bad.any() else []
                mismatch = mismatch or f"col {c} differs e.g. rows {idx}: got {a.iloc[idx[0]] if idx else '?'} exp {b.iloc[idx[0]] if idx else '?'} (dtypes {a.dtype}/{b.dtype})"
                break
        if mismatch:
            print(f"[FAIL] {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"[PASS] {name} ({len(g)} rows)")
            n_pass += 1
    # queries with no oracle → rows-only
    print(f"== {n_pass} pass, {n_fail} fail, oracle-less queries not checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
