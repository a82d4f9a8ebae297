#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name + rows by all columns, and
compares values. Dev tool only — NOT part of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import glob
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} duck={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(want)}")
            n_bad += 1
            continue
        # value compare: exact on strings/ints; exact on rounded floats
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    ok = (a.astype(str).fillna('') == b.astype(str).fillna('')).all()
            except Exception:
                ok = (a.astype(str) == b.astype(str)).all()
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            print(f"[DIFF] {name}: columns {diff_cols}")
            for c in diff_cols[:2]:
                m = ~((got[c].isna() & want[c].isna()) | (got[c] == want[c]))
                print(got[m].head(3))
                print(want[m].head(3))
            n_bad += 1
        else:
            print(f"[ OK ] {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
