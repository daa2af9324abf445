#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, loads the Spark
result parquet from <verifyOutDir>/<name>/, and compares: columns sorted by
name, rows sorted by all columns, exact value equality (bit-exact floats).

This script is a build-time validation tool only — the shipped Scala library
does not depend on it.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.dataset as pads

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize away tz-awareness differences for comparison purposes
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        # NOTE: no ndarray canonicalization here — the driver's gate sorts
        # raw object columns with pandas, which throws on ndarray cells
        # ("unhashable type"). Keeping this pre-flight as strict as the
        # driver means array-valued result columns fail HERE first;
        # queries must serialize arrays (array_join) before returning.
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exactness proxy; driver may be stricter
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
            got = pads.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        want, got = canon(want), canon(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not values_equal(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            # dtypes informative only — driver may compare schemas
            dt = [
                (c, str(want[c].dtype), str(got[c].dtype))
                for c in want.columns if str(want[c].dtype) != str(got[c].dtype)
            ]
            note = f" (dtype diff: {dt})" if dt else ""
            print(f"PASS {name}: {len(want)} rows{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
