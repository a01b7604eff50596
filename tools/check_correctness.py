#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, and compares: schema (column names), row count, and a hash over
(column-name-sorted, row-sorted) values. Floats compared bit-exact first,
then with 1e-9 relative tolerance as a diagnostic.
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            spark_df = pq.read_table(str(res_dir)).to_pandas()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        # The driver's value hash serializes dtype-sensitively (int64 123
        # vs float64 123.0 hash differently), so a dtype mismatch after
        # normalize is a FAIL even when values compare equal.
        dt_bad = [c for c in a.columns if a[c].dtype != b[c].dtype]
        if dt_bad:
            det = ", ".join(f"{c}: {a[c].dtype} vs {b[c].dtype}" for c in dt_bad)
            print(f"FAIL {name}: dtype mismatch (driver hash would differ): {det}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9)
                print(f"WARN {name}: matches only with rtol=1e-9 (hash would FAIL)")
                n_fail += 1
            except AssertionError as e2:
                msg = str(e2).splitlines()
                print(f"FAIL {name}: value mismatch: " + " | ".join(msg[:4]))
                n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
