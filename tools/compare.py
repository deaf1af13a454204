#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only;
the Scala library has no dependency on this).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump written by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB with every testdata
table registered as a view, then compares: sort columns by name, sort
rows, hash values. Reports exact match / near-miss (float-only drift) /
mismatch per query.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting works
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "tolist") and not isinstance(v, str)).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, (list, tuple)) else v))
    return df.sort_values(by=list(df.columns), kind="mergesort")\
             .reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        if a == b:
            return True, 0.0
        denom = max(abs(a), abs(b), 1e-30)
        return False, abs(a - b) / denom
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False, float("inf")
        worst = 0.0
        ok = True
        for x, y in zip(a, b):
            e, d = cells_equal(x, y)
            ok = ok and e
            worst = max(worst, d)
        return ok, worst
    try:
        if pd.isna(a) and pd.isna(b):
            return True, 0.0
    except (TypeError, ValueError):
        pass
    return (a == b), (0.0 if a == b else float("inf"))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            spark_df = canon(pq.read_table(f"{out_dir}/{name}").to_pandas())
        except Exception as e:
            print(f"FAIL  {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL  {name}: columns {list(spark_df.columns)} vs "
                  f"{list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL  {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        worst = 0.0
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                eq, drift = cells_equal(spark_df.at[i, c], duck_df.at[i, c])
                if not eq:
                    worst = max(worst, drift)
                    if bad is None or drift > 0:
                        bad = (i, c, spark_df.at[i, c], duck_df.at[i, c])
        if bad is None:
            print(f"PASS  {name}: {len(spark_df)} rows exact")
            n_pass += 1
        elif worst < 1e-9:
            print(f"NEAR  {name}: float drift {worst:.2e} at {bad[:2]} "
                  f"({bad[2]} vs {bad[3]}) — would FAIL a hash compare")
            n_fail += 1
        else:
            print(f"FAIL  {name}: first diff row={bad[0]} col={bad[1]}: "
                  f"{bad[2]!r} vs {bad[3]!r} (drift {worst:.2e})")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
