#!/usr/bin/env python3
"""Arrow-dtype parity check between graft.Verify parquet dumps and the
DuckDB oracle (dev tool only). The driver's hash compare is dtype-
sensitive; compare.py checks values — this checks the schemas.

Usage: python3 tools/dtypecheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(t):
    """Normalize representation differences that are not dtype differences
    (parquet large_string vs string, not-null flags)."""
    s = str(t)
    return s.replace("large_string", "string").replace("large_list", "list")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        try:
            spark = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"SKIP  {name}: no spark output ({e})")
            continue
        duck = con.sql(oracles[name]).arrow()
        s_types = {f.name: norm(f.type) for f in spark.schema}
        d_types = {f.name: norm(f.type) for f in duck.schema}
        diffs = {c: (s_types.get(c), d_types.get(c))
                 for c in set(s_types) | set(d_types)
                 if s_types.get(c) != d_types.get(c)}
        if diffs:
            bad += 1
            print(f"DIFF  {name}: {diffs}")
        else:
            print(f"OK    {name}")
    print(f"\n{bad} queries with dtype diffs")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
