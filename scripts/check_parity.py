"""Local replica of the driver's correctness gate.

Runs every registry query through Spark and its oracle through DuckDB at
the given sf dir, then compares row counts and an order-insensitive,
column-name-sorted value hash. Usage:

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from gmall_flink_20_spark.io import TABLES
from gmall_flink_20_spark.oracles import ORACLES
from gmall_flink_20_spark.queries import NO_ORACLE, QUERIES
from gmall_flink_20_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name in NO_ORACLE:
            print(f"ok    {name}: rows={len(got)} (rows-only, no oracle)")
            continue
        try:
            exp = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        g, e = canon(got), canon(exp)
        if len(g) != len(e):
            print(f"FAIL  {name}: rows spark={len(g)} oracle={len(e)}")
            failures.append(name)
            continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: cols spark={list(g.columns)} oracle={list(e.columns)}")
            failures.append(name)
            continue
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            print(f"FAIL  {name}: {int(bad.sum())}/{len(g)} rows differ; first diffs:")
            print(pd.concat([g[bad].head(3).add_suffix("_spark"), e[bad].head(3).add_suffix("_oracle")], axis=1))
            failures.append(name)
            continue
        print(f"ok    {name}: rows={len(g)}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
