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

from gmall_flink_20_spark.io import TABLES
from gmall_flink_20_spark.oracles import ORACLES
from gmall_flink_20_spark.queries import NO_ORACLE, QUERIES
from gmall_flink_20_spark.session import get_spark
from gmall_flink_20_spark.testing import assert_frames_match


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
        # shared helper includes the bitwise float check (signed zero /
        # last-ulp drift) so this script faithfully replicates the
        # driver's byte-level value hash — see testing.assert_frames_match
        try:
            assert_frames_match(got, exp, name)
        except AssertionError as e:  # noqa: BLE001
            print(f"FAIL  {e}")
            failures.append(name)
            continue
        print(f"ok    {name}: rows={len(got)}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
