"""Paired-engine benchmark: times the DuckDB oracle for every bench
query at the given sf dir (best-of-N, same protocol as bench.py) and
prints a JSON line {"oracle_total": s, "queries": {...}}. Run bench.py
first (Spark side), then this, then compare the two totals — that pair
is the BASELINE.md ratio.

Usage: python scripts/pair_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_QUERIES
from gmall_flink_20_spark.io import TABLES
from gmall_flink_20_spark.oracles import ORACLES
from gmall_flink_20_spark.queries import NO_ORACLE


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # warm the file cache / catalog the same way bench.py warms the JVM
    con.execute("SELECT count(*) FROM lineitem").fetchall()

    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in BENCH_QUERIES:
            if name in NO_ORACLE or name not in ORACLES:
                continue
            t0 = time.perf_counter()
            con.execute(ORACLES[name]).fetchdf()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    total = round(sum(timings.values()), 3)
    out = {
        "engine": "duckdb-oracle",
        "oracle_total": total,
        "n_queries": len(timings),
        "runs": runs,
        "sf_dir": sf_dir,
        "queries": timings,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_ORACLE_DETAIL.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("engine", "oracle_total", "n_queries", "runs", "sf_dir")}))


if __name__ == "__main__":
    main()
