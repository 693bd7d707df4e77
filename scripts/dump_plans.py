"""Dump .explain('formatted') for the given queries to plans/r13/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> <query> [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_20_spark.io import default_sf_dir
from gmall_flink_20_spark.queries import QUERIES
from gmall_flink_20_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="plans", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, tag)
    spark.stop()


if __name__ == "__main__":
    main()
