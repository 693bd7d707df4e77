"""Dump .explain('formatted') for the given queries to plans/<round>/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py [--round rNN] <tag> <query> [query ...]
(round defaults to r14; --repo <dir> points at an alternate checkout for
before-plans.)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_20_spark.io import default_sf_dir
from gmall_flink_20_spark.queries import QUERIES
from gmall_flink_20_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    rnd = "r14"
    if args and args[0] == "--round":
        rnd = args[1]
        args = args[2:]
    tag = args[0]
    names = args[1:]
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="plans", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
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
