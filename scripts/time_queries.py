"""Best-of-N isolated timing of named queries at $SPARK_GRAFT_SF_DIR —
same methodology as bench.py (toPandas materialization, cache cleared
between runs, warmed session). Usage:

    python scripts/time_queries.py [-n RUNS] <query> [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warm_operator_classes
from gmall_flink_20_spark.io import default_sf_dir
from gmall_flink_20_spark.queries import QUERIES
from gmall_flink_20_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = default_sf_dir()
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16"))
    spark = get_spark(app_name="time_queries", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    _warm_operator_classes(spark)
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in args:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).toPandas()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            spark.catalog.clearCache()
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
