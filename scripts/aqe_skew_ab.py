"""AQE skew-join A/B (VERDICT r5 item 8).

Builds a deliberately skewed sort-merge join at ~2× sf0.1 event volume
(one key owns 60% of the fact side), runs it with AQE skew-join
splitting ON vs OFF, and reports wall-clock plus the executed plan's
skew markers. With 32 cores, wall-clock ≈ the longest task chain, so
the ON/OFF delta directly measures how much the hot partition's single
task dominated. Appends nothing; print-only — results are recorded in
BASELINE.md by hand with the host context.

Usage: python scripts/aqe_skew_ab.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gmall_flink_20_spark.session import get_spark


def build(spark, n_rows: int):
    # fact: 60% of rows on key 0, rest uniform over 10k keys; a wide-ish
    # payload makes per-row join cost visible
    fact = (
        spark.range(n_rows)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < 6, F.lit(0)).otherwise(
                F.pmod(F.hash("id"), F.lit(10_000))
            ),
        )
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    dim = (
        spark.range(10_000)
        .withColumnRenamed("id", "k")
        .withColumn("dv", F.md5(F.col("k").cast("string")))
        # ~40 rows per key so the skewed key's join output is heavy
        .withColumn("dup", F.explode(F.sequence(F.lit(1), F.lit(40))))
    )
    return fact, dim


def run_once(spark, n_rows: int, skew_on: bool) -> tuple[float, str]:
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # thresholds sized so the hot partition qualifies at this volume
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = build(spark, n_rows)
    # the downstream agg keys on a NON-join column: OptimizeSkewedJoin
    # declines to split a partition another operator still needs
    # hash-distributed on the join key (forceOptimizeSkewedJoin exists
    # for that case; the honest demo avoids needing it)
    joined = (
        fact.join(dim, "k")
        .groupBy(F.substring("payload", 1, 2).alias("pp"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t0 = time.time()
    joined.collect()  # the Dataset's own execution: its plan IS the final one
    dt = time.time() - t0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return dt, plan


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark()
    run_once(spark, min(n_rows, 200_000), True)  # JIT/codegen warmup
    for label, on in [("skew_off", False), ("skew_on", True), ("skew_off2", False), ("skew_on2", True)]:
        dt, plan = run_once(spark, n_rows, on)
        print(f"{label}: {dt:.2f}s  skew_marker={'skew=true' in plan}")


if __name__ == "__main__":
    main()
