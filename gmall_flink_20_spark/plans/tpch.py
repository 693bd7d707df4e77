"""TPC-H-style scale queries over the driver's star schema.

These are the engine's heavy-scan/join benchmark plans (the reference has
no SQL analytics of this shape — its largest input is 142 rows — so these
exercise the scale contract from the build brief: scan-heavy aggregation,
multi-way joins with broadcast dims, selective filters that must reach the
parquet scan).

Determinism: money aggregates are summed as exact DECIMALs (inputs have
fixed scale) and only cast to double at the end, so the oracle's values
are bit-identical regardless of summation order. Averages are derived from
the exact sum/count pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

__all__ = ["q1_pricing_summary", "q3_top_orders", "q5_local_supplier_volume", "q6_forecast_revenue"]

# Exact decimal input casts: 2-dp money/qty, 2-dp rates. Products stay
# well under precision 38 (no scale reduction), sums are exact, and the
# final double cast is deterministic across engines.
_D = "decimal(12,2)"
_R = "decimal(4,2)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by (returnflag, linestatus)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    qty = F.col("l_quantity").cast(_D)
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_R)
    tax = F.col("l_tax").cast(_R)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast(_R) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1).cast(_R) - disc) * (F.lit(1).cast(_R) + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 BUILDING-segment orders by revenue.

    customer is the small side → broadcast; orders⋈lineitem shuffles on
    o_orderkey/l_orderkey only.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01")
    )
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation, ASIA region. All dims broadcast; the single big shuffle is
    lineitem⋈orders on the order key."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(cust),
            (orders["o_custkey"] == cust["c_custkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter + single global sum. The filters
    must push to the parquet scan (verified in tests via the explain plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(_D) * F.col("l_discount").cast(_R)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
