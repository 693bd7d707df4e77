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

__all__ = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_balances",
]

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


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for 1996 orders that have at
    least one returned line (the dataset has no l_commitdate, so the
    EXISTS predicate uses l_returnflag = 'R').

    The EXISTS becomes a LEFT SEMI join — at scale this shuffles both
    sides on the order key once and never materializes the (potentially
    many) matching lineitems per order.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
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


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of September-1996 revenue from PROMO parts.

    part is the broadcast side; the conditional sum folds into one
    aggregate pass. Both sums are exact decimals cast to double before
    the (IEEE-deterministic) ratio, so the oracle matches bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-average revenue lost to small Brand#23
    orders — lines whose quantity is below 20% of that part's average.

    The correlated AVG subquery becomes one per-part aggregate joined
    back to lineitem (co-partitioned on l_partkey: one shuffle feeds both
    the aggregate and the join under AQE). The threshold compare is kept
    in exact integer arithmetic (5·qty·cnt < sum_qty ⟺ qty < 0.2·avg, as
    quantities are integral and positive) so no float rounding can flip a
    row between engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    brand_lines = li.join(
        F.broadcast(brand_parts), li["l_partkey"] == brand_parts["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    stats = brand_lines.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    return (
        brand_lines.join(stats, brand_lines["l_partkey"] == stats["sp_partkey"])
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("qty_cnt")
            < F.col("qty_sum")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_D)).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-100 orders with total quantity > 300 and their
    customers.

    The HAVING subquery is a pre-aggregation of lineitem on the order key;
    only qualifying order keys (a tiny set) flow into the joins, so both
    orders and customer probe small inputs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.col("o_totalprice").cast(_D).cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three brand/size/quantity bands.

    One broadcast equi-join on the part key carries the whole disjunction
    as a post-join filter — Catalyst still pushes the per-side conjuncts
    (brand ∈ {...}, quantity ≤ 30) down to the scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    qty = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(band)
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count/total of above-average-balance
    customers with no 1995-H1 orders (every customer here has *some*
    order, so the anti-join is date-restricted to stay selective).

    The global average arrives as a broadcast single-row cross join; the
    threshold compare is exact (acctbal·cnt > sum as decimals) so engines
    can't disagree on boundary rows. NOT EXISTS is a LEFT ANTI join.
    """
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast(_D)
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("bal_sum"), F.count(F.lit(1)).alias("bal_cnt")
    )
    early_orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    ).select("o_custkey")
    return (
        cust.join(early_orders, cust["c_custkey"] == early_orders["o_custkey"], "left_anti")
        .crossJoin(F.broadcast(stats))
        .filter(bal * F.col("bal_cnt") > F.col("bal_sum"))
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )
