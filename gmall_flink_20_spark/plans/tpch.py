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
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_lines_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
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


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part (the dataset has no
    partsupp table, so the part↔supplier relation and its cost are derived
    from lineitem: cost = MIN line extendedprice for that (part, supplier)).

    The correlated MIN subquery becomes a per-part aggregate joined back;
    both the cost derivation and the min share one shuffle on l_partkey
    under AQE. All dims (supplier, nation, region) broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(14, 16)
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(euro_supp), li["l_suppkey"] == euro_supp["s_suppkey"])
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice").cast(_D)).alias("cost"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost["l_partkey"] == min_cost["mc_partkey"])
            & (cost["cost"] == min_cost["min_cost"]),
        )
        .select(
            F.col("s_acctbal").cast(_D).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("partkey"),
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year — lines
    where the supplier sits in one of the pair and the customer in the
    other. Dims broadcast; the two big shuffles are lineitem⋈orders on the
    order key and the final (small) groupBy."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_12's share of ASIA-customer ECONOMY-part
    revenue per order year. Share = exact-decimal conditional sum over
    exact-decimal total, cast to double only for the final division."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    cust_asia = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supp["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_asia), orders["o_custkey"] == cust_asia["c_custkey"], "left_semi")
        .join(F.broadcast(supp_n), li["l_suppkey"] == supp_n["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_12", revenue).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for
    'widget' parts (no partsupp ⇒ unit cost is the part's retail price, so
    profit = disc revenue − retailprice·quantity; all exact decimals)."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R)) - F.col(
        "p_retailprice"
    ).cast(_D) * F.col("l_quantity").cast(_D)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns for
    1996-Q4 orders. Customer (1.5k×sf rows) broadcasts; lineitem⋈orders is
    the single big shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "revenue",
            F.col("c_acctbal").cast(_D).cast("double").alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_7-supplied line value exceeds
    0.1% of that nation's total (no partsupp ⇒ value = summed line
    extendedprice). Threshold compare stays in exact decimals — 1000·part
    value > total — so boundary rows can't flip between engines. The
    per-part aggregate and the grand total reuse one scan; the total
    arrives as a broadcast single-row cross join."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    n_supp = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey")
    lines = li.join(F.broadcast(n_supp), li["l_suppkey"] == n_supp["s_suppkey"], "left_semi")
    per_part = lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(_D)).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of LATE lines by line status (no
    shipmode/commitdate in this dataset ⇒ 'late' is shipped > 60 days
    after the order date, the category is l_linestatus)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer — LEFT
    OUTER join keeps zero-order customers, excluding 'P'-status orders.
    Customer is small ⇒ the orders-side aggregate is computed first and
    the outer join broadcasts nothing wider than (custkey, count)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    )
    per_cust = orders.groupBy(F.col("o_custkey")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left_outer")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum 1996-H1 revenue. The
    view becomes a per-supplier aggregate; the max arrives as a broadcast
    single-row cross join and the equality is on exact decimals, so ties
    are engine-independent."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    revenue = F.col("l_extendedprice").cast(_D) * (F.lit(1).cast(_R) - F.col("l_discount").cast(_R))
    per_supp = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("rev_dec"))
    max_rev = per_supp.agg(F.max("rev_dec").alias("max_dec"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for small non-Brand#5 parts (part↔supplier via lineitem; the excluded
    'complaints' suppliers are those with negative balances, as an
    anti-join). countDistinct shuffles once on the part key with the
    supplier set pre-deduped map-side."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers that shipped > 50 units of some
    red part in 1996 (no partsupp availqty ⇒ the 'excess stock' predicate
    is the shipped-quantity aggregate itself). The nested EXISTS chain
    becomes aggregate → semi-join; quantity compare is exact decimal."""
    red_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    heavy = (
        li.join(F.broadcast(red_parts), li["l_partkey"] == red_parts["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        euro.join(heavy, euro["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), "s_name")
        .orderBy("suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers that alone 'failed' a multi-supplier
    finished order (no receipt/commit dates ⇒ the failure marker is the
    returned flag). The EXISTS/NOT-EXISTS self-join pair collapses into
    ONE shuffle on the order key: per-(order, supplier) flags, then
    per-order supplier/failure counts via a window — no lineitem
    self-join at all."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_os = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "has_r",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("has_r").over(w).alias("n_fail"),
    )
    return (
        flagged.filter(
            (F.col("has_r") == 1) & (F.col("n_supp") >= 2) & (F.col("n_fail") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_name", F.col("numwait").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
