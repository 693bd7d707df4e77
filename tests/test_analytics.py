"""Unit tests for operators/analytics.py (as-of join, funnel, retention,
pivot), sampling.weighted_sample, and text.tfidf_topk — semantics on
hand-built frames plus the plan-shape contracts."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_20_spark.operators import analytics, sampling, text


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


# ------------------------------------------------------------ as-of join


def test_asof_join_basic_and_ties(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=10, oid="a"), Row(k=1, t=5, oid="b"), Row(k=2, t=7, oid="c")]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, t=5, rid=1, v="r1"),
            Row(k=1, t=5, rid=2, v="r2"),  # tie at t=5 → larger rid wins
            Row(k=1, t=9, rid=3, v="r3"),
            Row(k=2, t=8, rid=4, v="r4"),  # after left t=7 → no match
        ]
    )
    out = analytics.asof_join(
        left, right, key="k", time_col="t", carry={"v": "v"}, right_tiebreak="rid"
    )
    got = {(r.k, r.t): (r.v, r.matched_time) for r in out.collect()}
    assert got[(1, 10)] == ("r3", 9)
    assert got[(1, 5)] == ("r2", 5)  # <= semantics + max-rid tiebreak
    assert got[(2, 7)] == (None, None)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([Row(k=1, t=100, oid="a")])
    right = spark.createDataFrame([Row(k=1, t=10, rid=1, v="old")])
    out = analytics.asof_join(
        left, right, key="k", time_col="t", carry={"v": "v"},
        right_tiebreak="rid", tolerance_s=50,
    )
    row = out.collect()[0]
    assert row.v is None and row.matched_time is None


def test_asof_join_single_exchange(spark):
    left = spark.createDataFrame([Row(k=1, t=10, oid="a")])
    right = spark.createDataFrame([Row(k=1, t=5, rid=1, v="x")])
    plan = _plan(
        analytics.asof_join(
            left, right, key="k", time_col="t", carry={"v": "v"}, right_tiebreak="rid"
        )
    )
    # union + window: exactly one shuffle on the key, no join operator
    assert plan.count(") Exchange") == 1 and "hashpartitioning(k" in plan
    assert "Join" not in plan


# --------------------------------------------------------------- funnel


def test_funnel_earliest_chain(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes A→B→C in order
            Row(user_id=1, ts_s=10, event_type="A"),
            Row(user_id=1, ts_s=20, event_type="B"),
            Row(user_id=1, ts_s=30, event_type="C"),
            # u2: C before B → stops after B
            Row(user_id=2, ts_s=10, event_type="A"),
            Row(user_id=2, ts_s=15, event_type="C"),
            Row(user_id=2, ts_s=20, event_type="B"),
            # u3: B only (no A) → reaches no step
            Row(user_id=3, ts_s=10, event_type="B"),
        ]
    )
    out = analytics.funnel(ev, ["A", "B", "C"], horizon_s=1000, time_col="ts_s")
    got = {r.step_name: r.users for r in out.collect()}
    assert got == {"A": 2, "B": 2, "C": 1}


def test_funnel_horizon_excludes_late_completion(spark):
    ev = spark.createDataFrame(
        [
            Row(user_id=1, ts_s=0, event_type="A"),
            Row(user_id=1, ts_s=2000, event_type="B"),  # outside horizon of A@0
        ]
    )
    out = analytics.funnel(ev, ["A", "B"], horizon_s=1000, time_col="ts_s")
    got = {r.step_name: r.users for r in out.collect()}
    assert got == {"A": 1, "B": 0}


def test_funnel_same_timestamp_step_counts(spark):
    # step at exactly the same second as the previous step qualifies (>=)
    ev = spark.createDataFrame(
        [Row(user_id=1, ts_s=5, event_type="A"), Row(user_id=1, ts_s=5, event_type="B")]
    )
    out = analytics.funnel(ev, ["A", "B"], horizon_s=10, time_col="ts_s")
    got = {r.step_name: r.users for r in out.collect()}
    assert got == {"A": 1, "B": 1}


def test_funnel_single_exchange(spark):
    ev = spark.createDataFrame([Row(user_id=1, ts_s=0, event_type="A")])
    plan = _plan(analytics.funnel(ev, ["A", "B", "C"], horizon_s=10, time_col="ts_s"))
    # chained window mins share ONE hash partitioning on user_id; the
    # only other exchange is the single-row global-agg gather
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count(") Exchange") == 2


# ------------------------------------------------------------- retention


def test_retention_cohorts(spark):
    ev = spark.createDataFrame(
        [
            Row(user_id=1, ts="2024-01-01 10:00:00"),
            Row(user_id=1, ts="2024-01-03 09:00:00"),
            Row(user_id=2, ts="2024-01-01 23:59:59"),
            Row(user_id=2, ts="2024-01-01 08:00:00"),
        ]
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = analytics.retention_cohorts(ev)
    got = {(r.cohort_day, r.day_offset): r.users for r in out.collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


# ----------------------------------------------------------------- pivot


def test_pivot_counts_fills_absent_with_zero(spark):
    df = spark.createDataFrame(
        [Row(g="x", v="a"), Row(g="x", v="a"), Row(g="y", v="b")]
    )
    out = analytics.pivot_counts(df, "g", "v", ["a", "b", "c"])
    got = {r.g: (r.a, r.b, r.c) for r in out.collect()}
    assert got == {"x": (2, 0, 0), "y": (0, 1, 0)}


def test_pivot_no_domain_discovery_job(spark):
    # explicit values → building the plan schedules no Spark job
    df = spark.createDataFrame([Row(g="x", v="a")])
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = analytics.pivot_counts(df, "g", "v", ["a", "b"])
    _ = out.schema
    assert tracker.getJobIdsForGroup(None) == before


# ------------------------------------------------------ weighted sampling


def test_weighted_sample_deterministic_and_sized(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    a = sampling.weighted_sample(df, 50, "w", key_col="doc_id")
    b = sampling.weighted_sample(df.repartition(7), 50, "w", key_col="doc_id")
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert len(ra) == 50 and ra == rb  # partitioning-independent


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # one row with overwhelming weight is (near-)always selected
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(10_000_000)).otherwise(F.lit(1)).alias("w"),
    )
    out = sampling.weighted_sample(df, 5, "w", key_col="doc_id")
    assert 7 in {r.doc_id for r in out.collect()}


# ----------------------------------------------------------------- tfidf


def test_tfidf_scores_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="banana cherry"),
        ]
    )
    out = text.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in top1] == ["apple", "banana"]
    idf_apple = math.log((1 + 2) / (1 + 1)) + 1
    assert abs(top1[0].score - round(2 * idf_apple, 6)) < 1e-9
    # ranks are dense per doc starting at 1
    assert [r.rank for r in top1] == [1, 2]


def test_tfidf_no_python_udf(spark, sf_dir):
    from gmall_flink_20_spark.io import load_table

    plan = _plan(text.tfidf_topk(load_table(spark, sf_dir, "documents"), k=3))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ group trend


def test_group_trend_zero_variance_yields_null(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # group "a": two points one day apart, slope = 100 cents/day
        Row(event_type="a", ts=t, value=1.0),
        Row(event_type="a", ts=t + dt.timedelta(days=1), value=2.0),
        # group "b": single event → zero x-variance
        Row(event_type="b", ts=t, value=5.0),
        # group "c": all events at one timestamp → zero x-variance
        Row(event_type="c", ts=t, value=1.0),
        Row(event_type="c", ts=t, value=9.0),
    ]
    out = {
        r.event_type: r
        for r in analytics.group_trend(spark.createDataFrame(rows)).collect()
    }
    assert abs(out["a"].slope_cents_per_day - 100.0) < 1e-6
    assert out["b"].slope_cents_per_day is None
    assert out["b"].intercept_cents is None
    assert out["c"].slope_cents_per_day is None
    assert out["c"].intercept_cents is None


# ------------------------------------------------------------ market basket


def test_market_basket_rule_stats(spark):
    """4 baskets: {1,2,3}, {1,2}, {1,2}, {3}. Pair (1,2) count=3,
    support=3/4, conf both ways 3/3 and 3/3, lift = 4*3/(3*3)."""
    rows = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 2),  # duplicate line collapses
        (13, 3),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = analytics.market_basket(df, min_pair_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.pair_count) == (1, 2, 3)
    assert r.support == 0.75
    assert r.conf_a_b == 1.0 and r.conf_b_a == 1.0
    assert abs(r.lift - round(4 * 3 / 9, 6)) < 1e-12


def test_market_basket_broadcasts_marginals(spark):
    rows = [(o, i) for o in range(20) for i in range(o % 4 + 2)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    plan = _plan(analytics.market_basket(df, min_pair_count=1))
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan


def test_revenue_concentration_uniform_and_skewed(spark):
    # uniform spend -> gini 0; 10 keys, 1 per decile, cum_share k/10
    rows = [(k, 10.0) for k in range(10)]
    df = spark.createDataFrame(rows, "o_custkey long, o_totalprice double")
    out = {r.decile: r for r in analytics.revenue_concentration(df).collect()}
    assert len(out) == 10
    assert all(out[d].gini == 0.0 for d in out)
    assert out[3].cum_share == 0.3 and out[10].cum_share == 1.0
    # one key owns everything among n=2 -> gini = 1/2 (rank formula)
    df2 = spark.createDataFrame(
        [(1, 100.0), (2, 0.0)], "o_custkey long, o_totalprice double"
    )
    got = {r.decile: r for r in analytics.revenue_concentration(df2).collect()}
    assert got[1].gini == 0.5
    assert got[1].cum_share == 1.0


def test_inter_event_gaps_exact_percentiles(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(i, u, off, typ):
        return Row(event_id=i, user_id=u, ts=t0 + dt.timedelta(seconds=off), event_type=typ)

    rows = [
        # user 1 clicks at 0, 10, 30 -> gaps 10, 20
        ev(1, 1, 0, "click"), ev(2, 1, 10, "click"), ev(3, 1, 30, "click"),
        # user 2 clicks at 0, 40 -> gap 40
        ev(4, 2, 0, "click"), ev(5, 2, 40, "click"),
        # single view -> no gap, type absent from output
        ev(6, 1, 5, "view"),
    ]
    out = {r.event_type: r for r in analytics.inter_event_gaps(
        spark.createDataFrame(rows)).collect()}
    assert set(out) == {"click"}
    c = out["click"]
    assert (c.n_gaps, c.min_gap_s, c.max_gap_s) == (3, 10, 40)
    # sorted gaps [10, 20, 40]: p50 = 20, p90 = h=(n-1)*0.9=1.8 -> 20+0.8*20=36
    assert c.p50_gap_s == 20.0
    assert c.p90_gap_s == 36.0
