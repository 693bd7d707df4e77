"""Reference-fixture semantics tests (SURVEY §5 plan item 4, FIXTURES.md).

Tiny CSVs in tests/fixtures/ replicate the reference's bundled input
shapes (LoginLog/OrderLog/ReceiptLog/AdClickLog beans) with the edge
cases FIXTURES.md calls out; each test asserts the exact outcome the
reference app would print for that case (per the corrected test-tree
variants, SURVEY §7)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gmall_flink_20_spark.operators import blacklist, joins, patterns
from gmall_flink_20_spark.sources import connectors

FIXTURES = Path(__file__).parent / "fixtures"


def load_csv(spark, name: str, schema: StructType):
    lines = spark.read.text(str(FIXTURES / name))
    return connectors.csv_lines_to_rows(lines, schema)


@pytest.fixture(scope="module")
def login_events(spark):
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ip", StringType()),
            StructField("event_type", StringType()),
            StructField("ts", LongType()),
        ]
    )
    return load_csv(spark, "login_log.csv", schema).withColumn(
        "ts_t", F.timestamp_seconds("ts")
    ).withColumn("event_id", F.monotonically_increasing_id()).cache()


def test_login_fail_two_consecutive_within_2s(spark, login_events):
    """LoginFailWithState2 semantics (C2): user 5402 has 3 consecutive
    fails 1s apart → two warnings; 23064's fail-success-fail resets →
    none; 5692's fails are 17s apart → none; 76053's are 2s apart →
    fires (inclusive bound)."""
    out = patterns.consecutive_event_pairs(
        login_events, "user_id", "ts_t", "event_type", "fail", 2, "event_id"
    ).collect()
    got = sorted((r.user_id, r.first_fail_s, r.last_fail_s) for r in out)
    assert got == [
        (5402, 1558430841, 1558430842),
        (5402, 1558430842, 1558430843),
        (76053, 1558430841, 1558430843),
    ]


def test_login_fail_horizon_counts(spark, login_events):
    """C1 semantics: ≥2 fails within 2s of the first fail."""
    out = patterns.events_within_horizon(
        login_events, "user_id", "ts_t", "event_type", "fail", 3, 2
    ).collect()
    got = {(r.user_id, r.anchor_s): r.fail_cnt for r in out}
    assert got[(5402, 1558430841)] == 3  # fails at 841, 842, 843
    assert (5692, 1558430833) not in got  # next fail 17s later
    assert got[(76053, 1558430841)] == 2


@pytest.fixture(scope="module")
def order_events(spark):
    schema = StructType(
        [
            StructField("order_id", LongType()),
            StructField("event_type", StringType()),
            StructField("tx_id", StringType()),
            StructField("ts", LongType()),
        ]
    )
    return load_csv(spark, "order_log.csv", schema).withColumn(
        "ts_t", F.timestamp_seconds("ts")
    ).withColumn("event_id", F.col("ts")).cache()


def test_order_timeout_15min(spark, order_events):
    """OrderTimeOutStateApp semantics (J4, 900s horizon): 34729 pays in
    2s → payed; 34730/34732 never pay → timeout; 34731 pays 1765s later →
    timeout (pay-after-timeout side output); 34733 pays at exactly 899s →
    payed."""
    out = patterns.match_or_timeout(
        order_events, "order_id", "ts_t", "event_type", "create", "pay", 900, "event_id"
    ).collect()
    got = {r.order_id: r.status for r in out}
    assert got == {
        34729: "payed",
        34730: "timeout",
        34731: "timeout",
        34732: "timeout",
        34733: "payed",
    }


@pytest.fixture(scope="module")
def receipt_events(spark):
    schema = StructType(
        [
            StructField("tx_id", StringType()),
            StructField("pay_channel", StringType()),
            StructField("ts", LongType()),
        ]
    )
    return load_csv(spark, "receipt_log.csv", schema).cache()


def test_pay_receipt_interval_join(spark, order_events, receipt_events):
    """PayReceiptWithJoinApp semantics (J1): receipt within [-3s, +5s] of
    the pay on the same txId. sd76f87d6: receipt +3s → match; 3hu3k2932:
    receipt +5s → match (inclusive); ewr342as4: no pay → no row."""
    pays = order_events.filter(F.col("event_type") == "pay").select(
        "order_id", "tx_id", F.col("ts").alias("pay_ts")
    )
    recs = receipt_events.select("tx_id", F.col("ts").alias("receipt_ts"))
    out = joins.interval_join(pays, recs, "tx_id", "pay_ts", "receipt_ts", -3, 5)
    got = sorted(r["order_id"] for r in out.collect())
    assert got == [34729, 34731]


def test_pay_receipt_reconcile_categories(spark, order_events, receipt_events):
    """PayReceiptWithConnectApp semantics (J2): matched pairs + both
    orphan directions (the corrected test-tree onTimer behavior)."""
    pays = order_events.filter(F.col("event_type") == "pay").select(
        "tx_id", F.col("ts").alias("pay_ts")
    )
    recs = receipt_events.select("tx_id", F.col("ts").alias("receipt_ts"))
    out = joins.reconcile_full_outer(
        pays, recs, "tx_id", "pay_ts", "receipt_ts", -3, 5,
        matched="payed_and_receipt", left_only="payed_no_receipt", right_only="no_payed_but_receipt",
    )
    cats = sorted(r.category for r in out.collect())
    # abc123def pay has no receipt; ewr342as4 receipt has no pay
    assert cats == ["no_payed_but_receipt", "payed_and_receipt", "payed_and_receipt", "payed_no_receipt"]


def test_ad_click_blacklist(spark):
    """AdClickApp/BlackListProcessFunc semantics (§2.10): user 543462
    exceeds threshold 3 on ad 1715 → one warning, further clicks
    suppressed; others stay under budget."""
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ad_id", LongType()),
            StructField("province", StringType()),
            StructField("city", StringType()),
            StructField("ts", LongType()),
        ]
    )
    clicks = load_csv(spark, "ad_click_log.csv", schema).withColumn(
        "ts_t", F.timestamp_seconds("ts")
    )
    kept, warn = blacklist.daily_threshold_split(
        clicks, ["user_id", "ad_id"], "ts_t", 3, "ts"
    )
    assert kept.count() == 3 + 2 + 1  # 543462 capped at 3; others full
    w = warn.collect()
    assert len(w) == 1 and (w[0].user_id, w[0].ad_id) == (543462, 1715)
    assert "over 3" in w[0].warning_msg
