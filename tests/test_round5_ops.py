"""Round-5 operator gates: the six previously-unverified operators
(VERDICT r4 item 1), the registry-window rotation invariants (item 4),
and the stale-memo retrain scenario (item 7)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gmall_flink_20_spark import queries as Q
from gmall_flink_20_spark.operators import analytics, ann, lm, text


# ------------------------------------------------------------ registry window


def test_window_is_exactly_fifty():
    assert len(Q._R9_WINDOW) == Q.WINDOW_SIZE == 50
    assert len(set(Q._R9_WINDOW)) == 50


def test_window_leads_the_registry():
    # updated each rotation: the CURRENT round's window fronts the dict
    assert list(Q.QUERIES)[:50] == Q._R13_WINDOW


def test_round10_new_ops_are_in_window():
    assert set(Q.R10_NEW) <= set(Q._R10_WINDOW)


def test_round9_rollover_fully_fronted():
    # VERDICT r9 item 1: ALL 41 rolled-over entries (the r5-latest
    # cohort — the entire staleness backlog) gate in round 10, so
    # nothing older than r6 remains
    assert len(Q._R9_ROLLOVER) == 41
    assert set(Q._R9_ROLLOVER) <= set(Q._R10_WINDOW)


def test_window_rotation_fronts_stalest():
    # round-10 rotation: the stale cohort in-window is the oldest-first
    # PREFIX of the round-6-stale list, and nothing pooled is silently
    # dropped — what doesn't fit is named in _R10_ROLLOVER (ADVICE r6)
    stale_in = [n for n in Q._STALE_R6 if n in set(Q._R10_WINDOW)]
    assert stale_in == Q._STALE_R6[: len(stale_in)]
    assert set(Q._R10_WINDOW) | set(Q._R10_ROLLOVER) == set(Q._R10_POOL)
    assert not (set(Q._R10_WINDOW) & set(Q._R10_ROLLOVER))


def test_staleness_bound_policy_enforced():
    # SURVEY §7.8: worst-case re-gate latency, computed from the LIVE
    # registry size, must stay inside the 6-round policy bound
    n = len(Q._ALL)
    bound = -(-(n - Q.WINDOW_SIZE) // (Q.WINDOW_SIZE - 10))
    assert bound <= 6


def test_registry_complete():
    assert set(Q.QUERIES) == set(Q._ALL)


# ------------------------------------------------------- seasonality_profile


def test_seasonality_negative_epoch_stays_in_range(spark):
    # pre-1970 timestamps must land in 0-6 / 0-23, not negative buckets
    # (ADVICE r4: truncating cast + % remainder gave negatives)
    df = spark.createDataFrame(
        [(-1,), (-86400 * 3 - 7200,), (0,), (86400 + 3600,)], "ts_s long"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    rows = analytics.seasonality_profile(df).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dow"] <= 6, r
        assert 0 <= r["hour"] <= 23, r
    # 1969-12-31 23:59:59 (ts=-1) is a Wednesday (dow 3, hour 23)
    cell = {(r["dow"], r["hour"]) for r in rows}
    assert (3, 23) in cell
    # 1970-01-01 00:00:00 is a Thursday (dow 4, hour 0)
    assert (4, 0) in cell


def test_seasonality_lift_identity(spark):
    # a single populated cell has lift == 1 by construction
    df = spark.createDataFrame([(3600,), (3600,)], "ts_s long").select(
        F.col("ts_s").cast("timestamp").alias("ts")
    )
    rows = analytics.seasonality_profile(df).collect()
    assert len(rows) == 1 and rows[0]["lift"] == 1.0


# ------------------------------------------------------- fulfillment_latency


def test_fulfillment_latency_last_shipment(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT", "2024-01-01"), (2, "1-URGENT", "2024-01-10")],
        "o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [(1, "2024-01-03"), (1, "2024-01-08"), (2, "2024-01-11")],
        "l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    [r] = analytics.fulfillment_latency(orders, lineitem).collect()
    # order 1 latency = LAST line (7 days), order 2 = 1 day
    assert r["n_orders"] == 2
    assert r["min_days"] == 1 and r["max_days"] == 7
    assert r["mean_days"] == 4.0


# ---------------------------------------------------------------- bigram_lm


def test_bigram_lm_drops_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lm.bigram_lm(df).collect()}
    # docs 2 and 3 have < 2 tokens -> no bigram rows
    assert set(rows) == {1}
    # doc 1 bigrams: "a b" x2, "b a" x1 -> n=3; corpus freqs 2,1
    r = rows[1]
    assert r["n_bigrams"] == 3
    assert r["sum_bf"] == 2 * 2 + 1 * 1
    assert r["min_bf"] == 1
    assert r["lm2_score"] == pytest.approx((5 / 3) / 3)


# ------------------------------------------------------------- phrase_census


def test_phrase_census_min_df_and_rank(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown dog sits"),
            (3, "the quick brown cat naps"),
            (4, "completely different text here"),
        ],
        "doc_id long, text string",
    )
    rows = text.phrase_census(df, n=3, min_df=2, topk=10).collect()
    # only "the quick brown" and "quick brown ..." phrases can recur;
    # "the quick brown" spans all 3 docs and must rank first
    assert rows[0]["phrase"] == "the quick brown"
    assert rows[0]["n_docs"] == 3
    assert rows[0]["df_share"] == 0.75
    # nothing with df < 2 survives
    assert all(r["n_docs"] >= 2 for r in rows)


# ---------------------------------------------------------------- vocab_gini


def test_vocab_gini_flat_vs_skewed(spark):
    # flat distribution (all tf equal) -> Gini ~ 0; skewed -> higher
    flat = spark.createDataFrame(
        [(1, "a b c d", "en")], "doc_id long, text string, lang string"
    )
    skew = spark.createDataFrame(
        [(1, "a a a a a a b", "en")], "doc_id long, text string, lang string"
    )
    [rf] = text.vocab_gini(flat).collect()
    [rs] = text.vocab_gini(skew).collect()
    assert rf["vocab_size"] == 4 and rf["total_tokens"] == 4
    assert rf["gini"] == 0.0
    # skew: tf=[1(b),6(a)] ranked asc -> G = 2*(1*1+2*6)/(2*7) - 3/2
    assert rs["gini"] == pytest.approx(2 * 13 / 14 - 1.5)
    assert rs["gini"] > rf["gini"]


# --------------------------------------------------------- ann_nprobe_pareto


def test_nprobe_pareto_monotone(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {
        r["nprobe"]: r
        for r in ann.ann_nprobe_pareto(
            emb, list(range(10)), 5, nprobes=(1, 2, 4), nlist=16, train_iters=3
        ).collect()
    }
    assert set(rows) == {1, 2, 4}
    # candidates scanned strictly grow with nprobe; recall never drops
    assert rows[1]["total_candidates"] < rows[2]["total_candidates"] < rows[4]["total_candidates"]
    assert rows[1]["mean_recall"] <= rows[2]["mean_recall"] <= rows[4]["mean_recall"]
    assert all(r["n_queries"] == 10 for r in rows.values())
    assert all(0.0 <= r["mean_recall"] <= 1.0 for r in rows.values())


# ------------------------------------------------- stale-artifact memo retrain


def test_memo_retrains_after_inplace_rewrite(spark, tmp_path):
    # rewriting the SAME path with different data must invalidate the
    # artifact memo (fingerprint includes file size+mtime) — the stale
    # scenario ADVICE r3 described for concurrent sessions.
    import random

    path = str(tmp_path / "emb")
    rng = random.Random(7)

    def write(seed):
        rng2 = random.Random(seed)
        rows = [(i, [rng2.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(path)

    write(1)
    df1 = spark.read.parquet(path)
    c1 = ann.kmeans_centroids_local(df1, 4, 1, "vec_id", "embedding", dim=8)
    write(2)
    df2 = spark.read.parquet(path)
    c2 = ann.kmeans_centroids_local(df2, 4, 1, "vec_id", "embedding", dim=8)
    assert c1 != c2, "memo returned stale centroids after in-place rewrite"


# ----------------------------------------------- distributed decile/Gini


def test_dist_rank_windows_are_bucket_partitioned(spark, sf_dir):
    """The scale-safe forms must never rank the key frame in a single
    partition: every row_number window over the per-key values has the
    range bucket in its partition spec (VERDICT r4 item 2 plan gate)."""
    import re

    from tests.test_scale_plans import plan_of

    for name in ("customers_revenue_pareto_dist", "customers_ltv_dist"):
        plan = plan_of(Q.QUERIES[name](spark, sf_dir))
        specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
        assert specs, f"{name}: no rank window found"
        for args in specs:
            assert "_bucket" in args.split(",")[0], (
                f"{name}: rank window not bucket-partitioned: {args}"
            )


def test_dist_forms_match_exact_forms(spark, sf_dir):
    from gmall_flink_20_spark.testing import assert_frames_match

    for dist, exact in (
        ("customers_revenue_pareto_dist", "customers_revenue_pareto"),
        ("customers_ltv_dist", "customers_ltv"),
    ):
        assert_frames_match(
            Q.QUERIES[dist](spark, sf_dir).toPandas(),
            Q.QUERIES[exact](spark, sf_dir).toPandas(),
            f"{dist} vs {exact}",
        )


def test_ntile_formula_matches_spark_ntile(spark):
    """_ntile10_from_desc_rank must reproduce ntile(10) exactly for
    remainder-heavy and tiny n."""
    from pyspark.sql import Window

    for n in (7, 10, 23, 101, 1007):
        df = spark.range(1, n + 1).withColumnRenamed("id", "r_desc")
        w = Window.orderBy("r_desc")
        got = df.select(
            "r_desc",
            analytics._ntile10_from_desc_rank(
                F.col("r_desc"), F.lit(n).cast("long")
            ).alias("d"),
            F.ntile(10).over(w).cast("long").alias("expected"),
        )
        bad = got.filter(F.col("d") != F.col("expected")).count()
        assert bad == 0, f"n={n}: {bad} mismatches"


# --------------------------------------------- round-5 second-batch operators


def test_mahalanobis_identical_vectors_score_zero(spark):
    # a corpus of identical vectors has zero variance everywhere -> the
    # zero-var guard yields score 0, not NaN
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    from gmall_flink_20_spark.operators import similarity

    rows = similarity.mahalanobis_outliers(df, dim=2).collect()
    assert len(rows) == 4
    assert all(r["maha2"] == 0.0 for r in rows)


def test_mahalanobis_flags_the_outlier(spark):
    from gmall_flink_20_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.1]), (3, [-1.0, -0.1]), (9, [0.0, 50.0])],
        "vec_id long, embedding array<double>",
    )
    scores = {r["vec_id"]: r["maha2"] for r in similarity.mahalanobis_outliers(df, dim=2).collect()}
    assert scores[9] == max(scores.values())


def test_cross_source_contamination_matrix(spark):
    from gmall_flink_20_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "a b c d e f", "s1"),       # grams: "a b c d e", "b c d e f"
            (2, "a b c d e x", "s2"),       # shares "a b c d e" with s1
            (3, "q r s t u v", "s3"),       # disjoint
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r["source_a"], r["source_b"]): r for r in text_ops.cross_source_contamination(df).collect()}
    assert len(rows) == 6  # 3*2 ordered pairs, zero-overlap pairs included
    assert rows[("s1", "s2")]["shared"] == 1
    assert rows[("s1", "s2")]["grams_a"] == 2
    assert rows[("s1", "s2")]["containment"] == 0.5
    assert rows[("s2", "s1")]["containment"] == 0.5
    assert rows[("s1", "s3")]["shared"] == 0
    assert rows[("s1", "s3")]["containment"] == 0.0


def test_referential_audit_counts_orphans_and_null_keys(spark):
    from gmall_flink_20_spark.operators import analytics

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    [r] = analytics.referential_audit([("c_p", child, "fk", parent, "pk")]).collect()
    # 99 has no parent; NULL never matches -> both orphans
    assert r["n_child"] == 4 and r["n_orphans"] == 2
    assert r["orphan_share"] == 0.5


def test_minhash_calibration_identical_docs(spark):
    """Two identical docs must land at full signature agreement with
    exact jaccard 1.0; the disjoint doc pairs (if banded together) at 0."""
    from gmall_flink_20_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    rows = {r["n_matches"]: r for r in dedup.minhash_calibration(df).collect()}
    assert 16 in rows  # the identical pair agrees on every component
    assert rows[16]["micro_jaccard"] == 1.0
    assert rows[16]["est_jaccard"] == 1.0


def test_dedup_savings_ledger(spark):
    from gmall_flink_20_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (5, "alpha beta gamma delta epsilon zeta"),
            (9, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    [r] = dedup.dedup_savings(df).collect()
    # one cluster {1,2,5}: survivor 1, dups 2 and 5 carry 6 tokens each
    assert r["cluster_size"] == 3 and r["n_clusters"] == 1
    assert r["total_docs"] == 3 and r["dup_docs"] == 2
    assert r["dup_tokens"] == 12


def test_tokenizer_fertility_ratios(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "don't stop", "en")],
        "doc_id long, text string, lang string",
    )
    [r] = text.tokenizer_fertility(df).collect()
    # ws tokens: 2 + 2 = 4; bpe: hello|world=2, don|'|t|stop=4 -> 6
    assert r["ws_tokens"] == 4 and r["bpe_tokens"] == 6
    assert r["total_chars"] == 11 + 10
    assert r["bpe_per_ws"] == 1.5


def test_pii_stats_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.com or c@d.org", "s1"),
            (2, "call 555-123-4567 now", "s1"),
            (3, "clean document", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    [r] = text.pii_stats(df).collect()
    assert r["docs_with_email"] == 1 and r["email_hits"] == 2
    assert r["docs_with_phone"] == 1 and r["phone_hits"] == 1
    assert r["pii_doc_share"] == pytest.approx(2 / 3, abs=1e-6)


def test_triangle_stats_known_graph(spark):
    from gmall_flink_20_spark.operators import graph

    # K4 minus one edge: nodes {1,2,3,4}, edges 12 13 14 23 24 (no 34)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "item_a long, item_b long"
    )
    [r] = graph.triangle_stats(edges).collect()
    assert r["n_nodes"] == 4 and r["n_edges"] == 5
    # triangles: 123 and 124
    assert r["n_triangles"] == 2
    # degrees: 1->3, 2->3, 3->2, 4->2 -> wedges 3+3+1+1 = 8
    assert r["n_wedges"] == 8
    assert r["global_clustering"] == 0.75


def test_triangle_stats_hub_star_has_none(spark):
    from gmall_flink_20_spark.operators import graph

    # star graph: hub 0 to leaves 1..5 — wedges but zero triangles
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "item_a long, item_b long"
    )
    [r] = graph.triangle_stats(edges).collect()
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 10
    assert r["global_clustering"] == 0.0


def test_cohort_ltv_curve(spark):
    orders = spark.createDataFrame(
        [
            (1, 100.0, "2024-01-05"),
            (1, 50.0, "2024-02-10"),
            (2, 10.0, "2024-01-20"),
            (3, 40.0, "2024-02-01"),
        ],
        "o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    rows = {(r["cohort_month"], r["age_months"]): r for r in analytics.cohort_ltv(orders).collect()}
    jan = 2024 * 12 + 1
    feb = jan + 1
    # Jan cohort: customers 1,2 -> size 2; age 0 revenue 11000 cents
    assert rows[(jan, 0)]["cohort_size"] == 2
    assert rows[(jan, 0)]["revenue_cents"] == 11000
    assert rows[(jan, 0)]["active_customers"] == 2
    # age 1: customer 1 spends 5000 -> cumulative 16000 -> LTV 80.0
    assert rows[(jan, 1)]["cum_revenue_cents"] == 16000
    assert rows[(jan, 1)]["cum_ltv_per_customer"] == 80.0
    # Feb cohort: customer 3 only
    assert rows[(feb, 0)]["cohort_size"] == 1
    assert rows[(feb, 0)]["revenue_cents"] == 4000


def test_seasonal_anomaly_zero_fill_catches_silent_week(spark):
    """A cell that goes silent one week must be flagged LOW — only the
    zero-filled grid can see it."""
    from datetime import datetime, timezone

    rows = []
    # cell (dow of day0+3h) active weeks 0-3 with 10 events, silent week 4
    for week in range(5):
        n = 10 if week < 4 else 0
        for i in range(n):
            rows.append((week * 100 + i, week * 604800 + 3 * 3600))
    # pacer in week 4 at another hour, so week 4 exists in the grid
    rows.append((999, 4 * 604800 + 10 * 3600))
    df = spark.createDataFrame(rows, "event_id long, ts_s long").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {r["week"]: r for r in analytics.seasonal_anomaly(df, z_threshold=1.9).collect() if r["hour"] == 3}
    # week 4's silent cell: counts (10,10,10,10,0) -> mean 8,
    # var (400-320)/5 = 16 -> z = (0-8)/4 = -2 — only visible zero-filled
    assert set(out) == {4}
    assert out[4]["n_events"] == 0
    assert out[4]["zscore"] == -2.0


def test_dup_provenance_split_sources(spark):
    from gmall_flink_20_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "s1"),
            (2, "alpha beta gamma delta epsilon zeta", "s2"),
            (3, "alpha beta gamma delta epsilon zeta", "s1"),
            (9, "one two three four five six seven", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r["source_x"], r["source_y"]): r for r in dedup.dup_provenance(df).collect()}
    # pairs (1,2) s1-s2, (1,3) s1-s1, (2,3) s1-s2
    assert rows[("s1", "s2")]["n_pairs"] == 2
    assert rows[("s1", "s2")]["within_source"] is False
    assert rows[("s1", "s1")]["n_pairs"] == 1
    assert rows[("s1", "s1")]["within_source"] is True


def test_order_backlog_interval_counting(spark):
    orders = spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-20"), (3, "2024-03-05")],
        "o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [(1, "2024-02-15"), (2, "2024-01-25"), (3, "2024-03-20")],
        "l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    rows = {r["month"]: r["open_orders"] for r in analytics.order_backlog(orders, lineitem).collect()}
    jan, feb, mar = 2024 * 12 + 1, 2024 * 12 + 2, 2024 * 12 + 3
    # Jan: orders 1,2 open; Feb: order 2 shipped in Jan -> only 1 open
    assert rows[jan] == 2
    assert rows[feb] == 1
    # Mar: order 1 shipped Feb; order 3 placed+shipped Mar -> 1 open
    assert rows[mar] == 1
    # month after Mar: everything shipped
    assert rows[mar + 1] == 0


def test_bot_cadence_flags_fixed_timer(spark):
    rows = []
    # bot user 1: exactly every 60s; human user 2: bursty gaps
    for i in range(6):
        rows.append((1, i, 1000 + 60 * i))
    for i, t in enumerate((0, 5, 8, 600, 610, 4000)):
        rows.append((2, 100 + i, 2000000 + t))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s long").select(
        "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {r["user_id"]: r for r in analytics.bot_cadence_score(df).collect()}
    assert out[1]["cv"] == 0.0 and out[1]["mean_gap_s"] == 60.0
    assert out[2]["cv"] > 1.0


def test_supplier_hhi_bounds(spark):
    li = spark.createDataFrame(
        [
            (1, 10, 100.0), (1, 11, 100.0),           # part 1: 50/50 split
            (2, 10, 400.0),                            # part 2: single source
            (3, 10, 300.0), (3, 11, 100.0),            # part 3: 75/25
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    rows = {r["l_partkey"]: r for r in analytics.supplier_hhi(li).collect()}
    assert rows[1]["hhi"] == 0.5 and rows[1]["n_suppliers"] == 2
    assert rows[2]["hhi"] == 1.0 and rows[2]["n_suppliers"] == 1
    assert rows[3]["hhi"] == 0.625


# --------------------------------------------------------- real media codecs


def test_media_real_roundtrip_local(spark):
    from gmall_flink_20_spark.operators import multimodal as mm

    df = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    out = {r["media_id"]: r for r in mm.decode_media(mm.encode_media(df)).collect()}
    assert len(out) == 9
    # kind assignment and per-kind fields
    assert out[0]["kind"] == "image" and out[0]["width"] == 5 and out[0]["height"] == 5
    assert out[1]["kind"] == "audio" and out[1]["sample_rate"] == 8000 and out[1]["n_samples"] == 64
    assert out[2]["kind"] == "video" and out[2]["n_frames"] == 4
    # closed-form check for one image
    exp = 3 * sum((3 + 3 * x + 7 * y) % 256 for x in range(5) for y in range(5))
    assert out[3]["content_sum"] == exp


def test_resize_images_real_nearest_neighbor(spark):
    from gmall_flink_20_spark.operators import multimodal as mm

    df = spark.createDataFrame([(0,), (3,)], "doc_id long")
    media = mm.encode_media(df)  # ids 0,3 -> both images
    resized = mm.resize_images_real(media, 2, 2).collect()
    assert len(resized) == 2
    by_id = {r["media_id"]: r for r in resized}
    for mid in (0, 3):
        r = by_id[mid]
        assert r["width"] == 2 and r["height"] == 2
        # re-decode the re-encoded BMP: nearest-neighbor of the 5x5
        # source at scale 2/5 picks source pixels (0, 2) on each axis
        w, h, s = mm._bmp_decode(bytes(r["payload"]))
        assert (w, h) == (2, 2)
        # decoded row y of the resized image maps to source row y*5//2
        exp = 3 * sum(
            (mid + 3 * (x * 5 // 2) + 7 * (y * 5 // 2)) % 256
            for x in range(2)
            for y in range(2)
        )
        assert s == exp, (mid, s, exp)


def test_threshold_sweep_monotone(spark):
    from gmall_flink_20_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),      # exact dup of 1
            (3, "alpha beta gamma delta epsilon OTHER"),     # partial overlap
            (9, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rows = {r["threshold"]: r for r in dedup.neardup_threshold_sweep(df).collect()}
    ts = sorted(rows)
    # pair and doc counts never increase as the threshold rises
    for lo, hi in zip(ts, ts[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
        assert rows[lo]["n_docs"] >= rows[hi]["n_docs"]
    # the exact-dup pair survives even at 0.9
    assert rows[0.9]["n_pairs"] >= 1


def test_pq_code_balance_bounds(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = ann.pq_code_balance(emb).collect()
    assert len(rows) == 8  # m subspaces
    for r in rows:
        # FAISS imbalance factor: 1 (uniform) <= f <= ks (collapsed)
        assert 1.0 <= r["imbalance"] <= 16.0, r
        assert 1 <= r["n_codes_used"] <= 16


def test_price_audit_violations(spark):
    li = spark.createDataFrame(
        [(1, 2.0, 200.0), (1, 1.0, 100.0), (1, 1.0, 500.0), (2, 1.0, 50.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "B1", 100.0), (2, "B2", 50.0)],
        "p_partkey long, p_brand string, p_retailprice double",
    )
    rows = {r["brand"]: r for r in analytics.price_integrity_audit(li, part).collect()}
    # part 1 retail 100: lines at unit 100, 100, 500 -> one violation (5x)
    assert rows["B1"]["n_lines"] == 3 and rows["B1"]["n_violations"] == 1
    assert rows["B2"]["n_violations"] == 0


def test_session_stats_summary(spark):
    sessions = spark.createDataFrame(
        [
            (1, 1000, 1000 + 600 + 1800, 5),   # 600s active
            (1, 9000, 9000 + 0 + 1800, 1),     # single-event session
            (2, 500, 500 + 1200 + 1800, 4),
        ],
        "user_id long, session_start_s long, session_end_s long, n_events long",
    )
    [r] = analytics.session_stats(sessions).collect()
    assert r["n_sessions"] == 3 and r["n_users"] == 2
    assert r["n_events"] == 10
    assert r["events_per_session"] == pytest.approx(10 / 3, abs=1e-6)
    assert r["max_duration_s"] == 1200
    assert r["p50_duration_s"] == 600.0
