"""Property-based tests (hypothesis): operator outputs vs brute-force
Python models on arbitrary small inputs."""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gmall_flink_20_spark.operators import patterns, topn, windows

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=7200),  # ts seconds offset
        st.sampled_from(["error", "success"]),
    ),
    min_size=1,
    max_size=40,
)

BASE = 1_700_000_000  # epoch anchor (multiple of nothing special)


def ts(s: int):
    return datetime.fromtimestamp(BASE + s, tz=timezone.utc).replace(tzinfo=None)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(EVENTS)
def test_tumbling_count_matches_model(spark, events):
    rows = [(u, ts(t)) for u, t, _ in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.window_end_s, r.user_id): r.cnt
        for r in windows.tumbling_count(df, "ts", "10 minutes", "user_id").collect()
    }
    model = Counter()
    for u, t, _ in events:
        window_end = ((BASE + t) // 600 + 1) * 600
        model[(window_end, u)] += 1
    assert got == dict(model)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(EVENTS)
def test_consecutive_pairs_matches_model(spark, events):
    rows = [(u, i, ts(t), et) for i, (u, t, et) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    got = sorted(
        (r.user_id, r.first_fail_s, r.last_fail_s)
        for r in patterns.consecutive_event_pairs(
            df, "user_id", "ts", "event_type", "error", 60, "event_id"
        ).collect()
    )
    model = []
    per_user: dict = {}
    for i, (u, t, et) in enumerate(events):
        per_user.setdefault(u, []).append((t, i, et))
    for u, evs in per_user.items():
        evs.sort()
        for (t0, _, e0), (t1, _, e1) in zip(evs, evs[1:]):
            if e0 == "error" and e1 == "error" and (BASE + t1) - (BASE + t0) <= 60:
                model.append((u, BASE + t0, BASE + t1))
    assert got == sorted(model)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # partition
            st.integers(min_value=0, max_value=50),  # item
            st.integers(min_value=1, max_value=99),  # count
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda x: (x[0], x[1]),
    ),
    st.integers(min_value=1, max_value=5),
)
def test_topn_matches_model(spark, rows, n):
    df = spark.createDataFrame(rows, "p long, item long, cnt long")
    got = {}
    for r in topn.top_n_per_key(df, ["p"], "cnt", n, tiebreak=["item"]).collect():
        got.setdefault(r.p, []).append((r.rn, r.item, r.cnt))
    model = {}
    for p, item, cnt in rows:
        model.setdefault(p, []).append((item, cnt))
    for p, items in model.items():
        ranked = sorted(items, key=lambda ic: (-ic[1], ic[0]))[:n]
        model[p] = [(i + 1, item, cnt) for i, (item, cnt) in enumerate(ranked)]
    got = {p: sorted(v) for p, v in got.items()}
    assert got == model


DOCS = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(DOCS)
def test_jaccard_blocked_matches_python_model(spark, texts):
    """Exact hashed-shingle Jaccard (n=1 so short strings shingle) must
    equal a direct Python set model on every same-block pair."""
    from gmall_flink_20_spark.operators import dedup

    rows = [(i, t, "x", "y") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        (r.doc_a, r.doc_b): (r.inter_sz, r.union_sz)
        for r in dedup.jaccard_blocked(df, n=1).collect()
    }
    # engine tokenization: split(trim(s), '\s+') yields [""] for empty
    # input in BOTH Spark and DuckDB (the oracles agree on this edge), so
    # the model must too
    def toks(t: str) -> list[str]:
        t = t.strip()
        return [""] if t == "" else t.split()

    sets = {i: set(toks(t)) for i, t in enumerate(texts)}
    ids = sorted(sets)
    expected = {
        (a, b): (len(sets[a] & sets[b]), len(sets[a]) + len(sets[b]) - len(sets[a] & sets[b]))
        for a in ids for b in ids
        if a < b and len(sets[a] & sets[b]) > 0
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(DOCS)
def test_permuted_minhash_ignores_duplicate_shingles(spark, texts):
    """min() over a multiset equals min() over its set: signatures from
    text with repeated tokens must equal signatures of the deduped text."""
    from gmall_flink_20_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts) if len(t.split()) >= 1]
    if not rows:
        return
    dup_rows = [(i, t + " " + t) for i, t in rows]  # every 1-shingle twice
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ddf = spark.createDataFrame(dup_rows, "doc_id long, text string")
    sig = {r.doc_id: r.sig for r in dedup.minhash_signature_permuted(df, n=1).collect()}
    dsig = {r.doc_id: r.sig for r in dedup.minhash_signature_permuted(ddf, n=1).collect()}
    assert sig == dsig


def test_ivf_recall_monotone_in_nprobe(spark):
    """More probes can only add candidates: top-k under nprobe=p must be
    at least as close to brute force as nprobe=1 (set containment of
    scanned cells implies rank quality is monotone; we check the exact
    top-1 neighbor is recovered once nprobe reaches nlist)."""
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import ann, similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.ann_bruteforce_topk(emb, [0, 1], 1).collect()
    }
    full = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann.ann_ivf_topk(emb, [0, 1], 1, nlist=4, nprobe=4).collect()
    }
    assert full == bf


# ---------------------------------------------------------------- components

EDGE_LISTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=1,
    max_size=60,
)


def _union_find_components(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {
        x: find(x) for x in parent
        if any(a != b and x in (a, b) for a, b in edges)
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(EDGE_LISTS)
def test_connected_components_matches_union_find(spark, edges):
    from gmall_flink_20_spark.operators import components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.id: r.component
        for r in components.connected_components(df).collect()
    }
    assert got == _union_find_components(edges)


def test_connected_components_chain_converges(spark):
    """A 64-node path is the worst case for naive min-label propagation
    (diameter 63); large-star/small-star must close it in O(log² n)
    rounds — well inside the default max_iter."""
    from gmall_flink_20_spark.operators import components

    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in components.connected_components(df).collect()}
    assert got == {i: 0 for i in range(64)}


def test_resolve_duplicates_keep_best(spark):
    from gmall_flink_20_spark.operators import components

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.1), (4, 0.7)], "doc_id long, quality double"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    # min-id canonical: keeps 1 (root) and unclustered 4
    kept = sorted(
        r.doc_id for r in components.resolve_duplicates(docs, clusters).collect()
    )
    assert kept == [1, 4]
    # quality-ranked canonical: keeps 2 (best of cluster) and 4
    best = sorted(
        r.doc_id
        for r in components.resolve_duplicates(
            docs, clusters, rank_cols=["quality"]
        ).collect()
    )
    assert best == [2, 4]


def test_ivf_pq_degenerates_to_pq_when_probing_all(spark):
    """IVF-PQ with nprobe = nlist scans every inverted list, so its
    ranking must equal plain PQ/ADC with the same codebooks — the IVF
    stage only PRUNES, it never re-scores."""
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import ann

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qids = [0, 1, 2]
    full = ann.ann_ivf_pq_topk(
        emb, qids, k=5, nlist=4, nprobe=4, coarse_iters=1
    ).collect()
    pq = ann.ann_pq_topk(emb, qids, k=5).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted((r.query_id, r.rank, r.neighbor_id) for r in full) == sorted(
        (r.query_id, r.rank, r.neighbor_id) for r in pq
    )


def test_ivf_pq_probes_prune_candidates(spark):
    """With nprobe < nlist each query's candidate set is a strict subset
    of the corpus: every returned neighbor must live in one of the
    query's probed cells."""
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import ann

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = ann.kmeans_centroids_local(
        emb.select("vec_id", "embedding"), nlist=8, iters=1
    )
    assigned = {
        r.vec_id: r.cid
        for r in emb.select(
            "vec_id", ann._assign_udf(cents)("embedding").alias("cid")
        ).collect()
    }
    out = ann.ann_ivf_pq_topk(
        emb, [0, 1], k=5, nlist=8, nprobe=2, coarse_iters=1
    ).collect()
    # recompute each query's probe set with the same sequential fold
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter("vec_id in (0, 1)").collect()
    }
    for qid, qv in qvecs.items():
        cd = []
        for cid, cv in cents:
            s = 0.0
            for i in range(len(cv)):
                d = qv[i] - cv[i]
                s = s + d * d
            cd.append((s, cid))
        probed = {cid for _, cid in sorted(cd)[:2]}
        for r in out:
            if r.query_id == qid:
                assert assigned[r.neighbor_id] in probed


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=2,
        max_size=30,
    )
)
def test_zvalue_preserves_per_dimension_order(spark, pts):
    """Morton order property: fixing one coordinate, z is monotone in
    the other (the reason range-cutting z bounds both dimensions)."""
    from pyspark.sql import functions as F

    from gmall_flink_20_spark.operators.layout import zvalue

    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select("x", "y", zvalue(F.col("x"), F.col("y"), 8).alias("z")).collect()
    by_x = {}
    for r in got:
        by_x.setdefault(r.x, []).append((r.y, r.z))
    for _, ys in by_x.items():
        ys.sort()
        zs = [z for _, z in ys]
        assert zs == sorted(zs)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 5), min_size=5, max_size=200),
    st.integers(2, 8),
)
def test_mg_heavy_hitters_model(spark, keys, k):
    """Every emitted key must be genuinely heavy (> n/(k+1)), the bound
    boolean must hold, and NO heavy key may be missed."""
    from collections import Counter

    from gmall_flink_20_spark.operators import sketches

    df = spark.createDataFrame([(v,) for v in keys], "k long").repartition(4)
    out = {r.item_id: r for r in sketches.mg_heavy_hitters_checked(df, "k", k=k).collect()}
    exact = Counter(keys)
    n = len(keys)
    heavy = {key for key, c in exact.items() if c > n / (k + 1)}
    assert set(out) == heavy
    for key in heavy:
        assert out[key].exact_cnt == exact[key]
        assert out[key].mg_within_bound


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_is_a_distribution_when_no_dangling(spark, raw_edges):
    """With symmetric edges every node has out-edges, so PageRank mass
    is conserved: Σ pr = 1 (within round-8 slack per node)."""
    from gmall_flink_20_spark.operators import graph

    sym = {(a, b) for a, b in raw_edges if a != b}
    sym |= {(b, a) for a, b in sym}
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in sorted(sym)], "src long, dst long, w double"
    )
    pr = graph.pagerank(df, iters=2, weight_col="w").collect()
    assert all(r.pr > 0 for r in pr)
    assert abs(sum(r.pr for r in pr) - 1.0) < 1e-6 * max(1, len(pr))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
        min_size=1,
        max_size=12,
    )
)
def test_dup_span_stats_matches_model(spark, docs):
    """Window census vs a brute-force python model: positional n-gram
    multiset, global multiplicity >= 2 flags."""
    from collections import Counter

    from gmall_flink_20_spark.operators import dedup

    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.dup_span_stats(df, n=n).collect()}

    grams = {}
    for i, toks in enumerate(docs):
        grams[i] = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    global_counts = Counter(g for gs in grams.values() for g in gs)
    for i, toks in enumerate(docs):
        if len(toks) < n:
            assert i not in got
            continue
        dup = sum(1 for g in grams[i] if global_counts[g] >= 2)
        assert got[i].n_windows == len(grams[i])
        assert got[i].n_dup_windows == dup


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # user
            st.integers(0, 86400 * 20),  # ts offset
            st.integers(0, 20000),  # cents
        ),
        min_size=4,
        max_size=60,
    )
)
def test_rfm_scores_are_monotone_in_metrics(spark, purchases):
    """Quartile scores must be monotone: a user with strictly better
    recency/frequency/monetary than another can never score worse."""
    from gmall_flink_20_spark.operators import analytics

    rows = [
        (u, ts(t), "purchase", c / 100.0, i)
        for i, (u, t, c) in enumerate(purchases)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double, event_id long"
    )
    out = {r.user_id: r for r in analytics.rfm_segments(df).collect()}
    users = list(out.values())
    for a in users:
        for b in users:
            if a.recency_days < b.recency_days:
                assert a.r_score <= b.r_score
            if a.frequency > b.frequency:
                assert a.f_score <= b.f_score
            if a.monetary_cents > b.monetary_cents:
                assert a.m_score <= b.m_score


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(-3, 3)),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    st.integers(2, 9),
)
def test_range_partitioned_rank_matches_global_sort(spark, rows, nbuckets):
    """range_partitioned_rank == the unpartitioned row_number for any
    value distribution (ties, negatives, skew) and any bucket count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_flink_20_spark.operators import analytics

    df = spark.createDataFrame(rows, "k long, v long")
    got = analytics.range_partitioned_rank(df, "v", "k", nbuckets=nbuckets)
    w = Window.orderBy(F.col("v").asc(), F.col("k").desc())
    exp = df.withColumn("_r_asc", F.row_number().over(w).cast("long"))
    g = {r["k"]: r["_r_asc"] for r in got.collect()}
    e = {r["k"]: r["_r_asc"] for r in exp.collect()}
    assert g == e


# ------------------------------------------------- round-6 late ops


WORD_DOCS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(WORD_DOCS, st.integers(min_value=2, max_value=5))
def test_zipf_slope_invariant_under_count_scaling(spark, docs, c):
    # multiplying every term count by c shifts ln(cnt) by ln(c): the
    # least-squares slope and R² are translation-invariant in y
    from gmall_flink_20_spark.operators.text import zipf_fit

    rows = [(i, " ".join(words), "en") for i, words in enumerate(docs)]
    scaled = [(i, " ".join(words * c), "en") for i, words in enumerate(docs)]
    # words*c preserves each doc's multiset scaled by c exactly
    df1 = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df2 = spark.createDataFrame(scaled, "doc_id long, text string, lang string")
    r1 = zipf_fit(df1, min_count=1).collect()[0]
    r2 = zipf_fit(df2, min_count=1).collect()[0]
    assert r1.n_terms == r2.n_terms
    if r1.zipf_slope is None:
        assert r2.zipf_slope is None
    else:
        assert abs(r1.zipf_slope - r2.zipf_slope) <= 1e-5
    if r1.zipf_r2 is not None and r2.zipf_r2 is not None:
        assert abs(r1.zipf_r2 - r2.zipf_r2) <= 1e-5


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(WORD_DOCS)
def test_burstiness_nonnegative_and_matches_model(spark, docs):
    # Cauchy-Schwarz: N·Q >= S²  =>  Q/S - S/N >= 0 for every term; and
    # the closed form equals the brute-force VMR over all docs w/ zeros
    from gmall_flink_20_spark.operators.text import term_burstiness

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = term_burstiness(df, top_k=100, min_df=1).collect()
    n = len(docs)
    for r in got:
        assert r.burstiness >= 0.0
        per_doc = [Counter(words)[r.term] for words in docs]
        s, q = sum(per_doc), sum(x * x for x in per_doc)
        assert r.df == sum(1 for x in per_doc if x)
        assert r.total_tf == s
        assert r.burstiness == round(q / s - s / n, 6)


DAILY = st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=8)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(DAILY, st.integers(min_value=2, max_value=4))
def test_changepoint_day_invariant_under_count_scaling(spark, counts, c):
    # scaling every day's count by c scales every |n·S_i − i·S_n| by c:
    # the argmax day is invariant, the statistic scales exactly by c
    import datetime as dt

    from gmall_flink_20_spark.operators.analytics import changepoint_cusum

    def build(mult):
        rows = []
        for day, cnt in enumerate(counts, start=1):
            for j in range(cnt * mult):
                rows.append(("a", dt.datetime(2024, 3, day, 8, j % 60, j // 60), 1))
        return spark.createDataFrame(
            rows, "event_type string, ts timestamp, user_id long"
        )

    r1 = changepoint_cusum(build(1)).collect()[0]
    rc = changepoint_cusum(build(c)).collect()[0]
    assert r1.cp_day == rc.cp_day
    assert rc.cusum_stat == c * r1.cusum_stat
    assert rc.n_days == r1.n_days == len(counts)


def test_changepoint_single_day_zero_stat(spark):
    import datetime as dt

    from gmall_flink_20_spark.operators.analytics import changepoint_cusum

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 3, 1, 8, 0), 1)],
        "event_type string, ts timestamp, user_id long",
    )
    r = changepoint_cusum(df).collect()[0]
    assert r.n_days == 1 and r.cusum_stat == 0 and r.cusum_norm == 0.0


# ------------------------------------------------------------- round 7

TEXTS = st.lists(
    st.text(alphabet="abcx .?!", min_size=1, max_size=40),
    min_size=2,
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_kl_divergence_nonnegative_property(spark, texts):
    # Gibbs: smoothed KL over the realized event space is always >= 0
    # (up to the round-6 contract), for any corpus shape
    from gmall_flink_20_spark.operators import text as T

    rows = [
        (i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts) if t.strip()
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = T.kl_divergence_by_source(df).collect()
    assert all(r.kl_unigram >= -1e-6 for r in out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25))
def test_survival_monotone_and_bounded(spark, durations):
    # Kaplan-Meier is a product of factors in [0, 1]: the curve is
    # non-increasing in day and stays within [0, 1]; n_risk is
    # non-increasing too — for ANY duration multiset (all converters)
    from gmall_flink_20_spark.operators import analytics as A

    base = 1_700_000_000
    rows = []
    for i, d in enumerate(durations):
        rows.append((i, 0, "view"))
        rows.append((i, d * 86400 + 1, "purchase"))
    df = spark.createDataFrame(
        [(j, u, ts(t), et) for j, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = sorted(A.survival_km(df).collect(), key=lambda r: r.day)
    s_prev, n_prev = 1.0 + 1e-9, None
    for r in out:
        assert -1e-9 <= r.survival <= s_prev
        if n_prev is not None:
            assert r.n_risk <= n_prev
        s_prev, n_prev = r.survival, r.n_risk


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=15))
def test_ewma_between_window_min_and_max(spark, counts):
    # a weighted mean of window counts can never leave [min, max] of the
    # counts inside the window
    from gmall_flink_20_spark.operators import analytics as A

    rows = []
    eid = 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, 1, ts(d * 86400), "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.day: r for r in A.ewma_trend(df, last_days=100).collect()}
    lo, hi = min(counts), max(counts)
    for r in out.values():
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.sampled_from(["view", "click", "purchase"]), min_size=2, max_size=30))
def test_multitouch_credit_conservation(spark, seq):
    # every conversion with >= 1 touch hands out EXACTLY 1.0 total
    # credit: sum(credit) == n_conversions-with-touches, any sequence
    from gmall_flink_20_spark.operators import analytics as A

    rows = [(i, 1, ts(i * 60), et) for i, et in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = A.multitouch_attribution(df).collect()
    total_credit = sum(r.credit for r in out)
    # conversions that have at least one prior touch within lookback
    n_conv = 0
    for i, et in enumerate(seq):
        if et == "purchase" and any(
            e in ("view", "click") and j < i and (i - j) * 60 <= 86400
            for j, e in enumerate(seq)
        ):
            n_conv += 1
    assert total_credit == pytest.approx(n_conv, abs=1e-4)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=0, max_size=3000))
def test_gif_lzw_roundtrip_property(spark, data):
    from gmall_flink_20_spark.operators import multimodal as M

    assert M._gif_lzw_decode(M._gif_lzw_encode(data or b"\x00")) == (data or b"\x00")


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    )
)
def test_skyline_matches_bruteforce(spark, pts):
    from gmall_flink_20_spark.operators import analytics as A

    df = spark.createDataFrame(
        [(i, float(x), int(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y long",
    )
    got = sorted((r.x, r.y) for r in A.skyline2d(df, "x", "y", "pid").collect())
    uniq = set((float(x), y) for x, y in pts)
    exp = sorted(
        p
        for p in uniq
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in uniq
        )
    )
    assert got == exp


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=60),
    st.lists(st.integers(30, 99), min_size=1, max_size=60),
)
def test_theta_overlap_matches_python_kmv(spark, ids_a, ids_b):
    # full determinism: a plain-python KMV replica (same md5-prefix hash,
    # same k-min / theta / estimate arithmetic) reproduces every Spark
    # estimate to within the round(,3) quantum, saturated or not
    import hashlib

    from gmall_flink_20_spark.operators import sketches as S

    K = 8
    rows = [("a", u) for u in ids_a] + [("b", u) for u in ids_b]
    df = spark.createDataFrame(rows, "grp string, uid long")
    r = S.theta_overlap(df, "grp", "uid", k=K).collect()[0]

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    M = float(16**15)
    ha, hb = sorted({h(u) for u in ids_a}), sorted({h(u) for u in ids_b})
    ta = float(16**15) if len(ha) < K else ha[K - 1]
    tb = float(16**15) if len(hb) < K else hb[K - 1]
    sa, sb = [x for x in ha[:K] if x < ta], [x for x in hb[:K] if x < tb]
    tab = min(ta, tb)
    saa, sbb = {x for x in sa if x < tab}, {x for x in sb if x < tab}
    q = 5.1e-4  # round(,3) quantum slack
    assert r.n_a == len(ha) and r.n_b == len(hb)
    assert abs(r.est_a - len(sa) * M / ta) <= q
    assert abs(r.est_b - len(sb) * M / tb) <= q
    assert abs(r.est_inter - len(saa & sbb) * M / tab) <= q
    assert abs(r.est_union - len(saa | sbb) * M / tab) <= q
    assert r.exact_inter == len(set(ha) & set(hb))


def _lpa_python(edges, rounds=5):
    """Plain-python replica of the LPA schedule (self-vote, min-label
    tie-break, synchronous) — the reference implementation the Spark
    operator must match exactly."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    nodes = sorted(set(x for e in edges for x in e))
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = {}
        for n in nodes:
            votes: dict[int, int] = {}
            for m in adj.get(n, []):
                votes[lbl[m]] = votes.get(lbl[m], 0) + 1
            votes[lbl[n]] = votes.get(lbl[n], 0) + 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[n] = best[0]
        lbl = nxt
    return lbl


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(EDGE_LISTS)
def test_label_propagation_matches_python_replica(spark, edges):
    from gmall_flink_20_spark.operators.graph import label_propagation

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "item_a long, item_b long")
    got = {r.item_id: r.community for r in label_propagation(df).collect()}
    # both sides count parallel edges with MULTIPLICITY (the replica
    # appends adjacency once per edge occurrence, exactly as Spark's
    # per-row vote does), so equality holds for duplicate and
    # reversed-duplicate edges too — no deduped-input restriction
    assert got == _lpa_python(edges)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=2, max_size=30)
)
def test_bloom_never_misses_a_true_dup(spark, texts):
    """The defining Bloom property: zero false negatives — every probe
    doc whose fingerprint exists in the index half MUST be a bloom hit,
    for any corpus."""
    from gmall_flink_20_spark.operators.dedup import bloom_membership_report

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = bloom_membership_report(df).collect()[0]
    assert r.n_bloom_hits >= r.n_true_dups
    assert r.n_false_pos == r.n_bloom_hits - r.n_true_dups
    assert r.n_false_pos >= 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=50),  # minute
            st.sampled_from(["view", "click", "error"]),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_temporal_join_containment_property(spark, dim_events, facts):
    """For every fact, the joined version (if any) must CONTAIN the
    fact's timestamp, and a version must exist whenever the user has
    any dim event at or before the fact."""
    from gmall_flink_20_spark.operators.analytics import scd2_intervals, temporal_join

    rows = [
        (i, u, float(m * 60), s) for i, (u, m, s) in enumerate(dim_events)
    ]
    from pyspark.sql import functions as F

    dim_df = spark.createDataFrame(
        rows, "event_id long, user_id long, t double, event_type string"
    ).select(
        "event_id", "user_id", F.col("t").cast("timestamp").alias("ts"), "event_type"
    )
    iv = scd2_intervals(dim_df)
    f_df = spark.createDataFrame(
        [(u, m * 60 * 1_000_000) for u, m in facts], "user_id long, ts_us long"
    )
    out = temporal_join(
        f_df,
        iv,
        "user_id",
        "ts_us",
        {"state": "st", "valid_from_us": "vf", "valid_to_us": "vt"},
    ).collect()
    earliest = {}
    for _, u, t, _s in rows:
        us = int(t * 1_000_000)
        earliest[u] = min(earliest.get(u, us), us)
    for r in out:
        if r.st is None:
            # no version can cover: user has no dim event <= fact time
            assert r.user_id not in earliest or r.ts_us < earliest[r.user_id]
        else:
            assert r.vf <= r.ts_us
            assert r.vt is None or r.ts_us < r.vt


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=5,
        max_size=60,
    )
)
def test_certify_quantiles_accepts_truth_rejects_junk(spark, vals):
    """The rank-band certifier must accept the data's own exact
    quantiles and reject an answer below every value (impossible rank),
    for any input."""
    import numpy as np

    from gmall_flink_20_spark.operators.profiling import certify_quantile_answers

    base = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, v double"
    )
    a50, a90, a99 = (float(np.percentile(vals, p)) for p in (50, 90, 99))
    good = spark.createDataFrame(
        [("g", a50, a90, a99)],
        "grp string, _a50 double, _a90 double, _a99 double",
    )
    r = certify_quantile_answers(base, good, "v", ["grp"]).collect()[0]
    assert r.q50_ok and r.q90_ok and r.q99_ok
    junk = spark.createDataFrame(
        [("g", float(min(vals) - 1), a90, a99)],
        "grp string, _a50 double, _a90 double, _a99 double",
    )
    j = certify_quantile_answers(base, junk, "v", ["grp"]).collect()[0]
    # an answer below every value has zero at-or-below rank; the p50
    # lower band is (0.5-d)n-1 >= 1.5 for n >= 5 -> must flag
    assert j.q50_ok is False


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.integers(min_value=0, max_value=8),  # coarse ts -> collisions
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_temporal_join_ts_only_rule_matches_model(spark, dim_events, facts):
    """The batch temporal join must resolve every fact to the state of
    the user's LAST dim event (in (ts, event_id) order) with ts <= fact
    ts — the ts-only containment convention (ADVICE r8) — on arbitrary
    data INCLUDING same-timestamp churn (the coarse ts domain forces
    collisions between dim versions and facts)."""
    from pyspark.sql import functions as F

    from gmall_flink_20_spark.operators.analytics import scd2_intervals, temporal_join

    rows = [(i, u, t * 60.0, s) for i, (u, t, s) in enumerate(dim_events)]
    dim_df = spark.createDataFrame(
        rows, "event_id long, user_id long, t double, event_type string"
    ).select(
        "event_id", "user_id", F.col("t").cast("timestamp").alias("ts"), "event_type"
    )
    iv = scd2_intervals(dim_df)
    f_df = spark.createDataFrame(
        [(u, t * 60 * 1_000_000) for u, t in facts], "user_id long, ts_us long"
    )
    got = {}
    for r in temporal_join(f_df, iv, "user_id", "ts_us", {"state": "st"}).collect():
        got.setdefault((r.user_id, r.ts_us), set()).add(r.st)
    model = {}
    for u, t in facts:
        t_us = t * 60 * 1_000_000
        hist = sorted(
            (int(x[2] * 1_000_000), x[0], x[3]) for x in rows if x[1] == u
        )
        st_at = None
        for vt, _eid, vs in hist:
            if vt <= t_us:
                st_at = vs
            else:
                break
        model.setdefault((u, t_us), set()).add(st_at)
    assert got == model
