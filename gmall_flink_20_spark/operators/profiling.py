"""Data-quality profiling — the Deequ/GreatExpectations-style audit pass
a pipeline runs before trusting a new drop of data.

One scan produces per-column row/null/distinct counts and numeric
ranges. The distinct counts are EXACT here (the oracle gate needs
engine-equal numbers); Spark lowers multiple count-distincts to one
Expand-based aggregate, so it is still a single pass over the data. At
100 TB swap ``exact_distinct=False`` to ``approx_count_distinct`` —
same single-agg plan without the k-fold Expand blow-up (approximate, so
no cross-engine gate; the profile consumer tolerates ±2%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = [
    "profile_table",
    "equiwidth_histogram",
    "check_constraints",
    "approx_quantiles_checked",
    "certify_quantile_answers",
]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: (column, dtype, n, n_null, n_distinct,
    min_num, max_num) — numeric ranges are NULL for non-numeric columns.

    Single aggregation over one scan; the long-format reshape is a
    zero-shuffle stack of the 1-row aggregate.
    """
    cols = columns or df.columns
    aggs = []
    numeric = {}
    for c in cols:
        numeric[c] = isinstance(df.schema[c].dataType, NumericType)
        aggs.append(F.count(F.lit(1)).alias(f"_n_{c}"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if numeric[c]:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    one = df.agg(*aggs)
    parts = []
    for c in cols:
        dtype = df.schema[c].dataType.simpleString()
        mn = f"_mn_{c}" if numeric[c] else "CAST(NULL AS DOUBLE)"
        mx = f"_mx_{c}" if numeric[c] else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"('{c}', '{dtype}', _n_{c}, _nn_{c}, _nd_{c}, {mn}, {mx})"
        )
    stack = f"stack({len(cols)}, " + ", ".join(
        p[1:-1] for p in parts
    ) + ") AS (column, dtype, n, n_null, n_distinct, min_num, max_num)"
    return one.select(F.expr(stack)).select(
        "column",
        "dtype",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num",
        "max_num",
    )


def equiwidth_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-width histogram of an INTEGER column (optionally per group):
    bucket edges derive from the global min/max, so the whole histogram
    is two passes — one tiny min/max aggregate broadcast back, one
    map-side-combined bucket count. Integer bucket arithmetic
    (floor((v - lo) * n / (hi - lo + 1))) keeps the edges exact and
    engine-independent — no float boundary can misplace a value.

    Emits (group?, bucket, lo, hi, cnt) with bucket ∈ [0, n_buckets).
    """
    gcols = [group_col] if group_col else []
    bounds = df.agg(
        F.min(value_col).cast("long").alias("_lo"),
        F.max(value_col).cast("long").alias("_hi"),
    )
    span = F.col("_hi") - F.col("_lo") + 1
    bucket = F.floor(
        (F.col(value_col).cast("long") - F.col("_lo")) * n_buckets / span
    ).cast("long")
    out = (
        df.crossJoin(F.broadcast(bounds))
        .select(*gcols, bucket.alias("bucket"), "_lo", "_hi")
        .groupBy(*gcols, "bucket", "_lo", "_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # explicit floor before the long cast: Spark's double→long cast
    # truncates but DuckDB's rounds, so a bare cast would diverge on
    # non-integer edge arithmetic
    return out.select(
        *gcols,
        "bucket",
        (F.col("_lo") + F.floor(F.col("bucket") * span / n_buckets))
        .cast("long")
        .alias("lo"),
        (F.col("_lo") + F.floor((F.col("bucket") + 1) * span / n_buckets) - 1)
        .cast("long")
        .alias("hi"),
        "cnt",
    )


def check_constraints(
    df: DataFrame,
    checks: dict[str, "F.Column"],
) -> DataFrame:
    """Deequ-style constraint verification: each named check is a boolean
    Column; the report counts violations per rule in ONE scan (all
    checks fold into a single aggregate projection — adding a rule adds
    a column, not a pass). Emits (rule, n_rows, n_violations, passed).

    Uniqueness-style checks need an aggregate, not a row predicate —
    express them as a row predicate over a window (see the query
    wrapper) or check n_distinct from ``profile_table`` instead.

    NULL semantics (SQL three-valued logic, same in the oracle): a rule
    evaluating to NULL on a row counts as NOT violated — write
    ``col.isNotNull() & predicate`` when unverifiable rows should fail.
    """
    names = list(checks)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name in names:
        aggs.append(
            F.sum(F.when(~checks[name], 1).otherwise(0)).alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    stack = f"stack({len(names)}, " + ", ".join(
        f"'{n}', _v_{n}" for n in names
    ) + ") AS (rule, n_violations)"
    return one.select(F.col("_n"), F.expr(stack)).select(
        "rule",
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def approx_quantiles_checked(
    df: DataFrame,
    value_col: str,
    group_col: str,
    accuracy: int = 1000,
) -> DataFrame:
    """Exact per-group p50/p90/p99 plus booleans asserting the
    Greenwald-Khanna ``percentile_approx`` sketch landed inside its
    RANK-error guarantee — the WA6 error-bound-gate pattern applied to
    quantiles (the estimate itself is estimator-specific, but the bound
    IS oracle-checkable: the SQL oracle emits the exact quantiles and
    literal TRUE, so a hash match proves the guarantee held).

    The guarantee is on RANKS (error <= n/accuracy), so the gate checks
    ranks directly rather than value bands (a value band from
    interpolated quantiles is ill-posed when the group is small and
    neighboring values are far apart): the count of group values
    strictly below / at-or-below the sketch's answer must intersect
    [(p - d)n - 1, (p + d)n + 1], d = 1/accuracy (the +-1 covers the
    floor/ceiling convention at the band edges). Two aggregates over
    the group: one builds the sketch answers (and the exact quantiles),
    a second counts ranks against the broadcast answers. At 100 TB the
    sketch is the only viable path (exact percentile sorts the group);
    this query certifies it against exact rank arithmetic.
    """
    ps = {"50": 0.5, "90": 0.9, "99": 0.99}
    answers = df.groupBy(group_col).agg(
        *[
            F.percentile_approx(F.col(value_col), F.lit(p), F.lit(int(accuracy)))
            .cast("double")
            .alias(f"_a{name}")
            for name, p in ps.items()
        ]
    )
    # the rank-band verification is shared with the streaming form
    # (events_quantiles_streaming certifies sketch answers that arrive
    # from the state store instead of the first aggregate)
    return certify_quantile_answers(
        df, answers, value_col, [group_col], accuracy=accuracy
    )


def certify_quantile_answers(
    base: DataFrame,
    answers: DataFrame,
    value_col: str,
    group_cols: list[str],
    accuracy: int = 1000,
) -> DataFrame:
    """Certify EXTERNALLY-computed quantile-sketch answers against
    exact rank arithmetic — the second half of
    ``approx_quantiles_checked``, factored out so the answers can come
    from a STREAMING percentile_approx aggregation (whose merged
    per-micro-batch sketch state carries the same 1/accuracy rank
    guarantee as the batch partial-merge path this band was calibrated
    on).

    ``answers``: one row per group with ``_a50/_a90/_a99`` (the
    sketch's p50/p90/p99 answers). Output: ``group_cols`` + exact
    p50/p90/p99 (round-6, oracle-comparable) + ``q*_ok`` booleans —
    the count of group values strictly below / at-or-below each answer
    must intersect [(p-d)n - 1, (p+d)n + 1], d = 1/accuracy. One
    broadcast join (answers are group-cardinality-sized) and ONE
    aggregation computing exact quantiles and rank counts together —
    a single scan of the group data.
    """
    d = 1.0 / float(accuracy)
    ps = {"50": 0.5, "90": 0.9, "99": 0.99}
    joined = base.select(
        *group_cols, F.col(value_col).alias("_v")
    ).join(F.broadcast(answers), group_cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for name, p in ps.items():
        aggs.append(
            (F.round(F.percentile(F.col("_v"), F.lit(p)), 6) + F.lit(0.0)).alias(
                f"p{name}"
            )
        )
        aggs.append(
            F.sum((F.col("_v") < F.col(f"_a{name}")).cast("long")).alias(
                f"_lt{name}"
            )
        )
        aggs.append(
            F.sum((F.col("_v") <= F.col(f"_a{name}")).cast("long")).alias(
                f"_le{name}"
            )
        )
    ranked = joined.groupBy(*group_cols, *[f"_a{n}" for n in ps]).agg(*aggs)
    flags = []
    for name, p in ps.items():
        n = F.col("_n").cast("double")
        lo = (F.lit(p - d) * n) - F.lit(1.0)
        hi = (F.lit(p + d) * n) + F.lit(1.0)
        flags.append(
            (
                (F.col(f"_lt{name}").cast("double") <= hi)
                & (F.col(f"_le{name}").cast("double") >= lo)
            ).alias(f"q{name}_ok")
        )
    return ranked.select(*group_cols, *[f"p{n}" for n in ps], *flags)
