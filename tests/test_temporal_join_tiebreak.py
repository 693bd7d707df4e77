"""Same-microsecond convention pin for the temporal table join.

ADVICE r8: the streaming decision rule previously resolved dim-version
validity under the (ts_us, event_id) total order while the batch
operator (analytics.temporal_join) and the shared oracle use ts-only
containment (valid_from_us <= ts_us) — a latent divergence whenever a
dim change shares a fact's exact microsecond with a larger event_id.
The chosen convention is TS-ONLY on both sides: a dim version taking
effect at exactly the fact's timestamp applies to that fact, whatever
the event_id order; two dim versions at the same timestamp resolve to
the sorted-last (higher event_id) one — the version the oracle's
zero-width-interval containment picks. These tests pin that convention
on the batch operator and the streaming state machine independently.
"""

from __future__ import annotations

import sys
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gmall_flink_20_spark.operators.analytics import temporal_join
from gmall_flink_20_spark.streaming import replay, stateful


def _utc(us: int):
    return datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)


def test_batch_same_microsecond_version_applies(spark):
    """valid_from_us == fact ts_us -> the new version applies (and a
    zero-width predecessor interval never matches any fact)."""
    dim = spark.createDataFrame(
        [
            (1, "view", 500, 1000),
            # zero-width: replaced within the same microsecond
            (1, "stale", 1000, 1000),
            (1, "browse", 1000, None),
        ],
        "user_id long, state string, valid_from_us long, valid_to_us long",
    )
    facts = spark.createDataFrame(
        [(1, 999), (1, 1000), (1, 1001)], "user_id long, ts_us long"
    )
    got = {
        r.ts_us: r.st
        for r in temporal_join(
            facts, dim, "user_id", "ts_us", {"state": "st"}
        ).collect()
    }
    assert got == {999: "view", 1000: "browse", 1001: "browse"}


def test_stream_same_microsecond_matches_batch_convention(spark):
    """A dim change sharing the fact's microsecond with a LARGER
    event_id must still apply (old (ts, eid) rule would pick 'view');
    two same-ts dim versions resolve to the higher-event_id one."""
    base = 1_600_000_000_000_000  # epoch µs
    rows = [
        # user 1: view@t0(eid 1), then browse@t1 with eid 100 > fact eid
        (1, 1, base, "view", 0),
        (1, 100, base + 1_000_000, "browse", 0),
        (1, 50, base + 1_000_000, "purchase", 7),  # same µs, smaller eid
        # user 2: two dim versions in the same microsecond -> higher eid
        (2, 10, base, "a", 0),
        (2, 20, base, "b", 0),
        (2, 5, base, "purchase", 9),  # same µs as both versions
    ]
    ev = spark.createDataFrame(
        [
            (u, e, us, et, c, _utc(us))
            for (u, e, us, et, c) in rows
        ],
        "user_id long, event_id long, ts_us long, event_type string, "
        "cents long, ts timestamp",
    )
    s1, s2, _ = replay.sentinel_pair(spark, ev)
    stream = replay.replay_stream(
        spark, ev, "ts", num_chunks=2, extra_chunks=[s1, s2]
    )
    out = stateful.temporal_join_stream(stream.withWatermark("ts", "1 seconds"))
    res = (
        replay.run_to_completion(out)
        .filter(F.col("user_id") >= 0)
        .collect()
    )
    got = {(r.user_id, r.ts_us): r.state_at for r in res}
    assert got[(1, base + 1_000_000)] == "browse"
    assert got[(2, base)] == "b"
    # and the batch operator agrees on the identical inputs
    from gmall_flink_20_spark.operators.analytics import scd2_intervals

    dim = scd2_intervals(
        ev.filter(F.col("event_type") != "purchase")
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "cents"
    )
    batch = {
        (r.user_id, r.ts_us): r.state_at
        for r in temporal_join(
            facts, dim, "user_id", "ts_us", {"state": "state_at"}
        ).collect()
    }
    assert batch == got
