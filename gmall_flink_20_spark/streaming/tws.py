"""transformWithStateInPandas (TWS) migration prototype — VERDICT r7
item 2.

PySpark 4.1 ships ``transformWithStateInPandas``: native per-key typed
state (Value/List/MapState) plus REGISTERED TIMERS, replacing the
single-timeout-per-group contract of ``applyInPandasWithState``. The
four GroupState-heavy replays (~67 s of the ~167 s streaming total)
sit on the applyInPandasWithState Python-worker round-trip floor, and
the replay-harness knobs are measured-exhausted — TWS's state server
(one long-lived Python worker per partition holding state out-of-band)
is the one untried lever.

STATUS — BLOCKED IN THIS SANDBOX, semantics proven, runtime untestable:
TWS's Python<->JVM state protocol requires the ``google.protobuf``
package (``pyspark/sql/streaming/proto``); it is NOT installed here and
installs are disallowed. A live A/B run crashes at query start with
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE: ImportError: cannot
import name 'descriptor' from 'google.protobuf'`` (verified against a
real replay stream this round; the plan builds, the runner cannot
boot). Same environmental-ceiling class as the Kafka broker (S4) and
PIL/ffmpeg (JPEG/MP4): the code below is the real migration target,
pinned by a broker-free contract harness (tests/test_tws_contract.py)
that drives the processor through the documented TWS lifecycle
(handleInputRows / handleExpiredTimer / state / timers) and gates it
against the SAME batch oracle as the live GroupState run — so when a
protobuf-equipped environment appears, the switch is the one-line
``order_timeout_stream_tws`` swap plus a bench A/B.

Decision recorded (BASELINE.md): the GroupState floor STANDS for this
sandbox; TWS migration is semantics-ready and environment-gated.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["OrderTimeoutProcessor", "order_timeout_stream_tws", "TWS_OUT_SCHEMA"]

TWS_OUT_SCHEMA = "user_id long, create_id long, create_ts_s long, status string"
_PENDING_SCHEMA = "create_id long, create_ts_s long"


def _resolve(
    pending: list[tuple[int, int]],
    arrivals: list[tuple[int, int, str]],
    horizon_s: int,
) -> tuple[list[tuple[int, int]], list[tuple[int, int, str]]]:
    """The J4 per-key transition function, shared verbatim with the
    GroupState form (stateful.order_timeout_stream): 'view' opens a
    pending order; 'purchase' resolves every pending within the horizon
    as 'payed' and every past-horizon pending as 'timeout'. Arrivals
    must be (ts, event_id)-sorted."""
    out: list[tuple[int, int, str]] = []
    for ts, eid, etype in arrivals:
        if etype == "view":
            pending.append((eid, ts))
        elif etype == "purchase":
            still = []
            for cid, cts in pending:
                if cts < ts <= cts + horizon_s:
                    out.append((cid, cts, "payed"))
                elif ts > cts + horizon_s:
                    out.append((cid, cts, "timeout"))
                else:
                    still.append((cid, cts))
            pending = still
    return pending, out


def _flush(
    pending: list[tuple[int, int]], wm_ms: int, horizon_s: int
) -> tuple[list[tuple[int, int]], list[tuple[int, int, str]]]:
    """Watermark flush: every pending whose deadline the watermark has
    passed emits 'timeout' — identical to the GroupState hasTimedOut
    branch."""
    out, still = [], []
    for cid, cts in pending:
        if (cts + horizon_s) * 1000 <= wm_ms:
            out.append((cid, cts, "timeout"))
        else:
            still.append((cid, cts))
    return still, out


def _emit(user_id: int, rows: list[tuple[int, int, str]]) -> Iterator[pd.DataFrame]:
    if rows:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "create_id": [r[0] for r in rows],
                "create_ts_s": [r[1] for r in rows],
                "status": [r[2] for r in rows],
            }
        )


def make_order_timeout_processor(horizon_s: int):
    """Build the TWS StatefulProcessor for J4. Import of the TWS base
    class is deferred so the module imports even on a Spark without the
    API; the processor itself uses only the documented handle surface
    (getListState / registerTimer / listTimers / deleteTimer), which the
    contract harness replicates."""
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
    )

    class OrderTimeoutProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._pending = handle.getListState("pending", _PENDING_SCHEMA)

        def _load(self) -> list[tuple[int, int]]:
            return [(int(r[0]), int(r[1])) for r in self._pending.get()]

        def _sync(self, pending: list[tuple[int, int]], timer_values) -> None:
            # single-timer discipline (min deadline), as the GroupState
            # form's setTimeoutTimestamp: clear, then re-register
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if pending:
                self._pending.put([(c, t) for c, t in pending])
                deadline_ms = min(t for _, t in pending) * 1000 + horizon_s * 1000
                self._handle.registerTimer(
                    max(deadline_ms, timer_values.getCurrentWatermarkInMs() + 1)
                )
            else:
                self._pending.clear()

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pending = self._load()
            arrivals: list[tuple[int, int, str]] = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts_s", "event_id"])
                arrivals.extend(
                    zip(
                        pdf["ts_s"].astype("int64").tolist(),
                        pdf["event_id"].astype("int64").tolist(),
                        pdf["event_type"].tolist(),
                    )
                )
            arrivals.sort(key=lambda a: (a[0], a[1]))
            pending, out = _resolve(pending, arrivals, horizon_s)
            self._sync(pending, timerValues)
            yield from _emit(user_id, out)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            pending, out = _flush(
                self._load(), timerValues.getCurrentWatermarkInMs(), horizon_s
            )
            self._sync(pending, timerValues)
            yield from _emit(user_id, out)

        def close(self) -> None:
            pass

    return OrderTimeoutProcessor()


# module-level alias for the docstring-promised name
OrderTimeoutProcessor = make_order_timeout_processor


def order_timeout_stream_tws(events: DataFrame, horizon_s: int) -> DataFrame:
    """The TWS plan for J4 — buildable today, runnable once
    ``google.protobuf`` exists (see module docstring). Expects the same
    input contract as stateful.order_timeout_stream."""
    return events.groupBy("user_id").transformWithStateInPandas(
        make_order_timeout_processor(horizon_s),
        TWS_OUT_SCHEMA,
        "append",
        "eventTime",
    )
