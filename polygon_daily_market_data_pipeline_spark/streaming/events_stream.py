"""Streaming analytics over the events stream: watermarked windowed
aggregation and a custom stateful sessionizer.

These are the streaming-only operators the reference lacks (SURVEY.md
§2.9 — its cadence is daily batch) but that a continuous ingest of the
same data needs. Both run equally over an unbounded source or, with
``Trigger.AvailableNow``, over a bounded directory — in which case the
results equal the batch equivalents, which is how the DuckDB oracle
checks them value-exactly (``run_*_available_now`` below).

Scale notes: the windowed aggregation is a streaming hash aggregate with
partial (map-side) combine — state per (window, event_type) only; the
watermark bounds state size. The sessionizer keeps one state row per
live user key, partitioned by user_id across executors via
``applyInPandasWithState``; the timeout is event-time (watermark-driven)
so state is evicted deterministically, not by wall clock.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = dt.timedelta(minutes=30)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

# State keeps timestamps as epoch MICROSECONDS (LongType), not
# TimestampType: PySpark round-trips state values through
# TimestampType.fromInternal/toInternal, which convert via the HOST
# local timezone, while the Arrow-delivered input rows are naive-UTC
# (session tz). On any non-UTC host the two disagree by the UTC offset
# — longs make the state machine timezone-free.
_STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type with a late-data
    watermark. Works on a stream (incremental state, append output once
    the watermark passes) and on a batch frame (watermark is a no-op)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def interval_join_stream(
    clicks: DataFrame,
    views: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (round 12, VERDICT r11
    #4 — the attribution join every clickstream pipeline runs): each
    click paired with EVERY view by the same user within
    ``[click_ts - lookback, click_ts]``. Structured Streaming's
    symmetric hash join buffers both sides in keyed state; the
    watermark plus the time-range condition bound that state — a view
    is evictable once the click-side watermark passes
    ``view_ts + lookback``, so state is O(users × lookback window), not
    O(stream). INNER join (default): matched pairs append as soon as
    both sides have arrived — on bounded data the drained result
    equals the batch interval join exactly, which is how the oracle
    checks it.

    ``how="left_outer"`` (round 13, VERDICT r12 #3) adds the
    attribution pipeline's other half: a click with NO qualifying view
    emits once with NULL view columns — but only after the watermark
    PROVES no match can still arrive (views can carry ``view_ts <=
    click_ts``, so a click is closed once the watermark passes
    ``click_ts``). This is eviction-driven emission, state semantics
    the inner join never exercises: the null row comes out of the
    state store at timeout, not from any input row.
    ``how="right_outer"`` is the view-side mirror (a view is closed
    once the watermark passes ``view_ts + lookback`` — the latest
    click that could still claim it), and ``how="full_outer"`` emits
    both sides' timeouts; on a bounded drain the view-side
    batch-equivalence predicate is ``view_ts + lookback < min(max
    click_ts, max view_ts)``, strict like the click side (pinned
    empirically in tests/test_streaming.py). Two consequences
    callers must know at any scale:

    - emission waits for the GLOBAL watermark — the MIN over both
      input streams' (max event time − delay); a stalled view stream
      delays unmatched-click emission, it never wrongly emits;
    - on a bounded drain a no-match click at exactly the terminal
      watermark stays in state (eviction is strictly-below-watermark),
      so the batch-equivalence predicate is ``click_ts < min(max
      click_ts, max view_ts)`` — encoded exactly by the oracle, and
      pinned empirically in tests/test_streaming.py.

    Works identically on batch frames (watermark is a no-op and the
    condition is a plain range join) — the batch twin the streaming
    result is pinned against in tests. Output: (user_id, click_ts,
    view_ts, click_value, view_value).

    Scale: ONE shuffle per side on user_id into co-partitioned state
    stores; no pairwise expansion beyond true matches. At 100 TB the
    knobs that matter are the watermark (state retention) and
    ``lookback`` (per-key fan-out) — both explicit here."""
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", watermark)
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    v = views.select(
        F.col("user_id").alias("view_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    joined = c.join(
        v,
        F.expr(
            "user_id = view_user_id "
            f"AND view_ts >= click_ts - INTERVAL {lookback} "
            "AND view_ts <= click_ts"
        ),
        how,
    )
    # view-side timeout rows carry a NULL click: their user arrives on
    # the view's key column — coalesce so every output row names its
    # user (a no-op for inner/left, where the click side is present)
    return joined.withColumn(
        "user_id", F.coalesce("user_id", "view_user_id")
    ).drop("view_user_id")


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-user session state machine: extend the open session while
    events fall within SESSION_GAP of its end; emit closed sessions.

    Events inside one micro-batch are sorted here; across batches the
    event-time timeout closes a session only after the watermark passes
    session_end + gap, so late events within the watermark reopen
    nothing they shouldn't."""
    (user_id,) = key
    gap_us = int(SESSION_GAP.total_seconds() * 1_000_000)

    def emit(start_us: int, end_us: int, n: int, sv: float) -> dict:
        # Naive-UTC pandas timestamps: Arrow + session tz (UTC) maps
        # them back to the exact event-time instants.
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(end_us, unit="us"),
            "n_events": n,
            "sum_value": sv,
        }

    if state.hasTimedOut:
        start_us, end_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame([emit(start_us, end_us, n, sv)])
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    out = []
    if state.exists:
        start_us, end_us, n, sv = state.get
    else:
        start_us = end_us = None
        n, sv = 0, 0.0

    for r in rows.itertuples(index=False):
        # pandas Timestamp is naive-UTC here (Arrow, session tz UTC);
        # .value is epoch ns with no host-tz interpretation.
        ts_us = int(r.ts.value // 1000)
        if start_us is None:
            start_us, end_us, n, sv = ts_us, ts_us, 1, float(r.value)
        elif ts_us - end_us <= gap_us:
            end_us, n, sv = max(end_us, ts_us), n + 1, sv + float(r.value)
        else:
            out.append(emit(start_us, end_us, n, sv))
            start_us, end_us, n, sv = ts_us, ts_us, 1, float(r.value)

    state.update((start_us, end_us, n, sv))
    # Event-time timeout: close the session once the watermark passes
    # its end + gap. Pure integer epoch math — no datetime.timestamp(),
    # which would interpret a naive datetime in the HOST OS timezone.
    state.setTimeoutTimestamp(end_us // 1000 + gap_us // 1000)
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    ``applyInPandasWithState`` (event-time timeout)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_stream_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The same gap-session operator on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (typed state handles + explicit
    event-time timers instead of a single state tuple + timeout conf).

    Kept alongside ``sessionize_stream`` rather than replacing it: both
    produce identical sessions (differential-tested against
    ``sessionize_batch``), but the TWS form is where new stateful
    features land (state TTL, multiple state variables, timer lists) —
    at 100 TB the interesting delta is that state variables are
    per-name, so a processor can evolve its state schema additively.

    Timer discipline: one live timer per key at ``session_end + gap``.
    Stale timers (superseded by a later event extending the session)
    are deleted on re-registration, so ``handleExpiredTimer`` only ever
    fires for a genuinely idle session — same eviction semantics as the
    EventTimeTimeout path in ``_sessionize_group``.

    Import-guarded: the TWS state server speaks protobuf
    (``pyspark.sql.streaming.proto``), so the ``protobuf`` package must
    be installed — absent it, the driver-side pre-init worker crashes
    with an opaque STREAM_FAILED; we fail fast with the dependency name
    instead. ``sessionize_stream`` (applyInPandasWithState) has no such
    dependency and is the registered/benched implementation.

    Guard re-verified against pyspark 4.1.2 (2026-08): the vendored
    ``pyspark.sql.streaming.proto.StateMessage_pb2`` still hard-imports
    ``google.protobuf`` (descriptor/symbol_database/builder), which
    pyspark declares as an optional extra, not a dependency — so the
    guard is load-bearing wherever protobuf isn't shipped, and the
    parity test runs the full TWS differential wherever it is.
    """
    try:
        import google.protobuf  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's TWS state-server protocol), which this "
            "environment does not ship; use sessionize_stream "
            "(applyInPandasWithState) or install protobuf."
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = int(SESSION_GAP.total_seconds() * 1_000_000)

    def _emit(user_id: int, start_us: int, end_us: int, n: int, sv: float):
        return pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(end_us, unit="us"),
                    "n_events": n,
                    "sum_value": sv,
                }
            ]
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # Same epoch-micros state encoding as _STATE_SCHEMA (see the
            # host-timezone note above — longs are timezone-free).
            self._session = handle.getValueState(
                "session",
                "session_start_us long, session_end_us long, "
                "n_events int, sum_value double",
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            (user_id,) = key
            pdfs = [pdf for pdf in rows]
            batch = pd.concat(pdfs).sort_values("ts")
            if self._session.exists():
                start_us, end_us, n, sv = self._session.get()
                old_timer = end_us // 1000 + gap_us // 1000
            else:
                start_us = end_us = None
                n, sv = 0, 0.0
                old_timer = None
            for r in batch.itertuples(index=False):
                ts_us = int(r.ts.value // 1000)
                if start_us is None:
                    start_us, end_us, n, sv = ts_us, ts_us, 1, float(r.value)
                elif ts_us - end_us <= gap_us:
                    end_us = max(end_us, ts_us)
                    n, sv = n + 1, sv + float(r.value)
                else:
                    yield _emit(user_id, start_us, end_us, n, sv)
                    start_us, end_us, n, sv = ts_us, ts_us, 1, float(r.value)
            self._session.update((start_us, end_us, n, sv))
            new_timer = end_us // 1000 + gap_us // 1000
            if old_timer is not None and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            self._handle.registerTimer(new_timer)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            (user_id,) = key
            if self._session.exists():
                start_us, end_us, n, sv = self._session.get()
                self._session.clear()
                yield _emit(user_id, start_us, end_us, n, sv)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def sessionize_batch(events: DataFrame, gap: dt.timedelta = SESSION_GAP) -> DataFrame:
    """Batch twin of ``sessionize_stream`` (gaps-and-islands with a lag
    window): same output on bounded data, and the form a SQL oracle can
    express — used to differential-test the stateful operator."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = int(gap.total_seconds())
    flagged = events.select(
        "user_id",
        "ts",
        "value",
        F.when(
            F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > gap_s,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("session_id")
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once record dedup on a business key — the
    streaming analog of the batch W1 window-dedup. State holds one entry
    per key seen within the watermark horizon and is evicted as event
    time advances, so state size is bounded by (arrival rate × horizon),
    not by stream length. Use when upstream retries can re-deliver rows
    (the reference's HTTP retry + FORCE=TRUE replay semantics)."""
    keys = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
