"""Streaming windowed aggregation + custom stateful operators.

The reference keeps no stream-time state (SURVEY T5: its "trending"
windows are query-time filters), but a 100 TB event pipeline needs
both standard shapes, so they're first-class here:

- ``windowed_counts``: tumbling event-time windows with a watermark —
  late rows beyond the watermark are dropped and window state is
  evicted, so state size is bounded by (watermark horizon / window).
- ``sessionize``: custom per-key state via applyInPandasWithState —
  session tracking with an inactivity gap, the canonical use of the
  arbitrary-stateful API. Arrow-batched; state is one small tuple per
  active key.

Operational gotcha: a stateful query with ProcessingTimeTimeout keeps
scheduling state-cleanup micro-batches even when no data is pending, so
``trigger(availableNow=True)`` never self-stops and
``processAllAvailable()`` never returns. Drive such queries by polling
``recentProgress`` for the expected input rows, then ``stop()``.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream exact dedup: ONE representative per content digest is
    emitted (which duplicate survives within a micro-batch is not
    defined — micro-batches have no total row order); re-arrivals
    within the watermark horizon are dropped and the digest state is
    evicted once the watermark passes — bounded state, unlike a naive
    dropDuplicates whose key set grows forever. The batch
    `pipelines.dedup.exact_dedup` remains the reconciliation path for
    duplicates farther apart than the horizon.

    NULL-text rows bypass the dedup entirely: md5(NULL) is NULL and
    dropDuplicatesWithinWatermark treats NULL keys as equal, which
    would silently collapse distinct no-content documents into one.
    The null branch carries NO withWatermark: it is a stateless append
    branch, and giving it its own watermark node would be the quiet-
    branch pinning hazard `stream_stream_attribution` documents — that
    node would only ever observe null-text rows, so on streams with
    no/rare null texts the min-policy global watermark stays at epoch
    and the dedup state on the main branch is never evicted."""
    hashed = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    deduped = (
        hashed.filter(F.col("text_hash").isNotNull())
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    nulls = hashed.filter(F.col("text_hash").isNull())
    return deduped.unionByName(nulls)


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    time_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type counts with late-data bound."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int"
_STATE_SCHEMA = "start long, last long, n int"
_GAP_US = 30 * 60 * 1_000_000  # 30 min inactivity gap, event time


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each user's events into gap-delimited sessions. The 30-min
    inactivity gap is enforced in EVENT time within the batch (events
    are sorted and split wherever consecutive timestamps are more than
    the gap apart — a replayed day of history in one micro-batch still
    yields one session per activity burst, not one giant session), and
    across batches (a batch whose earliest event is past the open
    session's last + gap closes that session first). Closed sessions
    emit immediately; the trailing open session stays in state and
    emits when the processing-time timeout fires. Timestamps tracked as
    epoch micros in state (state schema must be flat)."""
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(v) // 1000 for v in pd.to_datetime(pdf["ts"]).astype("int64"))
    ts_us.sort()

    open_session = list(state.get) if state.exists else None  # [start, last, n]
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if open_session is None:
            open_session = [t, t, 1]
        elif t - open_session[1] <= _GAP_US:
            open_session[1] = max(open_session[1], t)
            open_session[2] += 1
        else:
            closed.append(tuple(open_session))
            open_session = [t, t, 1]

    if open_session is not None:
        state.update(tuple(open_session))
        state.setTimeoutDuration(30 * 60 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [n for _, _, n in closed],
        }
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user sessions with a 30-minute
    inactivity gap (applyInPandasWithState)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_stream_attribution(
    events: DataFrame,
    *,
    view_type: str = "view",
    purchase_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to
    every view by the same user within ``horizon`` before it (the
    classic attribution shape; the reference has no streaming joins at
    all — SURVEY T-family — but a 100 TB event pipeline does).

    Takes ONE mixed event stream and splits it internally. This is
    deliberate and load-bearing for state eviction: if the caller
    pre-filters the stream into a view branch and a purchase branch and
    each branch is watermarked separately, each branch's
    ``EventTimeWatermark`` node only observes its own event type, so a
    quiet branch pins the global (min-policy) watermark and join state
    grows without bound — the exact hazard this operator exists to
    avoid. Nor can the split happen as a post-watermark ``filter``:
    Catalyst's ``PushPredicateThroughNonJoin`` pushes any predicate not
    referencing the event-time column BELOW the watermark node (and
    ``SimplifyConditionalsInPredicate`` unwraps CASE-based guards), so
    the watermark node would again see only one type. The robust split
    is a null-key projection: each side keeps EVERY row (so both
    watermark nodes track the global max event time) but nulls the join
    key for rows of the other type — null keys never satisfy the inner
    equi-join, so they produce no output and are evicted from state on
    the normal watermark schedule. Trade: every event is buffered on
    both sides until eviction (~2x join state vs a perfect split);
    state stays bounded by the watermark horizon either way.

    Inner join emits eagerly (no watermark-close latency), so an
    ``availableNow`` replay of a batch dataset in one micro-batch
    produces exactly the batch join — the registry entry pins that
    equivalence against a DuckDB interval-join oracle; the eviction
    registry entry pins the cross-micro-batch drop.
    """
    wm = events.withWatermark(time_col, watermark)
    v = wm.select(
        F.when(F.col("event_type") == view_type, F.col("user_id")).alias(
            "v_user"
        ),
        F.col("event_id").alias("view_id"),
        F.col(time_col).alias("view_ts"),
    )
    p = wm.select(
        F.when(F.col("event_type") == purchase_type, F.col("user_id")).alias(
            "p_user"
        ),
        F.col("event_id").alias("purchase_id"),
        F.col(time_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        F.expr(
            f"""
            v_user = p_user
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + interval {horizon}
            """
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )
