"""Temporal operators: as-of join, batch sessionization, time rollup.

The reference engine has no temporal algebra beyond created_at sorts —
these are the operators a time-series/training-data workload adds on
top (the prompt-side analog of TimescaleDB's asof/hypertable pieces),
each expressed as a single-shuffle DataFrame plan with an exact DuckDB
oracle (ASOF JOIN / window / ROLLUP are native there).

Scale notes (100 TB):
- asof_join is the union+window form: ONE hash-shuffle on the join key
  (no per-row range probe, no broadcast requirement); both inputs are
  tagged, interleaved in (ts, side) order, and the right payload is
  carried forward with last(ignorenulls) — the standard distributed
  as-of used by point-in-time-correct feature stores.
- sessionize is two stacked windows over the same (user) partitioning —
  one shuffle, lag + running sum, then the per-session aggregate reuses
  the partitioning.
- time_rollup uses DataFrame rollup(): partial aggregation happens
  map-side once and the grouping-set expansion is metadata, not extra
  scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Point-in-time join: for every left row, the payload of the LATEST
    right row with right_ts <= left_ts within the same key group (the
    inclusive-`>=` semantics of DuckDB/kdb ASOF JOIN).

    ``tolerance_seconds`` (pandas merge_asof semantics, opt-in — the
    default plan is byte-unchanged): a match older than
    left_ts - tolerance is nulled out. A quote from last Tuesday is
    not a price, an attribution click from last month is not a
    campaign touch — staleness bounds are what make as-of reads safe
    on gappy keys. The whole right row (matched timestamp + payload)
    rides the LOCF window as one packed struct, so the gate and the
    value always come from the SAME row — still one shuffle, no extra
    join. A NULL payload field on the matched row stays NULL (row
    semantics, as pandas merge_asof), never backfilled from an older
    row.

    Right rows must be unique per (key, ts) — pre-aggregate with an LWW
    window otherwise, or the tie winner is engine-dependent. Payload
    columns may not be named ``__mts``: the matched right timestamp
    rides the packed struct under that name, and a colliding payload
    field would silently corrupt the tolerance gate (ADVICE r13 —
    guarded below).
    """
    from pyspark.sql.types import StructField, StructType

    if "__mts" in payload:
        raise ValueError(
            "asof_join: payload column '__mts' collides with the internal "
            "matched-timestamp struct field; rename it before the join"
        )

    lcols = [c for c in left.columns if c not in on and c != left_ts]
    # the payload rides as ONE PACKED STRUCT per right row, never as
    # independent columns: per-column last(ignorenulls) would fill a
    # NULL field of the latest row from an OLDER row — "latest
    # non-null value" instead of the promised "payload of the latest
    # row" (and, with a tolerance, certify a stale value fresh by a
    # different row's timestamp — review r13). The struct itself is
    # non-null exactly on right rows, so one LOCF picks the whole
    # latest row atomically, matched timestamp included.
    pack_type = StructType(
        [StructField("__mts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pack_type).alias("_r_pack"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c) for c in payload],
        ).alias("_r_pack"),
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts => inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        F.last(F.col("_r_pack"), ignorenulls=True).over(w).alias("_f_pack"),
    )
    if tolerance_seconds is not None:
        fresh = F.col("_f_pack")["__mts"] >= F.col("_ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        out_payload = [
            F.when(fresh, F.col("_f_pack")[c]).alias(f"asof_{c}")
            for c in payload
        ]
    else:
        out_payload = [
            F.col("_f_pack")[c].alias(f"asof_{c}") for c in payload
        ]
    return filled.filter(F.col("_is_left") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols],
        *out_payload,
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_minutes: int = 60,
    max_buckets_per_interval: int | None = 1000,
) -> DataFrame:
    """Range join (point-in-interval) without the nested-loop plan
    Spark produces for a bare non-equi join: both sides map to
    fixed-width time buckets — an interval explodes into every bucket
    it overlaps — and the pairing becomes a hash EQUI-join on the
    bucket id refined by the exact range predicate. Shuffle volume
    tracks rows x (interval span / bucket width), not |points| x
    |intervals|; pick bucket_minutes near the typical interval span.

    The explode is the failure mode (VERDICT r3): one open-ended or
    year-long interval at a 60-min bucket silently inflates the build
    side by span/width rows. ``max_buckets_per_interval`` bounds it —
    intervals spanning more buckets than the cap are routed to a
    broadcast arm joined on the bare range predicate instead of
    exploding. That arm IS a broadcast nested-loop over the long
    intervals only; the premise is that cap-exceeding intervals are
    rare (if they are the common case, bucket_minutes is mis-chosen —
    raise it). Pass ``None`` to disable the split and explode
    everything (the pre-r5 behavior).

    Output: all (point, interval) columns for points inside
    [start, end] (inclusive both ends)."""
    bucket_us = bucket_minutes * 60 * 1_000_000
    p = points.withColumn(
        "_bucket", (F.unix_micros(F.col(point_ts)) / bucket_us).cast("long")
    )
    start_b = (F.unix_micros(F.col(start_col)) / bucket_us).cast("long")
    end_b = (F.unix_micros(F.col(end_col)) / bucket_us).cast("long")
    in_range = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    short_iv = intervals
    if max_buckets_per_interval is not None:
        n_buckets = end_b - start_b + F.lit(1)
        short_iv = intervals.filter(n_buckets <= max_buckets_per_interval)
        long_iv = intervals.filter(n_buckets > max_buckets_per_interval)
    i = short_iv.withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))
    out = p.join(i, "_bucket").filter(in_range).drop("_bucket")
    if max_buckets_per_interval is not None:
        long_arm = points.join(F.broadcast(long_iv), in_range)
        out = out.unionByName(long_arm)
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same key exceeds `gap_minutes`. Returns one
    row per session (key, session_id, start/end ts, n_events).

    Gap arithmetic is in whole microseconds (unix_micros) so any engine
    computes identical boundaries — no float epoch rounding."""
    gap_us = gap_minutes * 60 * 1_000_000
    # tiebreak_col makes LAG deterministic when two events share a
    # timestamp — without it the session boundary of tied rows is
    # engine- (and run-) dependent
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    marked = df.select(
        key_col,
        ts_col,
        *( [tiebreak_col] if tiebreak_col is not None else [] ),
        F.when(
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.lag(ts_col).over(w))
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("_new_session"),
    )
    with_sid = marked.select(
        key_col,
        ts_col,
        F.sum("_new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return with_sid.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    dim_col: str,
    value_col: str,
    *,
    granularity: str = "day",
) -> DataFrame:
    """Hypertable-style rollup: (time bucket, dimension) aggregates plus
    the per-bucket and grand totals in ONE pass — DataFrame rollup()
    keeps the partial aggregation map-side and expands grouping sets
    without extra scans."""
    # the bucket is emitted as a formatted string: subtotal rows carry a
    # NULL bucket, and a nullable string column round-trips engines
    # cleanly where a NaT-bearing timestamp column does not. The format
    # must carry the granularity's precision — a fixed yyyy-MM-dd would
    # silently collapse hourly/minute rollups into daily buckets.
    fmt = {
        "year": "yyyy",
        "month": "yyyy-MM",
        "week": "yyyy-MM-dd",
        "day": "yyyy-MM-dd",
        "hour": "yyyy-MM-dd HH:00",
        "minute": "yyyy-MM-dd HH:mm",
    }.get(granularity.lower(), "yyyy-MM-dd HH:mm:ss")
    bucket = F.date_format(
        F.date_trunc(granularity, F.col(ts_col)), fmt
    ).alias("bucket")
    return (
        df.select(bucket, F.col(dim_col), F.col(value_col))
        .rollup("bucket", dim_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("total_value"),
            F.grouping_id().alias("grouping_level"),
        )
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Funnel analysis: for each user, how far through the ordered
    ``steps`` sequence they progressed. Stage 1 anchors at the MIN
    timestamp of steps[0]; stage i+1 is reached iff an event of
    steps[i] exists with ts STRICTLY greater than the timestamp that
    reached stage i (and the anchor advances to the MIN such ts).
    Strict-ts comparison makes the result well-defined under timestamp
    ties with no event-order tiebreak at all — a simultaneous
    view+click counts the click only if another click follows.
    Returns every user present in the step-filtered events with
    (user, stage) where stage ∈ [0, len(steps)].

    Scale: the step-filtered (user, ts, type) projection is
    narrow-localCheckpointed once because len(steps)+1 aggregation
    passes consume it (the budget_select branch-re-scan guard); each
    pass is a min-aggregate + equi-join keyed on the user — state is
    ONE timestamp per user per stage, never a per-user collect_list a
    bot account could blow up. Each stage anchor derives from the
    PREVIOUS stage's materialized frame only (r15: stage i used to
    join the accumulated out chain, re-deriving every earlier stage's
    aggregation inside every later stage's subtree — the k-stage plan
    ran ~k²/2 passes over the corpus with zero exchange reuse; now
    each stage is one pass over the checkpointed events plus one join
    against a <=1-row-per-user frame, k+1 passes total), and the final
    result is the user set left-joined with each stage frame. The
    greedy earliest-advance recurrence is provably the maximal
    progression: advancing on the minimum qualifying timestamp only
    ever widens what qualifies next.
    """
    if not steps:
        raise ValueError("funnel_stages requires at least one step")
    staged = (
        df.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(type_col).alias("_tp"),
        )
        .localCheckpoint()
    )
    anchors: list[DataFrame] = []
    for i, s in enumerate(steps):
        ev = staged.filter(F.col("_tp") == s)
        if i == 0:
            t = ev.groupBy("_u").agg(F.min("_ts").alias("_t0"))
        else:
            # anchors[-1] carries only users that reached stage i (its
            # groupBy emits no NULL mins), so no isNotNull gate needed.
            t = (
                ev.join(anchors[-1], "_u")
                .filter(F.col("_ts") > F.col(f"_t{i - 1}"))
                .groupBy("_u")
                .agg(F.min("_ts").alias(f"_t{i}"))
            )
        # Two consumers each (the next stage's probe + the final join)
        # and at most one timestamp per user — materialize so neither
        # consumer re-runs the stage pass.
        t = t.localCheckpoint()
        anchors.append(t)
    out = staged.select("_u").distinct()
    for t in anchors:
        out = out.join(t, "_u", "left")
    stage = sum(
        (F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0))
        for i in range(len(steps))
    )
    return out.select(
        F.col("_u").alias(user_col), stage.cast("int").alias("stage")
    )


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort-retention triangle: cohort every user by the week
    of their FIRST activity, then count, per (cohort_week,
    week_offset), how many of that cohort's users were active — the
    standard retention report.

    Scale: the corpus collapses FIRST to distinct (user, week) rows
    (map-side partial distinct before one user-keyed shuffle — bounded
    at users × weeks regardless of event volume); the first-activity
    anchor is a min over that compacted frame reusing the same key,
    and the final rollup groups a two-small-column frame. Both weeks
    are Monday-aligned (date_trunc), so the day-difference is exactly
    divisible by 7 and the offset arithmetic is integer-exact.
    """
    week = F.date_trunc("week", F.col(ts_col))
    # Narrow-checkpoint: the anchor aggregate and the retention join
    # BOTH consume the distinct frame, and Spark does not dedupe
    # common subexpressions — without the materialization each branch
    # re-scans the corpus and re-runs the distinct (the budget_select
    # guard; the checkpointed frame is two small columns bounded at
    # users × weeks).
    acts = (
        df.select(F.col(user_col).alias("_u"), week.alias("_w"))
        .distinct()
        .localCheckpoint()
    )
    first = acts.groupBy("_u").agg(F.min("_w").alias("cohort_week"))
    return (
        acts.join(first, "_u")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("_w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def moving_window_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    days: int = 7,
) -> DataFrame:
    """Per-key trailing-window aggregate (the time-series RANGE frame):
    for every event, the count and cent-exact value sum of the key's
    events in [ts - days, ts] — a TRUE range frame (all events in the
    interval), not a row frame (last N rows), so bursts and gaps are
    handled correctly.

    Determinism: the frame is ordered by microsecond epoch, so both
    engines bound it identically (equal-ts peers are all included —
    RANGE semantics — making the result well-defined under ties);
    the value is quantized to integer cents BEFORE the frame sum, so
    no float accumulation order can diverge.

    Scale: ONE shuffle on the key; within a partition Spark evaluates
    the range frame with a sliding two-pointer over the sorted rows —
    O(rows) per key, state bounded by the widest window. A hot key is
    the same hazard class as any per-key window; the two-level
    decompositions (stratified_sample / budget_select) do not apply to
    a per-ROW output, so the mitigation is key-salting upstream if a
    key's event count exceeds a task.
    """
    cents = F.round(F.col(value_col).cast("double") * 100, 0).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-days * 86_400_000_000, 0)
    )
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        cents.alias("value_cents"),
    ).select(
        key_col,
        ts_col,
        "value_cents",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("value_cents").over(w).alias("sum_trailing_cents"),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    *,
    granularity: str = "hour",
) -> DataFrame:
    """Dense time-grid gap filling with last-observation-carried-forward
    — the missing member of the hypertable family (`time_rollup` folds
    observed buckets; dashboards and downstream window math need the
    EMPTY buckets present, holding the last known value). For each key,
    every ``granularity`` bucket between its first and last observation
    exists in the output; buckets with no events carry the previous
    bucket's value and ``observed = false``.

    Values fold as integer cents (the sketch/TPC-H quantization
    contract) so the fill is bit-identical cross-engine.

    Scale shape: observed buckets are a map-side-combining groupBy;
    per-key spans are a second tiny aggregate; the grid generates
    map-side from each span row (``sequence(min, max, interval)`` — one
    array per key, bounded by the key's own time range, never a global
    calendar cross join); the LOCF is one window per key ordered by
    bucket — the partition is the key's grid, which is exactly the
    state a per-key fill needs to see. Fixed-width granularities only
    (minute/hour/day/week): a month step has no fixed interval width,
    and a variable-step sequence would disagree across engines.

    Returns (key, bucket string, value_cents, observed); the first
    bucket of every key is observed by construction, so value_cents is
    never NULL.
    """
    widths = {"minute": "minute", "hour": "hour", "day": "day", "week": "week"}
    if granularity.lower() not in widths:
        raise ValueError(
            f"gap_fill supports fixed-width granularities {sorted(widths)}"
        )
    gran = widths[granularity.lower()]
    fmt = {
        "minute": "yyyy-MM-dd HH:mm",
        "hour": "yyyy-MM-dd HH:00",
        "day": "yyyy-MM-dd",
        "week": "yyyy-MM-dd",
    }[gran]
    bucket = F.date_trunc(gran, F.col(ts_col))
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    obs = (
        df.select(F.col(key_col), bucket.alias("_b"), cents.alias("_c"))
        .groupBy(key_col, "_b")
        .agg(F.sum("_c").cast("long").alias("_v"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("_b").alias("_mn"), F.max("_b").alias("_mx")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.expr(f"sequence(_mn, _mx, interval 1 {gran})")
        ).alias("_b"),
    )
    dense = grid.join(obs, [key_col, "_b"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col(key_col),
        F.date_format(F.col("_b"), fmt).alias("bucket"),
        F.last("_v", ignorenulls=True).over(w).alias("value_cents"),
        F.col("_v").isNotNull().alias("observed"),
    )


def ohlc_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    seq_col: str,
    *,
    granularity: str = "hour",
) -> DataFrame:
    """Candlestick downsampling: per (key, time bucket) open / high /
    low / close in integer cents plus the observation count — the
    hypertable rollup whose open/close need ORDER, not just extrema.

    One groupBy does all five aggregates in a single shuffle with full
    map-side partial aggregation: open/close ride min/max over a
    (ts, seq, value) struct — lexicographic struct comparison makes
    "value at the earliest (ts, seq)" an ordinary commutative min, so
    no window, no sort, no second pass. ``seq_col`` is the mandatory
    tie-breaker: bucket boundaries on tied timestamps would otherwise
    be engine-dependent (the sessionize lesson). The oracle derives
    open/close INDEPENDENTLY via ordered first()/last() aggregates, so
    the struct-ordering trick is checked against a different
    formulation rather than mirrored.
    """
    fmts = {
        "day": "yyyy-MM-dd",
        "hour": "yyyy-MM-dd HH:00",
        "minute": "yyyy-MM-dd HH:mm",
    }
    if granularity.lower() not in fmts:
        raise ValueError(
            "ohlc_rollup supports fixed-width granularities "
            f"{sorted(fmts)}; got {granularity!r}"
        )
    fmt = fmts[granularity.lower()]
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    ordered = F.struct(
        F.col(ts_col), F.col(seq_col), cents.alias("_c")
    )
    return (
        df.select(
            F.col(key_col),
            F.date_format(
                F.date_trunc(granularity, F.col(ts_col)), fmt
            ).alias("bucket"),
            ordered.alias("_o"),
            cents.alias("_cents"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.min("_o")["_c"].alias("open_c"),
            F.max("_cents").alias("high_c"),
            F.min("_cents").alias("low_c"),
            F.max("_o")["_c"].alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )
