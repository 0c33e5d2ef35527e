"""Streaming windowed aggregation (watermark) + stateful sessionize."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_windowed_counts_batch_semantics(spark):
    """The windowed agg runs identically on a batch frame (event-time
    windows are just expressions); verify window math on testdata."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.streaming.windows import windowed_counts

    e = tables.load(spark, SF_DIR, "events")
    out = windowed_counts(e, window="1 hour")
    rows = out.collect()
    assert all((r.window_end - r.window_start) == dt.timedelta(hours=1) for r in rows)
    assert sum(r.n for r in rows) == e.count()
    one = rows[0]
    manual = e.filter(
        (F.col("ts") >= one.window_start)
        & (F.col("ts") < one.window_end)
        & (F.col("event_type") == one.event_type)
    ).count()
    assert manual == one.n


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    """Run the same agg as a stream: watermark accepted, results match
    the batch run after availableNow drains the source."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.streaming.windows import windowed_counts

    src = str(tmp_path / "events_src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    e = tables.load(spark, SF_DIR, "events")
    e.write.parquet(src + "/part1.parquet")

    stream = (
        spark.readStream.schema(e.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        windowed_counts(stream, window="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    batch = windowed_counts(e, window="1 hour")
    # append mode only emits windows the watermark has closed; every
    # emitted row must match the batch computation exactly
    j = got.alias("s").join(
        batch.alias("b"),
        ["window_start", "window_end", "event_type"],
        "inner",
    )
    assert j.filter(F.col("s.n") != F.col("b.n")).count() == 0
    assert got.count() > 0


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """One representative per content digest across micro-batches
    (intra-batch survivor choice is arbitrary); re-arrivals within the
    watermark are dropped."""
    import datetime as dt

    from union_indexer_node_spark.streaming.windows import stream_exact_dedup

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "dd_src")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    schema = "doc_id long, text string, ts timestamp"
    spark.createDataFrame(
        [
            (1, "alpha body", t0),
            (2, "beta body", t0 + dt.timedelta(minutes=1)),
            (3, "alpha body", t0 + dt.timedelta(minutes=2)),  # dup in-batch
        ],
        schema,
    ).write.parquet(src + "/b1.parquet")

    def drain():
        q = (
            stream_exact_dedup(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # batch 2: cross-batch duplicate + one fresh doc
    spark.createDataFrame(
        [
            (4, "beta body", t0 + dt.timedelta(minutes=5)),  # dup cross-batch
            (5, "gamma body", t0 + dt.timedelta(minutes=6)),
        ],
        schema,
    ).write.parquet(src + "/b2.parquet")
    drain()

    rows = spark.read.parquet(out_dir).collect()
    ids = {r.doc_id for r in rows}
    assert len(rows) == 3, rows  # one representative per distinct text
    assert {r.text for r in rows} == {"alpha body", "beta body", "gamma body"}
    assert len(ids & {1, 3}) == 1  # exactly one alpha survivor
    assert 4 not in ids  # cross-batch duplicate dropped (state held)
    assert {2, 5} <= ids


def test_stream_exact_dedup_state_evicts_without_null_rows(spark, tmp_path):
    """Regression (ADVICE r6): the null-text branch used to carry its
    own withWatermark; on a stream with NO null texts that node never
    observed a row, so the min-policy global watermark stayed at epoch
    and dedup state was never evicted. With the stateless null branch,
    a duplicate arriving far past the watermark horizon must be
    RE-emitted (its digest state was evicted)."""
    import datetime as dt

    from union_indexer_node_spark.streaming.windows import stream_exact_dedup

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "ev_src")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    schema = "doc_id long, text string, ts timestamp"

    def drain():
        q = (
            stream_exact_dedup(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(src),
                watermark="1 hour",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, "alpha body", t0)], schema).write.parquet(
        src + "/b1.parquet"
    )
    drain()
    # advance event time far past the horizon so batch-1 state evicts
    spark.createDataFrame(
        [(2, "filler body", t0 + dt.timedelta(hours=6))], schema
    ).write.parquet(src + "/b2.parquet")
    drain()
    # duplicate of doc 1, long after eviction: must re-emit
    spark.createDataFrame(
        [(3, "alpha body", t0 + dt.timedelta(hours=7))], schema
    ).write.parquet(src + "/b3.parquet")
    drain()

    ids = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert ids == [1, 2, 3], ids


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: events within the gap
    fold into one session; the inactivity timeout emits it."""
    from union_indexer_node_spark.streaming.windows import sessionize

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(minutes=10)),
        (2, t0 + dt.timedelta(minutes=1)),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(
        src + "/p1.parquet"
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = str(tmp_path / "sess_out")

    # NOTE: with ProcessingTimeTimeout the query schedules state-
    # cleanup batches forever, so neither availableNow self-stop nor
    # processAllAvailable ever returns — poll progress until the input
    # rows are committed, then stop. (This cost a 6-minute hang to
    # learn; see module docstring.)
    def run_until_consumed(writer, expected_rows, timeout_s=90):
        import time

        q = writer.start()
        consumed = 0
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            consumed = sum(
                (p["numInputRows"] if isinstance(p, dict) else 0)
                for p in q.recentProgress
            )
            if consumed >= expected_rows:
                break
            time.sleep(1)
        q.stop()
        assert consumed >= expected_rows, f"only {consumed} rows consumed"

    writer = (
        sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
    )
    run_until_consumed(writer, len(rows))
    # availableNow drains then stops; sessions may still be open (no
    # timeout fired) — state handling itself is what we exercise here.
    # Feed a second batch to confirm state persisted across triggers.
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=12))], "user_id long, ts timestamp"
    ).write.parquet(src + "/p2.parquet")
    run_until_consumed(
        sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append"),
        1,
    )
    # the query ran with state across two triggers without error; any
    # emitted sessions must be well-formed
    import os

    emitted = (
        spark.read.parquet(out_dir)
        if any(f.endswith(".parquet") for f in os.listdir(out_dir))
        else None
    )
    if emitted is not None and emitted.count() > 0:
        for r in emitted.collect():
            assert r.session_end >= r.session_start
            assert r.n_events >= 1


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Inner stream-stream join over a single-file availableNow replay
    must equal the batch interval join row-for-row."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.streaming.windows import stream_stream_attribution

    ev = tables.load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    src = str(tmp_path / "ssj_src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    joined = stream_stream_attribution(stream)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_eq_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.table("ssj_eq_test").collect()
    }
    v = ev.filter(F.col("event_type") == "view").alias("v")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    expected = {
        (r["view_id"], r["purchase_id"])
        for r in v.join(
            p,
            F.expr(
                "v.user_id = p.user_id AND p.ts >= v.ts "
                "AND p.ts <= v.ts + interval 1 hour"
            ),
        )
        .select(
            F.col("v.event_id").alias("view_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_stream_join_drops_beyond_watermark(spark, tmp_path):
    """Late-data semantics: with the view arriving in a later
    micro-batch, AFTER the watermark has advanced past its join
    horizon, the pair is dropped — bounded state has real eviction."""
    import datetime as dt

    from pyspark.sql import Row
    from union_indexer_node_spark.streaming.windows import stream_stream_attribution

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    src = str(tmp_path / "late_src")
    # batch 1: the view enters join state; an unrelated far-future
    # purchase advances the watermark to ~46h at batch end, which
    # evicts the view (view_ts + horizon is far behind the watermark).
    spark.createDataFrame(
        [
            Row(event_id=2, user_id=7, event_type="view", ts=t0, value=0.0),
            Row(event_id=1, user_id=99, event_type="purchase",
                ts=t0 + dt.timedelta(hours=48), value=5.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = stream_stream_attribution(
        stream, horizon="1 hour", watermark="2 hours"
    )
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # batch 2: an unrelated row — its only job is to run a micro-batch
    # under the advanced watermark, which is when state cleanup fires
    # (eviction lags the watermark update by one batch).
    spark.createDataFrame(
        [
            Row(event_id=4, user_id=98, event_type="view",
                ts=t0 + dt.timedelta(hours=47), value=0.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q_mid = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q_mid.awaitTermination()
    # batch 3: the matching purchase 30 min after the view — but the
    # view's state was evicted, so no match is emitted. (Within one
    # micro-batch the pair WOULD match: late input is not filtered,
    # only state is evicted — the cross-batch arrival is what makes
    # eviction observable.)
    spark.createDataFrame(
        [
            Row(event_id=3, user_id=7, event_type="purchase",
                ts=t0 + dt.timedelta(minutes=30), value=9.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert all(r.view_id != 2 for r in rows)
