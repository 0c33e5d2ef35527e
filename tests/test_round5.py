"""Round-5 regression tests: ADVICE r4 items — probe_media strict
byte-budget arm + estimated_bytes override, digest-canonical
aggregation form, stream-dedup tempdir cleanup — plus the driver-hasher
scalar-output contract for registry queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _mixed_media(spark, n_small=50, small_bytes=1_000, big_bytes=200_000):
    rows = [(i, bytes([i % 251]) * small_bytes, "image/jpeg") for i in range(n_small)]
    rows.append((999, b"\x7f" * big_bytes, "video/mp4"))
    return spark.createDataFrame(rows, "id long, content binary, mime string")


def test_probe_media_isolates_oversized_blob(spark):
    """ADVICE r4: round-robin holds the byte budget only in
    expectation; strict mode must put a blob >= target alone in its
    partition and keep small-arm partitions under 2x target."""
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    target = 64_000
    media = _mixed_media(spark)
    out = probe_media(
        media, target_partition_bytes=target, isolate_oversized=True
    ).withColumn("pid", F.spark_partition_id())
    per_part = (
        out.groupBy("pid")
        .agg(
            F.sum("n_bytes").alias("part_bytes"),
            F.max("n_bytes").alias("max_blob"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    big_parts = [r for r in per_part if r.max_blob >= target]
    assert len(big_parts) == 1
    assert big_parts[0].n == 1, "oversized blob must be alone in its partition"
    for r in per_part:
        if r.max_blob < target:
            assert r.part_bytes < 2 * target, f"small-arm partition over 2x budget: {r}"


def test_probe_media_estimated_bytes_skips_scan(spark):
    """ADVICE r4: estimated_bytes drives the partition count directly
    (Connect-safe, no stats lookup, no fallback length() scan)."""
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = _mixed_media(spark, n_small=16, small_bytes=100, big_bytes=100)
    # pretend the corpus is 10 MB at a 1 MB budget -> exactly 10 partitions
    out = probe_media(
        media, target_partition_bytes=1 << 20, estimated_bytes=10 << 20
    )
    assert out.rdd.getNumPartitions() == 10


def test_probe_media_strict_matches_default_results(spark):
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = _mixed_media(spark)
    strict = probe_media(media, target_partition_bytes=64_000, isolate_oversized=True)
    loose = probe_media(media, target_partition_bytes=64_000)
    assert sorted(map(tuple, strict.collect())) == sorted(map(tuple, loose.collect()))


def test_registry_outputs_are_driver_hashable(spark):
    """CORRECTNESS_r04 lesson: the driver's canonicalizer sorts result
    columns with pandas, which cannot hash array/struct/map cells. Every
    registry entry must therefore project scalar columns only."""
    from union_indexer_node_spark.queries import registry

    offenders = []
    for name, qd in registry().items():
        df = qd.fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if any(k in t for k in ("array", "struct", "map")):
                offenders.append((name, f.name, t))
    assert not offenders, f"complex-typed registry outputs: {offenders}"


# ---------------------------------------------------------------------------
# VERDICT r3 "what's wrong" #3: bucketed_range_join exploded unboundedly
# long intervals (a 1-year interval at 60-min buckets = 8.7k rows). The
# cap must route such intervals to the broadcast arm, keep results
# exact, and keep the exploded build side bounded.
# ---------------------------------------------------------------------------
def _ts(spark_col_secs):
    return F.timestamp_seconds(F.lit(spark_col_secs))


def test_range_join_long_interval_clamped_and_exact(spark):
    from union_indexer_node_spark.operators.temporal import bucketed_range_join

    base = 1_700_000_000
    points = spark.createDataFrame(
        [(i, base + i * 3600) for i in range(0, 24 * 30)], "pid long, secs long"
    ).select("pid", F.timestamp_seconds("secs").alias("ts"))
    intervals = spark.createDataFrame(
        [
            (1, base + 10 * 3600, base + 12 * 3600),          # 2h window
            (2, base - 86400 * 200, base + 86400 * 200),      # ~400 days
        ],
        "iv long, s long, e long",
    ).select(
        "iv",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    out = bucketed_range_join(
        points, intervals, point_ts="ts", bucket_minutes=60,
        max_buckets_per_interval=100,
    )
    # brute force: every point x interval, filter range
    brute = points.crossJoin(
        intervals.select(
            F.col("iv").alias("b_iv"), "start_ts", "end_ts"
        )
    ).filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
    got = sorted((r.pid, r.iv) for r in out.collect())
    want = sorted((r.pid, r.b_iv) for r in brute.collect())
    assert got == want
    # the exploded short arm never materializes the 400-day interval:
    # its bucket count would exceed the cap by 2 orders of magnitude
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the intentional long arm


def test_range_join_cap_none_keeps_single_arm(spark):
    from union_indexer_node_spark.operators.temporal import bucketed_range_join

    base = 1_700_000_000
    points = spark.createDataFrame(
        [(1, base)], "pid long, secs long"
    ).select("pid", F.timestamp_seconds("secs").alias("ts"))
    intervals = spark.createDataFrame(
        [(1, base - 60, base + 60)], "iv long, s long, e long"
    ).select(
        "iv",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    out = bucketed_range_join(
        points, intervals, point_ts="ts", max_buckets_per_interval=None
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert [r.pid for r in out.collect()] == [1]


# ---------------------------------------------------------------------------
# VERDICT r3 item 8: property-test asof_join against a brute-force
# per-row max-filter reference. Covers inclusive-ts ties (right_ts ==
# left_ts must match), duplicate left timestamps, and keys with no
# matching right row (payload NULL).
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.integers(min_value=0, max_value=2)
_ts_i = st.integers(min_value=0, max_value=40)


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(st.tuples(_key, _ts_i), min_size=1, max_size=12),
    rights=st.dictionaries(
        st.tuples(_key, _ts_i),
        st.integers(min_value=-100, max_value=100),
        max_size=12,
    ),
)
def test_asof_join_matches_brute_force(spark, lefts, rights):
    from union_indexer_node_spark.operators.temporal import asof_join

    base = 1_700_000_000
    left = spark.createDataFrame(
        [(k, base + t, i) for i, (k, t) in enumerate(lefts)],
        "user_id long, secs long, row_id long",
    ).select("user_id", F.timestamp_seconds("secs").alias("ts"), "row_id")
    right_rows = [(k, base + t, float(v)) for (k, t), v in rights.items()]
    right = spark.createDataFrame(
        right_rows or [(99, 0, 0.0)],  # schema needs >=1 row; key 99 never matches
        "user_id long, secs long, value double",
    ).select("user_id", F.timestamp_seconds("secs").alias("ts"), "value")

    out = asof_join(left, right, ["user_id"], payload=["value"])
    got = {
        (r.row_id): r.asof_value for r in out.collect()
    }

    # brute force: latest right at right_ts <= left_ts per key
    want = {}
    rd = rights if right_rows else {}
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, v) for (rk, rt), v in rd.items() if rk == k and rt <= t]
        want[i] = float(max(cands)[1]) if cands else None
    assert got == want
    assert len(out.collect()) == len(lefts)  # every left row survives
