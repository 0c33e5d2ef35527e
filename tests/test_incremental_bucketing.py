"""T6 incremental refresh + bucketed co-located joins (scale layout)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from test_ingest import OPS_SCHEMA, T0, comment


def test_incremental_refresh_only_touches_changed_keys(spark):
    from union_indexer_node_spark.ingest.incremental import incremental_refresh
    from union_indexer_node_spark.ingest.posts import build_posts

    batch1 = [
        comment(10, "a", "p1", "v1"),
        comment(11, "b", "p2", "w1"),
    ]
    ops1 = spark.createDataFrame(batch1, schema=OPS_SCHEMA)
    state, wm = incremental_refresh(
        ops1, None, "block_height", 0, ["author", "permlink"],
        build_posts, [F.col("block_height")],
    )
    assert wm == 11
    assert {(r.author, r.permlink, r.body) for r in state.collect()} == {
        ("a", "p1", "v1"), ("b", "p2", "w1"),
    }

    # batch 2: edit of a/p1 arrives; b/p2 untouched
    ops2 = spark.createDataFrame(
        batch1 + [comment(20, "a", "p1", "v2 edited")], schema=OPS_SCHEMA
    )
    state2, wm2 = incremental_refresh(
        ops2, state, "block_height", wm, ["author", "permlink"],
        build_posts, [F.col("block_height")],
    )
    assert wm2 == 20
    rows = {(r.author, r.permlink): r for r in state2.collect()}
    assert rows[("a", "p1")].body == "v2 edited"  # edit fold saw full history
    assert rows[("a", "p1")].block_height == 20
    assert rows[("b", "p2")].body == "w1"  # untouched key carried over


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Writing both sides bucketed by the join key removes the
    Exchange from the join plan — the co-located join layout for the
    posts/(chain-state|votes) joins at scale."""
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored). The in-memory catalog forgets tables across
    # sessions but the directories persist — clean both first.
    import shutil

    for t in ("bl_left", "bl_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "bl_left"
    )
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "bl_right"
    )
    joined = spark.table("bl_left").join(spark.table("bl_right"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # co-located, no shuffle
    assert joined.count() == 1000
