"""Sources, sinks, profiles, intra-tx enrichment, streaming, multimodal
(SURVEY S1/S6-S8, X5/X6/X22, T1-T7, multimodal plumbing)."""

from __future__ import annotations

import datetime as dt
import json
import shutil

import pytest
from pyspark.sql import functions as F

from test_ingest import OPS_SCHEMA, T0, comment  # reuse fixture helpers

T1 = dt.datetime(2024, 1, 1, 1, 0)


# --- S1: block explosion ----------------------------------------------------
def test_explode_blocks(spark):
    from union_indexer_node_spark.sources.blocks import BLOCKS_SCHEMA, explode_blocks

    blocks = spark.createDataFrame(
        [
            {
                # height 0x01312d00 = 20000000
                "block_id": "01312d00deadbeef",
                "timestamp": T1,
                "transactions": [
                    {
                        "transaction_id": "tx-a",
                        "operations": [
                            {"op_type": "comment", "payload": "{}"},
                            {"op_type": "vote", "payload": "{}"},
                        ],
                    },
                    {
                        "transaction_id": "tx-b",
                        "operations": [{"op_type": "custom_json", "payload": "{}"}],
                    },
                ],
            }
        ],
        schema=BLOCKS_SCHEMA,
    )
    ops = explode_blocks(blocks).collect()
    assert len(ops) == 3
    by_pos = {(r.tx_idx, r.op_idx): r for r in ops}
    assert by_pos[(0, 0)].op_type == "comment"
    assert by_pos[(0, 1)].op_type == "vote"
    assert by_pos[(1, 0)].trx_id == "tx-b"
    assert all(r.block_height == 20000000 for r in ops)


# --- S6/S7/S8: sinks --------------------------------------------------------
def test_upsert_and_deletes(spark):
    from union_indexer_node_spark.sources.sinks import apply_deletes, upsert

    cur = spark.createDataFrame(
        [("a", 1, "old"), ("b", 1, "keep")], "k string, v long, s string"
    )
    inc = spark.createDataFrame(
        [("a", 2, "new"), ("c", 1, "ins")], "k string, v long, s string"
    )
    merged = upsert(cur, inc, ["k"], [F.col("v")])
    rows = {r.k: r.s for r in merged.collect()}
    assert rows == {"a": "new", "b": "keep", "c": "ins"}

    tomb = spark.createDataFrame([("b",)], "k string")
    after = apply_deletes(merged, tomb, ["k"])
    assert {r.k for r in after.collect()} == {"a", "c"}


# --- X22: profiles / communities routing ------------------------------------
def _account_update(h, account, profile, did=None):
    return dict(
        block_height=h, block_timestamp=T0 + dt.timedelta(minutes=h),
        tx_idx=0, trx_id=f"a{h}", op_idx=0, op_type="account_update2",
        author=None, permlink=None, parent_author=None, parent_permlink=None,
        title=None, body=None, json_metadata=None, custom_json_id=None,
        custom_json=None, required_posting_auths=[], voter=None,
        posting_json_metadata=json.dumps({"profile": profile, "did": did}),
        account=account, extensions=None,
    )


def test_profiles_and_communities(spark):
    from union_indexer_node_spark.ingest.profiles import (
        build_communities,
        build_profiles,
    )

    ops = spark.createDataFrame(
        [
            _account_update(1, "alice", {"name": "Alice One", "about": "v1"}),
            _account_update(5, "alice", {"name": "Alice Two", "about": "v2"},
                            did="did:key:z6Alice"),
            _account_update(2, "hive-135485", {"name": "My Community",
                                               "about": "c"}),
        ],
        schema=OPS_SCHEMA,
    )
    profs = {r.username: r for r in build_profiles(ops).collect()}
    assert set(profs) == {"alice"}  # hive-* routed away
    assert profs["alice"].displayName == "Alice Two"  # LWW
    assert profs["alice"].did == "did:key:z6Alice"
    assert profs["alice"]._id == "hive/alice"

    comms = {r.name: r for r in build_communities(ops).collect()}
    assert set(comms) == {"hive-135485"}
    assert comms["hive-135485"].title == "My Community"
    assert comms["hive-135485"]._id == "hive/hive-135485"


# --- X5/X6: intra-transaction adjacency -------------------------------------
def test_intra_tx_beneficiaries_and_authority(spark):
    from union_indexer_node_spark.ingest.posts import build_posts

    base = comment(7, "vid", "v1", "video post")
    co = dict(base, op_idx=1, op_type="comment_options", author=None,
              permlink=None, title=None, body=None, json_metadata=None,
              extensions=json.dumps(
                  [["comment_payout_beneficiaries",
                    {"beneficiaries": [{"account": "spk.beneficiary",
                                        "weight": 900}]}]]))
    cj = dict(base, op_idx=2, op_type="custom_json", author=None,
              permlink=None, title=None, body=None, json_metadata=None,
              custom_json_id="3speak-publish", custom_json="{}",
              required_posting_auths=["threespeak"])
    plain = comment(9, "txt", "t1", "no extras")
    ops = spark.createDataFrame([base, co, cj, plain], schema=OPS_SCHEMA)
    rows = {r.permlink: r for r in build_posts(ops).collect()}
    assert rows["v1"].beneficiaries == [("spk.beneficiary", 900)]
    assert rows["v1"].authority_signed is True
    assert rows["t1"].beneficiaries is None
    assert rows["t1"].authority_signed is False


# --- T1-T7: streaming foreachBatch ------------------------------------------
def test_streaming_posts_incremental(spark, tmp_path):
    from union_indexer_node_spark.streaming.stream import (
        ops_file_stream,
        start_posts_stream,
    )

    ops_dir = str(tmp_path / "ops")
    state_dir = str(tmp_path / "posts_state")
    ckpt = str(tmp_path / "ckpt")

    # micro-batch 1: initial post; micro-batch 2: edit at higher height
    b1 = spark.createDataFrame([comment(10, "s", "p", "v1")], schema=OPS_SCHEMA)
    b2 = spark.createDataFrame([comment(20, "s", "p", "v2")], schema=OPS_SCHEMA)
    b1.write.parquet(ops_dir + "/f1.parquet")
    b2.write.parquet(ops_dir + "/f2.parquet")

    stream = ops_file_stream(spark, ops_dir, OPS_SCHEMA, max_files_per_trigger=1)
    sq = start_posts_stream(spark, stream, state_dir, ckpt)
    sq.awaitTermination(120)

    final = spark.read.parquet(state_dir)
    rows = final.filter((F.col("author") == "s") & (F.col("permlink") == "p")).collect()
    assert len(rows) == 1
    assert rows[0].body == "v2"  # LWW across micro-batches
    assert rows[0].block_height == 20


def test_streaming_rewrite_is_partition_bounded(spark, tmp_path):
    """A micro-batch must rewrite only the created_date partitions it
    touches: data files of untouched partitions keep their exact paths
    and mtimes across a batch that lands in a different date."""
    import os

    from union_indexer_node_spark.streaming.stream import (
        ops_file_stream,
        start_posts_stream,
    )

    ops_dir = str(tmp_path / "ops")
    state_dir = str(tmp_path / "posts_state")
    ckpt = str(tmp_path / "ckpt")

    def snapshot_files(part: str) -> dict[str, float]:
        d = os.path.join(state_dir, part)
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    # batch 1: post on 2024-01-01 (comment(h) stamps T0 + h minutes)
    b1 = spark.createDataFrame([comment(10, "a", "p1", "day one")], schema=OPS_SCHEMA)
    b1.write.parquet(ops_dir + "/f1.parquet")
    sq = start_posts_stream(
        spark, ops_file_stream(spark, ops_dir, OPS_SCHEMA), state_dir, ckpt
    )
    sq.awaitTermination(120)
    day1 = "created_date=2024-01-01"
    before = snapshot_files(day1)
    assert before, "day-1 partition must exist after batch 1"

    # batch 2: different key, lands on 2024-01-02 (h=2000 min > 1 day)
    b2 = spark.createDataFrame([comment(2000, "b", "p2", "day two")], schema=OPS_SCHEMA)
    b2.write.parquet(ops_dir + "/f2.parquet")
    sq = start_posts_stream(
        spark, ops_file_stream(spark, ops_dir, OPS_SCHEMA), state_dir, ckpt
    )
    sq.awaitTermination(120)

    assert snapshot_files(day1) == before, (
        "untouched day-1 partition was rewritten"
    )
    assert os.path.isdir(os.path.join(state_dir, "created_date=2024-01-02"))
    got = {r.permlink: r.body for r in spark.read.parquet(state_dir).collect()}
    assert got == {"p1": "day one", "p2": "day two"}


def test_streaming_partition_migration_on_edit(spark, tmp_path):
    """An edit arriving in a later batch moves the post's created_at
    (per-batch min): the winner must land in the new date partition and
    the stale row's old partition must not keep a duplicate."""
    import os

    from union_indexer_node_spark.streaming.stream import (
        ops_file_stream,
        start_posts_stream,
    )

    ops_dir = str(tmp_path / "ops")
    state_dir = str(tmp_path / "posts_state")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame([comment(10, "a", "p1", "v1")], schema=OPS_SCHEMA)
    b1.write.parquet(ops_dir + "/f1.parquet")
    sq = start_posts_stream(
        spark, ops_file_stream(spark, ops_dir, OPS_SCHEMA), state_dir, ckpt
    )
    sq.awaitTermination(120)

    # same key, higher block, next day -> LWW winner migrates partitions
    b2 = spark.createDataFrame([comment(2000, "a", "p1", "v2")], schema=OPS_SCHEMA)
    b2.write.parquet(ops_dir + "/f2.parquet")
    sq = start_posts_stream(
        spark, ops_file_stream(spark, ops_dir, OPS_SCHEMA), state_dir, ckpt
    )
    sq.awaitTermination(120)

    rows = spark.read.parquet(state_dir).collect()
    assert len(rows) == 1 and rows[0].body == "v2"
    assert not os.path.isdir(os.path.join(state_dir, "created_date=2024-01-01")), (
        "emptied partition must be removed, not left with the stale row"
    )


# --- multimodal plumbing ----------------------------------------------------
def test_multimodal_probe_and_frame_plan(spark):
    from union_indexer_node_spark.pipelines.multimodal import (
        frame_sample_plan,
        probe_media,
    )

    media = spark.createDataFrame(
        [
            (1, bytearray(b"\x10fakepng\x20"), "image/png"),
            (2, bytearray(b""), "video/mp4"),
        ],
        "id long, content binary, mime string",
    )
    out = {r.id: r for r in probe_media(media).collect()}
    assert out[1].n_bytes == 9
    assert out[1].width == 16 + (0x10 % 64) * 16
    assert out[1].height == 16 + (0x20 % 64) * 16
    assert len(out[1].sha) == 64
    assert out[2].n_bytes == 0 and out[2].width == 0

    # real-decoder path is an explicit stub
    with pytest.raises(Exception):
        probe_media(media, use_fake_decoder=False).collect()

    plan = frame_sample_plan(
        spark.createDataFrame([(1, 61)], "id long, n_frames int"), every_n=30
    )
    assert [r.frame_idx for r in plan.collect()] == [0, 30, 60]
