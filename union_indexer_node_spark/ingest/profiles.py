"""profiles + communities pipelines (X22, account_update2 dispatch).

Reference: hive-stream.ts:448-493 — account_update2 carries
posting_json_metadata; accounts named 'hive-*' are communities and
route to the communities table (hive-stream.ts:456-473), everything
else updates a profile ('hive/<account>' id). Background refresh
(core.ts:405-436) re-reads the same projection from chain state; in
batch both collapse into one deterministic pipeline: latest
account_update2 per account (LWW) -> X22 projection -> route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.json_meta import profile_projection
from ..operators.windows import lww_latest


def _latest_account_updates(ops: DataFrame) -> DataFrame:
    au = ops.filter(F.col("op_type") == "account_update2")
    return lww_latest(
        au,
        ["account"],
        [F.col("block_height"), F.col("tx_idx"), F.col("op_idx")],
    ).withColumn("pm", profile_projection(F.col("posting_json_metadata")))


def build_profiles(ops: DataFrame) -> DataFrame:
    """Non-community accounts -> profile rows (X22 projection)."""
    latest = _latest_account_updates(ops).filter(
        ~F.col("account").startswith("hive-")
    )
    return latest.select(
        F.concat_ws("/", F.lit("hive"), F.col("account")).alias("_id"),
        F.col("account").alias("username"),
        F.lit("HIVE").alias("TYPE"),
        F.col("pm.profile.name").alias("displayName"),
        F.col("pm.profile.about").alias("about"),
        F.col("pm.profile.location").alias("location"),
        F.col("pm.profile.website").alias("website"),
        F.col("pm.did").alias("did"),
        F.struct(
            F.col("pm.profile.profile_image").alias("avatar"),
            F.col("pm.profile.cover_image").alias("cover"),
        ).alias("images"),
        F.struct(F.col("pm.profile.pinned").alias("pinned_post")).alias("extra"),
        F.col("block_timestamp").alias("updated_at"),
    )


def build_communities(ops: DataFrame) -> DataFrame:
    """'hive-*' accounts -> community rows (hive-stream.ts:456-473)."""
    latest = _latest_account_updates(ops).filter(
        F.col("account").startswith("hive-")
    )
    return latest.select(
        F.concat_ws("/", F.lit("hive"), F.col("account")).alias("_id"),
        F.col("account").alias("name"),
        F.col("pm.profile.name").alias("title"),
        F.col("pm.profile.about").alias("about"),
        F.struct(
            F.col("pm.profile.profile_image").alias("avatar"),
            F.col("pm.profile.cover_image").alias("cover"),
        ).alias("images"),
        F.col("block_timestamp").alias("updated_at"),
    )


def attach_creator_scores(profiles: DataFrame, scores: DataFrame) -> DataFrame:
    """A5 writeback (core.ts:362-382): left join scores, zero for
    inactive accounts — replaces the reference's two updateMany passes."""
    return profiles.join(
        scores.select(F.col("author").alias("username"), "score"),
        "username",
        "left",
    ).withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
