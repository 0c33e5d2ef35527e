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
    au = (
        ops.filter(F.col("op_type") == "account_update2")
        .withColumn("pm", profile_projection(F.col("posting_json_metadata")))
        # Reference parity (hive-stream.ts:453-455): an account_update2
        # whose posting_json_metadata carries no profile object is
        # skipped ENTIRELY (`continue` BEFORE the upsert) — so it must
        # be dropped BEFORE the LWW window, or it would become the
        # latest row and wipe a previous profile-carrying update. A
        # PERMISSIVE parse failure lands here too (pm.profile NULL);
        # the reference would throw on invalid JSON — dropping is the
        # batch-safe reading of the same "never reaches the upsert".
        .filter(F.col("pm.profile").isNotNull())
    )
    return lww_latest(
        au,
        ["account"],
        [F.col("block_height"), F.col("tx_idx"), F.col("op_idx")],
    )


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


def community_updateprops(ops: DataFrame) -> DataFrame:
    """The third ``community`` custom_json action (hive-stream.ts
    :311-322): ``updateProps`` upserts ``{title, about}`` into the
    communities table keyed ``hive/{signing account}`` — the community
    account posts metadata about ITSELF, so the signer is the key and
    the payload's ``community`` field (if any) is ignored, exactly as
    the reference reads only ``json[1].title/about``. Returns one row
    per op with the event-order columns so ``build_communities`` can
    field-wise-LWW-merge them against the account_update2 family."""
    # F.get, not getItem: ANSI Spark raises INVALID_ARRAY_INDEX when the
    # projection is evaluated on a row with an empty auths array (e.g.
    # pushed through a union ahead of the custom_json_id filter); get()
    # returns NULL — the same value JS auths[0] gives the reference.
    auth = F.get(F.col("required_posting_auths"), 0)
    return (
        ops.filter(
            (F.col("op_type") == "custom_json")
            & (F.col("custom_json_id") == "community")
        )
        .withColumn(
            "cj",
            F.from_json(
                F.col("custom_json"),
                "struct<action:string,title:string,about:string>",
            ),
        )
        # NULL-signer drop, same divergence note as build_follows: the
        # reference keys `hive/undefined` when posting auths are empty
        # (hive-stream.ts:285 reads [0] unguarded); we drop the row
        # rather than merge every authless op into one junk community.
        .filter((F.col("cj.action") == "updateProps") & auth.isNotNull())
        .select(
            auth.alias("account"),
            F.col("cj.title").alias("title"),
            F.col("cj.about").alias("about"),
            F.col("block_timestamp"),
            F.col("block_height"),
            F.col("tx_idx"),
            F.col("op_idx"),
        )
    )


def build_communities(ops: DataFrame) -> DataFrame:
    """Community rows from BOTH write families, merged field-wise the
    way sequential Mongo ``$set``s compose (hive-stream.ts), with each
    field restricted to the family that actually writes it:

    - ``account_update2`` on a 'hive-*' account (:456-473) sets ONLY
      ``username/TYPE/images/topics`` — the reference's ``$set`` there
      never touches title/about (profile name/about route to the
      PROFILES branch, not this one);
    - ``community`` custom_json ``updateProps`` (:311-322) is the
      exclusive writer of ``title``/``about``.

    Per field, the LATEST op of its owning family wins (Mongo applies
    each ``$set`` in arrival order; batch replays that as max_by over
    the event-order struct gated by a sets_* flag). An updateProps for
    an account with no account_update2 still creates the community row
    (the reference upserts), with NULL images; an account_update2-only
    community row has NULL title/about until an updateProps arrives —
    exactly the reference's document shape. ``topics`` mirrors
    :464's ``profile?.topcs || []`` (empty array, not NULL, per au
    row). One groupBy on account — the au side is pre-collapsed by the
    LWW window, so the union carries at most one au row plus the
    updateProps rows per account."""
    au = _latest_account_updates(ops).filter(
        F.col("account").startswith("hive-")
    ).select(
        F.col("account"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("about"),
        F.col("pm.profile.profile_image").alias("avatar"),
        F.col("pm.profile.cover_image").alias("cover"),
        F.coalesce(
            F.col("pm.profile.topcs"), F.array().cast("array<string>")
        ).alias("topics"),
        F.lit(False).alias("sets_ta"),
        F.lit(True).alias("sets_images"),
        F.col("block_timestamp"),
        F.col("block_height"),
        F.col("tx_idx"),
        F.col("op_idx"),
    )
    up = community_updateprops(ops).select(
        "account",
        "title",
        "about",
        F.lit(None).cast("string").alias("avatar"),
        F.lit(None).cast("string").alias("cover"),
        F.lit(None).cast("array<string>").alias("topics"),
        F.lit(True).alias("sets_ta"),
        F.lit(False).alias("sets_images"),
        "block_timestamp",
        "block_height",
        "tx_idx",
        "op_idx",
    )
    o = F.struct("block_height", "tx_idx", "op_idx")
    merged = au.unionByName(up).groupBy("account").agg(
        # family-gated maxes: a NULL-when-not-owner order key makes
        # max_by ignore the other family's rows entirely
        F.max_by(
            F.struct("title", "about"), F.when(F.col("sets_ta"), o)
        ).alias("_ta"),
        F.max_by(
            F.struct("avatar", "cover", "topics"),
            F.when(F.col("sets_images"), o),
        ).alias("_img"),
        F.max_by("block_timestamp", o).alias("updated_at"),
    )
    return merged.select(
        F.concat_ws("/", F.lit("hive"), F.col("account")).alias("_id"),
        F.col("account").alias("name"),
        F.col("_ta.title").alias("title"),
        F.col("_ta.about").alias("about"),
        F.struct(
            F.col("_img.avatar").alias("avatar"),
            F.col("_img.cover").alias("cover"),
        ).alias("images"),
        F.col("_img.topics").alias("topics"),
        F.col("updated_at"),
    )


# The reference only records delegations TO these accounts
# (CONFIG.delegated_posting_accounts, config.ts:5-9; '*' = everyone,
# checked at hive-stream.ts:408,425).
DELEGATED_POSTING_ACCOUNTS = ("threespeak", "threespeak.beta")


def build_delegated_authority(
    ops: DataFrame,
    *,
    allowed_accounts: tuple[str, ...] | None = DELEGATED_POSTING_ACCOUNTS,
) -> DataFrame:
    """delegated-authority edges (hive-stream.ts:399-447,
    types/index.ts:1-8): account_update ops carry posting/active
    account_auths; each grants an edge {type, from, to}; an update that
    drops an account revokes it (S8 delete — here: only the latest
    update per account defines the edge set, so revocation falls out of
    the LWW + re-derive).

    ``allowed_accounts`` is the reference's grantee allowlist
    (CONFIG.delegated_posting_accounts): only delegations TO one of
    these accounts are recorded; ``None`` or a tuple containing ``"*"``
    keeps every grant (the config's wildcard arm).

    Payload shape (raw_ops carries it in custom_json for account_update
    rows): {"posting": {"account_auths": [["acct", w], ...]},
            "active": {"account_auths": [...]}}"""
    au = ops.filter(F.col("op_type") == "account_update")
    latest = lww_latest(
        au, ["account"], [F.col("block_height"), F.col("tx_idx"), F.col("op_idx")]
    ).withColumn(
        "auth",
        F.from_json(
            F.col("custom_json"),
            "struct<posting:struct<account_auths:array<array<string>>>,"
            "active:struct<account_auths:array<array<string>>>>",
        ),
    )
    # one exploded projection for both auth types — a per-type union
    # would recompute the LWW window per branch (measured 4 exchanges
    # instead of 2)
    typed = F.array(
        *[
            F.struct(
                F.lit(t).alias("type"),
                F.coalesce(
                    F.col(f"auth.{t}.account_auths"),
                    F.array().cast("array<array<string>>"),
                ).alias("grants"),
            )
            for t in ("posting", "active")
        ]
    )
    edges = (
        latest.select(
            F.col("account").alias("from"),
            F.explode(typed).alias("ta"),
            F.col("block_timestamp").alias("date"),
            F.col("trx_id"),
            F.col("block_height"),
        )
        .select(
            F.col("ta.type").alias("type"),
            "from",
            F.explode(F.col("ta.grants")).alias("grant"),
            "date",
            "trx_id",
            "block_height",
        )
        .select(
            "type",
            "from",
            F.col("grant").getItem(0).alias("to"),
            "date",
            "trx_id",
            "block_height",
        )
    )
    return _apply_grantee_allowlist(edges, allowed_accounts)


def _apply_grantee_allowlist(
    edges: DataFrame, allowed: tuple[str, ...] | None
) -> DataFrame:
    if allowed is None or "*" in allowed:
        return edges
    return edges.filter(F.col("to").isin(list(allowed)))


def attach_creator_scores(profiles: DataFrame, scores: DataFrame) -> DataFrame:
    """A5 writeback (core.ts:362-382): left join scores, zero for
    inactive accounts — replaces the reference's two updateMany passes."""
    return profiles.join(
        scores.select(F.col("author").alias("username"), "score"),
        "username",
        "left",
    ).withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
