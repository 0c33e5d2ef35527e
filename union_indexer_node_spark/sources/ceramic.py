"""S3 — offchain (Ceramic) post source.

Reference: a MongoDB change stream over the offchain indexer's
`graph.docs` collection (services/index.ts:57-142) filters out
pin-heartbeat updates and deletes, then maps each document into the
posts collection with CERAMIC discriminators (field mapping at
services/index.ts:77-119).

Here the change feed is just a DataFrame (batch snapshot or a
readStream over the CDC feed); the mapping is one projection, and the
merge into posts is unionByName + LWW — the same sink path Hive posts
use, which is what makes the two sources one table (SURVEY §2.7).

DOCUMENTED DIVERGENCE (permlink mapping): the reference maps
``permlink: fullDocument.app_metadata?.permlink || null``
(services/index.ts:81) — an app-supplied, possibly-NULL value. This
engine maps ``permlink = stream_id`` instead: the stream id is the
document's stable unique key, so (author, permlink) stays a usable post
identity for joins/LWW even when the app omitted a permlink (the
reference's NULL permlinks break that key). Same treatment as the
first_upload probe-bug divergence in ingest/posts.py — flagged here and
in COVERAGE.md rather than silently diverging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Input shape of offchain docs (graph.docs); content is the post body
# document, creator_id the DID. ``changed_fields`` is the CDC
# updateDescription analog (which fields the change event touched);
# NULL means a full-document event (insert/replace/snapshot read).
CERAMIC_DOCS_SCHEMA = """
    stream_id string, version_id string, creator_id string,
    parent_author string, parent_permlink string,
    title string, body string, tags array<string>,
    json_metadata string, created_at timestamp, updated_at timestamp,
    last_pinged timestamp, deleted boolean,
    changed_fields array<string>
"""

# fields whose change alone is a heartbeat, not content
_PIN_ONLY_FIELDS = ["last_pinged", "last_checked"]


def ceramic_posts(docs: DataFrame) -> DataFrame:
    """Map offchain docs -> post rows (services/index.ts:77-119):
    author = DID, permlink = stream id, TYPE/__t discriminators set to
    CERAMIC; pin-only heartbeats and deletes dropped (the reference
    filters both in the change-stream handler, :67-76 — a change event
    whose updated fields are all pin bookkeeping is skipped). Rows
    without a ``changed_fields`` column (or NULL) are full-document
    events and always pass."""
    if "changed_fields" in docs.columns:
        pin_only = F.col("changed_fields").isNotNull() & (
            F.size(
                F.array_except(
                    F.col("changed_fields"),
                    F.array(*[F.lit(f) for f in _PIN_ONLY_FIELDS]),
                )
            )
            == 0
        )
        docs = docs.filter(~pin_only)
    # A ceramic doc with a parent permlink is a reply and carries the
    # 'comment' flag (services/index.ts:72-75) — so the F6 comment
    # exclusion applies to offchain replies too when a feed opts into
    # includeCeramic without includeComments.
    is_reply = F.col("parent_permlink").isNotNull() & (
        F.col("parent_permlink") != ""
    )
    return (
        docs.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
        .select(
            F.col("creator_id").alias("author"),
            F.col("stream_id").alias("permlink"),
            F.coalesce(F.col("parent_author"), F.lit("")).alias("parent_author"),
            F.coalesce(F.col("parent_permlink"), F.lit("")).alias("parent_permlink"),
            F.col("title"),
            F.col("body"),
            F.col("tags"),
            F.col("json_metadata"),
            F.col("created_at"),
            F.col("updated_at"),
            F.lit("CERAMIC").alias("TYPE"),
            F.lit("post_ceramic").alias("__t"),
            F.lit("published").alias("status"),
            F.col("stream_id").alias("off_chain_id"),
            F.col("version_id"),
            F.when(is_reply, F.array(F.lit("comment")))
            .otherwise(F.array().cast("array<string>"))
            .alias("flags"),
        )
    )


def union_post_sources(hive_posts: DataFrame, ceramic: DataFrame) -> DataFrame:
    """One posts table from both sources (§2.7): column union with
    missing columns null-filled; the discriminators keep query-side
    defaults (F7) working."""
    return hive_posts.unionByName(ceramic, allowMissingColumns=True)


def flagged_for_stream_id(posts: DataFrame) -> DataFrame:
    """The offchainIdRefresh selection (workers/background-proc/
    core.ts:44-51): posts flagged ``needs_stream_id`` with no
    ``offchain_id`` yet, HIVE type only. This is the key scan a batch
    refresh job feeds to the external Ceramic stream-creation service;
    pushdown-friendly (three column predicates on the posts scan)."""
    return posts.filter(
        F.col("needs_stream_id")
        & F.col("offchain_id").isNull()
        & (F.col("TYPE") == "HIVE")
    ).select("author", "permlink")


def assign_stream_ids(posts: DataFrame, assignments: DataFrame) -> DataFrame:
    """Batch analog of ``offchainIdRefresh`` (workers/background-proc/
    core.ts:44-70, scheduled per-minute at :464) plus the on-demand
    ``create_stream_id`` path (modules/api/controller.ts:6-40): merge
    externally-created Ceramic stream ids back onto posts, setting
    ``offchain_id`` and clearing ``needs_stream_id`` for the rows that
    got one. The external create itself is out-of-engine (a Ceramic
    write); ``assignments(author, permlink, stream_id)`` models its
    result as a snapshot table, the same way S4/J11 model RPC state.

    Semantics mirror the reference's per-post findOneAndUpdate:
    - only rows matching the flagged selection are eligible (a
      pre-existing offchain_id always wins — controller.ts:20-23);
    - unmatched or unflagged rows pass through untouched.

    Scale: assignments is bounded by the flagged count (a per-minute
    refresh batch), so it broadcasts; the posts table is never
    shuffled — one broadcast hash join + a projection.
    """
    # One assignment per key: a retried refresh can snapshot duplicate
    # (author, permlink) rows, and an un-deduped broadcast join would
    # fan out the posts table (duplicate keys downstream). min() is the
    # deterministic winner.
    a = assignments.groupBy(
        F.col("author").alias("_a_author"),
        F.col("permlink").alias("_a_permlink"),
    ).agg(F.min("stream_id").alias("_a_stream_id"))
    # Eligibility must be computed against the PRE-merge offchain_id;
    # materialize it as a column before either output column overwrites
    # the inputs it reads.
    assigned = (
        F.col("needs_stream_id")
        & F.col("offchain_id").isNull()
        & (F.col("TYPE") == "HIVE")
        & F.col("_a_stream_id").isNotNull()
    )
    return (
        posts.join(
            F.broadcast(a),
            (F.col("author") == F.col("_a_author"))
            & (F.col("permlink") == F.col("_a_permlink")),
            "left",
        )
        .withColumn("_assigned", assigned)
        .withColumns(
            {
                "offchain_id": F.coalesce(
                    F.col("offchain_id"),
                    F.when(F.col("_assigned"), F.col("_a_stream_id")),
                ),
                "needs_stream_id": F.when(
                    F.col("_assigned"), F.lit(False)
                ).otherwise(F.col("needs_stream_id")),
            }
        )
        .drop("_a_author", "_a_permlink", "_a_stream_id", "_assigned")
    )
