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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Input shape of offchain docs (graph.docs); content is the post body
# document, creator_id the DID.
CERAMIC_DOCS_SCHEMA = """
    stream_id string, version_id string, creator_id string,
    parent_author string, parent_permlink string,
    title string, body string, tags array<string>,
    json_metadata string, created_at timestamp, updated_at timestamp,
    last_pinged timestamp, deleted boolean
"""


def ceramic_posts(docs: DataFrame) -> DataFrame:
    """Map offchain docs -> post rows (services/index.ts:77-119):
    author = DID, permlink = stream id, TYPE/__t discriminators set to
    CERAMIC; pin-only heartbeats and deletes dropped (the reference
    filters both in the change-stream handler, :67-76)."""
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
        )
    )


def union_post_sources(hive_posts: DataFrame, ceramic: DataFrame) -> DataFrame:
    """One posts table from both sources (§2.7): column union with
    missing columns null-filled; the discriminators keep query-side
    defaults (F7) working."""
    return hive_posts.unionByName(ceramic, allowMissingColumns=True)
