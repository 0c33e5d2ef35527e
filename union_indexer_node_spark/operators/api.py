"""S9/§3.1 — the serving facade: GraphQL-shaped argument objects
compiled to DataFrame plans.

The reference's GraphQL root fields (schema.ts:308-328) each compile
their args into a Mongo filter via TransformFeedArgs
(resolvers/index.ts:58-149). This module is that compiler, targeting
FeedSpec/DataFrame instead: a thin serving layer (or notebook user)
passes the same argument dicts a GraphQL resolver would receive and
gets a DataFrame back. Nested-field enrichment (author profile,
children, community — the reference's N+1 getters) are explicit joins
here, requested via `include`.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import feeds
from .feeds import NAME_MAP, FeedSpec


def compile_args(args: Mapping[str, Any]) -> FeedSpec:
    """GraphQL feed args -> FeedSpec (TransformFeedArgs parity)."""
    where = {k: v for k, v in args.items() if k in NAME_MAP}
    spec = FeedSpec(
        where=where,
        or_where=args.get("or", {}),
        include_comments=bool(args.get("includeComments", False)),
        include_ceramic=bool(args.get("includeCeramic", False)),
        limit=int(args.get("limit", 100)),
        skip=int(args.get("skip", 0)),
        follower=args.get("byFollower"),
    )
    return spec


def spkvideo_filters(args: Mapping[str, Any]):
    """F8 — spkvideo flag filters (resolvers/index.ts:61-71) against
    the silver posts schema (first_upload / app_types / is_short)."""
    preds = []
    sv = args.get("spkvideo") or {}
    if sv.get("firstUpload"):
        preds.append(F.col("first_upload"))
    if sv.get("only"):
        preds.append(
            F.array_contains(
                F.coalesce(F.col("app_types"), F.array().cast("array<string>")),
                "spkvideo",
            )
        )
    if sv.get("isShort"):
        preds.append(F.col("is_short"))
    return preds


def social_feed(
    posts: DataFrame,
    args: Mapping[str, Any],
    follows: DataFrame | None = None,
    social_connections: DataFrame | None = None,
) -> DataFrame:
    spec = compile_args(args)
    for p in spkvideo_filters(args):
        posts = posts.filter(p)
    return feeds.social_feed(
        posts, spec, follows=follows, social_connections=social_connections
    )


def search_feed(posts: DataFrame, args: Mapping[str, Any]) -> DataFrame:
    return feeds.search_feed(posts, args["term"], compile_args(args))


def trending_feed(posts: DataFrame, args: Mapping[str, Any]) -> DataFrame:
    return feeds.trending_feed(
        posts,
        compile_args(args),
        trending_by=args.get("trendingBy", "payout"),
    )


def related_feed(posts: DataFrame, args: Mapping[str, Any]) -> DataFrame:
    return feeds.related_feed(
        posts,
        args["author"],
        args["permlink"],
        limit=int(args.get("limit", 25)),
    )


def trending_tags(posts: DataFrame, args: Mapping[str, Any]) -> DataFrame:
    return feeds.trending_tags(posts, limit=int(args.get("limit", 5)))


def social_post(posts: DataFrame, args: Mapping[str, Any]) -> DataFrame:
    """F10 point lookup (socialPost root field)."""
    return posts.filter(
        (F.col("author") == args["author"]) & (F.col("permlink") == args["permlink"])
    ).limit(1)


def with_author_profile(posts: DataFrame, profiles: DataFrame) -> DataFrame:
    """J5 — the author.profile nested field as one broadcast join
    instead of a per-row findOne (resolvers/posts.ts:140-155)."""
    pr = profiles.select(
        F.col("username").alias("author"),
        F.struct("displayName", "about", "images").alias("author_profile"),
    )
    return posts.join(F.broadcast(pr), "author", "left")


def with_community(posts: DataFrame, communities: DataFrame) -> DataFrame:
    """J6 — community nested field: join on the computed 'hive/<permlink>'
    key only when parent_permlink names a community
    (resolvers/posts.ts:245-260)."""
    key = F.when(
        F.col("parent_permlink").startswith("hive-"),
        F.concat_ws("/", F.lit("hive"), F.col("parent_permlink")),
    )
    cm = communities.select(
        F.col("_id").alias("_community_id"),
        F.struct("title", "about").alias("community"),
    )
    return posts.withColumn("_community_id", key).join(
        F.broadcast(cm), "_community_id", "left"
    ).drop("_community_id")


ROOT_FIELDS = {
    "socialFeed": social_feed,
    "searchFeed": search_feed,
    "trendingFeed": trending_feed,
    "relatedFeed": related_feed,
    "trendingTags": trending_tags,
    "socialPost": social_post,
}


def execute(root_field: str, posts: DataFrame, args: Mapping[str, Any], **tables) -> DataFrame:
    """Dispatch a root field like the GraphQL schema does
    (schema.ts:308-328)."""
    fn = ROOT_FIELDS[root_field]
    if root_field == "socialFeed":
        return fn(
            posts,
            args,
            follows=tables.get("follows"),
            social_connections=tables.get("social_connections"),
        )
    return fn(posts, args)
