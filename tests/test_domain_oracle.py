"""Row-identical validation of the domain views against their DuckDB CTE
twins.

``tables.posts()``/``tables.follows()`` and ``POSTS_CTE``/``FOLLOWS_CTE``
must stay in lockstep — every oracle-checked domain query depends on it.
This test compares FULL rows (every column, every row) at sf0.001, so a
drift in any derivation rule fails here before it can silently skew a
downstream oracle comparison that happens to dodge the divergent rows.

Regression anchor: Spark's sequence(1, 0) yields [1, 0] (descending)
while DuckDB's generate_series(1, 0) is empty — uid%4==0 users must have
zero 'blog' followings in both engines (tables.follows guards this).
"""

from __future__ import annotations

from oracle_harness import compare, duckdb_conn
from union_indexer_node_spark import tables


def _duck(sf_dir: str, body: str):
    con = duckdb_conn(sf_dir)
    try:
        return con.execute(tables.oracle_with_domain(body)).fetchdf()
    finally:
        con.close()


def test_posts_view_row_identical(spark, sf_dir):
    spdf = tables.posts(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, "SELECT * FROM posts")
    # Arrays compare as strings via canon(); that still pins element
    # order and content.
    assert not compare(spdf, ddf, "posts"), compare(spdf, ddf, "posts")


def test_follows_view_row_identical(spark, sf_dir):
    spdf = tables.follows(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, "SELECT * FROM follows")
    assert not compare(spdf, ddf, "follows"), compare(spdf, ddf, "follows")


def test_social_connections_view_row_identical(spark, sf_dir):
    spdf = tables.social_connections(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, "SELECT * FROM social_connections")
    assert len(spdf) > 0, "derivation must produce DID edges"
    assert not compare(spdf, ddf, "social_connections"), compare(
        spdf, ddf, "social_connections"
    )


def test_did_follower_routes_to_social_connections(spark, sf_dir):
    """feeds.social_feed must consult social_connections (not follows)
    for a did:-prefixed byFollower — reference resolvers/index.ts:126-146."""
    import pytest

    from union_indexer_node_spark.operators.feeds import FeedSpec, social_feed

    posts = tables.posts(spark, sf_dir)
    fol = tables.follows(spark, sf_dir)
    with pytest.raises(ValueError, match="social_connections"):
        social_feed(posts, FeedSpec(follower="did:key:zu6"), follows=fol)


def test_follows_mod4_zero_users_have_no_blog_edges(spark, sf_dir):
    f = tables.follows(spark, sf_dir).toPandas()
    blog = f[f["what"] == "blog"]
    uids = blog["follower"].str.lstrip("u").astype(int)
    assert not (uids % 4 == 0).any(), "uid%4==0 users must have 0 followings"
