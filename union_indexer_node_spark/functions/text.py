"""Text functions: mentions, tokenization (SURVEY X14/X21/A9).

The reference extracts twitter-style @mentions from post bodies
(notifications.ts:5,17-35) — hive account mentions are lower-cased,
DID mentions kept verbatim (notifications.ts:39-45).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's mention regex VERBATIM (notifications.ts:5, the
# twitter-text derivative): group 1 is the left-boundary guard (start
# of text or a non-name character — 'foo@bar' is NOT a mention), group
# 2 the @/＠ sign, group 3 the captured name, group 4 an optional
# /list suffix. The name charset [a-zA-Z0-9_:-] has NO DOT, so
# '@threespeak.beta' captures only 'threespeak' — faithful to the
# reference, which inherits the twitter rule. RE2-safe (no lookaround,
# the boundary is a consumed group), so DuckDB oracles run the
# identical pattern.
MENTION_RE = (
    r"((?:^|[^a-zA-Z0-9_!#$%&*@＠]|(?:^|[^a-zA-Z0-9_+~.-])(?:rt|RT|rT|Rt):?))"
    r"([@＠])([a-zA-Z0-9_:-]{1,80})(/[a-zA-Z:][a-zA-Z0-9_:-]{0,24})?"
)
MENTION_GROUP = 3


def extract_mentions(body: Column) -> Column:
    """All @mentions in a body; hive names lower-cased, DIDs verbatim
    (notifications.ts:39-45)."""
    raw = F.regexp_extract_all(body, F.lit(MENTION_RE), MENTION_GROUP)
    return F.transform(
        raw,
        lambda m: F.when(m.startswith("did:"), m).otherwise(F.lower(m)),
    )


# RE2-safe (no lookarounds) so any engine finds identical matches.
HASHTAG_RE = r"#([a-zA-Z0-9_]+)"
URL_RE = r"https?://[a-zA-Z0-9./_%\-?=&#]+"


def extract_hashtags(body: Column) -> Column:
    """All #hashtags, lower-cased (SURVEY §7 Phase 5: the mention
    extractor generalized to the other social markup)."""
    return F.transform(
        F.regexp_extract_all(body, F.lit(HASHTAG_RE), 1), lambda t: F.lower(t)
    )


def extract_urls(body: Column) -> Column:
    """All http(s) URLs, verbatim."""
    return F.regexp_extract_all(body, F.lit(URL_RE), 0)


def tokenize(text: Column) -> Column:
    """X21 v1 tokenizer: lower-case word split. Token-AND matching over
    this reproduces the observable behavior of Mongo's $text for the
    reference (which sorts by recency, never by text score —
    resolvers/index.ts:210-213)."""
    return F.split(F.lower(text), "[^a-z0-9]+")


def mention_notifications(posts: DataFrame) -> DataFrame:
    """A9 — notifications derived from post bodies
    (notifications.ts:17-56, process-meta.ts:20-30):
    explode mentions, tag type by did-prefix, dedupe on (ref, target,
    notification_type). Pure explode + project + dropDuplicates —
    map-side until the dedup shuffle. The reference stamps
    ``mentioned_at`` from post.updated_at (notifications.ts:50);
    frames without that column (the read-side domain view) fall back
    to created_at."""
    ts_col = "updated_at" if "updated_at" in posts.columns else "created_at"
    # Semantics-preserving pre-filter: the verbatim reference regex is
    # a heavy NFA (the consumed-boundary alternation), and most bodies
    # mention no one. No @/＠ in the body ⇒ the pattern cannot match
    # (every alternative requires group 2's sign), so skipping those
    # rows map-side changes nothing and spares the regex scan —
    # measured 1.5x on the a9 bench entry after adopting the verbatim
    # pattern (VERDICT r7).
    has_sign = F.col("body").contains("@") | F.col("body").contains("＠")
    return (
        posts.filter(has_sign)
        .select(
            F.col("author").alias("from"),
            F.col(ts_col).alias("mentioned_at"),
            F.concat_ws("/", F.lit("hive"), F.col("author"), F.col("permlink")).alias(
                "ref"
            ),
            F.explode(extract_mentions(F.col("body"))).alias("target"),
        )
        .withColumn(
            "type",
            F.when(F.col("target").startswith("did:"), "did").otherwise("hive"),
        )
        .withColumn("notification_type", F.lit("mention"))
        .dropDuplicates(["ref", "target", "notification_type"])
    )
