"""Scalar column functions (SURVEY §2.8).

Each function cites the reference implementation it re-expresses
(file:line into /root/reference/). All are pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Allowlist of apps whose posts are indexed
# (reference: src/services/block_processing/posts.ts:30)
ALLOWED_APPS = ["3speak", "dbuzz"]


def detect_post_type(app: Column) -> Column:
    """X2 — detectPostType (block_processing/posts.ts:1-24): the app
    string's '/'-prefix matched against known apps; anything else (or
    unparseable metadata) is 'unknown'.

    Documented divergence (lenient arm): the reference matches the
    dBuzz prefix CASE-SENSITIVELY as 'dBuzz' (posts.ts:10), so a
    lower-case 'dbuzz/2' app string is 'unknown' there; this engine
    accepts both spellings — real dBuzz posts have shipped both, and
    classifying them 'unknown' would drop them from the ALLOWED_APPS
    gate on a casing accident. Same divergence-ledger treatment as
    first_upload / O6 / permlink."""
    prefix = F.split(app, "/").getItem(0)
    return (
        F.when(prefix == "3speak", "3speak")
        .when(prefix == "dBuzz", "dbuzz")
        .when(prefix == "dbuzz", "dbuzz")
        .when(prefix == "steemit", "steemit")
        .otherwise("unknown")
    )


def pullout_ipfs_links(source_map: Column) -> Column:
    """X3 — pulloutIpfsLinks (hive-stream.ts:14-30): map sourceMap
    entries to {cid: host-of-url}. parse_url is JVM-side."""
    return F.transform(
        source_map,
        lambda e: F.struct(F.parse_url(e["url"], F.lit("HOST")).alias("cid")),
    )


def storage_type(source_map: Column) -> Column:
    """X4 — storage type resolution (hive-stream.ts:632-646): 'ipfs' if
    a video entry exists, else 'thumbnail_ipfs' if a thumbnail entry
    exists, else 'legacy'."""
    sm = F.coalesce(source_map, F.array())
    return (
        F.when(F.exists(sm, lambda e: e["type"] == "video"), "ipfs")
        .when(F.exists(sm, lambda e: e["type"] == "thumbnail"), "thumbnail_ipfs")
        .otherwise("legacy")
    )


def deleted_status(flags: Column, tags: Column) -> Column:
    """X8 — deleted-status precedence (hive-stream.ts:550-561): the
    literal 'deleted' in json_metadata.flags or tags ⇒ status 'deleted'."""
    f = F.coalesce(flags, F.array().cast("array<string>"))
    t = F.coalesce(tags, F.array().cast("array<string>"))
    return F.when(
        F.array_contains(f, "deleted") | F.array_contains(t, "deleted"), "deleted"
    ).otherwise("published")


def is_short(duration: Column, height: Column, width: Column) -> Column:
    """X12 — short-video predicate (core.ts:222-229): duration <= 180s
    and portrait orientation."""
    return (duration <= 180) & (height >= width)


def asset_to_float(asset: Column) -> Column:
    """X16 — '1.234 HBD' -> 1.234 (core.ts:104, post-stats.ts:46-48).
    try_cast: under Spark 4's default ANSI mode a plain cast on a
    malformed asset string ('' / 'HBD' in dirty chain data) would abort
    the whole query; NULL-per-row matches the reference's parseFloat
    NaN tolerance."""
    return F.split(asset, " ").getItem(0).try_cast("double")


def payout_value(pending: Column, total: Column, curator: Column, last_payout: Column) -> Column:
    """X16 payout choice (post-stats.ts:46-48): pending while unpaid
    (epoch last_payout), else total+curator."""
    return F.when(
        last_payout <= F.lit("1970-01-01 00:00:00").cast("timestamp"),
        asset_to_float(pending),
    ).otherwise(asset_to_float(total) + asset_to_float(curator))


def block_height_from_id(block_id: Column) -> Column:
    """X18 — block height = first 8 hex chars of block_id
    (utils.ts:19,57,93)."""
    return F.conv(F.substring(block_id, 1, 8), 16, 10).cast("long")


def hive_id(*parts: Column | str) -> Column:
    """X19 — id synthesis 'hive-<a>-<b>' / 'hive/<x>'
    (hive-stream.ts:290,334,376,463)."""
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("-", F.lit("hive"), *cols)


def post_refs(author: Column, permlink: Column) -> Column:
    """X11 — refs = ['hive:<author>:<permlink>'] (resolvers/posts.ts:37-40)."""
    return F.array(F.concat_ws(":", F.lit("hive"), author, permlink))


def community_ref(parent_permlink: Column) -> Column:
    """X11 — community_ref = parent_permlink when it names a community
    (resolvers/posts.ts:88-94)."""
    return F.when(parent_permlink.startswith("hive-"), parent_permlink)


def roles_structs(roles: Column) -> Column:
    """X20 — [username, role, title] triples -> structs
    (resolvers/index.ts:413-420)."""
    return F.transform(
        roles,
        lambda r: F.struct(
            r.getItem(0).alias("username"),
            r.getItem(1).alias("role"),
            r.getItem(2).alias("title"),
        ),
    )


def parse_resolution(manifest: Column) -> Column:
    """X12/S5 — video dimensions from an HLS manifest: the reference
    regexes RESOLUTION=WxH out of the fetched .m3u8 (core.ts:164-191).
    Returns struct(width, height); null when absent."""
    res = F.regexp_extract(manifest, r"RESOLUTION=(\d+)x(\d+)", 0)
    w = F.regexp_extract(manifest, r"RESOLUTION=(\d+)x(\d+)", 1)
    h = F.regexp_extract(manifest, r"RESOLUTION=(\d+)x(\d+)", 2)
    return F.when(
        res != "",
        F.struct(w.cast("int").alias("width"), h.cast("int").alias("height")),
    )


def spkvideo_view(
    duration: Column,
    images: Column,
    source_map: Column,
    body: Column,
    author: Column,
    permlink: Column,
) -> Column:
    """X10 — the spkvideo getter (resolvers/posts.ts:104-130): null
    unless a video duration exists; thumbnail = last image or the CDN
    default; play_url = the sourceMap video entry or the CDN template;
    short_description = segment after the '---\\n\\n' divider."""
    sm = F.coalesce(source_map, F.array())
    video_entries = F.filter(sm, lambda e: e["type"] == "video")
    play_url = F.when(
        F.size(video_entries) > 0, video_entries.getItem(0)["url"]
    ).otherwise(
        F.concat_ws(
            "/",
            F.lit("https://threespeakvideo.b-cdn.net"),
            permlink,
            F.lit("default.m3u8"),
        )
    )
    # try_element_at both places: under default-ANSI Spark 4, plain
    # element_at throws on an empty images array (index -1) or a body
    # without the divider (index 2) instead of returning NULL.
    thumbnail = F.coalesce(
        F.try_element_at(
            F.coalesce(images, F.array().cast("array<string>")), F.lit(-1)
        ),
        F.concat_ws(
            "/",
            F.lit("https://threespeakvideo.b-cdn.net"),
            permlink,
            F.lit("thumbnails/default.png"),
        ),
    )
    short_desc = F.try_element_at(F.split(body, r"---\n\n"), F.lit(2))
    return F.when(
        duration.isNotNull(),
        F.struct(
            duration.alias("duration"),
            play_url.alias("play_url"),
            thumbnail.alias("thumbnail_url"),
            short_desc.alias("short_description"),
            F.concat_ws("/", author, permlink).alias("ref"),
        ),
    )


def vote_sign_counts(active_voters: Column) -> tuple[Column, Column]:
    """A6 — up/down vote counts from the voter list (core.ts:118-119).
    Higher-order filter+size: no shuffle, no explode."""
    av = F.coalesce(active_voters, F.array())
    up = F.size(F.filter(av, lambda v: v["rshares"] > 0))
    down = F.size(F.filter(av, lambda v: v["rshares"] < 0))
    return up, down
