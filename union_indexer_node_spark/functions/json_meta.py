"""JSON metadata projection (SURVEY §2.8 X1/X7/X22).

The reference keeps ``json_metadata`` as an open JSON document
(types/posts.ts:51-56) and reads ~12 known paths. We store the raw
string AND a typed struct projection: ``from_json`` with a permissive
schema returns NULL on bad JSON, so the raw column is the fallback —
exactly the reference's parse-or-keep-string behavior
(hive-stream.ts:495-502).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The typed projection of the paths the reference actually reads
# (read sites: resolvers/index.ts:45-47,104-106, resolvers/posts.ts:104-130,
#  hive-stream.ts:14-30,622-646, core.ts:200-228).
JSON_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("app", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("image", T.ArrayType(T.StringType())),
        T.StructField("flags", T.ArrayType(T.StringType())),
        T.StructField(
            "video",
            T.StructType(
                [
                    T.StructField(
                        "info",
                        T.StructType(
                            [
                                T.StructField("lang", T.StringType()),
                                T.StructField("duration", T.DoubleType()),
                                T.StructField("title", T.StringType()),
                                T.StructField("author", T.StringType()),
                                T.StructField("permlink", T.StringType()),
                                T.StructField("file", T.StringType()),
                                T.StructField("filesize", T.LongType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "sourceMap",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField("url", T.StringType()),
                                    T.StructField("format", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField(
            "profile",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("about", T.StringType()),
                    T.StructField("location", T.StringType()),
                    T.StructField("website", T.StringType()),
                    T.StructField("pinned", T.StringType()),
                    T.StructField("profile_image", T.StringType()),
                    T.StructField("cover_image", T.StringType()),
                    # sic: the reference reads `profile?.topcs` —
                    # hive-stream.ts:464 — so the typo'd key is the one
                    # that exists on chain for community topic lists
                    T.StructField("topcs", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField("did", T.StringType()),
    ]
)


def parse_json_metadata(raw: Column) -> Column:
    """X1 — permissive parse; NULL struct on bad JSON (caller keeps the
    raw column alongside, hive-stream.ts:495-502)."""
    return F.from_json(raw, JSON_METADATA_SCHEMA, {"mode": "PERMISSIVE"})


def app_name(jm: Column) -> Column:
    """X7 — app_metadata.app = split(app,'/')[0] (hive-stream.ts:648-649)."""
    return F.split(jm["app"], "/").getItem(0)


def profile_projection(posting_json_metadata: Column) -> Column:
    """X22 — profile struct from posting_json_metadata
    (hive-stream.ts:448-493, core.ts:405-436)."""
    return F.from_json(posting_json_metadata, PROFILE_SCHEMA, {"mode": "PERMISSIVE"})
