"""Table access + deterministic domain-view derivation.

Two families of inputs:

1. **Generic testdata** (``/root/testdata/sf*/``): TPC-H-ish tables
   ``region nation customer supplier part orders lineitem`` plus
   ``events`` (an append stream), ``documents`` (text corpus) and
   ``embeddings`` (array<float> vectors). Loaded verbatim.

2. **Domain views**: the reference engine's data model is a social index
   (``posts``/``profiles``/``follows``/``communities`` — shapes at
   /root/reference/src/types/posts.ts:1-84 and
   /root/reference/src/workers/hive-stream.ts:289-492). The driver's
   oracle can only see the generic tables, so we *derive* domain-shaped
   views from ``events`` with pure modulo/concat arithmetic that DuckDB
   reproduces bit-for-bit (see ``POSTS_CTE`` — the same derivation as a
   DuckDB CTE). Every domain operator is then oracle-checkable.

At 100 TB the derivation is irrelevant (real ingest feeds the silver
tables, see ``ingest/``); what matters is that the *query* code paths
exercised here are the production ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GENERIC_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to run our queries — including a vanilla
    session built by an external harness, not just ``session.get_spark()``.

    Both confs are runtime-settable SQLConfs, so ``spark.conf.set`` works
    after session construction:

    - ``nanosAsLong``: events.parquet stores TIMESTAMP(NANOS), which a
      stock Spark 4 reader rejects with PARQUET_TYPE_ILLEGAL. Reading the
      ns value as long (then truncating ns->us in ``load``) matches
      DuckDB's read of the same file.
    - ``timeZone=UTC``: timestamp→string/date rendering must agree with
      the DuckDB oracle regardless of the host machine's zone.
    """
    # Each conf gets its own guard: a failure on one must not silently
    # skip the other, and a locked-down session should leave a trace
    # (a swallowed timeZone failure would otherwise surface much later
    # as a confusing timestamp-rendering oracle mismatch).
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # Current driver testdata stores ts as TIMESTAMP(MICROS,
        # isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ
        # by default. NTZ can't carry a streaming watermark
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so read it as plain
        # TIMESTAMP instead — value-identical under the pinned UTC
        # session zone, and matches DuckDB's naive read.
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception as exc:  # static-conf lockdown; may still work
            import warnings

            warnings.warn(f"could not set {key}={value}: {exc}", stacklevel=2)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning + predicate pushdown reach
    the parquet scan because we return the raw reader output (no caching,
    no materialization barriers).

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) (older driver
    testdata — Spark reads it as long under
    ``spark.sql.legacy.parquet.nanosAsLong`` and we truncate ns->us) and
    plain TIMESTAMP(MICROS) (current testdata — no conversion needed).
    Branch on the *read* dtype so both generations load identically and
    match DuckDB's read of the same file."""
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in GENERIC_TABLES}


# ---------------------------------------------------------------------------
# Domain view: posts (reference shape: types/posts.ts:1-84)
# ---------------------------------------------------------------------------
# The arithmetic below is mirrored EXACTLY in POSTS_CTE (DuckDB dialect).
# Rules of the shared subset: integer modulo, '||' concat (both engines
# implicitly cast ints), CASE WHEN, no floats except pass-through of
# ``value`` (2-decimal doubles).
#
# Shape goals (FIXTURES.md distribution requirements):
#   - comments: event_type='click' rows, flags=['comment'], parent points
#     at a low event_id so parents exist and communities are skewed
#   - community posts: parent_permlink LIKE 'hive-%' (5 communities,
#     skew via modulo)
#   - TYPE: mostly 'HIVE', some 'CERAMIC', some NULL (tests Mongo $ne
#     null-semantics, SURVEY F7)
#   - tags: 17-value vocabulary + 'deleted' poison tag (X8)
#   - mentions embedded in body for A9/X14


def posts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    is_comment = F.col("event_type") == "click"
    eid = F.col("event_id")
    uid = F.col("user_id")

    author = F.concat(F.lit("u"), uid.cast("string"))
    permlink = F.concat(F.lit("p"), eid.cast("string"))
    app = (
        F.when(F.col("event_type") == "purchase", "3speak/1.0")
        .when(F.col("event_type") == "signup", "dbuzz/2")
        .when(F.col("event_type") == "error", "steemit/0.1")
        .otherwise("other/1")
    )
    tag1 = F.concat(F.lit("t"), (eid % 17).cast("string"))
    tag2 = F.concat(F.lit("t"), (eid % 5).cast("string"))
    deleted = (eid % 97) == 0

    return e.select(
        eid.alias("event_id"),
        author.alias("author"),
        permlink.alias("permlink"),
        F.when(is_comment, F.concat(F.lit("u"), ((eid % 211) % 40).cast("string")))
        .otherwise(F.lit(""))
        .alias("parent_author"),
        F.when(is_comment, F.concat(F.lit("p"), (eid % 211).cast("string")))
        .when(eid % 7 < 2, F.concat(F.lit("hive-"), (eid % 5).cast("string")))
        .otherwise(F.lit("blog"))
        .alias("parent_permlink"),
        F.concat(F.lit("post "), eid.cast("string")).alias("title"),
        F.when(
            eid % 11 == 0,
            F.concat(
                F.lit("hello @u"),
                ((eid + 1) % 40).cast("string"),
                F.lit(" and @U"),
                ((eid + 2) % 40).cast("string"),
                F.lit(" bye"),
            ),
        )
        .otherwise(F.concat(F.lit("plain body "), eid.cast("string")))
        .alias("body"),
        F.when(deleted, F.array(tag1, tag2, F.lit("deleted")))
        .otherwise(F.array(tag1, tag2))
        .alias("tags"),
        F.when(deleted, F.lit("deleted")).otherwise(F.lit("published")).alias("status"),
        F.col("ts").alias("created_at"),
        F.when(eid % 13 == 0, F.lit("CERAMIC"))
        .when(eid % 13 == 1, F.lit(None).cast("string"))
        .otherwise(F.lit("HIVE"))
        .alias("TYPE"),
        F.when(is_comment, F.array(F.lit("comment")))
        .when(eid % 13 == 1, F.lit(None).cast("array<string>"))
        .otherwise(F.array().cast("array<string>"))
        .alias("flags"),
        app.alias("app"),
        F.split(app, "/").getItem(0).alias("app_name"),
        F.when(eid % 4 == 0, "en")
        .when(eid % 4 == 1, "es")
        .when(eid % 4 == 2, F.lit(None).cast("string"))
        .otherwise("fr")
        .alias("lang"),
        F.floor(F.col("value")).cast("int").alias("num_votes"),
        (F.col("value") / 10).alias("payout"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("duration"),
    )


# DuckDB rendering of the SAME derivation (validated row-identical by
# tests/test_domain_oracle.py). Keep in lockstep with posts() above.
POSTS_CTE = """
posts AS (
  SELECT
    event_id,
    'u' || CAST(user_id AS VARCHAR) AS author,
    'p' || CAST(event_id AS VARCHAR) AS permlink,
    CASE WHEN event_type = 'click'
         THEN 'u' || CAST((event_id % 211) % 40 AS VARCHAR)
         ELSE '' END AS parent_author,
    CASE WHEN event_type = 'click' THEN 'p' || CAST(event_id % 211 AS VARCHAR)
         WHEN event_id % 7 < 2 THEN 'hive-' || CAST(event_id % 5 AS VARCHAR)
         ELSE 'blog' END AS parent_permlink,
    'post ' || CAST(event_id AS VARCHAR) AS title,
    CASE WHEN event_id % 11 = 0
         THEN 'hello @u' || CAST((event_id + 1) % 40 AS VARCHAR)
              || ' and @U' || CAST((event_id + 2) % 40 AS VARCHAR) || ' bye'
         ELSE 'plain body ' || CAST(event_id AS VARCHAR) END AS body,
    CASE WHEN event_id % 97 = 0
         THEN ['t' || CAST(event_id % 17 AS VARCHAR),
               't' || CAST(event_id % 5 AS VARCHAR), 'deleted']
         ELSE ['t' || CAST(event_id % 17 AS VARCHAR),
               't' || CAST(event_id % 5 AS VARCHAR)] END AS tags,
    CASE WHEN event_id % 97 = 0 THEN 'deleted' ELSE 'published' END AS status,
    ts AS created_at,
    CASE WHEN event_id % 13 = 0 THEN 'CERAMIC'
         WHEN event_id % 13 = 1 THEN NULL
         ELSE 'HIVE' END AS "TYPE",
    CASE WHEN event_type = 'click' THEN ['comment']
         WHEN event_id % 13 = 1 THEN NULL
         ELSE [] END AS flags,
    CASE WHEN event_type = 'purchase' THEN '3speak/1.0'
         WHEN event_type = 'signup' THEN 'dbuzz/2'
         WHEN event_type = 'error' THEN 'steemit/0.1'
         ELSE 'other/1' END AS app,
    CASE WHEN event_type = 'purchase' THEN '3speak'
         WHEN event_type = 'signup' THEN 'dbuzz'
         WHEN event_type = 'error' THEN 'steemit'
         ELSE 'other' END AS app_name,
    CASE WHEN event_id % 4 = 0 THEN 'en'
         WHEN event_id % 4 = 1 THEN 'es'
         WHEN event_id % 4 = 2 THEN NULL
         ELSE 'fr' END AS lang,
    CAST(FLOOR(value) AS INTEGER) AS num_votes,
    value / 10 AS payout,
    CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS duration
  FROM events
)
"""


# ---------------------------------------------------------------------------
# Domain view: follows (reference shape: hive-stream.ts:289-301,375-387)
# ---------------------------------------------------------------------------
# Edge rule: user u follows (u*3+k) % 40 for k in 1..(u%4) — users have
# 0..3 followings; plus every 5th user subscribes to a community.


def follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = (
        e.select(F.col("user_id").cast("long").alias("uid")).distinct()
    )
    # Guard the sequence: Spark's sequence(1, 0) yields the DESCENDING
    # [1, 0] while DuckDB's generate_series(1, 0) is empty — uid%4==0
    # users must have zero followings in both engines.
    n = F.col("uid") % 4
    k = u.select(
        "uid",
        F.explode(
            F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("k"),
    )
    user_edges = k.select(
        F.concat(F.lit("u"), F.col("uid").cast("string")).alias("follower"),
        F.concat(
            F.lit("u"), ((F.col("uid") * 3 + F.col("k")) % 40).cast("string")
        ).alias("following"),
        F.lit("blog").alias("what"),
    )
    community_edges = u.filter(F.col("uid") % 5 == 0).select(
        F.concat(F.lit("u"), F.col("uid").cast("string")).alias("follower"),
        F.concat(F.lit("hive-"), (F.col("uid") % 5).cast("string")).alias("following"),
        F.lit("community").alias("what"),
    )
    return user_edges.unionByName(community_edges)


FOLLOWS_CTE = """
follows AS (
  SELECT 'u' || CAST(uid AS VARCHAR) AS follower,
         'u' || CAST((uid * 3 + k) % 40 AS VARCHAR) AS following,
         'blog' AS what
  FROM (SELECT DISTINCT user_id AS uid FROM events) u,
       LATERAL (SELECT UNNEST(generate_series(1, CAST(uid % 4 AS INTEGER))) AS k) s
  UNION ALL
  SELECT 'u' || CAST(uid AS VARCHAR), 'hive-' || CAST(uid % 5 AS VARCHAR),
         'community'
  FROM (SELECT DISTINCT user_id AS uid FROM events) u
  WHERE uid % 5 = 0
)
"""


# ---------------------------------------------------------------------------
# Domain view: social_connections (offchain DID follow graph)
# ---------------------------------------------------------------------------
# The reference keeps a SEPARATE offchain collection for Ceramic/DID
# identities: `social_connections` in the offchain db
# (/root/reference/src/services/index.ts:149,165), consulted by the
# byFollower resolver when the id starts with 'did:'
# (/root/reference/src/modules/api/graphql-v2/resolvers/index.ts:126-146).
# Derivation rule: every uid%3==0 user has a DID persona
# 'did:key:zu<uid>' following 1..(1+(uid%7)%3) on-chain authors at
# (uid*7+k)%40 — always >=1 edge, so no empty-sequence divergence.


def social_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(F.col("user_id").cast("long").alias("uid")).distinct()
    did = u.filter(F.col("uid") % 3 == 0)
    k = did.select(
        "uid",
        F.explode(
            F.sequence(F.lit(1), F.lit(1) + (F.col("uid") % 7) % 3)
        ).alias("k"),
    )
    return k.select(
        F.concat(F.lit("did:key:zu"), F.col("uid").cast("string")).alias("follower"),
        F.concat(
            F.lit("u"), ((F.col("uid") * 7 + F.col("k")) % 40).cast("string")
        ).alias("following"),
    )


SOCIAL_CONNECTIONS_CTE = """
social_connections AS (
  SELECT 'did:key:zu' || CAST(uid AS VARCHAR) AS follower,
         'u' || CAST((uid * 7 + k) % 40 AS VARCHAR) AS following
  FROM (SELECT DISTINCT user_id AS uid FROM events WHERE user_id % 3 = 0) u,
       LATERAL (SELECT UNNEST(generate_series(
                  1, CAST(1 + (uid % 7) % 3 AS INTEGER))) AS k) s
)
"""


# ---------------------------------------------------------------------------
# Derived relation: partsupp (TPC-H completion, round 13)
# ---------------------------------------------------------------------------
# The driver testdata has no partsupp.parquet, so TPC-H q2/q9/q11/q16/
# q20 originally ran as adapted "shapes". This view derives a faithful
# partsupp with pure integer arithmetic both engines reproduce
# bit-for-bit (same rules as the domain views above):
#   - 4 suppliers per part, dbgen-style: with S = COUNT(supplier) and
#     0-based keys, ps_suppkey_i = (pk + pk//S + i*(S//4)) % S for
#     i in 0..3. The i*(S//4) stride makes the 4 keys DISTINCT for
#     every S divisible by 4 in the testdata (10 is not, but 2*4 < 10
#     keeps them distinct there too); pk//S rotates the assignment per
#     part-key epoch like dbgen's (partkey-1)/S term.
#   - ps_supplycost in [1.00, 1000.00): cents are a fixed integer hash
#     of the (part, supplier) key, divided by 100.0 — both engines
#     perform the identical int arithmetic then the identical IEEE
#     division, so the doubles are bit-equal.
#   - ps_availqty in [1, 9999]: same construction.
#   - CONTAINMENT (self-review r13): real dbgen generates lineitem's
#     (l_partkey, l_suppkey) pairs FROM partsupp, so every lineitem
#     row joins partsupp losslessly — the property Q9/Q20 rely on.
#     Our testdata fixed lineitem first, so we close the containment
#     the other way: the key set is the 4-per-part formula pairs
#     UNION the DISTINCT observed lineitem pairs. Cost/availqty are
#     pure functions of the key, so both origins price identically.
#
# Scale note: the formula rows are 4x|part| derived map-side from a
# scan of part plus ONE broadcast scalar (the supplier count); the
# containment arm adds one distinct over the fact's two key columns —
# the same cardinality as partsupp itself, a single narrow shuffle.
# At 100 TB the real table would be ingested instead; every query
# below treats partsupp as an opaque relation, so swapping the view
# for a real table changes nothing downstream.


def partsupp(
    spark: SparkSession,
    sf_dir: str,
    part_keys: DataFrame | None = None,
    supp_keys: DataFrame | None = None,
) -> DataFrame:
    """The derived partsupp relation, optionally pruned to a key set.

    ``part_keys`` (one column ``p_partkey``) / ``supp_keys`` (one
    column ``ps_suppkey``) restrict the relation BELOW the
    containment-closing distinct, so the union/distinct shuffle and
    any downstream broadcast carry only the keys the caller will keep
    anyway. Equivalence: cost/availqty are pure functions of the key
    pair, so ``partsupp(part_keys=K)`` row-for-row equals
    ``partsupp().join(K, semi)`` (pinned by TestPartsuppDerivation).
    Callers may pass a filter ONLY when they inner/semi-join partsupp
    on that key against the same filtered set downstream — per-group
    aggregates keyed by ps_partkey (Q2's min, Q11's sum) are safe
    because groups for surviving keys see identical rows.
    """
    p = load(spark, sf_dir, "part").select("p_partkey")
    if part_keys is not None:
        p = part_keys.select("p_partkey")
    s_cnt = load(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    pk = F.col("p_partkey")
    sk = (
        pk + F.expr("p_partkey div s_cnt") + F.col("i") * F.expr("s_cnt div 4")
    ) % F.col("s_cnt")
    formula_keys = (
        p.join(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "s_cnt",
            F.explode(F.array([F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(pk.alias("ps_partkey"), sk.cast("long").alias("ps_suppkey"))
    )
    observed_keys = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    if part_keys is not None:
        observed_keys = observed_keys.join(
            F.broadcast(
                part_keys.select(F.col("p_partkey").alias("ps_partkey"))
            ),
            "ps_partkey",
            "left_semi",
        )
    if supp_keys is not None:
        sk_frame = F.broadcast(supp_keys.select("ps_suppkey"))
        formula_keys = formula_keys.join(sk_frame, "ps_suppkey", "left_semi")
        observed_keys = observed_keys.join(sk_frame, "ps_suppkey", "left_semi")
    keys = formula_keys.unionByName(observed_keys).distinct()
    pkey, skey = F.col("ps_partkey"), F.col("ps_suppkey")
    cost_cents = (pkey * 7919 + skey * 104729) % 99900 + 100
    avail = (pkey * 47 + skey * 13) % 9999 + 1
    return keys.select(
        "ps_partkey",
        "ps_suppkey",
        (cost_cents.cast("double") / 100.0).alias("ps_supplycost"),
        avail.cast("long").alias("ps_availqty"),
    )


# ---------------------------------------------------------------------------
# Derived relation: lineitem_ext (TPC-H completion, round 14)
# ---------------------------------------------------------------------------
# The driver testdata's lineitem carries no l_shipmode and no
# commit/receipt dates, which kept Q12 and Q21 as adapted "shapes".
# This view extends lineitem with the three columns, derived with pure
# integer key arithmetic both engines reproduce bit-for-bit (the
# partsupp discipline above):
#   - l_shipmode: the 7 dbgen modes indexed by
#     (l_orderkey*31 + l_linenumber) % 7 — uniform, per-line stable.
#   - l_commitdate = l_shipdate + ((l_orderkey*17 + l_linenumber*3)
#     % 61 − 30) days: within ±30 days of ship, so Q12's
#     l_shipdate < l_commitdate and Q21's late test
#     (l_receiptdate > l_commitdate) both split the data
#     non-degenerately.
#   - l_receiptdate = l_shipdate + ((l_orderkey*13 + l_linenumber*7)
#     % 30 + 1) days: dbgen's receipt = ship + 1..30 days.
# Day arithmetic is calendar-day on plain (zone-less) timestamps —
# Spark timestampadd(DAY, ...) and DuckDB's ts + INTERVAL 1 DAY * n
# agree exactly. Scale note: pure map-side projection over the fact
# scan, no shuffle, no extra pass; at 100 TB the real columns would be
# ingested, and every consumer treats lineitem_ext as an opaque
# relation, so swapping the view for the real table changes nothing.

_SHIPMODES = ("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")


def lineitem_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    mode = F.array(*[F.lit(m) for m in _SHIPMODES])[
        ((ok * 31 + ln) % 7).cast("int")
    ]
    return li.select(
        "*",
        mode.alias("l_shipmode"),
        F.expr(
            "timestampadd(DAY, CAST((l_orderkey*17 + l_linenumber*3) % 61"
            " - 30 AS INT), l_shipdate)"
        ).alias("l_commitdate"),
        F.expr(
            "timestampadd(DAY, CAST((l_orderkey*13 + l_linenumber*7) % 30"
            " + 1 AS INT), l_shipdate)"
        ).alias("l_receiptdate"),
    )


LINEITEM_EXT_CTE = """
lineitem_ext AS (
  SELECT *,
         (['AIR', 'FOB', 'MAIL', 'RAIL', 'REG AIR', 'SHIP', 'TRUCK'])
           [CAST((l_orderkey * 31 + l_linenumber) % 7 AS INTEGER) + 1]
           AS l_shipmode,
         l_shipdate + INTERVAL 1 DAY
           * CAST((l_orderkey * 17 + l_linenumber * 3) % 61 - 30 AS INTEGER)
           AS l_commitdate,
         l_shipdate + INTERVAL 1 DAY
           * CAST((l_orderkey * 13 + l_linenumber * 7) % 30 + 1 AS INTEGER)
           AS l_receiptdate
  FROM lineitem
)
"""


PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 7919 + ps_suppkey * 104729) % 99900 + 100
              AS DOUBLE) / 100.0 AS ps_supplycost,
         CAST((ps_partkey * 47 + ps_suppkey * 13) % 9999 + 1 AS BIGINT)
           AS ps_availqty
  FROM (
    SELECT DISTINCT ps_partkey, ps_suppkey FROM (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + p_partkey // s.cnt + i.i * (s.cnt // 4)) % s.cnt
               AS ps_suppkey
      FROM part
      CROSS JOIN (SELECT COUNT(*) AS cnt FROM supplier) s
      CROSS JOIN (VALUES (0), (1), (2), (3)) i(i)
      UNION ALL
      SELECT l_partkey, l_suppkey FROM lineitem
    )
  )
)
"""


def register_domain_views(spark: SparkSession, sf_dir: str) -> None:
    """Register generic tables + domain views as temp views for spark.sql."""
    for n in GENERIC_TABLES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
    posts(spark, sf_dir).createOrReplaceTempView("posts")
    follows(spark, sf_dir).createOrReplaceTempView("follows")
    social_connections(spark, sf_dir).createOrReplaceTempView("social_connections")
    partsupp(spark, sf_dir).createOrReplaceTempView("partsupp")
    lineitem_ext(spark, sf_dir).createOrReplaceTempView("lineitem_ext")


def oracle_with_domain(body_sql: str, *, recursive: bool = False) -> str:
    """Wrap an oracle query body with the domain-view CTEs (DuckDB).

    ``recursive=True`` emits WITH RECURSIVE so the body may append
    recursive CTEs (DuckDB allows non-recursive CTEs under it)."""
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return (
        f"{kw} {POSTS_CTE.strip()}, {FOLLOWS_CTE.strip()}, "
        f"{SOCIAL_CONNECTIONS_CTE.strip()} {body_sql}"
    )
