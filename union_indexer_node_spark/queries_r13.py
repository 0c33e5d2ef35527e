"""Round-13 registry entries. Imported by ``queries.py`` AFTER
queries_r12 so registration order appends to the tail of the
insertion sequence (all r13-born entries start life in
``_DEPRIORITIZED`` anyway, per the rotation plan — they enter the
driver window with the r14 tranche).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import tables
from .queries import q


def _mmr_chain_sql(qid: int) -> str:
    """Unrolled 3-step greedy MMR CTE chain for query vector ``qid``
    (the sim_mmr_rerank oracle pattern, suffixed for composition into
    the batch arm's UNION)."""
    s = f"_{qid}"
    return f"""
    c{s} AS (
      SELECT e.vec_id, e.embedding,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])),
                   6) AS rel
      FROM embeddings e,
           (SELECT embedding FROM embeddings WHERE vec_id = {qid}) q
      ORDER BY rel DESC, e.vec_id LIMIT 12
    ),
    p1{s} AS (SELECT vec_id, embedding, rel AS mmr FROM c{s}
           ORDER BY rel DESC, vec_id LIMIT 1),
    m2{s} AS (
      SELECT c.vec_id, c.embedding,
             ROUND(CAST(0.7 AS DOUBLE) * c.rel
                   - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                     * ROUND(list_cosine_similarity(
                         CAST(c.embedding AS DOUBLE[]),
                         CAST(p1.embedding AS DOUBLE[])), 6),
                   6) AS mmr
      FROM c{s} c, p1{s} p1 WHERE c.vec_id <> p1.vec_id
    ),
    p2{s} AS (SELECT vec_id, embedding, mmr FROM m2{s}
           ORDER BY mmr DESC, vec_id LIMIT 1),
    m3{s} AS (
      SELECT c.vec_id,
             ROUND(CAST(0.7 AS DOUBLE) * c.rel
                   - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                     * GREATEST(
                         ROUND(list_cosine_similarity(
                             CAST(c.embedding AS DOUBLE[]),
                             CAST(p1.embedding AS DOUBLE[])), 6),
                         ROUND(list_cosine_similarity(
                             CAST(c.embedding AS DOUBLE[]),
                             CAST(p2.embedding AS DOUBLE[])), 6)),
                   6) AS mmr
      FROM c{s} c, p1{s} p1, p2{s} p2
      WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id)
    ),
    p3{s} AS (SELECT vec_id, mmr FROM m3{s} ORDER BY mmr DESC, vec_id
              LIMIT 1)"""


def _mmr_union_sql(qid: int) -> str:
    s = f"_{qid}"
    return f"""
    SELECT CAST({qid} AS BIGINT) AS query_id, vec_id,
           CAST(1 AS BIGINT) AS pick_idx, mmr FROM p1{s}
    UNION ALL
    SELECT CAST({qid} AS BIGINT), vec_id, CAST(2 AS BIGINT), mmr
    FROM p2{s}
    UNION ALL
    SELECT CAST({qid} AS BIGINT), vec_id, CAST(3 AS BIGINT), mmr
    FROM p3{s}"""


_MMR_BATCH_QIDS = (0, 1, 7)


# BATCH MMR (VERDICT r12 item 6): the composition-safe arm of
# sim_mmr_rerank — all query groups re-ranked in ONE plan (candidate
# window + one applyInPandas), zero driver round trips. The oracle is
# the serving oracle's unrolled greedy chain instantiated per query
# and UNIONed, so this entry ALSO pins batch == serving cross-engine
# (the serving entry stays in-window r13 with the single-query chain).
@q(
    "sim_mmr_rerank_batch",
    "WITH "
    + ",".join(_mmr_chain_sql(i) for i in _MMR_BATCH_QIDS)
    + " ".join(
        (" " if n == 0 else " UNION ALL ") + _mmr_union_sql(i)
        for n, i in enumerate(_MMR_BATCH_QIDS)
    ),
)
def sim_mmr_rerank_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.similarity import mmr_rerank_batch

    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.filter(
        F.col("vec_id").isin(*_MMR_BATCH_QIDS)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return mmr_rerank_batch(
        emb, queries, n_candidates=12, k=3, lam=0.7
    )


# KMV pairwise set-overlap (round 13): the sketch-family set-operation
# completion — cross-source CONTENT overlap estimated from per-source
# KMV sketches ALONE (Beyer et al.: the k smallest hashes of the merged
# sketch ARE the union's sketch; the fraction present in both inputs
# estimates Jaccard). The keyed set is word BIGRAMS, not unigrams: the
# synthetic corpus shares one tiny vocabulary across sources (31
# distinct tokens — unigram Jaccard is degenerately 1.0), while
# per-source bigram sets run ~700 >> k=128, so the SATURATED estimator
# and partial overlaps are what the oracle hash-checks, end to end in
# exact integers.
_KMV_OV_K = 128
_KMV_OV_NUMER = (_KMV_OV_K - 1) * (1 << 48)


@q(
    "sketch_kmv_source_overlap",
    f"""
    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    b AS (
      SELECT source, toks[i] || ' ' || toks[i+1] AS token
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1))
                       AS i) s
      WHERE len(toks) >= 2
    ),
    th AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS h
      FROM b
    ),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
        FROM th) WHERE r <= {_KMV_OV_K}
    ),
    gs AS (SELECT DISTINCT source FROM sk),
    pairs AS (
      SELECT a.source AS ga, b.source AS gb
      FROM gs a, gs b WHERE a.source < b.source
    ),
    cand AS (
      SELECT DISTINCT p.ga, p.gb, s.h
      FROM pairs p JOIN sk s ON s.source = p.ga OR s.source = p.gb
    ),
    uk AS (
      SELECT ga, gb, h, r FROM (
        SELECT ga, gb, h,
               ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS r
        FROM cand) WHERE r <= {_KMV_OV_K}
    ),
    per AS (
      SELECT uk.ga, uk.gb,
             SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                      THEN 1 ELSE 0 END) AS j_num,
             COUNT(*) AS k_used,
             MAX(CASE WHEN uk.r = {_KMV_OV_K} THEN uk.h END) AS kth
      FROM uk
      LEFT JOIN sk sa ON sa.source = uk.ga AND sa.h = uk.h
      LEFT JOIN sk sb ON sb.source = uk.gb AND sb.h = uk.h
      GROUP BY 1, 2
    )
    SELECT ga, gb, CAST(j_num AS BIGINT) AS j_num,
           CAST(k_used AS BIGINT) AS k_used,
           CAST(ue AS BIGINT) AS union_est,
           CAST((j_num * ue) // k_used AS BIGINT) AS intersect_est,
           CAST((1000 * j_num) // k_used AS BIGINT) AS jaccard_permille
    FROM (SELECT *, CASE WHEN k_used < {_KMV_OV_K} THEN k_used
                         ELSE {_KMV_OV_NUMER} // kth END AS ue
          FROM per)
    """,
)
def sketch_kmv_source_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.sketches import kmv_pairwise_overlap, kmv_sketch

    d = tables.load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    bg = F.expr(
        "transform(sequence(1, size(_toks) - 1), "
        "i -> concat(_toks[i-1], ' ', _toks[i]))"
    )
    bigrams = (
        d.select("source", toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select("source", F.explode(bg).alias("token"))
    )
    sk = kmv_sketch(bigrams, ["source"], "token", k=_KMV_OV_K)
    return kmv_pairwise_overlap(sk, "source", k=_KMV_OV_K)


# Incremental connected components (round 13): the dedup-cluster
# analog of the diff->index chains — fold a batch of NEW edges into a
# STORED labeling via the super-node contraction (each old component
# is already a star around its min member, so CC over the mapped batch
# edges alone reproduces the from-scratch solve over old ∪ new edges).
# The entry solves the old 2/3 of a sparse events-derived graph with
# connected_components, folds the remaining 1/3 with cc_incremental,
# and the oracle recomputes components over the FULL edge set with the
# reach recursive CTE — a fold bug (stale label, missed merge, lost
# batch-born node) hash-mismatches.
@q(
    "graph_cc_incremental",
    """
    WITH RECURSIVE ed AS (
      SELECT (user_id * 13) % 1999 AS a,
             (user_id * 7 + event_id) % 1999 AS b
      FROM events WHERE event_id % 37 = 0
    ),
    und AS (SELECT a AS s, b AS d FROM ed UNION SELECT b, a FROM ed),
    reach(s, d) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM und)
      UNION
      SELECT r.s, u.d FROM reach r JOIN und u ON u.s = r.d
    )
    SELECT CAST(s AS BIGINT) AS node,
           CAST(MIN(d) AS BIGINT) AS cluster_id
    FROM reach GROUP BY s
    """,
)
def graph_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.training import cc_incremental, connected_components

    # the old-graph solve and the batch fold both derive from this
    # scan — materialize once (guide §1.2 step 1; the before plan ran
    # the filtered events scan per consumer)
    e = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 37 == 0)
        .select(
            "event_id",
            ((F.col("user_id") * 13) % 1999).alias("a"),
            ((F.col("user_id") * 7 + F.col("event_id")) % 1999).alias("b"),
        )
        .localCheckpoint()
    )
    old = e.filter(F.col("event_id") % 3 != 0).select("a", "b")
    new = e.filter(F.col("event_id") % 3 == 0).select("a", "b")
    base = connected_components(old, "a", "b")
    return cc_incremental(base, new, "a", "b").select(
        F.col("node").cast("long").alias("node"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


# Dictionary phrase tagging (round 13): FlashText/Aho–Corasick
# semantics — every occurrence of every dictionary phrase
# (word-boundary exact, case-folded, overlapping counted) — as
# per-length gram enumeration + ONE broadcast equi-join, never a
# contains-BNLJ. The fixture dictionary mixes single words, two
# bigrams, a trigram (exercising three distinct gram passes) and a
# never-matching phrase (absence must agree cross-engine).
_KW_DICT = (
    ("engine", "spark"),
    ("engine", "vector"),
    ("join_algo", "hash join"),
    ("join_algo", "sort merge join"),
    ("scan_op", "table scan"),
    ("absent", "quantum flux"),
)
_KW_DICT_VALUES = ", ".join(f"('{t}', '{p}')" for t, p in _KW_DICT)
_ORACLE_TOKS = (
    "list_filter(string_split_regex(lower(coalesce({col}, '')),"
    " '[^a-z0-9]+'), x -> x <> '')"
)


@q(
    "curation_keyword_tag",
    f"""
    WITH dict(tag, phrase) AS (VALUES {_KW_DICT_VALUES}),
    dn AS (
      SELECT tag,
             array_to_string({_ORACLE_TOKS.format(col="phrase")}, ' ')
               AS pnorm,
             len({_ORACLE_TOKS.format(col="phrase")}) AS plen
      FROM dict
    ),
    t AS (
      SELECT doc_id, {_ORACLE_TOKS.format(col="text")} AS toks
      FROM documents
    ),
    m AS (
      -- match positions as a per-(doc, phrase) lambda filter: DuckDB's
      -- binder can't resolve a LATERAL (or an unnest projection)
      -- correlated to TWO from-items, but a list lambda binds both
      SELECT t.doc_id, d.tag,
             list_filter(generate_series(1, len(t.toks) - d.plen + 1),
               i -> array_to_string(t.toks[i : i + d.plen - 1], ' ')
                      = d.pnorm) AS ps
      FROM t, dn d
    )
    SELECT doc_id, tag, CAST(SUM(len(ps)) AS BIGINT) AS n_matches,
           CAST(MIN(ps[1]) AS BIGINT) AS first_pos
    FROM m WHERE len(ps) > 0
    GROUP BY doc_id, tag
    """,
)
def curation_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.curation import keyword_tag

    d = tables.load(spark, sf_dir, "documents")
    dictionary = spark.createDataFrame(
        list(_KW_DICT), "tag string, phrase string"
    )
    return keyword_tag(d, dictionary, "text", "doc_id")


# First-occurrence n-gram novelty (round 13): per-document fraction of
# distinct bigrams unseen in any smaller-id document — the continuous
# "how much of this page is new text" curation signal (contamination
# measures overlap vs a benchmark; this is overlap vs the corpus's own
# past). Integer permille so both engines agree bit-for-bit.
@q(
    "curation_ngram_novelty",
    f"""
    WITH t AS (
      SELECT doc_id, {_ORACLE_TOKS.format(col="text")} AS toks
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS gram
        FROM t WHERE len(toks) >= 2)
    ),
    f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((1000 * SUM(CASE WHEN f.first_doc = g.doc_id
                                 THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS novelty_permille
    FROM g JOIN f USING (gram)
    GROUP BY g.doc_id
    """,
)
def curation_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.curation import ngram_novelty

    d = tables.load(spark, sf_dir, "documents")
    return ngram_novelty(d, "text", "doc_id", n=2)


def _hilbert_oracle_sql(bits: int) -> str:
    """Level-chain CTE mirror of hilbert_key_frame: one CTE per curve
    level, each rewriting (x, y, d) from the previous — the same
    linear-projection shape the Spark side uses (a single nested
    expression would explode in either engine)."""
    n = 1 << bits
    mask = n - 1
    parts = [
        f"""h{bits} AS (
      SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
             CAST(l_partkey AS BIGINT) & {mask} AS x,
             CAST(l_suppkey AS BIGINT) & {mask} AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem)"""
    ]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        parts.append(
            f"""h{level} AS (
      SELECT l_orderkey, l_linenumber,
             d + CAST({s * s} AS BIGINT)
                 * xor(3 * CASE WHEN (x & {s}) != 0 THEN 1 ELSE 0 END,
                       CASE WHEN (y & {s}) != 0 THEN 1 ELSE 0 END) AS d,
             CASE WHEN (y & {s}) = 0
                  THEN CASE WHEN (x & {s}) != 0 THEN {n - 1} - y
                       ELSE y END
                  ELSE x END AS x,
             CASE WHEN (y & {s}) = 0
                  THEN CASE WHEN (x & {s}) != 0 THEN {n - 1} - x
                       ELSE x END
                  ELSE y END AS y
      FROM h{level + 1})"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hval"
        "\n    FROM h0"
    )


# Hilbert clustering key (round 13): the better-locality sibling of
# layout_zorder_key — consecutive Hilbert cells are always
# grid-adjacent, so a file covering a compact key range covers a
# compact 2-D region and footer min/max pruning stays tight for range
# predicates on BOTH columns. Same (l_partkey, l_suppkey, 16-bit)
# frame as the Morton entry so the two layouts are directly
# comparable. The level-chain construction (16 withColumns
# projections, never one nested expression) is itself the point: the
# naive Column form is ~3^16 Catalyst nodes.
@q("layout_hilbert_key", _hilbert_oracle_sql(16))
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.layout import hilbert_key_frame

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        "l_partkey",
        "l_suppkey",
    )
    return hilbert_key_frame(
        li, F.col("l_partkey"), F.col("l_suppkey"), bits=16, out="hval"
    ).drop("l_partkey", "l_suppkey")


# LSH recall evaluation (round 13): the dedup-family sibling of
# ann_recall_eval — MEASURED banding recall vs exact shingle Jaccard
# by similarity band, on a deterministic 1/3 document sample (the
# banding S-curve was previously only unit-tested against its closed
# form). Ground truth enumerates shared-shingle pairs via equi-join
# (a no-shared-shingle pair has Jaccard 0 — never an all-pairs cross
# join); both populations are digest-canonicalized identically. The
# oracle replays the whole protocol: the sample, the md5 minhash
# windows, the 4-band keys, the 200-cap bucket window and the exact
# integer Jaccard bands.
@q(
    "dedup_lsh_recall_eval",
    """
    WITH sdoc AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id FROM sdoc GROUP BY md5(text)
    ),
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM sdoc WHERE doc_id IN (SELECT doc_id FROM canon)
    ),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, len(toks) - 2),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      )) AS s
      FROM toks
    ),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    truth AS (
      SELECT i.a, i.b,
             (1000 * i.i) // (sa.n + sb.n - i.i) AS jp
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.a
      JOIN sz sb ON sb.doc_id = i.b
    ),
    hashed AS (
      SELECT doc_id, md5(s) || md5(s || '#') AS hx FROM sh
    ),
    sig AS (
      SELECT doc_id,
        min(substr(hx,  1, 8)) h0, min(substr(hx,  9, 8)) h1,
        min(substr(hx, 17, 8)) h2, min(substr(hx, 25, 8)) h3,
        min(substr(hx, 33, 8)) h4, min(substr(hx, 41, 8)) h5,
        min(substr(hx, 49, 8)) h6, min(substr(hx, 57, 8)) h7
      FROM hashed GROUP BY doc_id
    ),
    bands_all AS (
      SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    bands AS (
      SELECT doc_id, band_idx, band_key FROM (
        SELECT doc_id, band_idx, band_key,
               COUNT(*) OVER (PARTITION BY band_idx, band_key) AS m
        FROM bands_all
      ) WHERE m <= 200
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       AND x.doc_id < y.doc_id
    )
    SELECT CAST(band_lo AS BIGINT) AS band_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(caught) AS BIGINT) AS n_caught,
           CAST((1000 * SUM(caught)) // COUNT(*) AS BIGINT)
             AS recall_permille
    FROM (
      SELECT CASE WHEN t.jp >= 900 THEN 900
                  WHEN t.jp >= 700 THEN 700
                  WHEN t.jp >= 500 THEN 500
                  WHEN t.jp >= 300 THEN 300
                  ELSE 0 END AS band_lo,
             CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS caught
      FROM truth t
      LEFT JOIN cand c ON c.a = t.a AND c.b = t.b
    )
    GROUP BY band_lo
    """,
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.dedup import lsh_recall_eval

    d = tables.load(spark, sf_dir, "documents")
    return lsh_recall_eval(
        d, "text", "doc_id", k=8, bands=4, shingle_n=3, sample_mod=3
    )


# Rendezvous (HRW) sharding (round 13): the reshard-stable shard
# assignment — growing n shards to n+1 moves an expected 1/(n+1) of
# keys, every one TO the new shard (a modulus bucket remaps ~n/(n+1)
# of the corpus — the difference between an incremental top-up copy
# and rewriting the export at 100 TB). Pure map-side argmax over
# per-shard md5 scores; the oracle replays the argmax with a window.
@q(
    "training_rendezvous_shard",
    """
    SELECT doc_id, CAST(shard AS BIGINT) AS shard FROM (
      SELECT doc_id, s AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#'
                            || CAST(s AS VARCHAR)) DESC, s
             ) AS r
      FROM documents, (SELECT unnest(generate_series(0, 7)) AS s)
    ) WHERE r = 1
    """,
)
def training_rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.training import rendezvous_shard

    # distinct() makes the entry share the oracle's per-KEY framing
    # explicitly (the window replay collapses duplicate ids, while the
    # operator itself is per-row — a duplicated id would row-count-
    # mismatch without this even though every assignment agrees)
    keys = tables.load(spark, sf_dir, "documents").select("doc_id").distinct()
    return rendezvous_shard(keys, "doc_id", n_shards=8).select(
        "doc_id", "shard"
    )


# Time-grid gap filling with LOCF (round 13): the hypertable-family
# completion — every hour between a user's first and last event exists
# in the output, empty buckets carrying the last observed value
# (dashboards and window math need the empty buckets PRESENT; the
# rollup entry folds only observed ones). Integer-cents values; the
# oracle replays grid + LOCF with generate_series and IGNORE NULLS.
@q(
    "temporal_gap_fill",
    """
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS b,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE user_id % 25 = 0
    ),
    obs AS (
      SELECT user_id, b, CAST(SUM(c) AS BIGINT) AS v
      FROM e GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(b) AS mn, MAX(b) AS mx FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b
      FROM span
    ),
    d AS (
      SELECT g.user_id, g.b, o.v
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.b = g.b
    )
    SELECT user_id, strftime(b, '%Y-%m-%d %H:00') AS bucket,
           CAST(LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS value_cents,
           v IS NOT NULL AS observed
    FROM d
    """,
)
def temporal_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import gap_fill

    e = tables.load(spark, sf_dir, "events").filter(
        F.col("user_id") % 25 == 0
    )
    return gap_fill(e, "ts", "user_id", "value", granularity="hour")


# Triangle counting (round 13): per-node triangle participation — the
# local-clustering / community-density primitive beside
# graph_pagerank_quantized (centrality) and dedup_cc_clusters
# (reachability). The engine runs degree-ordered orientation
# (compact-forward): oriented out-degrees are O(sqrt(m)) under any
# skew, so hub wedges never explode. The oracle enumerates the same
# triangle set from the canonical a<b<c edge ordering — orientation
# changes the enumeration order, never the set. Graph: md5-derived
# Erdos-Renyi-ish edges over 1997 nodes from event ids, so both
# engines build the identical graph (the pagerank entry's pattern).
@q(
    "graph_triangle_count",
    """
    WITH ed AS (
      SELECT DISTINCT LEAST(sx, dx) AS u, GREATEST(sx, dx) AS v
      FROM (
        SELECT CAST(('0x' || substr(hx, 1, 6)) AS BIGINT) % 1997 AS sx,
               CAST(('0x' || substr(hx, 7, 6)) AS BIGINT) % 1997 AS dx
        FROM (SELECT md5(CAST(event_id AS VARCHAR)) AS hx FROM events)
      ) WHERE sx <> dx
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM ed e1
      JOIN ed e2 ON e2.u = e1.v
      JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.training import triangle_count

    e = tables.load(spark, sf_dir, "events")
    hx = F.md5(F.col("event_id").cast("string"))
    edges = e.select(
        (F.conv(F.substring(hx, 1, 6), 16, 10).cast("long") % 1997).alias(
            "sx"
        ),
        (F.conv(F.substring(hx, 7, 6), 16, 10).cast("long") % 1997).alias(
            "dx"
        ),
    ).filter(F.col("sx") != F.col("dx"))
    return triangle_count(edges, "sx", "dx")


# Explicit-register HyperLogLog (round 13): the fixed-size,
# MAX-mergeable member of the sketch family (KMV = k rows, merge by
# re-rank; CM = counter grid, merge by +; HLL = 256 registers, merge
# by element-wise MAX — the cheapest fold of the three, and duplicate
# keys are absorbed map-side because MAX is idempotent). Registers
# build from the same md5 48-bit hash as KMV, so the estimate is pure
# integer arithmetic and the oracle replays it bit-for-bit — the
# "engine HLL encodings can never be oracle-checked" objection applies
# to approx_count_distinct's private state, not to explicit registers.
# Keyspace: per-source trigram vocabulary (~20-40x the register count
# at sf0.01 — the raw-estimate regime, no small-range correction).
from .operators.sketches import _HLL_ALPHA_NUM as _HLL_AN  # noqa: E402

_HLL_SFX = 1 << 40


@q(
    "sketch_hll_distinct",
    f"""
    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT source,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS token
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2))
                       AS i) s
      WHERE len(toks) >= 3
    ),
    h AS (
      SELECT source,
             CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS hv
      FROM g
    ),
    r AS (
      SELECT source, hv >> 40 AS bucket,
             MAX(CASE WHEN hv % {_HLL_SFX} = 0 THEN 41
                 ELSE 40 - CAST(floor(log2(CAST(hv % {_HLL_SFX} AS DOUBLE)))
                                AS BIGINT) END) AS rho
      FROM h GROUP BY 1, 2
    ),
    per AS (
      SELECT source,
             SUM(CAST(1 AS BIGINT) << (41 - rho)) AS hsum,
             COUNT(*) AS nb
      FROM r GROUP BY 1
    )
    SELECT source,
           CAST({_HLL_AN} // (hsum + (256 - nb) * (CAST(1 AS BIGINT) << 41))
                AS BIGINT) AS est_distinct,
           CAST(256 - nb AS BIGINT) AS n_zero
    FROM per
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import hll_estimate, hll_registers

    d = tables.load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    tg = F.expr(
        "transform(sequence(2, size(_toks) - 1), "
        "i -> concat(_toks[i-2], ' ', _toks[i-1], ' ', _toks[i]))"
    )
    trigrams = (
        d.select("source", toks.alias("_toks"))
        .filter(F.size("_toks") >= 3)
        .select("source", F.explode(tg).alias("token"))
    )
    regs = hll_registers(trigrams, ["source"], "token")
    return hll_estimate(regs, ["source"])


# URL canonicalization + exact URL dedup (round 13): the CommonCrawl-
# frontier identity operator — scheme/host case folding, www. strip,
# default-port drop, trailing-slash strip, tracking-param removal
# (order-preserving), fragment drop. The fixture builds messy URLs
# from doc_id arithmetic (mixed-case scheme/host, www variants,
# matching default ports, trailing slashes, utm_/fbclid noise,
# fragments); the oracle is INDEPENDENT — it derives each URL's
# canonical form from the same arithmetic directly instead of
# replaying the regex pipeline, so a canonicalizer bug cannot cancel
# itself out of the comparison.
@q(
    "curation_url_dedup",
    """
    SELECT 'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE '' END
             || '://example.com/Page/' || CAST(doc_id % 101 AS VARCHAR)
             || '?q=spark' AS canonical_url,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY 1
    """,
)
def curation_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.curation import url_dedup

    d = tables.load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, "https").otherwise("HTTP")
    www = (
        F.when(did % 4 == 0, "WWW.").when(did % 4 == 1, "www.").otherwise("")
    )
    port = F.when(
        did % 5 == 0, F.when(did % 2 == 0, ":443").otherwise(":80")
    ).otherwise("")
    trail = F.when(did % 7 == 0, "/").otherwise("")
    frag = F.when(did % 6 == 0, "#ref").otherwise("")
    messy = F.concat(
        scheme,
        F.lit("://"),
        www,
        F.lit("Example.COM"),
        port,
        F.lit("/Page/"),
        (did % 101).cast("string"),
        trail,
        F.lit("?utm_source=feed&q=spark&fbclid="),
        did.cast("string"),
        frag,
    )
    return url_dedup(d.select("doc_id", messy.alias("url")), "url", "doc_id")


# Token-entropy quality signal (round 13): the distribution-shape
# member of the text-quality family (quality_features measures
# ratios, repetition_stats measures adjacency, entropy measures the
# whole histogram). Per-term rounding to integer 1e-4 units BEFORE
# the sum makes the float fold associative — Spark partial aggregates
# and DuckDB's single pass land on the identical integer, and the
# permille projection is integer division in both engines.
@q(
    "text_token_entropy",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t WHERE len(toks) >= 1)
      GROUP BY 1, 2
    ),
    per AS (
      -- CAST the SUMs here: DuckDB SUM(BIGINT) is HUGEINT, which
      -- pandas renders as float64 — the r12 dtype-parity lesson
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(c * log2(c) * 10000, 0) AS BIGINT))
                  AS BIGINT) AS tsum
      FROM c GROUP BY 1
    )
    SELECT doc_id, n AS n_tokens,
           CAST((1000 * (CAST(ROUND(n * log2(n) * 10000, 0) AS BIGINT)
                         - tsum)) // (n * 10000) AS BIGINT)
             AS entropy_permille
    FROM per
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.textstats import token_entropy

    d = tables.load(spark, sf_dir, "documents")
    return token_entropy(d, "text", "doc_id")


# Multiprobe LSH recall curve (round 13): measured recall@10 AND
# candidate volume per probe radius (0 = exact bucket, 1 = +8
# Hamming-1 rings, 2 = +28 Hamming-2) — the eval that prices each
# extra ring before a deployment pays for it. One corpus scan serves
# all radii: the query side explodes into its radius-2 probe
# neighborhood with each probe carrying its mask popcount (a pair
# reached via mask m sits at Hamming distance exactly popcount(m)),
# so per-radius membership is a filter over one equi-join's output.
# Eval-family sibling of ann_recall_eval / dedup_lsh_recall_eval.
from .oracle_common import _ANN_PLANES as _PLANES_R13  # noqa: E402
from .oracle_common import _bucket_sql as _bsql_r13  # noqa: E402
from .pipelines.ann_lsh import probe_masks as _probe_masks  # noqa: E402

_MP_MASKS_SQL = ", ".join(f"({m}, {pc})" for m, pc in _probe_masks(8, 2))


@q(
    "ann_multiprobe_recall",
    f"""
    WITH sig AS (
      SELECT vec_id, embedding, {_bsql_r13('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS q_vec, bucket AS qb
      FROM sig WHERE vec_id % 83 = 0
    ),
    mk AS (SELECT * FROM (VALUES {_MP_MASKS_SQL}) AS t(m, pc)),
    probes AS (SELECT q_id, q_vec, xor(qb, m) AS pb, pc FROM q, mk),
    pairs AS (
      SELECT p.q_id, s.vec_id,
             ROUND(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                                          CAST(p.q_vec AS DOUBLE[])), 6)
               AS sim,
             p.pc
      FROM sig s JOIN probes p ON s.bucket = p.pb
    ),
    exact_pairs AS (
      SELECT q.q_id, s.vec_id,
             ROUND(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                                          CAST(q.q_vec AS DOUBLE[])), 6)
               AS sim
      FROM sig s, q
    ),
    exact AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY sim DESC, vec_id) AS rank
        FROM exact_pairs
      ) WHERE rank <= 10
    ),
    radii AS (SELECT unnest([0, 1, 2]) AS radius),
    lsh AS (
      SELECT radius, q_id, vec_id FROM (
        SELECT r.radius, p.q_id, p.vec_id,
               ROW_NUMBER() OVER (PARTITION BY r.radius, p.q_id
                                  ORDER BY p.sim DESC, p.vec_id) AS rank
        FROM radii r JOIN pairs p ON p.pc <= r.radius
      ) WHERE rank <= 10
    ),
    cand AS (
      SELECT r.radius, COUNT(*) AS c
      FROM radii r JOIN pairs p ON p.pc <= r.radius GROUP BY 1
    ),
    hits AS (
      SELECT l.radius, COUNT(*) AS h
      FROM lsh l JOIN exact x
        ON x.q_id = l.q_id AND x.vec_id = l.vec_id
      GROUP BY 1
    ),
    nq AS (SELECT COUNT(*) AS n FROM q)
    SELECT r.radius AS radius, nq.n AS n_queries,
           COALESCE(c.c, 0) AS cand_pairs,
           CAST(1000 * COALESCE(h.h, 0) // (10 * nq.n) AS BIGINT)
             AS recall_permille
    FROM radii r
    CROSS JOIN nq
    LEFT JOIN cand c ON c.radius = r.radius
    LEFT JOIN hits h ON h.radius = r.radius
    """,
)
def ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.ann_lsh import multiprobe_recall

    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 83 == 0)
    return multiprobe_recall(
        emb, queries, _PLANES_R13, k=10, radii=(0, 1, 2)
    )


# Leakage-safe split (round 13): split assignment drawn from the
# duplicate-cluster representative instead of the row id — members of
# a dup cluster can never straddle train/test (the contamination an
# id-keyed draw commits for ~2% of dup pairs and decontamination then
# has to mop up). Fixture plants exact duplicates (every 4th doc
# re-ingested under a new id); identity is exact md5 of the text,
# rep = min member id (groupBy-min + equi-join — the skew-safe form),
# draw = hash_split's md5 permille buckets on the rep.
@q(
    "training_cluster_split",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 4 = 0
    ),
    cl AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_rep
      FROM all_docs
    )
    SELECT doc_id, cluster_rep,
           CASE WHEN b < 10 THEN 'test'
                WHEN b < 20 THEN 'val'
                ELSE 'train' END AS split
    FROM (
      SELECT doc_id, cluster_rep,
             CAST(('0x' || substring(md5(CAST(cluster_rep AS VARCHAR)),
                                     1, 8))::UBIGINT AS BIGINT) % 1000 AS b
      FROM cl
    )
    """,
)
def training_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.training import cluster_split

    base = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    all_docs = base.unionByName(dups)
    # window MIN over the digest, not aggregate-then-join: md5-text
    # clusters are tiny by construction (no skew hazard), so the
    # window form's one scan + one shuffle beats re-deriving the
    # keyed frame on both join sides (the exact_dedup shape)
    labeled = all_docs.select(
        "doc_id", F.md5(F.col("text")).alias("_h")
    ).withColumn(
        "cluster_rep",
        F.min("doc_id").over(Window.partitionBy("_h")),
    )
    return cluster_split(labeled, "cluster_rep").select(
        "doc_id", "cluster_rep", "split"
    )


# OHLC candlestick rollup (round 13): the hypertable downsample whose
# open/close need ORDER within the bucket, not just extrema. The
# engine rides min/max over a (ts, seq, cents) struct — lexicographic
# struct comparison turns "value at the earliest tick" into an
# ordinary commutative aggregate (one shuffle, full map-side partial
# agg, no window); the oracle derives open/close INDEPENDENTLY with
# ordered first()/last() aggregates, so the struct trick is checked
# against a different formulation. event_id breaks timestamp ties.
@q(
    "temporal_ohlc_rollup",
    """
    SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')
             AS bucket,
           FIRST(c ORDER BY ts, event_id) AS open_c,
           MAX(c) AS high_c,
           MIN(c) AS low_c,
           LAST(c ORDER BY ts, event_id) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE user_id % 10 = 3
    )
    GROUP BY 1, 2
    """,
)
def temporal_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import ohlc_rollup

    e = tables.load(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 3
    )
    return ohlc_rollup(
        e, "ts", "user_id", "value", "event_id", granularity="hour"
    )


# Directed containment probe (round 13): the asymmetric relation
# symmetric Jaccard misses — a 12-token excerpt of a 400-token page
# has Jaccard ~0.03 but containment 1.0. Scale shape is the directed
# probe (new ingests vs corpus), not all-pairs: probe shingles
# equi-join the hot-capped corpus postings and |sh(A) ∩ sh(B)| falls
# straight out of the join as a count — exact by construction, no
# verify pass. Fixture plants 12-token excerpts of every 5th doc
# under new ids; each must surface its source at 1000 permille.
@q(
    "dedup_containment_probe",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    probe AS (
      SELECT doc_id + 1000000 AS probe_id, toks[1:12] AS ptoks
      FROM base WHERE doc_id % 5 = 0 AND len(toks) >= 12
    ),
    shp AS (
      SELECT DISTINCT probe_id,
             ptoks[i] || ' ' || ptoks[i+1] || ' ' || ptoks[i+2] AS sh
      FROM probe, LATERAL (SELECT unnest(generate_series(1,
                             len(ptoks) - 2)) AS i) s
    ),
    sizes AS (
      SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_probe_shingles
      FROM shp GROUP BY 1
    ),
    shc AS (
      SELECT DISTINCT doc_id AS corpus_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
      FROM base, LATERAL (SELECT unnest(generate_series(1,
                            len(toks) - 2)) AS i) s
      WHERE len(toks) >= 3
    ),
    cold AS (
      SELECT corpus_id, sh FROM (
        SELECT corpus_id, sh,
               COUNT(*) OVER (PARTITION BY sh) AS df
        FROM shc
      ) WHERE df <= 200
    ),
    shared AS (
      SELECT p.probe_id, c.corpus_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM shp p JOIN cold c ON c.sh = p.sh
      WHERE p.probe_id <> c.corpus_id
      GROUP BY 1, 2
    )
    SELECT s.probe_id, s.corpus_id, s.n_shared, z.n_probe_shingles,
           CAST((1000 * s.n_shared) // z.n_probe_shingles AS BIGINT)
             AS containment_permille
    FROM shared s JOIN sizes z USING (probe_id)
    WHERE (1000 * s.n_shared) // z.n_probe_shingles >= 600
    """,
)
def dedup_containment_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.dedup import containment_probe, tokens

    base = tables.load(spark, sf_dir, "documents")
    t = base.select("doc_id", tokens(F.col("text")).alias("_toks"))
    probe = (
        t.filter((F.col("doc_id") % 5 == 0) & (F.size("_toks") >= 12))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.array_join(F.slice("_toks", 1, 12), " ").alias("text"),
        )
    )
    return containment_probe(
        probe,
        base,
        "text",
        "doc_id",
        shingle_n=3,
        min_containment_permille=600,
        hot_cap=200,
    )


# Weighted reservoir sample (round 13): Efraimidis–Spirakis A-ES
# bottom-k — per-group sample WITHOUT replacement whose inclusion
# probability tracks the weight column, deterministically (u from the
# shared md5 hash, rank by round(ln(u)/w, 12), id tie-break). The
# weighted sibling of sketch_sample_quantiles' uniform bottom-k and
# sample_weighted_bernoulli's with-replacement rates; mergeable like
# KMV (union + re-rank). Weights: n_chars (longer docs likelier).
@q(
    "sample_weighted_reservoir",
    """
    SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ROUND(ln((CAST(('0x' || substr(
                          md5(CAST(doc_id AS VARCHAR)), 1, 12))
                          AS BIGINT) + 1) / 281474976710656.0)
                          / CAST(n_chars AS DOUBLE), 12) DESC,
                        doc_id
             ) AS rk
      FROM documents WHERE n_chars > 0
    ) WHERE rk <= 16
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import weighted_bottomk

    d = tables.load(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    out = weighted_bottomk(
        d.select("source", "doc_id", "n_chars"),
        ["source"],
        "doc_id",
        "n_chars",
        k=16,
    )
    w = Window.partitionBy("source").orderBy(F.desc("_wk"), "doc_id")
    return out.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).cast("long").alias("rk"),
    )


# Referential-integrity audit (round 13): column_profile's relational
# sibling — per (child.fk -> parent.pk) relation: row count, NULL fks,
# and ORPHANS via a NULL-salted LEFT join against the DISTINCT parent
# keys with a hit indicator feeding one aggregate (the distinct
# pre-pass is what stops duplicated parent keys double-counting
# children; ADVICE r13 fixed the stale 'left_anti' wording here). The
# fixture plants orphans by shrinking the parent side (customers with
# c_custkey % 7 = 0 "lost"), alongside the intact lineitem -> orders
# relation as the healthy control.
@q(
    "quality_referential_audit",
    """
    WITH parent AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 7 <> 0
    ),
    r1 AS (
      SELECT 'orders.custkey->customer' AS relation,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_fk,
             CAST(SUM(CASE WHEN o_custkey IS NOT NULL
                            AND o_custkey NOT IN (SELECT c_custkey
                                                  FROM parent)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM orders
    ),
    op AS (SELECT DISTINCT o_orderkey FROM orders),
    r2 AS (
      SELECT 'lineitem.orderkey->orders' AS relation,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_fk,
             CAST(SUM(CASE WHEN l_orderkey IS NOT NULL
                            AND l_orderkey NOT IN (SELECT o_orderkey
                                                   FROM op)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM lineitem
    )
    SELECT * FROM r1 UNION ALL SELECT * FROM r2
    """,
)
def quality_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.curation import referential_audit

    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 != 0
    )
    li = tables.load(spark, sf_dir, "lineitem")
    return referential_audit(
        [
            ("orders.custkey->customer", orders, "o_custkey", cust,
             "c_custkey"),
            ("lineitem.orderkey->orders", li, "l_orderkey", orders,
             "o_orderkey"),
        ]
    )


# Exact set-similarity join via prefix filtering (round 13): AllPairs
# /PPJoin — every pair with shingle Jaccard >= 0.5, NO recall loss
# (the guarantee LSH banding trades for speed; dedup_lsh_recall_eval
# MEASURES that loss, this operator eliminates it). Candidates come
# from an equi-join of global-rarity-ordered PREFIX shingles only —
# complete by the pigeonhole bound, fanning out on rare (low-df)
# keys by construction. The oracle is INDEPENDENT: it computes
# all-pairs Jaccard with no prefix machinery, so an unsound prefix
# bound (a missed pair) can never cancel out of the comparison.
# Fixture: half the corpus plus planted 80%-truncations (J ~ 0.8).
@q(
    "dedup_prefix_filter_join",
    """
    WITH td AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id % 2 = 0
    ),
    all_docs AS (
      SELECT doc_id, toks FROM td
      UNION ALL
      SELECT doc_id + 2000000, toks[1:(4 * len(toks)) // 5] FROM td
      WHERE doc_id % 6 = 0 AND (4 * len(toks)) // 5 >= 3
    ),
    shset AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(toks) - 2),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS sh
      FROM all_docs WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh)
                    - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM shset a JOIN shset b ON a.doc_id < b.doc_id
    -- UNROUNDED threshold, matching the engine: the prefix bound is
    -- complete for true J >= t; a rounded filter would demand pairs
    -- at J in [t - 5e-7, t) the generator may legitimately miss
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh)
             - len(list_intersect(a.sh, b.sh))) >= 0.5
    """,
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.dedup import prefix_filter_join, tokens

    base = tables.load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    t = base.select("doc_id", tokens(F.col("text")).alias("_toks"))
    planted = (
        t.filter(
            (F.col("doc_id") % 6 == 0)
            & (F.expr("(4 * size(_toks)) div 5") >= 3)
        )
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.array_join(
                F.slice(
                    "_toks", 1, F.expr("(4 * size(_toks)) div 5")
                ),
                " ",
            ).alias("text"),
        )
    )
    corpus = base.select("doc_id", "text").unionByName(planted)
    return prefix_filter_join(
        corpus, "text", "doc_id", threshold_permille=500, shingle_n=3
    )


# Character-level fuzzy matching (round 13): the entity-resolution
# member of the dedup family — shingle similarity can't see one-char
# typos or clipped prefixes. Blocking key = word tokens 2..5 (chosen
# to survive the planted mutation: dropping the first CHARACTER
# mutates only token 1, appending ' zz' only adds a token); verify =
# thresholded Levenshtein (banded O(n*k), -1 beyond the bound) after
# the |len| - |len| <= k lower-bound prune. Fixture plants mutants of
# every 9th doc: first char dropped + ' zz' appended (distance <= 4).
@q(
    "dedup_fuzzy_edit_match",
    """
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    all_docs AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 3000000, substr(text, 2) || ' zz' FROM base
      WHERE doc_id % 9 = 0 AND length(text) > 40
    ),
    keyed AS (
      SELECT doc_id, text, length(text) AS len,
             array_to_string(list_filter(string_split_regex(lower(text),
               '[^a-z0-9]+'), x -> x <> '')[2:5], ' ') AS blk
      FROM all_docs
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
     AND abs(a.len - b.len) <= 4
    WHERE levenshtein(a.text, b.text) <= 4
    """,
)
def dedup_fuzzy_edit_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.dedup import fuzzy_edit_match, tokens

    base = tables.load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    mutants = base.filter(
        (F.col("doc_id") % 9 == 0) & (F.length("text") > 40)
    ).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.expr("substr(text, 2)"), F.lit(" zz")).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(mutants)
    blk = F.array_join(
        F.slice(tokens(F.col("text")), 2, 4), " "
    ).alias("blk")
    return fuzzy_edit_match(
        corpus.select("doc_id", "text", blk),
        "text",
        "doc_id",
        ["blk"],
        max_edits=4,
    )


# HLL sketch lattice (round 13): daily distinct (user, event_type)
# estimates derived by ROLLING UP hourly register state — never
# rescanning events — the property that makes sketch dashboards
# affordable (materialize registers at the finest grain once, serve
# every coarser grain by MAX-folding; associativity tested through
# the hour -> day -> global chain). The oracle builds daily registers
# directly: MAX over (day, bucket) of hourly maxima IS the direct
# daily maximum — the identity under check. Small-range regime on
# this fixture (~270 keys/day vs m=256): the raw estimate is biased
# high and n_zero says so — emitted, not hidden; the entry pins the
# lattice identity, not small-range accuracy (KMV serves that).
@q(
    "sketch_hll_rollup",
    f"""
    WITH h AS (
      -- NULL keys are "no observation" (hll_registers filters them
      -- up front; a NULL register row would deflate the empty-bucket
      -- term) — mirror the exclusion or the parity gate flips on the
      -- first NULL-bearing fixture
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                                      || event_type), 1, 12))
                  AS BIGINT) AS hv
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    r AS (
      SELECT day, hv >> 40 AS bucket,
             MAX(CASE WHEN hv % {_HLL_SFX} = 0 THEN 41
                 ELSE 40 - CAST(floor(log2(CAST(hv % {_HLL_SFX}
                                               AS DOUBLE)))
                                AS BIGINT) END) AS rho
      FROM h GROUP BY 1, 2
    ),
    per AS (
      SELECT day,
             SUM(CAST(1 AS BIGINT) << (41 - rho)) AS hsum,
             COUNT(*) AS nb
      FROM r GROUP BY 1
    )
    SELECT day,
           CAST({_HLL_AN} // (hsum + (256 - nb) * (CAST(1 AS BIGINT) << 41))
                AS BIGINT) AS est_distinct,
           CAST(256 - nb AS BIGINT) AS n_zero
    FROM per
    """,
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import (
        hll_estimate,
        hll_registers,
        hll_rollup,
    )

    e = tables.load(spark, sf_dir, "events")
    keyed = e.select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH"
        ).alias("hour"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")
        ).alias("key"),
    )
    hourly = hll_registers(keyed, ["day", "hour"], "key")
    daily = hll_rollup(hourly, ["day"])
    return hll_estimate(daily, ["day"])


# Per-source scorecard (round 13): the composition capstone — the
# one-page report an ingest gate reads per crawl slice, every column
# integer permille/count so it reproduces on any engine and any
# partitioning: doc count, exact-dup rate (planted: every 4th doc
# re-ingested under a new id), mean token entropy, short-doc rate,
# mean length. Composes token_entropy + the exact_dedup digest
# identity; report frame is |sources| rows.
@q(
    "pipeline_source_scorecard",
    """
    WITH all_docs AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, source FROM documents
      WHERE doc_id % 4 = 0
    ),
    t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM all_docs
    ),
    c AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t WHERE len(toks) >= 1)
      GROUP BY 1, 2
    ),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(c * log2(c) * 10000, 0) AS BIGINT))
                  AS BIGINT) AS tsum
      FROM c GROUP BY 1
    ),
    e AS (
      SELECT doc_id,
             CAST((1000 * (CAST(ROUND(n * log2(n) * 10000, 0) AS BIGINT)
                           - tsum)) // (n * 10000) AS BIGINT) AS ep
      FROM per
    ),
    es AS (
      SELECT d.source, CAST(SUM(e.ep) AS BIGINT) AS se,
             CAST(COUNT(*) AS BIGINT) AS ne
      FROM e JOIN all_docs d USING (doc_id) GROUP BY 1
    ),
    bs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END)
                  AS BIGINT) AS shorts,
             CAST(SUM(length(text)) AS BIGINT) AS chars
      FROM all_docs GROUP BY 1
    )
    SELECT bs.source, bs.n_docs,
           CAST((1000 * (bs.n_docs - bs.nd)) // bs.n_docs AS BIGINT)
             AS dup_permille,
           CAST(COALESCE(es.se // es.ne, 0) AS BIGINT)
             AS mean_entropy_permille,
           CAST((1000 * bs.shorts) // bs.n_docs AS BIGINT)
             AS short_permille,
           CAST(bs.chars // bs.n_docs AS BIGINT) AS mean_chars
    FROM bs LEFT JOIN es ON es.source = bs.source
    """,
)
def pipeline_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelines.curation import source_scorecard

    base = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    dups = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    return source_scorecard(
        base.unionByName(dups), "text", "doc_id", "source"
    )


# As-of join with staleness tolerance (round 13): the pandas
# merge_asof(tolerance=) semantics — a click from last month is not a
# campaign touch; matches older than left_ts - 1h null out. The
# engine carries the matched right timestamp through the same LOCF
# window (one shuffle, no extra join, default arm byte-unchanged);
# the oracle uses DuckDB's NATIVE ASOF JOIN with a CASE staleness
# gate — a different formulation agreeing on the answer.
@q(
    "temporal_asof_tolerance",
    """
    WITH p AS (
      SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'
    ), c0 AS (
      SELECT user_id, ts, value, event_id FROM events
      WHERE event_type = 'click'
    ), c AS (
      SELECT user_id, ts, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM c0
      ) WHERE rn = 1
    )
    SELECT p.user_id, p.ts, p.event_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR
                THEN ROUND(c.value, 2) END AS asof_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def temporal_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import asof_join
    from .operators.windows import lww_latest

    e = tables.load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    # the same LWW tie-break the sibling temporal_asof_join uses — one
    # implementation, so the two arms can never diverge on tied clicks
    clicks = lww_latest(
        e.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        [F.col("event_id")],
    ).select("user_id", "ts", "value")
    out = asof_join(
        purchases,
        clicks,
        ["user_id"],
        payload=["value"],
        tolerance_seconds=3600,
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("asof_value"), 2).alias("asof_value"),
    )
