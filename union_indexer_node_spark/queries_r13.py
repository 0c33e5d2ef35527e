"""Round-13 registry entries. Imported by ``queries.py`` AFTER
queries_r12 so registration order appends to the tail of the
insertion sequence (all r13-born entries start life in
``_DEPRIORITIZED`` anyway, per the rotation plan — they enter the
driver window with the r14 tranche).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
