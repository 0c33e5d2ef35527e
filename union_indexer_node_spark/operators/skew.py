"""Skew mitigation (SURVEY §7 hard part #5).

Hot keys are structural in this domain: a viral post's replies all
carry the same (parent_author, parent_permlink); a hot community is one
`parent_permlink` value. AQE's skew-join splitting covers the join
side; for aggregations over a hot key, two-phase salted aggregation
keeps any single reducer from owning the whole key.

Spark-first notes: aggregations with algebraic combiners (count/sum/
min/max) already do map-side partial aggregation, which absorbs most
skew — salting matters for (a) exact distinct-style aggregates where
partials can't collapse, and (b) joins against a hot build side when
AQE is unavailable (streaming micro-batches)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (keys, salt) so a hot
    key spreads over `buckets` reducers; phase 2 merges the partials.

    ``aggs`` maps output column -> (input column, fn) where fn is one
    of count/sum/min/max (algebraic, so partials merge exactly).

    The salt hashes the row's non-key aggregate inputs — deterministic
    per row content, so a task retry re-produces the same partials
    (monotonically_increasing_id would re-deal rows to different salt
    buckets on retry; harmless for algebraic merges but harder to
    reason about, and useless when partials are ever materialized).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt_inputs = sorted({col for col, _ in aggs.values() if col}) or keys
    salt = F.abs(F.hash(*[F.col(c) for c in salt_inputs], F.spark_partition_id())) % buckets
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        expr = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(col))
        phase1_aggs.append(expr.alias(f"_p_{out}"))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*phase1_aggs)
    )
    phase2_aggs = [
        getattr(F, merge_fn[fn])(F.col(f"_p_{out}")).alias(out)
        for out, (col, fn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_distinct_count(
    df: DataFrame, keys: list[str], distinct_col: str, *, buckets: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per hot key without one reducer holding
    the key's whole distinct set: salt by the DISTINCT VALUE (so equal
    values land in the same bucket and dedupe there), count distinct
    per bucket, sum the buckets."""
    salt = F.abs(F.hash(F.col(distinct_col))) % buckets
    per_bucket = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("_d"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_d").alias("distinct_count"))
