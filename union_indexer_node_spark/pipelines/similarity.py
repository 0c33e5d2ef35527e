"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, the dot product is a
JVM-side fold (F.aggregate over zip_with), top-k is
TakeOrderedAndProject. ~O(n·d) per query with no shuffle beyond the
final top-k reduction.

Scale path: IVF-style partitioned search — restrict the scan to the
query's coarse partition (here the `label` column stands in for a
centroid assignment; a production build would k-means the corpus and
store the centroid id as a partition column, giving partition pruning
on the parquet scan).

All math in float64 with explicit rounding so results are
cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], *, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 20,
) -> DataFrame:
    """Exact cosine top-k against a constant query vector. The query is
    a literal array (broadcast by constant folding); ordering ties
    break on id so the result set is deterministic."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine_sim(F.col(vec_col), qv), 6).alias("sim")
    return (
        emb.select(F.col(id_col), sim)
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame, query_vec: list[float], query_bucket, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_col: str = "label", k: int = 20,
) -> DataFrame:
    """IVF-style approximate top-k: scan only the query's coarse bucket.
    With the corpus written partitioned-by-bucket, the filter prunes
    partitions at the parquet scan — the 100 TB path reads ~1/nlist of
    the data."""
    return brute_force_topk(
        emb.filter(F.col(bucket_col) == query_bucket),
        query_vec,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
    )


def label_centroids(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Per-bucket centroids (element-wise mean): the IVF coarse-index
    builder / embedding-drift monitor. posexplode to (bucket, dim, val)
    rows so the mean is a plain partial-aggregated groupBy — the
    scalable form for wide corpora (no whole-vector accumulator on one
    reducer); the centroid reassembles via sort_array(collect_list).
    Also emits the bucket population."""
    exploded = emb.select(
        F.col(bucket_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    per_dim = exploded.groupBy(bucket_col, "dim").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("m")
    )
    counts = emb.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        per_dim.groupBy(bucket_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
        .join(counts, bucket_col)
        .select(bucket_col, "n_vectors", "centroid")
    )


def with_norm(emb: DataFrame, *, vec_col: str = "embedding", norm_col: str = "norm") -> DataFrame:
    """Stage the L2 norm as a column. Pair-joins that divide by norms
    must hoist this per-vector: computing _norm inside the pair
    expression evaluates it once per PAIR (O(n²·d)) instead of once per
    vector (O(n·d)) — measured 2.5× on label-bucketed near-dup."""
    return emb.withColumn(norm_col, _norm(F.col(vec_col)))


def pairwise_cosine(
    emb: DataFrame, pairs: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine for explicit (a, b) id pairs (embedding-based near-dup
    verification stage). Norms are per-vector staged; the per-pair work
    is one dot product + one divide (same expression values as
    dot/(|a||b|), so oracle results are bit-identical)."""
    e = with_norm(emb, vec_col=vec_col)
    ea = e.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("norm").alias("na")
    )
    eb = e.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("norm").alias("nb")
    )
    out = pairs.join(ea, "a").join(eb, "b")
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return out.select("a", "b", F.round(cos, 6).alias("cosine"))


def quantize_int8(
    emb: DataFrame, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization (the standard ANN-index
    compression step: 4x smaller vectors, dot products in integer
    SIMD). scale = max|x| per vector; q_i = round(127 * x_i / scale).
    Fully map-side — no shuffle, no UDF. Arithmetic is forced to double
    on both engines so the rounding boundary is engine-independent.
    Zero vectors quantize to all-zero with scale 0."""
    # scale must be hoisted into its own projection: referencing the
    # array_max aggregate inside the quantize lambda re-folds the whole
    # vector once per element — O(d^2) per vector (same hazard
    # shingles_from_tokens documents for the tokenizer).
    v = F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    scaled = emb.select(
        F.col(id_col), F.col(vec_col), F.array_max(v).alias("_scale")
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            F.col("_scale") > 0,
            F.round(F.lit(127.0) * x.cast("double") / F.col("_scale"), 0),
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return scaled.select(
        F.col(id_col),
        F.round(F.col("_scale"), 6).alias("scale"),
        q.alias("q_vec"),
    )


def truncate_renorm(
    emb: DataFrame,
    *,
    dims: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-style truncation: keep the first ``dims`` components
    and L2-renormalize — the standard cheap-retrieval trick for
    MRL-trained embeddings (coarse search on the prefix, rerank on the
    full vector). Fully map-side, no shuffle, no UDF. Zero prefixes
    stay zero (norm 0 guard). Components round to 6 decimals so both
    engines agree on the emitted floats."""
    # norm hoisted into its own projection — referencing the fold
    # inside the renorm lambda would recompute it per element, O(d^2)
    # per vector (matters at real 1k-4k dims).
    prefix = F.slice(F.col(vec_col), 1, dims)
    normed = emb.select(
        F.col(id_col),
        prefix.alias("_pre"),
        F.sqrt(
            F.aggregate(
                prefix,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("_norm"),
    )
    renormed = F.transform(
        F.col("_pre"),
        lambda x: F.when(
            F.col("_norm") > 0, F.round(x.cast("double") / F.col("_norm"), 6)
        ).otherwise(F.lit(0.0)),
    )
    return normed.select(
        F.col(id_col),
        F.round(F.col("_norm"), 6).alias("prefix_norm"),
        renormed.alias("vec_trunc"),
    )
