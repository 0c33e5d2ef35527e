"""Round-4 regression tests: the <2-token repetition_stats crash
(ADVICE r3 high), LSH hot-bucket capping, byte-budget multimodal
partitioning, and range-join long-interval bounding.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# ADVICE r3 (high): repetition_stats crashed with
# INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any doc with <2 tokens, because
# F.sequence(1, 0) defaults step to -1 and emits [1, 0]. The DuckDB
# oracle's generate_series(1, 0) is empty, so the engines silently
# diverged. Short docs must produce ratios of 0 in BOTH engines.
# ---------------------------------------------------------------------------
SHORT_DOCS = [
    (1, ""),                    # 0 tokens
    (2, "one"),                 # 1 token
    (3, "...!!!"),              # 0 tokens after tokenizer strips punct
    (4, "two tokens"),          # minimal bigram case
    (5, "spam spam spam spam"), # degenerate repetition
]


def test_repetition_stats_short_docs_no_crash(spark):
    from union_indexer_node_spark.pipelines.curation import repetition_stats

    d = spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_stats(d, "text", "doc_id").collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    for short_id in (1, 2, 3):
        assert rows[short_id].dup_token_ratio == 0.0
        assert rows[short_id].top_bigram_ratio == 0.0
    assert rows[4].n_tokens == 2
    assert rows[4].top_bigram_ratio == 1.0  # single bigram claims 100%
    assert rows[5].dup_token_ratio == 0.75  # 4 tokens, 1 distinct
    assert rows[5].top_bigram_ratio == 1.0  # "spam spam" x3


def test_repetition_stats_short_docs_match_duckdb(spark):
    """The oracle twin of text_repetition_stats over a corpus that
    includes <2-token docs (the shipped documents table has none, which
    is how the crash survived round 3)."""
    from union_indexer_node_spark.pipelines.curation import repetition_stats

    d = spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.n_tokens, r.dup_token_ratio, r.top_bigram_ratio)
        for r in repetition_stats(d, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in SHORT_DOCS)
        + ") AS t(doc_id, text)"
    )
    from union_indexer_node_spark import queries as q

    oracle = q.registry()["text_repetition_stats"].oracle
    want = {tuple(r) for r in con.execute(oracle).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# VERDICT r3 "what's wrong" #1: LSH hot buckets. m docs in one band
# bucket emit m(m-1)/2 pairs — AQE redistributes the work but not the
# output. Guards: identical texts band one canonical; residual over-cap
# buckets are dropped.
# ---------------------------------------------------------------------------
def test_lsh_identical_docs_collapse_to_one_canonical(spark):
    """1,000 byte-identical docs must contribute ZERO candidate pairs
    (one digest-canonical is banded); the near-dup pair among the two
    genuinely distinct texts must survive."""
    from union_indexer_node_spark.pipelines.dedup import lsh_candidate_pairs

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
              for i in range(1000)]
    near = [
        (2000, "a genuinely different document about spark catalyst plans here"),
        (2001, "a genuinely different document about spark catalyst plans there"),
    ]
    d = spark.createDataFrame(boiler + near, "doc_id long, text string")
    pairs = {(p.a, p.b) for p in lsh_candidate_pairs(d, "text", "doc_id").collect()}
    assert not {(a, b) for a, b in pairs if a < 1000 and b < 1000}, (
        "identical-text docs emitted pairs; digest-canonical collapse failed"
    )
    assert (2000, 2001) in pairs, "true near-dup pair lost"


def test_lsh_bucket_cap_bounds_boilerplate_blowup(spark):
    """120 DISTINCT texts with identical token arrays (punctuation-only
    variants — the tokenizer strips punctuation) collide in every band.
    With bucket_cap=50 the hot bucket is dropped (0 pairs); uncapped it
    explodes to 120·119/2 pairs. This is the quadratic the cap exists
    to bound."""
    from union_indexer_node_spark.pipelines.dedup import lsh_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base + "!" * (i + 1)) for i in range(120)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    capped = lsh_candidate_pairs(d, "text", "doc_id", bucket_cap=50).count()
    assert capped == 0
    uncapped = lsh_candidate_pairs(d, "text", "doc_id", bucket_cap=None).count()
    assert uncapped == 120 * 119 // 2


def test_lsh_bucket_stats_reports_dropped_mass(spark):
    """The audit companion: bucket sizes over the boilerplate corpus
    must show the 4 hot buckets (one per band) of 120 members each, so
    a pipeline can compute and log the recall mass a cap drops."""
    from union_indexer_node_spark.pipelines.dedup import lsh_bucket_stats

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base + "!" * (i + 1)) for i in range(120)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    stats = lsh_bucket_stats(d, "text", "doc_id").collect()
    assert sorted(r.n_members for r in stats) == [120, 120, 120, 120]


# ---------------------------------------------------------------------------
# VERDICT r3 "what's wrong" #2: probe_media accepted target_partition_bytes
# but never used it. The byte budget must drive the partition count so
# no single Arrow batch/Python worker materializes unbounded media bytes.
# ---------------------------------------------------------------------------
def _media_frame(spark, n_rows, blob_bytes):
    rows = [(i, bytes([i % 251]) * blob_bytes, "video/mp4") for i in range(n_rows)]
    return spark.createDataFrame(rows, "id long, content binary, mime string")


def test_probe_media_partitions_scale_with_byte_budget(spark):
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = _media_frame(spark, 64, 20_000)  # ~1.25 MB of blobs
    tight = probe_media(media, target_partition_bytes=64_000)
    loose = probe_media(media, target_partition_bytes=1 << 30)
    n_tight = tight.rdd.getNumPartitions()
    n_loose = loose.rdd.getNumPartitions()
    assert n_loose == 1
    assert n_tight >= 8, f"expected >=8 byte-budget partitions, got {n_tight}"
    # and the results themselves are identical either way
    assert sorted(map(tuple, tight.collect())) == sorted(map(tuple, loose.collect()))


def test_probe_media_none_budget_keeps_input_partitioning(spark):
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = _media_frame(spark, 16, 100).repartition(5)
    out = probe_media(media, target_partition_bytes=None)
    assert out.rdd.getNumPartitions() == 5


def test_probe_media_uses_file_stats_without_content_scan(spark, tmp_path):
    """File-backed media sizes partitions from the planner's sizeInBytes
    statistic (parquet footers), not a scan. Incompressible blobs so
    file bytes track payload bytes."""
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    import random

    rows = [
        (i, random.Random(i).randbytes(20_000), "image/jpeg") for i in range(64)
    ]
    spark.createDataFrame(rows, "id long, content binary, mime string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "media"))
    media = spark.read.parquet(str(tmp_path / "media"))
    n_tight = probe_media(media, target_partition_bytes=64_000).rdd.getNumPartitions()
    n_loose = probe_media(media, target_partition_bytes=1 << 30).rdd.getNumPartitions()
    assert n_loose == 1
    assert n_tight >= 8, f"expected >=8 byte-budget partitions, got {n_tight}"


def test_real_decoder_header_probe_path(spark):
    """The real (default) arm needs NO codec lib for PNG: the header
    probe reads width/height straight from the IHDR chunk. Bytes are
    hand-built so this runs in every container (since round 7 the
    Pillow arm is only the fallback for other formats)."""
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    def png_bytes(w, h):
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])  # bit depth / color / std flags
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + len(ihdr).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # crc (unchecked by the probe)
        )

    media = spark.createDataFrame(
        [(1, png_bytes(32, 48), "image/png"), (2, png_bytes(100, 10), "image/png")],
        "id long, content binary, mime string",
    )
    out = {
        r.id: (r.width, r.height) for r in probe_media(media).collect()
    }
    assert out == {1: (32, 48), 2: (100, 10)}


def test_real_decoder_raises_without_codec(spark):
    """Codec-less container: an image format BEYOND the pure header
    probe (webp here) must fail loudly (NotImplementedError from the
    worker), never silently fake. Corrupt blobs of the pure-header
    formats are data, not config — covered elsewhere."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; stub arm not reachable")
    except ImportError:
        pass
    from py4j.protocol import Py4JJavaError
    from union_indexer_node_spark.pipelines.multimodal import probe_media

    media = spark.createDataFrame(
        [(1, b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")],
        "id long, content binary, mime string",
    )
    with pytest.raises(Exception) as exc_info:
        probe_media(media, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )
