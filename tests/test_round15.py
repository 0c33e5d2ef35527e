"""Round-15 regression pins.

Covers the ADVICE r14 items:
- containment_probe rejects hot_cap=None on an inline corpus build
  (the cap-less combination was only sanctioned for pre-capped
  external postings; silently skipping the stop-shingle drop changes
  results);
- prefix_filter_join(index=...) asserts the index was BUILT at the
  join's (threshold_permille, shingle_n) — a mismatched index is an
  incomplete candidate generator on an operator whose contract is
  exactness;
- fuzzy_blocking_recall buckets its brute truth by xxhash64(id), so
  string ids work (pmod on the raw id required a numeric column).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContainmentProbeHotCapGuard:
    def test_inline_corpus_with_hot_cap_none_raises(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            containment_probe,
        )

        docs = _docs(spark, [(1, "alpha bravo charlie delta")])
        with pytest.raises(ValueError, match="hot_cap=None"):
            containment_probe(
                docs, docs, "text", "doc_id", hot_cap=None
            )

    def test_precapped_postings_with_hot_cap_none_ok(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            containment_probe,
            drop_hot_shingles,
            shingle_postings,
        )

        corpus = _docs(
            spark,
            [
                (1, "alpha bravo charlie delta echo foxtrot golf"),
                (2, "totally different words appear in this one"),
            ],
        )
        probe = _docs(spark, [(10, "alpha bravo charlie delta echo")])
        post = drop_hot_shingles(
            shingle_postings(corpus, "text", "doc_id"), hot_cap=200
        ).withColumnRenamed("_id", "corpus_id")
        out = containment_probe(
            probe,
            corpus,
            "text",
            "doc_id",
            hot_cap=None,
            corpus_postings=post,
        ).collect()
        assert [(r["probe_id"], r["corpus_id"]) for r in out] == [(10, 1)]


class TestPrefixIndexParamContract:
    FIX = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel"),
        (2, "alpha bravo charlie delta echo foxtrot golf"),
        (3, "zulu yankee xray whiskey victor uniform tango"),
    ]

    def test_index_carries_build_params(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            PrefixFilterIndex,
            prefix_filter_index,
        )

        idx = prefix_filter_index(
            _docs(spark, self.FIX),
            "text",
            "doc_id",
            threshold_permille=700,
            shingle_n=2,
        )
        assert isinstance(idx, PrefixFilterIndex)
        assert (idx.threshold_permille, idx.shingle_n) == (700, 2)

    def test_threshold_mismatch_raises(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            prefix_filter_index,
            prefix_filter_join,
        )

        df = _docs(spark, self.FIX)
        idx = prefix_filter_index(df, "text", "doc_id",
                                  threshold_permille=800)
        with pytest.raises(ValueError, match="threshold_permille=800"):
            prefix_filter_join(
                df, "text", "doc_id", threshold_permille=500, index=idx
            )

    def test_shingle_mismatch_raises(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            prefix_filter_index,
            prefix_filter_join,
        )

        df = _docs(spark, self.FIX)
        idx = prefix_filter_index(df, "text", "doc_id", shingle_n=2)
        with pytest.raises(ValueError, match="shingle_n=2"):
            prefix_filter_join(df, "text", "doc_id", shingle_n=3,
                               index=idx)

    def test_bare_tuple_rejected(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            prefix_filter_index,
            prefix_filter_join,
        )

        df = _docs(spark, self.FIX)
        idx = prefix_filter_index(df, "text", "doc_id")
        with pytest.raises(TypeError, match="PrefixFilterIndex"):
            prefix_filter_join(
                df, "text", "doc_id", index=tuple(idx.frames)
            )

    def test_matched_params_still_exact(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            prefix_filter_index,
            prefix_filter_join,
        )

        df = _docs(spark, self.FIX)
        composed = sorted(
            map(
                tuple,
                prefix_filter_join(
                    df, "text", "doc_id", threshold_permille=600
                ).collect(),
            )
        )
        idx = prefix_filter_index(df, "text", "doc_id",
                                  threshold_permille=600)
        via_index = sorted(
            map(
                tuple,
                prefix_filter_join(
                    df,
                    "text",
                    "doc_id",
                    threshold_permille=600,
                    index=idx,
                ).collect(),
            )
        )
        assert via_index == composed and composed


class TestFuzzyBlockingStringIds:
    def test_string_ids_accepted_and_truth_exact(self, spark):
        from union_indexer_node_spark.pipelines.dedup import (
            fuzzy_blocking_recall,
        )

        rows = [
            ("doc-a", "the quick brown fox jumps over the lazy dog"),
            ("doc-b", "the quick brown fox jumps over the lazy dot"),
            ("doc-c", "an entirely unrelated sentence about spark"),
            ("doc-d", "he quick brown fox jumps over the lazy dog"),
        ]
        out = {
            r["strategy"]: r
            for r in fuzzy_blocking_recall(
                spark.createDataFrame(rows, "doc_id string, text string"),
                "text",
                "doc_id",
                max_edits=4,
                brute_buckets=3,
            ).collect()
        }
        assert set(out) == {
            "brute_truth",
            "token_window",
            "sorted_neighborhood",
        }
        bt = out["brute_truth"]
        # a-b (1 edit), a-d (1 edit), b-d (2 edits) are the truth set
        assert bt["n_true"] == 3
        assert bt["recall_permille"] == 1000
        assert bt["n_candidates"] == 6  # C(4,2) by the pairing proof

    def test_numeric_ids_truth_unchanged_by_hash_bucketing(self, spark):
        """The hash-derived bucket must not change WHAT the brute
        truth finds — only how the all-pairs work is spread."""
        from union_indexer_node_spark.pipelines.dedup import (
            fuzzy_blocking_recall,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dot"),
            (3, "an entirely unrelated sentence about spark"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        by_bkts = [
            {
                r["strategy"]: (r["n_true"], r["n_matched"])
                for r in fuzzy_blocking_recall(
                    df, "text", "doc_id", brute_buckets=k
                ).collect()
            }
            for k in (1, 2, 5)
        ]
        assert by_bkts[0] == by_bkts[1] == by_bkts[2]
        assert by_bkts[0]["brute_truth"][0] == 1
