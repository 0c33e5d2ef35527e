"""Round-13 additions.

Covers (VERDICT r12 / ADVICE r12 work items):
- item 2: the oracle harness's int-vs-float dtype-parity gate — the
  exact masking that let r12's only two driver fails slip past 522
  green local tests (DuckDB HUGEINT -> pandas float64 corrupting
  >2^53 hash values while tolerance compare shrugged).
- ADVICE medium: follows_op_audit legacy empty-auth op must be labeled
  a drop (spoof), matching build_follows' fold exactly.
- ADVICE low: partial keyset cursor -> clean ValueError.
- ADVICE low: trending/related feeds reject a cursor instead of
  silently degrading to skip/limit.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_harness import compare


class TestDtypeParityGate:
    """The harness must flag int64-in-one-engine / float64-in-the-other
    BEFORE tolerance compare can mask a value corrupted by the float
    round-trip (2^53 mantissa limit)."""

    def test_int_vs_float_flags_violation(self):
        # 7.2e16-scale value: float64 cannot hold it exactly, which is
        # precisely the r12 dhash failure mode.
        big = 72057594037927951
        spark_pdf = pd.DataFrame({"id": [1], "h": pd.array([big], dtype="int64")})
        duck_pdf = pd.DataFrame({"id": [1], "h": [float(big)]})
        errs = compare(spark_pdf, duck_pdf, "probe")
        assert any("dtype parity violation" in e for e in errs), errs

    def test_float_vs_int_flags_violation_either_direction(self):
        spark_pdf = pd.DataFrame({"v": [9398.0]})
        duck_pdf = pd.DataFrame({"v": pd.array([9398], dtype="int64")})
        errs = compare(spark_pdf, duck_pdf, "probe")
        assert any("dtype parity violation" in e for e in errs), errs

    def test_matching_int_types_pass(self):
        big = 72057594037927951
        a = pd.DataFrame({"h": pd.array([big], dtype="int64")})
        b = pd.DataFrame({"h": pd.array([big], dtype="int64")})
        assert compare(a, b, "probe") == []

    def test_matching_float_types_still_tolerant(self):
        a = pd.DataFrame({"v": [1.0000000001]})
        b = pd.DataFrame({"v": [1.0]})
        assert compare(a, b, "probe") == []


class TestCursorValidation:
    def test_partial_cursor_clean_error(self):
        from union_indexer_node_spark.operators.api import compile_args

        with pytest.raises(ValueError, match="both created_at and permlink"):
            compile_args({"after": {"created_at": "2024-01-01T00:00:00"}})
        with pytest.raises(ValueError, match="both created_at and permlink"):
            compile_args({"after": {"permlink": "p1"}})

    def test_full_cursor_still_compiles(self):
        from union_indexer_node_spark.operators.api import compile_args

        spec = compile_args(
            {"after": {"created_at": "2024-01-01T00:00:00", "permlink": "p1"}}
        )
        assert spec.after is not None and spec.after[1] == "p1"

    def test_trending_feed_rejects_cursor(self, spark):
        import datetime

        from union_indexer_node_spark.operators.feeds import (
            FeedSpec,
            trending_feed,
        )

        posts = spark.createDataFrame(
            [("a", "p", "", "c", datetime.datetime(2024, 1, 1), 1.0, None)],
            "author string, permlink string, parent_author string, "
            "parent_permlink string, created_at timestamp, payout double, "
            "flags array<string>",
        )
        spec = FeedSpec(after=(datetime.datetime(2024, 1, 1), "p"))
        with pytest.raises(ValueError, match="recency-ordered feeds only"):
            trending_feed(posts, spec)
