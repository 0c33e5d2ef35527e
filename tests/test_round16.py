"""Round-16 regression pins (optimization round 2).

Covers the ADVICE r15 items:
- jaccard_pairs prune self-dedup (left is right) must match the
  per-side prune path exactly — the shared-shingle-frame fast path was
  previously guarded only by the end-to-end oracle suite;
- the prune self-dedup path must stay LAZY at DataFrame construction
  (the r15 eager localCheckpoint made building the frame trigger a
  Spark job; callers that only build/explain a plan paid full
  materialization of the shared shingle frame).

Plus pins for this round's optimizations (added per batch).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestJaccardPairsPruneSelfDedup:
    ROWS = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "totally different words in this one here"),
        (4, "alpha beta gamma delta epsilon zeta"),
        (5, "unrelated filler text padding tokens"),
    ]
    PAIRS = [(1, 2), (1, 4), (2, 4), (3, 5)]

    def test_shared_frame_path_equals_per_side_path(self, spark):
        """ADVICE r15: jaccard_pairs(d, d, ..., prune=True) takes the
        shared-shingle-frame fast path (left IS right); passing two
        DISTINCT but equal frames forces the per-side prune branch.
        Both must produce identical (a, b, jaccard) sets."""
        from union_indexer_node_spark.pipelines.dedup import jaccard_pairs

        d = _docs(spark, self.ROWS)
        d2 = _docs(spark, self.ROWS)  # equal content, distinct object
        pairs = spark.createDataFrame(self.PAIRS, "a long, b long")
        pairs = pairs.localCheckpoint()

        fast = {
            (r.a, r.b): r.jaccard
            for r in jaccard_pairs(
                d, d, pairs, "text", "doc_id", prune=True
            ).collect()
        }
        slow = {
            (r.a, r.b): r.jaccard
            for r in jaccard_pairs(
                d, d2, pairs, "text", "doc_id", prune=True
            ).collect()
        }
        assert fast == slow
        assert fast[(1, 4)] == 1.0  # identical texts
        assert fast[(3, 5)] == 0.0  # disjoint shingle sets

    def test_construction_defers_the_shingle_pass(self, spark):
        """ADVICE r15: building the prune self-dedup frame must not
        materialize the shared shingle frame (that happens at the first
        ACTION, once, shared by both join sides). Construction still
        runs the pair-id BroadcastExchange subtree — checkpointing
        forces toRdd, which executes broadcasts — i.e. at most the two
        bounded pair-sized jobs, never the corpus shingle pass (the
        eager form ran three: broadcast x2 + the checkpoint
        materialization)."""
        from union_indexer_node_spark.pipelines.dedup import jaccard_pairs

        d = _docs(spark, self.ROWS)
        pairs = spark.createDataFrame(self.PAIRS, "a long, b long")
        pairs = pairs.localCheckpoint()

        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        df = jaccard_pairs(d, d, pairs, "text", "doc_id", prune=True)
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after - before <= 2, (
            f"construction ran {after - before} jobs — the shingle "
            "checkpoint materialized eagerly again"
        )
        # and the lazily-checkpointed plan still computes correctly
        out = {(r.a, r.b): r.jaccard for r in df.collect()}
        assert out[(1, 4)] == 1.0
