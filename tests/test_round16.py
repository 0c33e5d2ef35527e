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


# ---------------------------------------------------------------------------
# Round-16 optimization pins
# ---------------------------------------------------------------------------


class TestSearchByIndexCountedIntersection:
    """The token-AND path is now a COUNTED posting intersection (one
    IN-filtered pass + groupBy); these pin the two places where a
    counting rewrite could diverge from the old join-per-term chain."""

    def test_duplicate_query_terms_are_idempotent(self, spark):
        from union_indexer_node_spark.pipelines.search import (
            build_inverted_index,
            search_by_index,
        )

        docs = _docs(
            spark,
            [
                (1, "alpha beta gamma"),
                (2, "alpha alpha alpha"),
                (3, "beta only here"),
            ],
        )
        idx = build_inverted_index(docs, "text", ["doc_id"])

        def hits(terms):
            return {
                r["doc_id"]
                for r in search_by_index(
                    idx, docs, terms, ["doc_id"]
                ).collect()
            }

        # a repeated term must behave as the term once — the count
        # compares against the DISTINCT term count, and the index is
        # distinct per (token, key), so doc 2's three 'alpha's are one
        # posting
        assert hits(["alpha", "alpha"]) == hits(["alpha"]) == {1, 2}
        assert hits(["alpha", "beta", "alpha"]) == hits(
            ["alpha", "beta"]
        ) == {1}

    def test_and_requires_every_term(self, spark):
        from union_indexer_node_spark.pipelines.search import (
            build_inverted_index,
            search_by_index,
        )

        docs = _docs(
            spark,
            [(1, "alpha beta"), (2, "alpha"), (3, "beta"), (4, "")],
        )
        idx = build_inverted_index(docs, "text", ["doc_id"])
        got = {
            r["doc_id"]
            for r in search_by_index(
                idx, docs, ["alpha", "beta"], ["doc_id"]
            ).collect()
        }
        assert got == {1}


class TestClassifierSparseWeights:
    def test_all_miss_docs_score_exactly_bias(self, spark):
        """With a weight table covering only ONE bucket, a doc whose
        features all hash elsewhere must still score exactly ``bias``
        through the LEFT weight join + coalesce (the r16 rewrite
        removed the join-back that used to restore such docs)."""
        import hashlib

        from union_indexer_node_spark.pipelines.textstats import (
            quality_classifier_score,
        )

        def bucket(g, n=64):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n

        # one feature's bucket gets a weight; everything else misses
        hit_b = bucket("alpha")
        w = spark.createDataFrame([(hit_b, 7)], "bucket long, weight long")
        docs = _docs(
            spark,
            [
                (1, "alpha"),          # hits: score 7 + bias
                (2, "beta gamma"),     # features exist, all miss: bias
                (3, ""),               # zero features: bias
            ],
        )
        out = {
            r["doc_id"]: r
            for r in quality_classifier_score(
                docs, "text", "doc_id", w, n_buckets=64, bias=3
            ).collect()
        }
        assert len(out) == 3
        # doc 1 may collect extra hits only if another feature collides
        # into hit_b; 'alpha' alone has no bigrams, so exactly one hit
        assert out[1]["score"] == 10 and out[1]["keep"] is True
        assert out[2]["score"] == 3 and out[2]["keep"] is True
        assert out[3]["score"] == 3 and out[3]["keep"] is True


class TestCanonicalSignatureParity:
    def test_digest_keyed_equals_canon_then_sign(self, spark):
        """_canonical_signature must be row-for-row equal to
        minhash_signature(_digest_canonicals(df)) — the r16 rewrite
        moves the canonicalization INTO the signature aggregation so
        text bytes never enter an exchange; duplicates, short docs,
        empty and NULL texts must all land identically."""
        from union_indexer_node_spark.pipelines.dedup import (
            _canonical_signature,
            _digest_canonicals,
            minhash_signature,
        )

        docs = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon"),
                (7, "alpha beta gamma delta epsilon"),  # dup, higher id
                (3, "alpha beta gamma delta epsilon"),  # dup, mid id
                (4, "some other text entirely here now"),
                (5, "two words"),                        # < shingle_n
                (6, ""),                                 # empty
                (8, None),                               # NULL text
            ],
        )
        old = sorted(
            minhash_signature(
                _digest_canonicals(docs, "text", "doc_id"),
                "text",
                "doc_id",
                k=8,
                shingle_n=3,
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        new = sorted(
            _canonical_signature(
                docs, "text", "doc_id", k=8, shingle_n=3
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [tuple(r) for r in new] == [tuple(r) for r in old]
        # the dup cluster is represented once, by its min id
        assert [r["doc_id"] for r in new] == [1, 4]
