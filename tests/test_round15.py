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

And the VERDICT r14 items landed in code this round:
- item 6: fuzzy_blocking_frontier — the width-2..8 ladder priced from
  one scan per strategy, pinned against a pure-Python reference and a
  monotonicity property (token-window nests decreasing, SNM cumulates
  increasing);
- item 5: triangle_count_incremental(stored_degrees=...) — the
  optional maintained (node, degree) state frame; bit-equality with
  the recomputed-degree path, threading across folds, replay no-op,
  and a hypothesis fuzz.
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


# ---------------------------------------------------------------------------
# fuzzy_blocking_frontier (VERDICT r14 item 6): the width-ladder eval
# ---------------------------------------------------------------------------

import itertools
import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_frontier(rows, max_edits, min_w, max_w):
    """Pure-Python per-width protocol replay (independent of the
    single-scan monotonicity trick the Spark side uses)."""

    def lev(a, b):
        if abs(len(a) - len(b)) > max_edits:
            return max_edits + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    ids = [r[0] for r in rows]
    text = dict(rows)
    truth = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if abs(len(text[a]) - len(text[b])) <= max_edits
        and lev(text[a], text[b]) <= max_edits
    }
    ref = {
        ("brute_truth", 0): (
            len(ids) * (len(ids) - 1) // 2,
            len(truth),
        )
    }
    for w in range(min_w, max_w + 1):
        # Spark slice(_toks, 2, w) == python toks[1:1+w]
        cands = {
            (a, b)
            for a, b in itertools.combinations(ids, 2)
            if toks(text[a])[1 : 1 + w] == toks(text[b])[1 : 1 + w]
        }
        ref[("token_window", w)] = (len(cands), len(cands & truth))
    ranked = sorted(ids, key=lambda i: (" ".join(toks(text[i])), i))
    rk = {i: r + 1 for r, i in enumerate(ranked)}
    for w in range(min_w, max_w + 1):
        cands = {
            (a, b)
            for a, b in itertools.combinations(ids, 2)
            if abs(rk[a] - rk[b]) <= w - 1
        }
        ref[("sorted_neighborhood", w)] = (len(cands), len(cands & truth))
    return len(truth), ref


_FRONTIER_WORDS = ["alpha", "bravo", "charlie", "delta", "a1", "x"]
_frontier_doc = st.lists(
    st.sampled_from(_FRONTIER_WORDS), max_size=8
).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_frontier_doc, min_size=2, max_size=10))
def test_fuzzy_blocking_frontier_matches_python_reference(spark, texts):
    """Property fuzz: every (strategy, width) cell of the frontier
    equals an independent per-width Python replay — the Spark side
    prices the whole ladder from ONE scan per strategy via the
    nesting/cumulation monotonicities, so a bug there would shear
    exactly one side of this comparison. Collision-prone vocabulary:
    duplicates, empty docs, shared block keys, rank ties all arise."""
    from union_indexer_node_spark.pipelines.dedup import (
        fuzzy_blocking_frontier,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    n_true, ref = _py_frontier(rows, max_edits=4, min_w=2, max_w=6)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in fuzzy_blocking_frontier(
        df, "text", "doc_id", max_edits=4, min_width=2, max_width=6,
        brute_buckets=3,
    ).collect():
        assert r["n_true"] == n_true
        got[(r["strategy"], r["width"])] = (
            r["n_candidates"],
            r["n_matched"],
        )
    assert got == ref


def test_fuzzy_blocking_frontier_monotonicities(spark):
    """The two arms move in OPPOSITE directions along the ladder —
    the property the frontier exists to expose: token-window
    candidates are non-increasing in width (stricter key), SNM
    candidates non-decreasing (more neighbors)."""
    from union_indexer_node_spark.pipelines.dedup import (
        fuzzy_blocking_frontier,
    )

    # deep tokens must DISCRIMINATE within shallow blocks for the
    # token arm to shed candidates as the window widens: i % 3 is
    # not implied by i % 2, so width-2 blocks (same i % 2) split at
    # width 3+ (echo{i % 3} enters the window)
    rows = [
        (i, f"alpha bravo charlie{i % 2} echo{i % 3} golf{i % 5} hotel")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cells = {
        (r["strategy"], r["width"]): r["n_candidates"]
        for r in fuzzy_blocking_frontier(
            df, "text", "doc_id", min_width=2, max_width=6
        ).collect()
    }
    tw = [cells[("token_window", w)] for w in range(2, 7)]
    snm = [cells[("sorted_neighborhood", w)] for w in range(2, 7)]
    assert tw == sorted(tw, reverse=True)
    assert snm == sorted(snm)
    assert tw[0] > tw[-1] and snm[0] < snm[-1]  # non-vacuous


# --- VERDICT r14 item 5: maintained degree state in the triangle fold


def _fp(df):
    cols = sorted(df.columns)
    row = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))
    return (
        df.select(row.alias("h"))
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))))
        .collect()[0][0]
    )


def _degrees_of(edges):
    """From-scratch (node, degree) over a canonical edge frame — the
    independent recompute the maintained frame must always equal."""
    return (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


class TestTriangleDegreeState:
    """triangle_count_incremental(stored_degrees=...) — the optional
    third state frame that removes the fold's one O(graph) term (the
    anchor-choice degree recompute). Contract: bit-equality with the
    recomputed-degree path, and the returned degree frame always
    equals the from-scratch aggregate over the returned edges."""

    @staticmethod
    def _store(spark, edge_list):
        from union_indexer_node_spark.pipelines.training import (
            canonical_edges,
            triangle_count,
        )

        raw = spark.createDataFrame(edge_list, "a long, b long")
        edges = canonical_edges(raw, "a", "b").localCheckpoint()
        return edges, triangle_count(edges, "a", "b")

    def test_degree_path_bit_equal_to_recompute(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            triangle_count_incremental,
        )

        # store: a wheel (hub 0 touching 1..6, ring closed) so the
        # anchor choice is exercised on skewed degrees; batch: edges
        # hitting all three fold cases (1-, 2-, 3-batch-edge
        # triangles) plus a brand-new node 99
        store_edges, store_counts = self._store(
            spark,
            [(0, i) for i in range(1, 7)]
            + [(i, i + 1) for i in range(1, 6)]
            + [(6, 1)],
        )
        batch = spark.createDataFrame(
            [(2, 4), (99, 1), (99, 2), (10, 11), (11, 12), (10, 12)],
            "a long, b long",
        )
        e_rec, c_rec = triangle_count_incremental(
            store_edges, store_counts, batch, "a", "b"
        )
        e_deg, c_deg, d_out = triangle_count_incremental(
            store_edges,
            store_counts,
            batch,
            "a",
            "b",
            stored_degrees=_degrees_of(store_edges),
        )
        assert _fp(c_deg) == _fp(c_rec)
        assert _fp(e_deg) == _fp(e_rec)
        assert _fp(d_out) == _fp(_degrees_of(e_deg))

    def test_degree_frame_threads_across_folds(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            canonical_edges,
            triangle_count,
        )
        from union_indexer_node_spark.pipelines.training import (
            triangle_count_incremental,
        )

        # deterministic multiplicative graph, folded in 3 batches with
        # the degree frame THREADED (never recomputed); end state must
        # match the from-scratch solve over the union
        all_edges = [
            ((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)
        ]
        batches = [all_edges[0:20], all_edges[20:40], all_edges[40:60]]
        edges, counts = self._store(spark, batches[0])
        degrees = _degrees_of(edges).localCheckpoint()
        for b in batches[1:]:
            bdf = spark.createDataFrame(b, "a long, b long")
            edges, counts, degrees = triangle_count_incremental(
                edges, counts, bdf, "a", "b", stored_degrees=degrees
            )
            edges = edges.localCheckpoint()
            counts = counts.localCheckpoint()
            degrees = degrees.localCheckpoint()
        union = spark.createDataFrame(all_edges, "a long, b long")
        scratch_edges = canonical_edges(union, "a", "b")
        assert _fp(counts) == _fp(
            triangle_count(scratch_edges, "a", "b")
        )
        assert _fp(edges) == _fp(scratch_edges)
        assert _fp(degrees) == _fp(_degrees_of(scratch_edges))

    def test_replay_is_noop_for_degrees_too(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            triangle_count_incremental,
        )

        store_edges, store_counts = self._store(
            spark, [(1, 2), (2, 3), (1, 3), (3, 4)]
        )
        degrees = _degrees_of(store_edges)
        # replay the whole store as a "new" batch: anti-join absorbs
        # every edge, so counts AND degrees are unchanged
        e2, c2, d2 = triangle_count_incremental(
            store_edges,
            store_counts,
            store_edges,
            "a",
            "b",
            stored_degrees=degrees,
        )
        assert _fp(c2) == _fp(store_counts)
        assert _fp(e2) == _fp(store_edges)
        assert _fp(d2) == _fp(degrees)

    def test_bad_degree_columns_raise(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            triangle_count_incremental,
        )

        store_edges, store_counts = self._store(spark, [(1, 2)])
        bad = spark.createDataFrame([(1, 1)], "node long, deg long")
        with pytest.raises(ValueError, match="stored_degrees"):
            triangle_count_incremental(
                store_edges,
                store_counts,
                spark.createDataFrame([(2, 3)], "a long, b long"),
                "a",
                "b",
                stored_degrees=bad,
            )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=14,
        ),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=11),
                st.integers(min_value=0, max_value=11),
            ),
            min_size=1,
            max_size=8,
        ),
    )
    def test_fuzz_degree_path_equals_recompute(
        self, spark, store_list, batch_list
    ):
        from union_indexer_node_spark.pipelines.training import (
            triangle_count_incremental,
        )

        store_list = [e for e in store_list if e[0] != e[1]]
        if not store_list:
            store_list = [(0, 1)]
        store_edges, store_counts = self._store(spark, store_list)
        batch = spark.createDataFrame(batch_list, "a long, b long")
        e_rec, c_rec = triangle_count_incremental(
            store_edges, store_counts, batch, "a", "b"
        )
        e_deg, c_deg, d_out = triangle_count_incremental(
            store_edges,
            store_counts,
            batch,
            "a",
            "b",
            stored_degrees=_degrees_of(store_edges),
        )
        assert _fp(c_deg) == _fp(c_rec)
        assert _fp(d_out) == _fp(_degrees_of(e_deg))


class TestTemperatureResampleAttractor:
    """The r15 sf0.5 stress-sweep catch: with UNIFORM domain counts
    the exact-math keep rate is 0.5 — a 1/2^20 grid point — and the
    old floor-quantization put the keep/drop cliff exactly where the
    engines' summation-order ulps land (Spark's tree-summed wsum
    floored to 0.5 - 2^-20 while DuckDB's sequential sum gave 0.5).
    Round-to-nearest centers attractors in their cells; this pins the
    uniform case to an exact 0.5 in the Spark arm."""

    def test_uniform_counts_rate_exactly_half(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            temperature_resample,
        )

        rows = [(d * 100 + i, f"dom{d}") for d in range(8) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_resample(
            df, "doc_id", "source", alpha=0.5, target_frac=0.5
        )
        rates = {r["rate"] for r in out.select("rate").distinct().collect()}
        assert rates == {0.5}


def test_stream_degree_threaded_triangle_soak_sf01(spark, tmp_path):
    """The production pattern for the r15 degree state: a foreachBatch
    stream folds (edge store, counts, degrees) across micro-batches —
    the degree frame is NEVER recomputed after the base solve — and
    the end state must byte-match the from-scratch triangle solve and
    the from-scratch degree aggregate over all edges."""
    from union_indexer_node_spark import tables
    from union_indexer_node_spark.pipelines.training import (
        canonical_edges,
        triangle_count,
        triangle_count_incremental,
    )

    edges = (
        tables.load(spark, "/root/testdata/sf0.1", "events")
        .filter(F.col("event_id") % 53 == 0)
        .select(
            "event_id",
            ((F.col("user_id") * 13) % 997).alias("a"),
            ((F.col("user_id") * 7 + F.col("event_id")) % 997).alias("b"),
        )
    )
    src = str(tmp_path / "tri_deg_stream")
    for m in (0, 1, 2):
        edges.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = {"edges": None, "counts": None, "degrees": None}

    def fold(batch_df, batch_id):
        batch = batch_df.select("a", "b").localCheckpoint()
        if state["edges"] is None:
            state["edges"] = canonical_edges(batch, "a", "b")
            state["counts"] = triangle_count(state["edges"], "a", "b")
            state["degrees"] = _degrees_of(state["edges"])
        else:
            (
                state["edges"],
                state["counts"],
                state["degrees"],
            ) = triangle_count_incremental(
                state["edges"],
                state["counts"],
                batch,
                "a",
                "b",
                stored_degrees=state["degrees"],
            )
        for k in state:
            state[k] = state[k].localCheckpoint()

    q = (
        spark.readStream.schema(edges.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)

    scratch_edges = canonical_edges(edges, "a", "b")
    assert _fp(state["counts"]) == _fp(
        triangle_count(scratch_edges, "a", "b")
    )
    assert _fp(state["edges"]) == _fp(scratch_edges)
    assert _fp(state["degrees"]) == _fp(_degrees_of(scratch_edges))


class TestTriangleAssumeCanonical:
    """r15 optimization pin: the assume_canonical fast path must be
    count-for-count equal to the default path on an input that IS
    canonical — the contract the composed incremental entry relies on
    when it skips the base solve's re-distinct of its checkpointed
    edge store."""

    def test_fast_path_equals_default_on_canonical_input(self, spark):
        from union_indexer_node_spark.pipelines.training import (
            canonical_edges,
            triangle_count,
        )

        raw = spark.range(0, 600).select(
            (F.col("id") % 17).alias("a"),
            ((F.col("id") / 17).cast("long") % 17).alias("b"),
        )
        canon = canonical_edges(raw, "a", "b").localCheckpoint()
        default = {
            (r["node"], r["tri_cnt"])
            for r in triangle_count(canon, "a", "b").collect()
        }
        fast = {
            (r["node"], r["tri_cnt"])
            for r in triangle_count(
                canon, "a", "b", assume_canonical=True
            ).collect()
        }
        assert default == fast and len(default) > 0
