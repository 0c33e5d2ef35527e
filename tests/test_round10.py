"""Round-10 additions:

- byte-preserving passage removal (kept text slices ORIGINAL bytes)
- stale-counts LEFT-join semantics (ADVICE r9 medium: a passage absent
  from a prebuilt frequency index is frequency-0 → KEPT, not dropped)
- alignment-robust duplicate-span removal (sliding windows + covered-
  token coalescing) including the fixed-window-miss demonstration
- streaming passage-count fold releases superseded checkpoints
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# remove_repeated_passages: byte preservation
# ---------------------------------------------------------------------------


def test_remove_repeated_passages_preserves_original_bytes(spark):
    """Kept text slices the ORIGINAL string: casing, punctuation and
    whitespace survive; a removed segment takes its trailing separator
    and leaves the leading one."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_repeated_passages,
    )

    # "aa bb" (normalized) appears 3x > 2 → removed everywhere; the
    # second segment's bytes must come back verbatim.
    docs = _mk_docs(
        spark,
        [
            (1, "s", "Aa, bb!  Cc... dd?"),
            (2, "s", "aa bb cc dd"),
            (3, "s", "AA BB"),
            (4, "s", "aa\tbb -- Keep Me."),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_passages(
            docs, "text", "doc_id", words_per_passage=2, max_occurrences=2
        ).collect()
    }
    assert out[1]["cleaned_text"] == "Cc... dd?"
    assert out[2]["cleaned_text"] == "cc dd"
    assert out[3]["cleaned_text"] == ""  # fully boilerplate → lead only
    assert out[4]["cleaned_text"] == "Keep Me."
    assert (out[4]["n_segments"], out[4]["n_removed"]) == (2, 1)


def test_remove_repeated_passages_identity_is_byte_exact(spark):
    """Below threshold the op must round-trip EVERY byte — mixed
    casing, punctuation runs, leading/trailing separators, tabs."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_repeated_passages,
    )

    texts = [
        "Hello, World! x2",
        "  leading and trailing  ",
        "no-punct words only here",
        "a",
        "...only! punct?!...",
        "",
        "Tabs\tand\nnewlines mixed;  double  spaces.",
    ]
    docs = _mk_docs(spark, [(i, "s", t) for i, t in enumerate(texts)])
    out = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_repeated_passages(
            docs, "text", "doc_id", words_per_passage=3,
            max_occurrences=10**9,
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == t, (i, repr(out[i]), repr(t))


def test_remove_repeated_passages_stale_index_keeps_novel_docs(spark):
    """ADVICE r9 (medium): scrubbing a batch against a lifetime index
    that has NOT yet folded that batch must keep novel documents
    intact (frequency-0), not silently blank them — the LEFT-join +
    coalesce contract."""
    from union_indexer_node_spark.pipelines.dedup import (
        passage_counts,
        remove_repeated_passages,
    )

    older = _mk_docs(
        spark, [(100, "s", "old boiler plate"), (101, "s", "old boiler plate")]
    )
    stale = passage_counts(older, "text", words_per_passage=2)
    batch = _mk_docs(spark, [(1, "s", "Entirely novel writing here.")])
    out = remove_repeated_passages(
        batch, "text", "doc_id",
        words_per_passage=2, max_occurrences=1, counts=stale,
    ).collect()
    assert out[0]["cleaned_text"] == "Entirely novel writing here."
    assert out[0]["n_removed"] == 0


# ---------------------------------------------------------------------------
# remove_duplicate_spans: alignment robustness + byte preservation
# ---------------------------------------------------------------------------

_DISC = "all rights reserved by acme corp"


def _shifted_corpus(spark):
    return _mk_docs(
        spark,
        [
            (1, "s", f"Alpha beta! {_DISC} unique one."),
            (2, "s", f"{_DISC} gamma, delta two."),
            (3, "s", f"pad filler words three {_DISC} tail."),
            (4, "s", "Totally unrelated content without any duplicates here."),
            (5, "s", ""),
        ],
    )


def test_remove_duplicate_spans_catches_shifted_boilerplate(spark):
    """The disclaimer starts at token offsets 2, 0 and 4 — different
    alignments. Sliding windows remove all 6 disclaimer tokens from
    every carrier; original bytes of the remainder survive."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_duplicate_spans,
    )

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _shifted_corpus(spark), "text", "doc_id",
            window_tokens=6, stride=1, max_occurrences=2,
        ).collect()
    }
    assert len(out) == 5  # no silent row loss
    assert out[1]["cleaned_text"] == "Alpha beta! unique one."
    assert out[1]["n_removed_tokens"] == 6
    assert out[2]["cleaned_text"] == "gamma, delta two."
    assert out[3]["cleaned_text"] == "pad filler words three tail."
    # untouched doc: byte-identical via the anti-join fast path
    assert (
        out[4]["cleaned_text"]
        == "Totally unrelated content without any duplicates here."
    )
    assert out[4]["n_removed_tokens"] == 0
    assert (out[5]["cleaned_text"], out[5]["n_tokens"]) == ("", 0)


def test_fixed_windows_provably_miss_what_sliding_removes(spark):
    """The capability gap VERDICT r9 names: on the SAME corpus the
    fixed-segmentation remover removes nothing (shifted copies never
    align to equal segments) while the sliding-span remover scrubs
    the disclaimer from all three carriers."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_duplicate_spans,
        remove_repeated_passages,
    )

    corpus = _shifted_corpus(spark)
    fixed = remove_repeated_passages(
        corpus, "text", "doc_id", words_per_passage=6, max_occurrences=2
    )
    assert (
        fixed.agg(F.sum("n_removed")).collect()[0][0] == 0
    ), "fixed windows unexpectedly aligned — weaken the shift fixture"
    sliding = remove_duplicate_spans(
        corpus, "text", "doc_id",
        window_tokens=6, stride=1, max_occurrences=2,
    )
    assert sliding.agg(F.sum("n_removed_tokens")).collect()[0][0] == 18


def test_remove_duplicate_spans_merges_overlapping_windows(spark):
    """A long shared run is covered by MANY overlapping flagged
    windows; removal by covered-token set coalesces them into one span
    (no double-removal, no fragmentation)."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_duplicate_spans,
    )

    run = "one two three four five six seven eight"  # 8 tokens > w=4
    docs = _mk_docs(
        spark,
        [
            (1, "s", f"Head. {run} Tail."),
            (2, "s", f"{run} end"),
            (3, "s", f"start {run}"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, "text", "doc_id",
            window_tokens=4, stride=1, max_occurrences=2,
        ).collect()
    }
    assert out[1]["cleaned_text"] == "Head. Tail."
    assert out[1]["n_removed_tokens"] == 8
    assert out[2]["cleaned_text"] == "end"
    assert out[3]["cleaned_text"] == "start "


def test_remove_duplicate_spans_identity_below_threshold(spark):
    """Unreachable threshold → byte-exact identity for every doc,
    including short-of-one-window and token-less documents."""
    from union_indexer_node_spark.pipelines.dedup import (
        remove_duplicate_spans,
    )

    texts = [
        "Hello, World! x2",
        "short",
        "",
        "...!!",
        " ".join(f"w{i}" for i in range(30)) + " trailing.",
    ]
    docs = _mk_docs(spark, [(i, "s", t) for i, t in enumerate(texts)])
    out = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_duplicate_spans(
            docs, "text", "doc_id",
            window_tokens=4, stride=1, max_occurrences=10**9,
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == t, (i, repr(out[i]), repr(t))


# ---------------------------------------------------------------------------
# streaming passage-count fold: superseded checkpoints released
# ---------------------------------------------------------------------------


def test_stream_passage_fold_releases_superseded_checkpoints(spark, sf_dir):
    """ADVICE r9 (low): the foreachBatch fold must not accumulate one
    checkpointed counts copy per micro-batch — after the run at most
    ONE fold checkpoint (the live state) may remain persisted beyond
    whatever was already persisted before."""
    from union_indexer_node_spark.queries import registry

    sc = spark.sparkContext
    n_persistent = lambda: sc._jsc.sc().getPersistentRDDs().size()
    before = n_persistent()
    registry()["stream_passage_counts_incremental"].fn(
        spark, sf_dir
    ).collect()
    after = n_persistent()
    assert after - before <= 1, (before, after)


# ---------------------------------------------------------------------------
# bpe_train_merges: k-iteration trainer semantics
# ---------------------------------------------------------------------------


def test_bpe_train_merges_classic_example(spark):
    """Hand-checkable corpus: 'low' x5 + 'lower' x2. Iteration 0 must
    merge ('l','o') with count 7; iteration 1 merges ('lo','w') with
    count 7; iteration 2 merges ('e','r') with count 2 — and the merge
    must be greedy left-to-right inside each word."""
    from union_indexer_node_spark.pipelines.textstats import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2))],
        "doc_id long, text string",
    )
    out = [
        (r["merge_idx"], r["pair_left"], r["pair_right"], r["merged"],
         r["pair_count"])
        for r in bpe_train_merges(docs, "text", n_merges=3)
        .orderBy("merge_idx")
        .collect()
    ]
    assert out == [
        (0, "l", "o", "lo", 7),
        (1, "lo", "w", "low", 7),
        (2, "e", "r", "er", 2),
    ]


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaa' with top pair (a,a) merges to ['aa','a'], so the next
    iteration sees pair ('aa','a') — the non-overlapping greedy scan
    of the classic trainer, not an overlap double-merge."""
    from union_indexer_node_spark.pipelines.textstats import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aaa aaa bb")], "doc_id long, text string"
    )
    out = [
        (r["merge_idx"], r["pair_left"], r["pair_right"], r["pair_count"])
        for r in bpe_train_merges(docs, "text", n_merges=2)
        .orderBy("merge_idx")
        .collect()
    ]
    # vocab: aaa(wf2) -> pairs (a,a) x2 per word = count 4; bb -> (b,b) 1
    assert out[0] == (0, "a", "a", 4)
    # after merge: 'aa a' -> pair (aa, a) count 2 beats (b, b) count 1
    assert out[1] == (1, "aa", "a", 2)


# ---------------------------------------------------------------------------
# quality_classifier_score: learned-gate scoring semantics
# ---------------------------------------------------------------------------


def test_quality_classifier_scores_and_gate(spark):
    """Score = sum of bucket weights over unigrams+bigrams; empty docs
    score exactly the bias and are never silently dropped; keep is
    score > 0. Cross-checked against a driver-side recomputation of
    the same md5 arithmetic."""
    import hashlib

    from union_indexer_node_spark.pipelines.textstats import (
        hashed_ngram_weights,
        quality_classifier_score,
    )

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 64

    def weight(b):
        return (
            int(hashlib.md5(f"qcT:{b}".encode()).hexdigest()[:8], 16)
            % 2001
            - 1000
        )

    texts = {1: "Alpha beta beta!", 2: "", 3: "solo"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    w = hashed_ngram_weights(spark, n_buckets=64, seed="qcT")
    out = {
        r["doc_id"]: r
        for r in quality_classifier_score(
            docs, "text", "doc_id", w, n_buckets=64, bias=5
        ).collect()
    }
    assert len(out) == 3

    def expect(text):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        feats = toks + [
            f"{toks[i]}_{toks[i+1]}" for i in range(len(toks) - 1)
        ]
        return sum(weight(bucket(g)) for g in feats) + 5

    for did, text in texts.items():
        assert out[did]["score"] == expect(text), did
        assert out[did]["keep"] == (expect(text) > 0), did
    assert out[2]["score"] == 5  # empty doc = bias exactly


def test_quality_classifier_model_join_is_broadcast(spark):
    """The model application must be a broadcast join — shuffling the
    corpus against a KB-sized weight table is the anti-pattern."""
    from union_indexer_node_spark.pipelines.textstats import (
        hashed_ngram_weights,
        quality_classifier_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    w = hashed_ngram_weights(spark, n_buckets=64, seed="qcT")
    scored = quality_classifier_score(docs, "text", "doc_id", w, n_buckets=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
