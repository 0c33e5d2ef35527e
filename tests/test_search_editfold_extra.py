"""Round-3 robustness additions: incremental inverted-index maintenance
and a property-based round trip for the built-in dmp patch applier.
"""

from __future__ import annotations

import urllib.parse

from hypothesis import given, settings
from hypothesis import strategies as st

from union_indexer_node_spark.ingest.editfold import _apply_patch


def test_incremental_index_matches_full_rebuild(spark):
    from union_indexer_node_spark.pipelines.search import (
        build_inverted_index,
        search_by_index,
        update_inverted_index,
    )

    docs_v1 = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "catalyst optimizes the logical plan"),
            (3, "parquet stores columns not rows"),
        ],
        "doc_id long, text string",
    )
    index_v1 = build_inverted_index(docs_v1, "text", ["doc_id"])

    # doc 2 edited, doc 3 deleted (empty text), doc 4 added
    changes = spark.createDataFrame(
        [
            (2, "adaptive execution replans the shuffles"),
            (3, ""),
            (4, "arrow batches cross the python boundary"),
        ],
        "doc_id long, text string",
    )
    incremental = update_inverted_index(index_v1, changes, "text", ["doc_id"])

    docs_v2 = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "adaptive execution replans the shuffles"),
            (4, "arrow batches cross the python boundary"),
        ],
        "doc_id long, text string",
    )
    full = build_inverted_index(docs_v2, "text", ["doc_id"])
    assert set(map(tuple, incremental.collect())) == set(map(tuple, full.collect()))

    # deleted doc no longer matches; both maintained paths agree
    hits = search_by_index(incremental, docs_v2, ["shuffles"], ["doc_id"])
    assert {r.doc_id for r in hits.collect()} == {1, 2}


# --- built-in dmp patch applier: generated-patch round trip -----------------

# diff-match-patch %-encodes payload lines with this safe set
# (public dmp source, python port: quote(text, "!~*'();/?:@&=+$,# "))
_DMP_SAFE = "!~*'();/?:@&=+$,# "
_MARGIN = 4


def _dmp_patch_text(base: str, pos: int, n_del: int, insert: str) -> str:
    """Render one splice (delete `n_del` chars at `pos`, insert
    `insert`) in diff-match-patch patch-text format with standard
    4-char context margins — the exact shape hive-stream edits carry."""
    pre = base[max(0, pos - _MARGIN) : pos]
    deleted = base[pos : pos + n_del]
    post = base[pos + n_del : pos + n_del + _MARGIN]
    start1 = pos - len(pre) + 1  # 1-based
    len1 = len(pre) + len(deleted) + len(post)
    start2 = start1
    len2 = len(pre) + len(insert) + len(post)
    q = lambda s: urllib.parse.quote(s, safe=_DMP_SAFE)  # noqa: E731
    lines = [f"@@ -{start1},{len1} +{start2},{len2} @@"]
    if pre:
        lines.append(" " + q(pre))
    if deleted:
        lines.append("-" + q(deleted))
    if insert:
        lines.append("+" + q(insert))
    if post:
        lines.append(" " + q(post))
    return "\n".join(lines)


@settings(max_examples=200, deadline=None)
@given(
    base=st.text(min_size=1, max_size=80),
    pos_frac=st.floats(min_value=0.0, max_value=1.0),
    n_del=st.integers(min_value=0, max_value=10),
    insert=st.text(max_size=20),
)
def test_apply_patch_round_trip(base, pos_frac, n_del, insert):
    pos = int(pos_frac * len(base))
    n_del = min(n_del, len(base) - pos)
    if n_del == 0 and not insert:
        return  # empty splice renders an empty patch body
    expected = base[:pos] + insert + base[pos + n_del :]
    patch = _dmp_patch_text(base, pos, n_del, insert)
    assert _apply_patch(base, patch) == expected


@settings(max_examples=50, deadline=None)
@given(garbage=st.text(min_size=1, max_size=60))
def test_apply_patch_falls_back_verbatim_on_non_patch(garbage):
    """Anything that does not parse as a patch is the new body verbatim
    (the reference's own fallback, hive-stream.ts:540-548)."""
    if garbage.startswith("@@"):
        return  # only exercising the non-patch shape here
    assert _apply_patch("stored body", garbage) == garbage
