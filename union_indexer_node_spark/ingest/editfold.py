"""X13 — edit-as-patch folding (the engine's only Python UDF).

Reference behavior (hive-stream.ts:540-548): when a comment op arrives
for an existing post, its body is interpreted as a diff-match-patch
patch against the stored body; if patch parsing/application fails, the
body is taken verbatim (full replacement).

Batch re-expression: per (author, permlink), fold the bodies in
(block_height, tx_idx, op_idx) order. Implemented as a grouped
aggregation — ``collect_list(struct(...))`` sorted in-expression via
``array_sort`` (JVM-side), then ONE Arrow-batched pandas UDF applies
the fold. Reply threads are short (bounded edits per post), so the
collected list stays small; the shuffle is the same one the LWW dedup
needs anyway.

``diff_match_patch`` is optional (not in this container): without it
every edit is a full replacement — the reference's own fallback path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

try:  # optional dependency; fallback = full-replacement semantics
    from diff_match_patch import diff_match_patch as _DMP

    _dmp = _DMP()
except Exception:  # pragma: no cover - env without the package
    _dmp = None


def _apply_patch(base: str, candidate: str) -> str:
    """Apply candidate as a dmp patch onto base; verbatim on failure."""
    if _dmp is None:
        return candidate
    try:
        patches = _dmp.patch_fromText(candidate)
        if not patches:
            return candidate
        new_body, results = _dmp.patch_apply(patches, base)
        return new_body if results and all(results) else candidate
    except Exception:
        return candidate


@F.pandas_udf(StringType())
def _fold_bodies(bodies: pd.Series) -> pd.Series:
    """bodies: Series of lists of body strings, already event-ordered."""
    out = []
    for seq in bodies:
        acc = ""
        for b in seq:
            acc = _apply_patch(acc, b) if acc else (b or "")
        out.append(acc)
    return pd.Series(out)


def folded_body(events: Column) -> Column:
    """events: array<struct<block_height,tx_idx,op_idx,body>> (unsorted).

    array_sort orders by struct fields lexicographically (block_height,
    tx_idx, op_idx) JVM-side; only the fold itself crosses into Python.
    """
    ordered = F.array_sort(events)
    return _fold_bodies(F.transform(ordered, lambda e: e["body"]))
