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

try:  # optional dependency; preferred when present (fuzzy matching)
    from diff_match_patch import diff_match_patch as _DMP

    _dmp = _DMP()
except Exception:  # pragma: no cover - env without the package
    _dmp = None

import re as _re
import urllib.parse as _url

_HUNK_RE = _re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@$")


def _parse_dmp_text(text: str):
    """Minimal parser for the diff-match-patch patch text format
    (the '@@ -l,c +l,c @@' header followed by ' '/'-'/'+' lines with
    %-encoded payloads). Returns list of (start1, lines) or None if the
    text is not a well-formed patch."""
    if not text.startswith("@@"):
        return None
    patches = []
    cur = None
    for line in text.split("\n"):
        if not line:
            continue
        m = _HUNK_RE.match(line)
        if m:
            cur = (int(m.group(1)), [])
            patches.append(cur)
        elif cur is not None and line[0] in " +-":
            cur[1].append((line[0], _url.unquote(line[1:], errors="strict")))
        else:
            return None
    return patches or None


def _apply_exact(base: str, patches) -> str | None:
    """Exact-offset application: every context/delete line must match
    the base at the stated position; None on any mismatch (caller falls
    back). diff-match-patch itself fuzzes offsets — this is the strict
    subset, which covers patches generated against the exact stored
    body (the reference's normal case, hive-stream.ts:540-548)."""
    out = base
    shift = 0
    for start1, ops in patches:
        pos = start1 - 1 + shift
        if pos < 0 or pos > len(out):
            return None
        for kind, payload in ops:
            if kind == " ":
                if out[pos : pos + len(payload)] != payload:
                    return None
                pos += len(payload)
            elif kind == "-":
                if out[pos : pos + len(payload)] != payload:
                    return None
                out = out[:pos] + out[pos + len(payload) :]
                shift -= len(payload)
            else:  # '+'
                out = out[:pos] + payload + out[pos:]
                pos += len(payload)
                shift += len(payload)
    return out


def _apply_patch(base: str, candidate: str) -> str:
    """Apply candidate as a dmp patch onto base; verbatim on failure
    (the reference's own fallback)."""
    if _dmp is not None:
        try:
            patches = _dmp.patch_fromText(candidate)
            if not patches:
                return candidate
            new_body, results = _dmp.patch_apply(patches, base)
            return new_body if results and all(results) else candidate
        except Exception:
            return candidate
    try:
        parsed = _parse_dmp_text(candidate)
    except Exception:
        return candidate
    if parsed is None:
        return candidate
    applied = _apply_exact(base, parsed)
    return candidate if applied is None else applied


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
