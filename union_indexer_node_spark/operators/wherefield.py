"""WhereField predicate compiler.

The reference's generic filter language is the GraphQL ``WhereField``
input — ``{_regex,_eq,_ne,_lt,_gt,_lte,_gte,_in,_nin}``
(/root/reference/src/modules/api/graphql-v2/schema.ts:257-268), compiled
to MongoDB by prefix-swapping ``_`` -> ``$``
(/root/reference/src/modules/api/graphql-v2/resolvers/index.ts:7-20).
Empty ``_in``/``_nin`` lists are dropped (resolvers/index.ts:14-16).

Mongo semantic corners we reproduce exactly (SURVEY F1-F9):

- On **array-valued fields** (``tags``, ``app_metadata.types``), ``_eq``
  means *membership* and ``_in`` means *overlap* (Mongo array matching).
- ``_ne`` / ``_nin`` also match documents where the field is **missing**
  (Mongo $ne passes absent fields). We encode "absent ≡ NULL", so the
  compiled predicate is ``col != v OR col IS NULL`` — three-valued SQL
  logic alone would drop NULL rows, which would diverge.
- Empty ``_in: []`` / ``_nin: []`` are dropped entirely (no-op), matching
  the reference.

All output is pure ``Column`` expressions — JVM-side, codegen-friendly,
and pushdown-eligible (equality/range predicates reach the parquet scan).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALAR_OPS = {"_eq", "_ne", "_lt", "_gt", "_lte", "_gte", "_in", "_nin", "_regex"}


def _is_array_col(df_schema, field: str) -> bool:
    """Best-effort: top-level field of ArrayType ⇒ Mongo array-matching."""
    try:
        from pyspark.sql.types import ArrayType

        return isinstance(df_schema[field].dataType, ArrayType)
    except Exception:
        return False


def compile_wherefield(
    col: Column, spec: Mapping[str, Any], *, array_field: bool = False
) -> Column | None:
    """Compile one WhereField spec against a column.

    ``array_field=True`` switches to Mongo array-matching semantics:
    _eq -> array_contains, _in -> arrays_overlap, negations add the
    missing-field (NULL) escape hatch.
    """
    preds: list[Column] = []
    for op, val in spec.items():
        if op not in SCALAR_OPS:
            raise ValueError(f"unsupported WhereField op: {op}")
        if op in ("_in", "_nin") and isinstance(val, (list, tuple)) and len(val) == 0:
            continue  # reference drops empty lists (resolvers/index.ts:14-16)
        if array_field:
            preds.append(_compile_array_op(col, op, val))
        else:
            preds.append(_compile_scalar_op(col, op, val))
    if not preds:
        return None
    return reduce(lambda a, b: a & b, preds)


def _compile_scalar_op(col: Column, op: str, val: Any) -> Column:
    if op == "_eq":
        if val is None:
            return col.isNull()
        return col == F.lit(val)
    if op == "_ne":
        if val is None:
            return col.isNotNull()
        # Mongo $ne matches missing fields too (SURVEY F7)
        return (col != F.lit(val)) | col.isNull()
    if op == "_lt":
        return col < F.lit(val)
    if op == "_gt":
        return col > F.lit(val)
    if op == "_lte":
        return col <= F.lit(val)
    if op == "_gte":
        return col >= F.lit(val)
    if op == "_in":
        return col.isin(list(val))
    if op == "_nin":
        return (~col.isin(list(val))) | col.isNull()
    if op == "_regex":
        return col.rlike(val)
    raise AssertionError(op)


def _compile_array_op(col: Column, op: str, val: Any) -> Column:
    arr = F.coalesce(col, F.array().cast("array<string>"))
    if op == "_eq":
        return F.array_contains(arr, val)
    if op == "_ne":
        return ~F.array_contains(arr, val)  # NULL coalesced to [] ⇒ True
    if op == "_in":
        return F.arrays_overlap(arr, F.array(*[F.lit(v) for v in val]))
    if op == "_nin":
        return ~F.arrays_overlap(arr, F.array(*[F.lit(v) for v in val]))
    if op == "_regex":
        return F.exists(arr, lambda x: x.rlike(val))
    raise ValueError(f"op {op} not defined for array fields")


def or_of(preds: list[Column | None]) -> Column | None:
    """$or expansion (FeedOptinsOR, resolvers/index.ts:108-116)."""
    preds = [p for p in preds if p is not None]
    if not preds:
        return None
    return reduce(lambda a, b: a | b, preds)


def and_of(preds: list[Column | None]) -> Column | None:
    preds = [p for p in preds if p is not None]
    if not preds:
        return None
    return reduce(lambda a, b: a & b, preds)
