"""Exhaustive WhereField semantics grid (SURVEY F1-F9).

Every operator × (scalar, array) field × null-bearing rows, compared
against an independent Python implementation of MongoDB's matching
rules (the reference's semantics contract). Catches drift in the
null/missing-field corners that spot tests miss.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from union_indexer_node_spark.operators.wherefield import compile_wherefield

ROWS = [
    {"id": 0, "s": "apple", "n": 1, "arr": ["x", "y"]},
    {"id": 1, "s": "banana", "n": 5, "arr": ["y", "z"]},
    {"id": 2, "s": None, "n": None, "arr": None},
    {"id": 3, "s": "cherry", "n": 10, "arr": []},
    {"id": 4, "s": "apple", "n": 5, "arr": ["x"]},
]

SCHEMA = "id int, s string, n int, arr array<string>"


def mongo_match_scalar(value, op, operand) -> bool:
    """Mongo matching semantics for a scalar field; value=None models a
    missing field."""
    if op == "_eq":
        return value is None if operand is None else value == operand
    if op == "_ne":
        return value is not None if operand is None else value != operand
    if op in ("_lt", "_gt", "_lte", "_gte"):
        if value is None:
            return False  # Mongo range ops don't match missing/null
        return {
            "_lt": value < operand,
            "_gt": value > operand,
            "_lte": value <= operand,
            "_gte": value >= operand,
        }[op]
    if op == "_in":
        return value in operand
    if op == "_nin":
        return value not in operand  # missing passes $nin
    if op == "_regex":
        return value is not None and re.search(operand, value) is not None
    raise AssertionError(op)


def mongo_match_array(value, op, operand) -> bool:
    arr = value or []
    if op == "_eq":
        return operand in arr
    if op == "_ne":
        return operand not in arr
    if op == "_in":
        return any(v in arr for v in operand)
    if op == "_nin":
        return not any(v in arr for v in operand)
    if op == "_regex":
        return any(re.search(operand, v) for v in arr)
    raise AssertionError(op)


SCALAR_CASES = [
    ("s", "_eq", "apple"),
    ("s", "_eq", None),
    ("s", "_ne", "apple"),
    ("s", "_ne", None),
    ("s", "_regex", "an"),
    ("s", "_in", ["apple", "cherry"]),
    ("s", "_nin", ["apple"]),
    ("n", "_lt", 5),
    ("n", "_lte", 5),
    ("n", "_gt", 5),
    ("n", "_gte", 5),
    ("n", "_in", [1, 10]),
    ("n", "_nin", [5]),
]

ARRAY_CASES = [
    ("arr", "_eq", "x"),
    ("arr", "_ne", "x"),
    ("arr", "_in", ["x", "z"]),
    ("arr", "_nin", ["x", "z"]),
    ("arr", "_regex", "^x$"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, schema=SCHEMA)


@pytest.mark.parametrize("field,op,operand", SCALAR_CASES)
def test_scalar_semantics(frame, field, op, operand):
    pred = compile_wherefield(F.col(field), {op: operand})
    got = {r.id for r in frame.filter(pred).collect()}
    want = {r["id"] for r in ROWS if mongo_match_scalar(r[field], op, operand)}
    assert got == want, f"{field} {op} {operand}: spark={got} mongo={want}"


@pytest.mark.parametrize("field,op,operand", ARRAY_CASES)
def test_array_semantics(frame, field, op, operand):
    pred = compile_wherefield(F.col(field), {op: operand}, array_field=True)
    got = {r.id for r in frame.filter(pred).collect()}
    want = {r["id"] for r in ROWS if mongo_match_array(r[field], op, operand)}
    assert got == want, f"{field} {op} {operand}: spark={got} mongo={want}"


def test_empty_in_dropped(frame):
    """Empty _in/_nin lists are dropped entirely (resolvers/index.ts:14-16):
    a spec of only empty lists compiles to no predicate."""
    assert compile_wherefield(F.col("s"), {"_in": []}) is None
    assert compile_wherefield(F.col("s"), {"_nin": []}) is None


def test_conjunction_of_ops(frame):
    """Multiple ops in one spec AND together (Mongo field-doc)."""
    pred = compile_wherefield(F.col("n"), {"_gte": 1, "_lt": 10, "_nin": [5]})
    got = {r.id for r in frame.filter(pred).collect()}
    assert got == {0}
