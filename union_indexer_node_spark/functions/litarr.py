"""Single-parse literal-array builders.

``F.array(*[F.lit(x) for x in vals])`` costs one py4j round trip per
element plus one per combinator — ~1.7 s of pure driver time for a
64-element double array built inside an iteration loop (measured r15;
the same hazard bloom_decontaminate documented for its 4096-long bit
table). One ``F.expr`` string parses JVM-side in milliseconds and
folds to the identical array constant, so model literals (centroids,
codebooks, LUTs, hyperplanes, query vectors) stop costing driver time
proportional to their dimension.

Bit-identity discipline:

- doubles go through ``repr(float(x))`` + ``CAST('…' AS DOUBLE)``:
  Python ``repr`` round-trips the exact binary double and
  ``Double.parseDouble`` returns the nearest double of that decimal —
  the same value ``F.lit(float(x))`` ships. (A bare SQL decimal
  literal like ``1.5`` would parse as DECIMAL, changing arithmetic
  type promotion — the cast keeps DoubleType exactly.)
- ints emit plain decimal literals: Spark types them INT when they fit
  in 32 bits and BIGINT otherwise — the same promotion ``F.lit(int)``
  performs — and mixed-width arrays coerce to the common type in both
  forms.
- longs emit the ``L`` suffix for a guaranteed BIGINT element type.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(vals: Iterable[float]) -> Column:
    """array<double> literal, bit-identical to F.array(*map(F.lit, …))."""
    body = ",".join(f"CAST('{repr(float(v))}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({body})")


def lit_ints(vals: Iterable[int]) -> Column:
    """array<int-or-bigint> literal with F.lit's width promotion."""
    body = ",".join(str(int(v)) for v in vals)
    return F.expr(f"array({body})")


def lit_longs(vals: Iterable[int]) -> Column:
    """array<bigint> literal."""
    body = ",".join(f"{int(v)}L" for v in vals)
    return F.expr(f"array({body})")


def lit_double(v: float) -> Column:
    """One double literal via the same exact-repr cast."""
    return F.expr(f"CAST('{repr(float(v))}' AS DOUBLE)")
