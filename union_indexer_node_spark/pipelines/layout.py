"""Data-layout operators: Z-order (Morton) and Hilbert clustering keys
for multi-dimensional data skipping.

At 100 TB the scan is the query cost, and single-column layouts only
prune one predicate. Writing a table range-partitioned + sorted by the
Z-order interleave of its hottest filter columns gives every one of
those columns locality inside each file, so min/max footer stats prune
scans for predicates on ANY of them (the Delta/Iceberg OPTIMIZE ZORDER
strategy, reproduced here with plain DataFrame primitives: an
expression for the key, repartitionByRange + sortWithinPartitions for
the placement — no engine extension needed).

The key itself is pure map-side bit arithmetic, exactly reproducible
in any engine, so the registry entry oracle-checks the interleave
bit-for-bit. The placement pass is plan-pinned (RangePartitioning) by
tests instead — row placement is not a row-visible value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer columns,
    ``bits`` low bits each (values above 2^bits wrap via masking —
    callers bucket/rank wider domains first).

    The expression unrolls to bits*ncols shift-and-mask terms — all
    long arithmetic inside whole-stage codegen, no UDF, no shuffle.
    With the default 16 bits and 2 columns the key fits in 32 bits;
    keep bits*ncols <= 63 so the key stays a positive long.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError("bits * ncols must stay within a positive long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            # bit i of column j lands at interleaved position i*n + j
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1).cast("long")),
                    i * n + j,
                )
            )
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """The placement pass: range-partition by the Z key (one range
    exchange — each output partition becomes one file at write time)
    and sort within partitions, so every file covers a compact Z range
    and its per-column min/max stats are tight for ALL ``cols``.
    Callers write the result with ``.write.parquet(...)``.
    """
    keyed = df.withColumn(
        "_z", zorder_key([F.col(c) for c in cols], bits=bits)
    )
    parts = keyed.repartitionByRange(
        *([n_files] if n_files else []), F.col("_z")
    )
    return parts.sortWithinPartitions("_z")


def hilbert_key_frame(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    *,
    bits: int = 16,
    out: str = "hval",
) -> DataFrame:
    """Hilbert-curve index of two non-negative integer columns (order
    2^bits, the canonical xy2d walk) — the better-locality sibling of
    ``zorder_key``: consecutive Hilbert cells are always grid-adjacent
    (Morton order jumps at power-of-two boundaries), so files covering
    a compact key range cover a compact RECTANGLE-ish region and
    min/max footer pruning stays tight for range predicates on both
    columns.

    Why a FRAME transformer where zorder_key is a Column: each of the
    ``bits`` levels rewrites (x, y) from BOTH previous values (the
    reflect-and-swap rotation), so a single nested Column expression
    would reference each prior level twice and blow up ~3^bits nodes
    at Catalyst level. One ``withColumns`` per level keeps the plan a
    linear chain of projections — CollapseProject declines to inline
    an alias referenced more than once — and every level is still pure
    map-side long arithmetic inside whole-stage codegen (no UDF, no
    shuffle; working columns are dropped on exit).

    Values above 2^bits wrap via masking, same contract as zorder_key.
    """
    if not 1 <= bits <= 31:
        raise ValueError("hilbert bits must be in [1, 31]")
    n = 1 << bits
    mask = n - 1
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    lmask = F.lit(mask).cast("long")
    df = df.withColumns(
        {
            "_hx": x_col.cast("long").bitwiseAND(F.lit(mask)),
            "_hy": y_col.cast("long").bitwiseAND(F.lit(mask)),
            "_hd": zero,
        }
    )
    # Branch-free level step (the Hacker's-Delight form of the same
    # walk — proven term-equal to the canonical s²·((3·rx)^ry) /
    # reflect-through-(n-1) recurrence by the reference-walk test):
    #   - the quadrant term (3·rx)^ry == 2·xi + (xi^yi), shift-
    #     accumulated as d' = 4d + ... (high bit first);
    #   - reflection through n-1 is XOR with mask (n is a power of 2),
    #     so the rx==1 branch folds into `xor (mask·xi)` — no nested
    #     CASE. The first Hilbert cut generated ~80 Catalyst nodes per
    #     level from the nested whens and ran 15× slower than zorder
    #     at bench scale (the fused 16-level stage blew past the JIT
    #     method limit); this form is ~25 nodes per level and runs at
    #     zorder speed.
    for level in range(bits - 1, -1, -1):
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        xi = F.shiftright(x, level).bitwiseAND(one)
        yi = F.shiftright(y, level).bitwiseAND(one)
        nd = d * F.lit(4) + xi * F.lit(2) + xi.bitwiseXOR(yi)
        refl = lmask * xi  # 0 when xi=0, the full reflect mask when 1
        nx = F.when(yi == zero, y.bitwiseXOR(refl)).otherwise(x)
        ny = F.when(yi == zero, x.bitwiseXOR(refl)).otherwise(y)
        df = df.withColumns({"_hd": nd, "_hx": nx, "_hy": ny})
    return df.withColumn(out, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_layout(
    df: DataFrame,
    x_name: str,
    y_name: str,
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Placement pass over the Hilbert key — same shape as
    ``zorder_layout`` (one range exchange + within-partition sort)."""
    keyed = hilbert_key_frame(
        df, F.col(x_name), F.col(y_name), bits=bits, out="_h"
    )
    parts = keyed.repartitionByRange(
        *([n_files] if n_files else []), F.col("_h")
    )
    return parts.sortWithinPartitions("_h")
