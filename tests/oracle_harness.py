"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row-count + schema + order-insensitive values.

Float columns are compared with a small absolute tolerance locally; the
registry's job is to ROUND in both engines so the driver's exact hash
also matches.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from union_indexer_node_spark.tables import GENERIC_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in GENERIC_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# NUL can't appear in real data from either engine, so a genuine NULL
# in one engine can never compare equal to a same-looking string value
# in the other (a "<NULL>"-style sentinel could collide).
_NULL_SENTINEL = "\x00<NULL>\x00"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal + categorical dtypes for cross-engine compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # Normalize null spelling first: Spark→pandas gives None,
            # DuckDB→pandas gives NaN; astype(str) would diverge.
            na = df[c].isna()
            df[c] = df[c].astype(str)
            df.loc[na, c] = _NULL_SENTINEL
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return errs
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(
            f"{name}: columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        # Dtype-parity gate (VERDICT r12 item 2): integer in one engine
        # but float in the other means the oracle (or the query) changed
        # the value's representation — e.g. DuckDB's SUM(BIGINT) returns
        # HUGEINT, which pandas fetches as float64 and silently corrupts
        # above 2^53. The driver hashes exact values, so tolerance
        # compare here must NOT mask it.
        a_int = pd.api.types.is_integer_dtype(a[c])
        b_int = pd.api.types.is_integer_dtype(b[c])
        a_flt = pd.api.types.is_float_dtype(a[c])
        b_flt = pd.api.types.is_float_dtype(b[c])
        if (a_int and b_flt) or (a_flt and b_int):
            errs.append(
                f"{name}.{c}: dtype parity violation — spark={a[c].dtype} "
                f"duck={b[c].dtype}; an int-vs-float split means the two "
                f"engines disagree on the column's type (driver hash "
                f"WILL fail). CAST the oracle output (HUGEINT→BIGINT?) "
                f"or fix the query."
            )
            continue
        if a_flt or b_flt:
            av, bv = a[c].astype(float), b[c].astype(float)
            bad = [
                i
                for i, (x, y) in enumerate(zip(av, bv))
                if not (
                    (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9 + 1e-9 * abs(y)
                )
            ]
        elif pd.api.types.is_datetime64_any_dtype(a[c]):
            # NaT != NaT, so plain != flags matching null timestamps
            bad = [
                i
                for i, (x, y) in enumerate(zip(a[c], b[c]))
                if not (x == y or (pd.isna(x) and pd.isna(y)))
            ]
        else:
            bad = [i for i, (x, y) in enumerate(zip(a[c], b[c])) if x != y]
        if bad:
            i = bad[0]
            errs.append(
                f"{name}.{c}: {len(bad)} mismatches, first at {i}: "
                f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
            )
    return errs
