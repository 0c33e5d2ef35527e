"""Sinks (SURVEY S6/S7/S8): upsert, bulk upsert, delete — batch-first.

The reference's findOneAndUpdate/bulkWrite/findOneAndDelete calls
(hive-stream.ts:160-197,289-310,711-718) are last-write-wins upserts
and keyed deletes against MongoDB. Re-expressed set-oriented:

- ``upsert``: union(current, incoming) -> LWW window on the key -> new
  snapshot. One shuffle on the key; with both sides bucketed by the key
  the shuffle disappears.
- ``apply_deletes``: left-anti join against the tombstone set.

On a Delta/Iceberg-backed deployment these become single
``MERGE INTO ... WHEN MATCHED UPDATE / DELETE WHEN NOT MATCHED INSERT``
statements inside foreachBatch (exactly-once with the streaming
checkpoint, SURVEY T2); the pure-parquet variants here implement the
same semantics for environments without a table format, and are what
the tests drive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.windows import lww_latest


def upsert(
    current: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    order: list[Column],
) -> DataFrame:
    """LWW upsert: the winning row per key across both frames. `order`
    columns (descending recency, e.g. block_height/tx_idx/op_idx) must
    exist in both frames; `current=None` means first load."""
    merged = incoming if current is None else current.unionByName(
        incoming, allowMissingColumns=True
    )
    return lww_latest(merged, keys, order)


def apply_deletes(current: DataFrame, tombstones: DataFrame, keys: list[str]) -> DataFrame:
    """S8 — drop rows whose key appears in the tombstone set (unfollow,
    unsubscribe, revoked authority). Broadcast anti-join when the
    tombstone set is small."""
    return current.join(tombstones.select(*keys).distinct(), keys, "left_anti")


def write_snapshot(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> None:
    """Write the new table snapshot. Date-partitioning posts by
    created_at day mirrors the reference's (created_at desc) index
    intent and gives partition pruning to every trending/window query."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
