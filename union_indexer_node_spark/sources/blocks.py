"""S1 — Hive block source: nested blocks -> exploded ops frame.

Reference input shape (consumed at hive-stream.ts:199-222):
  block: {block_id: hex-string, timestamp, transactions:
          [{transaction_id, operations: [[op_name, op_payload_json]]}]}
Block height is the first 8 hex chars of block_id (utils.ts:19,57,93).

The explosion keeps (block_height, tx_idx, op_idx) positional indices —
they are the LWW sort key (W2) and enable intra-transaction adjacency
lookups (X5 authority_signed, X6 beneficiaries) as self-joins instead
of the reference's imperative `tx.operations[2]` peeks.

Ordering note (T1): the reference needs blocks processed in strict
height order; this pipeline doesn't — ordering is data (`block_height`
column), not stream position, so any partitioning works and replays
are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import block_height_from_id

# Expected nested schema for a raw blocks table (block dumps at rest).
BLOCKS_SCHEMA = """
    block_id string, timestamp timestamp,
    transactions array<struct<
        transaction_id: string,
        operations: array<struct<op_type: string, payload: string>>
    >>
"""


def explode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks (BLOCKS_SCHEMA) -> one row per operation with positional
    indices. Two Generate (posexplode) operators, no shuffle."""
    txs = blocks.select(
        block_height_from_id(F.col("block_id")).alias("block_height"),
        F.col("timestamp").alias("block_timestamp"),
        F.posexplode("transactions").alias("tx_idx", "tx"),
    )
    ops = txs.select(
        "block_height",
        "block_timestamp",
        "tx_idx",
        F.col("tx.transaction_id").alias("trx_id"),
        F.posexplode("tx.operations").alias("op_idx", "op"),
    )
    return ops.select(
        "block_height",
        "block_timestamp",
        "tx_idx",
        "trx_id",
        "op_idx",
        F.col("op.op_type").alias("op_type"),
        F.col("op.payload").alias("payload"),
    )
