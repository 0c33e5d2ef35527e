"""Ingest pipelines: blockchain operations -> silver index tables.

Batch-first and order-insensitive: where the reference relies on
processing blocks in time order with monotonic state guards
(hive-stream.ts:536-582), we sort within key windows by
(block_height, tx_idx, op_idx) — the same outcome, deterministic under
any partitioning, replayable at any scale.
"""
