"""Sources and sinks (SURVEY §2.1).

The reference's stream machinery (fastStream's fetch fan-out, reorder
buffer, heap backpressure — utils.ts:12-199) is transport plumbing that
Spark replaces wholesale: batch reads of block dumps + Structured
Streaming for the live tail. What remains engine-relevant is (a) the
block -> operation explosion with positional indices and (b) upsert /
delete sink semantics, both here.
"""
