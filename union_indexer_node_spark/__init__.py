"""union_indexer_node_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of spknetwork/union-indexer-node.

The reference (read-only at /root/reference) is a Node.js + MongoDB social
indexer for the Hive blockchain: an ingest worker projecting blockchain
operations into document collections, cron enrichment jobs, and a GraphQL
resolver layer that compiles argument objects into MongoDB find/aggregate
calls. This package re-expresses that entire surface as idiomatic Spark:

- ``ingest/``    blockchain-ops -> silver tables (posts/profiles/follows/...)
                 as deterministic, order-insensitive batch DataFrame pipelines
                 (last-write-wins windows replace Mongo upsert ordering).
- ``operators/`` the query layer: WhereField predicate compiler, feed
                 queries, joins, aggregations, windows (resolver semantics
                 re-expressed set-oriented — no N+1).
- ``functions/`` the scalar expression library (JSON projection, post-type
                 detection, mention extraction, asset parsing, ...), all
                 built-in Column expressions — JVM-side, codegen-friendly.
- ``pipelines/`` LLM-data-pipeline extensions: dedup (exact/MinHash-LSH/
                 SimHash/n-gram), similarity search over embeddings, text
                 analysis, multimodal column plumbing.
- ``streaming/`` Structured Streaming wrappers reusing the batch logic via
                 foreachBatch.

Design rules (100 TB first):
- DataFrame/SQL only; no RDDs. Catalyst does pushdown/pruning/join choice.
- No per-row Python in hot paths; Pandas UDFs (Arrow) where Python is
  genuinely required.
- Every shuffle is deliberate: broadcast small dims, aggregate-then-join,
  AQE for skew.
"""

__version__ = "0.1.0"
