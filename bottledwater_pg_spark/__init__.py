"""bottledwater_pg_spark — a PySpark-native engine with the capability
surface of confluentinc/bottledwater-pg.

The reference (read-only at /root/reference) is a Postgres→Kafka CDC
pipeline: consistent snapshot + transactionally ordered change stream,
Avro-encoded rows keyed by primary key, one topic per table,
hash-partitioned by key, schema inference/evolution, at-least-once
delivery, backpressure, and a configurable error policy.

This package re-expresses that surface Spark-first, in two planes:

1. **CDC plane** — the change-event envelope (SURVEY §1.5), a
   deterministic CDC generator standing in for the Postgres capture side
   (ext/ + client/ of the reference), latest-state-by-key
   materialization with tombstone semantics (Kafka log compaction),
   topic routing, key-hash partitioning, transaction ordering, error
   policy, and Structured Streaming equivalents.

2. **Query plane** — the consumer-side capability the reference
   delegates to downstream systems (README.md:30-32): joins, aggregates,
   windows, set ops, scalar functions — plus LLM-data-pipeline
   operators (dedup, similarity search, text analysis, multimodal
   plumbing) designed for 100 TB scale.

All computation is declared through the DataFrame/SQL API so Catalyst
and Tungsten pick the physical strategy; Pandas UDFs are used only where
built-in operators genuinely cannot express the semantics.
"""

from bottledwater_pg_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
