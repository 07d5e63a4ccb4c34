"""Operators: CDC materialization plus the consumer-side query plane
(dedup, similarity, text analysis, multimodal plumbing)."""

from bottledwater_pg_spark.operators.materialize import (
    decode_rows,
    latest_by_key,
    materialize,
)

__all__ = ["decode_rows", "latest_by_key", "materialize"]
