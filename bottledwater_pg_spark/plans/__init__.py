"""Logical-plan-level building blocks: the CDC envelope schema and
plan-inspection helpers."""

from bottledwater_pg_spark.plans.envelope import (
    ENVELOPE_FIELDS,
    ENVELOPE_SCHEMA,
    OP_BEGIN,
    OP_COMMIT,
    OP_DELETE,
    OP_INSERT,
    OP_TABLE_SCHEMA,
    OP_UPDATE,
    envelope_schema,
)

__all__ = [
    "ENVELOPE_FIELDS",
    "ENVELOPE_SCHEMA",
    "OP_BEGIN",
    "OP_COMMIT",
    "OP_DELETE",
    "OP_INSERT",
    "OP_TABLE_SCHEMA",
    "OP_UPDATE",
    "envelope_schema",
]
