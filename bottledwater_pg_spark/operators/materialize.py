"""Latest-state-by-key materialization — Kafka log-compaction semantics
as a Spark operator.

The reference delegates this to Kafka log compaction: every event is
keyed by primary key, a Delete produces a null-value tombstone, and
compaction keeps only the newest value per key
(/root/reference/kafka/bottledwater.c:533-541, 559-643;
README.md:283-297). This module computes that compacted state.

Scale design (the part that must survive 100 TB):

* ``latest_by_key`` is a single hash aggregation ``groupBy(key).agg(
  max_by(struct(...), lsn))`` — ONE shuffle on the key, with map-side
  partial aggregation, so each executor pre-compacts its partitions
  before the exchange. This beats the textbook
  ``Window.partitionBy(key).orderBy(desc(lsn)) + row_number()=1``
  formulation, which shuffles the *full* event stream and then sorts
  every partition (no partial aggregation, O(n log n) per partition).
* Row payloads stay as undecoded JSON strings until after compaction:
  ``from_json`` runs once per surviving key, not once per event.
* Per-key event order is recovered from ``lsn``, never from arrival
  order — a shuffle reorders rows, and the reference's ordering
  guarantee is per-key within a partition anyway
  (bottledwater.c:784-808).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bottledwater_pg_spark.plans.envelope import DML_OPS, OP_DELETE, ROW_JSON_OPTIONS


def compact(events: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Compact a CDC envelope stream to the newest event per key,
    KEEPING tombstones — one row per key with columns
    ``key, op, lsn, new_row`` (plus ``extra_cols``, carried from the
    winning event — e.g. ``topic`` for rename-aware streaming state)
    of the winning event.

    Tombstones must survive compaction whenever the state will be
    merged with more (possibly older) events later — exactly why Kafka
    retains tombstones in compacted topics for a grace period. Use
    :func:`latest_by_key` when this is the final compaction.
    """
    dml = events.filter(F.col("op").isin(*DML_OPS) & F.col("key").isNotNull())
    latest = dml.groupBy("key").agg(
        F.max_by(
            F.struct("op", "lsn", "new_row", *extra_cols), F.col("lsn")
        ).alias("last")
    )
    return latest.select(
        "key",
        F.col("last.op").alias("op"),
        F.col("last.lsn").alias("lsn"),
        F.col("last.new_row").alias("new_row"),
        *[F.col(f"last.{c}").alias(c) for c in extra_cols],
    )


def drop_tombstones(compacted: DataFrame) -> DataFrame:
    return compacted.filter(
        (F.col("op") != OP_DELETE) & F.col("new_row").isNotNull()
    )


def latest_by_key(events: DataFrame) -> DataFrame:
    """Terminal compaction: newest event per key, tombstones dropped."""
    return drop_tombstones(compact(events))


def decode_rows(compacted: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Decode the surviving ``new_row`` JSON payloads into typed columns
    (the client-side counterpart of the reference's Avro decode,
    client/protocol_client.c:94-294 — here ``from_json`` with a fixed
    per-table schema)."""
    return compacted.select(
        F.from_json(F.col("new_row"), row_schema, ROW_JSON_OPTIONS).alias("r")
    ).select("r.*")


def materialize(events: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Full pipeline: compact by key, drop tombstones, decode rows."""
    return decode_rows(latest_by_key(events), row_schema)


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history: every non-delete event
    opens a version valid from its lsn until the key's next event
    (``valid_to_lsn`` null = current). Deletes close the prior version
    without opening one — the tombstone contract as history instead of
    compaction.

    Unlike compaction this genuinely needs every event ordered within
    its key, so the window formulation is correct here: ONE shuffle on
    the key, per-partition sort by lsn, no O(n^2) self-join. At 100 TB
    the output is written partitioned by is_current so point-in-time
    queries prune to closed or open versions.
    """
    from pyspark.sql import Window

    dml = events.filter(F.col("op").isin(*DML_OPS) & F.col("key").isNotNull())
    w = Window.partitionBy("key").orderBy("lsn")
    with_next = dml.withColumn("valid_to_lsn", F.lead("lsn").over(w))
    return with_next.filter(F.col("op") != OP_DELETE).select(
        "key",
        F.col("op").alias("op"),
        F.col("lsn").alias("valid_from_lsn"),
        "valid_to_lsn",
        F.col("valid_to_lsn").isNull().alias("is_current"),
        "new_row",
    )


def append_only(events: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Unkeyed-table materialization: inserts/updates append, deletes
    are dropped (X2, bottledwater.c:537-541). No shuffle at all."""
    rows = events.filter(
        F.col("op").isin(*DML_OPS)
        & (F.col("op") != OP_DELETE)
        & F.col("new_row").isNotNull()
    )
    return rows.select(F.from_json(F.col("new_row"), row_schema, ROW_JSON_OPTIONS).alias("r")).select(
        "r.*"
    )
