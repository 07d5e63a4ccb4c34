"""Kafka-shaped sink frame (K1) — (topic, key, value) rows with
null-value tombstones for deletes.

Reference: ``send_kafka_msg`` produces one (key, value) message per
event; Insert/Update carry the new row, Delete carries a NULL value so
Kafka log compaction eventually removes the key; deletes on unkeyed
tables are silently dropped (/root/reference/kafka/bottledwater.c:
559-643, delete handling 533-541; README.md:283-297).

In Spark this frame is exactly what ``writeStream.format("kafka")``
expects (topic/key/value columns); here it is also materializable as a
DataFrame so the message-level semantics are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bottledwater_pg_spark.plans.envelope import DML_OPS, OP_DELETE


def kafka_sink_frame(events: DataFrame) -> DataFrame:
    """Envelope -> (topic, key, value, lsn) message frame.

    * Insert/Update -> value = new row payload
    * Delete        -> value = NULL (log-compaction tombstone)
    * unkeyed Delete -> dropped entirely (X2, bottledwater.c:537-541)
    * control events (begin/commit/table_schema) are not messages
    """
    dml = events.filter(F.col("op").isin(*DML_OPS))
    dml = dml.filter(~((F.col("op") == OP_DELETE) & F.col("key").isNull()))
    return dml.select(
        "topic",
        "key",
        F.when(F.col("op") == OP_DELETE, F.lit(None).cast("string"))
        .otherwise(F.col("new_row"))
        .alias("value"),
        "lsn",
    )
