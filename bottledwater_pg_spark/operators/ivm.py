"""Incremental view maintenance (IVM) — maintain aggregates directly
from the CDC stream, without materializing row state at all.

The classic delta-propagation rule for SUM/COUNT views: every change
event contributes signed deltas —

* Insert  -> +new image
* Update  -> +new image, -old image   (group moves handled for free:
             the two deltas land in their own groups)
* Delete  -> -old image

Summing the deltas telescopes to exactly the aggregate over the final
row state, PROVIDED old images are faithful (the generator emits the
row as it was at event time, like PG logical decoding's old tuple —
REPLICA IDENTITY FULL; protocol_server.c:115-117 documents when
oldtuple is present).

Why it matters at 100 TB: a dashboard-style aggregate over a huge
table maintained this way costs O(|changes|) per refresh — the row
state (and its storage) is never touched. Deltas aggregate with
partial aggregation (decimal sums are associative), so the per-batch
cost is one narrow explode + one small shuffle on the group key. This
composes with foreachBatch the same way the merge sink does: add the
batch's delta aggregate to a tiny persisted per-group table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bottledwater_pg_spark.plans.envelope import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ROW_JSON_OPTIONS,
)

DEC = "decimal(18,2)"


def incremental_group_agg(
    events: DataFrame,
    row_schema: T.StructType,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """COUNT(*) + SUM(value) per group, folded from signed CDC deltas.

    Returns ``(group_col, n_rows, total)`` for groups with surviving
    rows — identical to aggregating the materialized final state, but
    computed without maintaining it.
    """
    plus = F.when(
        F.col("op").isin(OP_INSERT, OP_UPDATE) & F.col("new_row").isNotNull(),
        F.struct(F.lit(1).alias("sign"), F.col("new_row").alias("payload")),
    )
    minus = F.when(
        F.col("op").isin(OP_UPDATE, OP_DELETE) & F.col("old_row").isNotNull(),
        F.struct(F.lit(-1).alias("sign"), F.col("old_row").alias("payload")),
    )
    contribs = (
        events.select(F.explode(F.array(plus, minus)).alias("c"))
        .filter(F.col("c").isNotNull())
        .select(
            F.col("c.sign").alias("sign"),
            F.from_json(F.col("c.payload"), row_schema, ROW_JSON_OPTIONS).alias("r"),
        )
    )
    signed_value = (
        F.col("sign").cast(DEC) * F.col("r").getField(value_col).cast(DEC)
    )
    return (
        contribs.groupBy(F.col("r").getField(group_col).alias(group_col))
        .agg(
            F.sum("sign").cast("long").alias("n_rows"),
            F.sum(signed_value).cast("double").alias("total"),
        )
        .filter(F.col("n_rows") > 0)
    )
