"""Snapshot diff — derive a CDC event stream from two table snapshots:
the INVERSE of materialization. Where the reference turns a change
stream into state (via Kafka compaction), this turns two states into
the minimal change stream between them — the standard bootstrap when a
source can only provide periodic full dumps (the "snapshot-only
capture" degenerate case of CDC).

Semantics per key (full outer join old x new):

* key only in new            -> Insert(new image)
* key in both, images differ -> Update(old image, new image)
* key only in old            -> Delete(old image)
* key in both, images equal  -> no event (the diff is minimal)

Scale: ONE full-outer sort-merge/shuffled-hash join on the key — the
same single-shuffle cost as latest-by-key compaction, with partial
image comparison pushed into the join output projection. Image
equality compares the serialized row (a canonical JSON projection), so
wide tables cost one string compare, not N column compares, after the
one-time encode.

Reference tie-in: the snapshot phase (snapshot.c:103-189) emits every
row as Insert; diffing two successive snapshots recovers exactly the
update/delete events logical decoding would have produced (minus
intra-interval churn), keyed and ordered for the same downstream
compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bottledwater_pg_spark.plans.envelope import ROW_JSON_OPTIONS


def snapshot_diff(
    old: DataFrame, new: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """Minimal change set between two snapshots of the same table.

    Returns ``(key, op, old_row, new_row)`` with JSON images, one row
    per changed key. Inputs must share a schema; ``pk_cols`` is the
    logical key.
    """
    def encode(df: DataFrame, image: str, side: str) -> DataFrame:
        key = F.to_json(F.struct(*[F.col(c) for c in pk_cols]), ROW_JSON_OPTIONS)
        row = F.to_json(F.struct(*[F.col(c) for c in df.columns]), ROW_JSON_OPTIONS)
        return df.select(key.alias(f"{side}_key"), row.alias(image))

    o = encode(old, "old_row", "o")
    n = encode(new, "new_row", "n")
    joined = o.join(n, o.o_key == n.n_key, "full_outer")
    return (
        joined.withColumn(
            "op",
            F.when(F.col("o_key").isNull(), F.lit("insert"))
            .when(F.col("n_key").isNull(), F.lit("delete"))
            .when(F.col("old_row") != F.col("new_row"), F.lit("update")),
        )
        .filter(F.col("op").isNotNull())
        .select(
            F.coalesce("n_key", "o_key").alias("key"),
            "op",
            "old_row",
            "new_row",
        )
    )
