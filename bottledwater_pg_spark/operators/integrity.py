"""Sequence-integrity audit: find every gap in an id/offset sequence —
the "did we lose messages?" check a CDC consumer runs over dense
event ids or Kafka offsets (the reference's at-least-once contract,
bottledwater.c:684-689, promises no loss; THIS is how a consumer
verifies that promise held).

Scale design: the classic lag-over-global-order formulation needs a
single-partition sort. Here gaps are found in TWO telescoped levels:

* level 0 — rows bucket by ``id div bucket_size``; in-bucket gaps come
  from a lag window PARTITIONED by bucket (parallelism = number of
  buckets, sort unit = bucket_size rows).
* level 1 — one summary row per non-empty bucket (min/max id); gaps
  that cross bucket boundaries (including entirely-missing buckets)
  come from a lag window over the summaries — n/bucket_size rows. At
  10^12+ ids apply the same step once more (summaries of summaries);
  each level divides the sorted row count by bucket_size.

Both levels emit (gap_start, gap_end) inclusive ranges; their union is
exactly the global-lag answer (in-bucket windows see every
consecutive pair within a bucket; the summary window sees every pair
that straddles a boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_gap_ranges(df: DataFrame, id_col: str,
                        bucket_size: int = 1024) -> DataFrame:
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    b = ids.withColumn("bkt", F.expr(f"id div {bucket_size}"))

    w0 = Window.partitionBy("bkt").orderBy("id")
    inner = (
        b.withColumn("prev", F.lag("id").over(w0))
        .filter(F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
        )
    )

    summary = b.groupBy("bkt").agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    w1 = Window.orderBy("bkt")
    boundary = (
        summary.withColumn("prev_hi", F.lag("hi").over(w1))
        .filter(
            F.col("prev_hi").isNotNull()
            & (F.col("lo") - F.col("prev_hi") > 1)
        )
        .select(
            (F.col("prev_hi") + 1).alias("gap_start"),
            (F.col("lo") - 1).alias("gap_end"),
        )
    )
    return inner.unionByName(boundary)
