"""Interval (range) join — point-in-interval matching without a
nested-loop join.

Spark has no native range-join optimization: a plain
``points.join(intervals, p.ts >= i.start & p.ts < i.end)`` plans as
BroadcastNestedLoopJoin (O(|points| x |intervals|)), which is fine for
a handful of intervals and fatal at scale. This operator applies the
standard bucketed-range-join decomposition (the same strategy Databricks'
range-join hint and Flink's interval join use internally):

1. quantize time into fixed-width buckets;
2. a point belongs to exactly ONE bucket; an interval is exploded to
   the buckets it overlaps (expansion factor = len/bucket_width + 1,
   bounded and chosen by the caller);
3. equi-join on the bucket id — hash join, shuffles both sides on a
   key Catalyst understands, AQE-skew-splittable;
4. re-apply the exact predicate to discard same-bucket near-misses.

Because each point carries a single bucket, every (point, interval)
match is produced exactly once — no dedup pass needed.

The reference has no such operator (it is a CDC shuttle); this is part
of the consumer-side surface its README points at ("a consumer relying
on seeing all updates relating to a given key … for a stream-table
join", /root/reference/kafka/bottledwater.c:800-807, README.md:384-398).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row whose half-open
    window ``[start_col, end_col)`` contains ``point_ts``.

    Column names of the two inputs must be disjoint. Empty or inverted
    intervals match nothing. ``bucket_seconds`` trades shuffle width
    (small buckets -> more interval replicas) against post-filter
    selectivity (large buckets -> more near-misses discarded); set it
    near the typical interval length.
    """
    bu = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        "_p_us", F.unix_micros(F.col(point_ts).cast("timestamp"))
    ).withColumn("_bkt", F.expr(f"_p_us div {bu}"))
    iv = (
        intervals.withColumn(
            "_s_us", F.unix_micros(F.col(start_col).cast("timestamp"))
        )
        .withColumn("_e_us", F.unix_micros(F.col(end_col).cast("timestamp")))
        .filter(F.col("_e_us") > F.col("_s_us"))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.expr(f"_s_us div {bu}"), F.expr(f"(_e_us - 1) div {bu}")
                )
            ),
        )
    )
    return (
        p.join(iv, "_bkt")
        .filter((F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") < F.col("_e_us")))
        .drop("_bkt", "_p_us", "_s_us", "_e_us")
    )
