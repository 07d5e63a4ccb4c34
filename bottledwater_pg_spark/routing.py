"""Topic routing and key-hash partitioning (reference operators R1, K2).

Reference semantics:

* Topic name is ``[prefix.][pg_schema.]table`` with the ``public``
  namespace omitted (kafka/bottledwater.c:386-415;
  kafka/table_mapper.c:185-242; README.md:326-358).
* Messages are hash-partitioned by key so every event for a given key
  lands in the same partition — required for log compaction and for
  consumers doing stream-table joins (bottledwater.c:784-808;
  spec/functional/partitioning_spec.rb:24-111). Unkeyed messages get a
  random (round-robin) partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_name(table: str, namespace: str = "public", prefix: str | None = None) -> str:
    """``[prefix.][namespace.]table``; 'public' omitted like the
    reference (bottledwater.c:386-415)."""
    parts = []
    if prefix:
        parts.append(prefix)
    if namespace and namespace != "public":
        parts.append(namespace)
    parts.append(table)
    return ".".join(parts)


def route(df: DataFrame, topic_col: str = "topic") -> dict[str, DataFrame]:
    """Split an envelope DataFrame into one DataFrame per topic.

    Driver-side equivalent of the table→topic registry
    (table_mapper.c:58-147). The list of topics is small (one per
    table), so a distinct() on the routing column is cheap; each
    returned branch is a filter the optimizer pushes into the scan.
    """
    topics = [r[0] for r in df.select(topic_col).distinct().collect()]
    return {t: df.filter(F.col(topic_col) == t) for t in topics}


def partition_by_key(
    df: DataFrame, num_partitions: int, key_col: str = "key"
) -> DataFrame:
    """Hash-partition by key: identical keys → identical partitions;
    null (unkeyed) keys spread across partitions (K2).

    Spark's ``repartition(n, col)`` hashes all NULLs to one partition,
    which would recreate the skew the reference's ``consistent_random``
    partitioner avoids (bottledwater.c:784-808) — so unkeyed rows are
    scattered by a per-row salt instead, matching the reference's
    random placement (partitioning_spec.rb:96-111).
    """
    # wide salt domain: hashing only num_partitions distinct salt
    # values into num_partitions buckets collides and leaves partitions
    # empty; a large domain makes placement effectively uniform
    salted = F.when(
        F.col(key_col).isNull(),
        F.concat(F.lit("\0unkeyed\0"), (F.rand() * 1_000_000).cast("long")),
    ).otherwise(F.col(key_col))
    return df.repartition(num_partitions, salted)
