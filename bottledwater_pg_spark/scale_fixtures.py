"""Synthetic scale-up fixtures: union-replicate the sf0.1 tables xN
with key-space offsets so scaling behavior is MEASURED, not argued.

No sf1 fixture exists under /root/testdata, so the 10x evidence is
manufactured from what is on disk: each replica k shifts every key
column by ``k * KEY_OFFSET`` (copies never collide — base ids are
well under 10M at any shipped SF, and the queries' own synthetic
offsets top out at 600k), and TEXT columns prefix every token with
``r{k}`` so replica documents share no shingles/tokens/char-k-grams
with any other replica. The result behaves like N independent shards
of fresh data: dedup/contamination pair structure is exactly N copies
of the base corpus's (no cross-replica near-dups, which naive
duplication would create quadratically many of), joins fan out within
a replica only, and graph components stay replica-local.

The reference never scales beyond its docker fixtures (README.md:
497-501 "not yet run on large production databases"); this module is
the north-star 100 TB posture made falsifiable: run the same operator
at x1 and x10 and record the wall-time ratio (scripts/scale_soak.py,
bench.py ``scale_soak`` block, SCALE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table

KEY_OFFSET = 10_000_000

# key columns shifted per replica; text columns token-prefixed.
# orders.o_custkey / lineitem.l_orderkey shift WITH their parents so
# every join stays replica-local (the fan-out of a x10 join equals
# 10 independent x1 joins, which is what "10x the data" means for a
# sharded workload); l_suppkey shifts so the co-purchase graph's
# supplier nodes shard too.
REPLICATION_SPECS: dict[str, dict[str, tuple[str, ...]]] = {
    "documents": {"keys": ("doc_id",), "texts": ("text",)},
    "customer": {"keys": ("c_custkey",)},
    "orders": {"keys": ("o_orderkey", "o_custkey")},
    "lineitem": {"keys": ("l_orderkey", "l_suppkey")},
    "events": {"keys": ("event_id", "user_id")},
    "embeddings": {"keys": ("vec_id",)},
}


def replicated_table(spark: SparkSession, sf_dir: str, name: str,
                     factor: int) -> DataFrame:
    """The fixture table unioned ``factor`` times with per-replica key
    offsets (and token prefixes for text) — replica 0 is the raw
    table. A narrow union of projections: no shuffle; scans
    parallelize per replica."""
    spec = REPLICATION_SPECS[name]
    base = load_table(spark, sf_dir, name)
    parts = []
    for k in range(factor):
        df = base
        for c in spec.get("keys", ()):
            df = df.withColumn(
                c, (F.col(c) + F.lit(k * KEY_OFFSET)).cast(df.schema[c].dataType)
            )
        if k > 0:
            for c in spec.get("texts", ()):
                df = df.withColumn(
                    c, F.regexp_replace(F.col(c), r"(\S+)", f"r{k}$1")
                )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_scaled_dir(spark: SparkSession, sf_dir: str, out_dir: str,
                     factor: int,
                     tables: tuple[str, ...] = tuple(REPLICATION_SPECS),
                     ) -> str:
    """Write a fixture-shaped directory (``{table}.parquet`` files) at
    ``factor`` x the given sf_dir, so every existing ``queries()``
    entry runs against it unmodified. Returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    for t in tables:
        replicated_table(spark, sf_dir, t, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    return out_dir
