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
    if name == "lineitem" and factor > 1:
        out = out.unionByName(_stitch_lineitems(spark, base, factor))
    return out


# Cross-replica stitch for the supplier co-occurrence graph. Pure
# key-offset replication makes the xN graph N DISJOINT copies whose
# tie counts are identical, so the triangle/k-core top-5000 edge
# budget tie-breaks onto replica 0 and the soak analyzes a thinned x1
# graph — wall-scaling evidence, but degenerate structure (SCALE.md
# r8 caveat). The stitch adds, between each adjacent replica pair, a
# deterministic 48-supplier "community" (24 low-id suppliers from
# each side interleaved on a ring) co-served through synthetic
# orders: order o covers the 8 consecutive ring positions starting at
# o mod 48, so a supplier pair at ring distance d shares
# (8-d) * STITCH_ORDERS/48 orders — cnt 70..10 for d=1..7, all at or
# above the measured max internal tie (12 at sf0.1). The budget's
# spine is then genuinely cross-replica: the x10 graph holds dense
# ring communities chaining the replicas (non-empty 6-core, triangle
# count growing with N) while staying bounded — 8 suppliers per
# stitch order (the per-order self-join bound the census relies on),
# ~3.8k rows per replica seam vs ~7M replicated rows.
STITCH_SUPPLIERS = 24   # per side; ring size 48
STITCH_ORDERS = 480     # 10 full ring sweeps -> d<=4 ties cnt >= 40
STITCH_SPAN = 8         # suppliers per synthetic order
STITCH_OKEY_BASE = 5_000_000  # above any base/base-derived orderkey


def _stitch_lineitems(spark: SparkSession, base: DataFrame,
                      factor: int) -> DataFrame:
    ring = 2 * STITCH_SUPPLIERS
    template = F.broadcast(
        base.orderBy("l_orderkey", "l_linenumber", "l_suppkey").limit(1)
        .drop("l_orderkey", "l_suppkey", "l_linenumber")
    )
    idx = spark.range((factor - 1) * STITCH_ORDERS * STITCH_SPAN).select(
        (F.col("id") / (STITCH_ORDERS * STITCH_SPAN))
        .cast("long").alias("k"),          # seam: replica k <-> k+1
        ((F.col("id") / STITCH_SPAN).cast("long") % STITCH_ORDERS)
        .alias("o"),
        (F.col("id") % STITCH_SPAN).alias("i"),
    )
    pos = (F.col("o") + F.col("i")) % ring
    okey = (
        F.col("k") * KEY_OFFSET + STITCH_OKEY_BASE + F.col("o")
    )
    # even ring positions draw from replica k, odd from replica k+1;
    # position p maps to base supplier id (p div 2) + 1
    suppkey = (
        (pos / 2).cast("long") + 1
        + (F.col("k") + pos % 2) * KEY_OFFSET
    )
    rows = idx.select(
        okey.cast("long").alias("l_orderkey"),
        suppkey.cast("long").alias("l_suppkey"),
        (F.col("i") + 1).cast("int").alias("l_linenumber"),
    )
    lnum_type = base.schema["l_linenumber"].dataType
    return rows.withColumn(
        "l_linenumber", F.col("l_linenumber").cast(lnum_type)
    ).crossJoin(template).select(*base.columns)


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
