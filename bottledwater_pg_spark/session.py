"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting here is chosen to
also be the right default on a 1000-executor cluster reading 100 TB:
AQE on (runtime coalescing, skew-join splitting), Arrow enabled for the
Pandas-UDF slow path, UTC session timezone so results compare exactly
against the DuckDB oracle, and shuffle partitions sized to cores locally
(on a real cluster AQE's coalescing makes the static number mostly
irrelevant).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bottledwater_pg_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    The config mirrors what we would ship for a large cluster; only
    ``master`` and driver memory are local-mode artifacts.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert to broadcast at runtime — all essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for the Pandas-UDF slow path (dedup sketches,
        # multimodal decode). Batched columnar, not per-row pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Don't let tiny local test files produce one giant partition;
        # on a cluster this is the per-task scan unit.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # The events fixture carries TIMESTAMP(NANOS) parquet columns,
        # which Spark rejects by default; read them as long and convert
        # in load_table (truncate to µs — same as DuckDB's read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ------------------------------------------------------------------
# Tracked persists.  Query builders persist shared intermediates
# (shingle tables, SRP sketches, LSH pair sets) that are reused by
# several branches of ONE query's action.  Left alone they would
# accumulate in executor storage for the life of the session across a
# 100+ query run, competing with later queries for cache space
# (MEMORY_AND_DISK spills, so correctness is safe — but eviction
# pressure grows monotonically).  persist_tracked() registers each
# one; release_persisted() drops them all, and is called between
# query invocations (bench.py, __spark_entry__.queries() wrappers) —
# i.e. after the previous query's consuming action has finished.

_TRACKED_PERSISTS: list = []


def persist_tracked(df, level=None):
    """persist() + register for release after the query's action."""
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED_PERSISTS.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_TRACKED_PERSISTS)
    while _TRACKED_PERSISTS:
        try:
            _TRACKED_PERSISTS.pop().unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    return n


# Columns stored as TIMESTAMP(NANOS) in the fixture parquet; read as
# long ns (legacy.parquet.nanosAsLong) and truncated to µs on load,
# matching what DuckDB's reader does.
_NS_TIMESTAMP_COLS = {"events": ("ts",)}

# Read-side parallelism floor (spark_optimization_guide §2.5 "input
# skew: one huge unsplittable file ... otherwise repartition
# immediately after the read"). A parquet file yields at most one
# non-empty split per ROW GROUP, whatever the split config says; the
# test fixtures are single-row-group files, so without this every
# per-row-heavy projection that sits before the first exchange (CDC
# envelope encode, k-gram md5, shingling, regex round-trip parsers)
# runs on ONE core. OPT-IN PER CALL SITE (``parallel=True``): the
# full-bench A/B showed the round-robin exchange pays for itself only
# where the pre-shuffle per-row work dominates (winnowing k-gram md5
# 0.56x, n-gram contamination 0.42x, interval parse 0.36x, Bloom
# probe 0.64x, the CDC envelope encode family 0.59-0.90x) while
# taxing every scan-light query ~0.4-0.6 s of extra stage latency —
# a blanket default regressed the 90-query tail 1.4-3x. Even when
# opted in it is gated on the input actually being under-split (row
# groups < default parallelism) and carrying enough bytes to matter,
# so a production table laid out as many splits (the 100 TB case)
# never pays it. Result-safe: every declared query is
# order-insensitive (collect_list always under sort_array, first/last
# only windowed or group-constant; re-certified by the full exact
# gate this round).
_SCAN_REPARTITION_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_SCAN_REPARTITION_MIN_BYTES", str(192 * 1024))
)
#: path -> (mtime, size, row_groups) probe cache
_SPLIT_PROBE_CACHE: dict = {}


def _row_group_count(path: str) -> tuple[int, int]:
    """(row_groups, size_bytes) of a LOCAL parquet file; (big, big) on
    any failure (URI paths, missing pyarrow) so the gate stays off."""
    try:
        st = os.stat(path)
        cached = _SPLIT_PROBE_CACHE.get(path)
        if cached is not None and cached[0] == st.st_mtime:
            return cached[1], cached[2]
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_row_groups
        _SPLIT_PROBE_CACHE[path] = (st.st_mtime, n, st.st_size)
        return n, st.st_size
    except Exception:  # pragma: no cover — URI/odd layouts: skip gate
        return 1 << 30, 0


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
):
    """Read one fixture table (TESTDATA.md) as a DataFrame.

    ``parallel=True`` opts in to the under-split read repartition (see
    the comment above ``_SCAN_REPARTITION_MIN_BYTES``) — pass it where
    heavy per-row work sits between the scan and the first exchange.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _NS_TIMESTAMP_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            # integer `div`, not `/1000` — float division of an ~1e18 ns
            # value loses µs precision (double has 53 mantissa bits)
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"{col} div 1000")).cast("timestamp_ntz"),
            )
    if parallel and os.environ.get(
        "SPARK_GRAFT_SCAN_REPARTITION", "auto"
    ) != "off":
        par = spark.sparkContext.defaultParallelism
        row_groups, size = _row_group_count(path)
        if row_groups < par and size >= _SCAN_REPARTITION_MIN_BYTES:
            df = df.repartition(par)
    return df


def parallel_scan(df, parallel: bool = True):
    """Under-split-read repartition for a DataFrame that did not come
    straight from :func:`load_table` (generated streams, unions):
    round-robin to default parallelism iff the plan currently has
    fewer partitions — the §2.5 unsplittable-input remedy, gated the
    same way (no-op on real multi-split inputs; env kill-switch)."""
    if not parallel or os.environ.get(
        "SPARK_GRAFT_SCAN_REPARTITION", "auto"
    ) == "off":
        return df
    if df.isStreaming:
        # streaming plans have no RDD to inspect (and micro-batch
        # partitioning is the source's business) — explicit check
        # instead of the former silent broad-except (VERDICT r14 §6)
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n < par:
        df = df.repartition(par)
    return df


def register_tables(spark, sf_dir: str) -> list[str]:
    """Register every fixture table as a temp view so ad-hoc
    ``spark.sql`` works against the same data the driver-contract
    queries read (ns-timestamp handling included via load_table)."""
    import glob as _glob
    import os as _os

    names = []
    for path in sorted(_glob.glob(_os.path.join(sf_dir, "*.parquet"))):
        name = _os.path.splitext(_os.path.basename(path))[0]
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    return names
