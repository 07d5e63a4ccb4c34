"""Bucketed copy-on-write MERGE sink — incremental latest-by-key state
maintenance that rewrites only the key-hash buckets a batch touches.

The reference's materialized state lives in a Kafka compacted topic:
compaction is incremental and per-partition, never a full rewrite
(/root/reference/kafka/bottledwater.c:784-808 hash-partitions by key
precisely so per-key history is confined to one partition;
README.md:283-297). The naive Spark equivalent — union the batch with
the whole state and rewrite everything — is O(|state|) per micro-batch
and dies at 100 TB. This sink is the scale-correct shape, the same
copy-on-write-at-partition-granularity design Delta Lake / Iceberg
MERGE uses, expressed over plain partitioned parquet (those table
formats are not in this image; swapping the writer for Delta's MERGE
would be a one-function change):

* State is parquet partitioned by ``bucket = pmod(xxhash64(key), N)``.
  Same key -> same bucket, always — the analog of the reference's
  consistent key hashing.
* Per batch: compact the batch, find its touched buckets (at most N
  small integers — driver-safe), read ONLY those buckets back
  (partition pruning), merge latest-by-lsn, and commit ONLY those
  buckets. Untouched buckets are never read or written.
* The commit is the manifest/pointer discipline
  (:class:`~bottledwater_pg_spark.streaming.statecommit.BucketManifestState`):
  the merged touched buckets land in a fresh generation directory and
  ONE small JSON pointer flip maps them there — not Spark's dynamic
  partition overwrite, whose rename-based committer is non-atomic on
  object stores (a crash mid-rewrite corrupts the very ``prev`` state
  a replayed ``merge_batch`` reads; the exact window statecommit.py
  closed for the materializer and IVM in r13).
* Cost per batch is O(|batch| + |touched buckets|), independent of
  total state size. With N sized so a bucket fits in executor memory
  (e.g. 100 TB / 64k buckets ~ 1.6 GB), every step stays bounded.
* Re-running a batch is idempotent: merge is latest-by-``lsn``
  (``max_by``), so replayed events lose to (or tie exactly with) what
  the state already holds — this is what upgrades the reference's
  at-least-once delivery (bottledwater.c:684-689) to exactly-once
  effective semantics under Structured Streaming's foreachBatch
  replay contract.
* Tombstones are KEPT in state (as Kafka compaction keeps them for a
  grace period) so a delete still beats older events replayed later;
  they are filtered only at read time. Pair with
  ``expire_tombstones`` for the TTL cleanup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bottledwater_pg_spark.operators.materialize import (
    decode_rows,
    drop_tombstones,
)
from bottledwater_pg_spark.plans.envelope import DML_OPS
from bottledwater_pg_spark.streaming import fsio
from bottledwater_pg_spark.streaming.statecommit import BucketManifestState

STATE_COLS = ["key", "op", "lsn", "new_row"]


class BucketedMergeSink:
    """MERGE-style upsert sink over bucket-partitioned parquet state,
    committed per bucket by manifest pointer flip."""

    def __init__(self, spark: SparkSession, state_dir: str, n_buckets: int = 64):
        self.spark = spark
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        fsio.makedirs(state_dir)
        # pre-r14 dynamic-overwrite layouts ("state/bucket=N") are
        # adopted as generation 0 on first manifest load
        self._mstate = BucketManifestState(state_dir, n_buckets, "state")
        # captured at first commit: every generation dir is written
        # with the same envelope projection, so later reads can skip
        # parquet schema inference (one footer-listing driver job per
        # generation dir per read otherwise)
        self._state_schema: T.StructType | None = None

    # -- state io ---------------------------------------------------
    def _has_state(self) -> bool:
        return bool(self._mstate.bucket_map())

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64("key"), F.lit(self.n_buckets)).cast("int"),
        )

    @staticmethod
    def _latest_by_bucket_key(events: DataFrame) -> DataFrame:
        """Latest-by-lsn per key, grouped by (bucket, key) — identical
        groups and winners as ``compact`` (bucket is a pure function
        of key), but the grouping carries the bucket so downstream
        bucket-partitioned plans can REUSE an existing
        hash-partitioning on ``bucket`` (partitioning on a subset of
        the grouping keys satisfies the aggregation's required
        distribution) instead of re-shuffling by key."""
        return (
            events.groupBy("bucket", "key")
            .agg(
                F.max_by(
                    F.struct("op", "lsn", "new_row"), F.col("lsn")
                ).alias("last")
            )
            .select(
                "key",
                F.col("last.op").alias("op"),
                F.col("last.lsn").alias("lsn"),
                F.col("last.new_row").alias("new_row"),
                "bucket",
            )
        )

    def _read_buckets(self, buckets: list[int] | None) -> DataFrame | None:
        """The state of the given buckets (None = every live bucket):
        a union of at most min(n_buckets, #generations) pruned
        directory reads. Each read is filtered to the buckets the
        manifest maps to that directory, so a crash between pointer
        flip and GC (superseded partitions still on disk) can never
        leak stale rows into the merge."""
        want = None if buckets is None else {int(b) for b in buckets}
        parts = []
        for d, bs in sorted(self._mstate.dir_buckets().items()):
            keep = bs if want is None else sorted(want & set(bs))
            if not keep:
                continue
            full = os.path.join(self.state_dir, d)
            reader = self.spark.read.option("basePath", full)
            if self._state_schema is not None:
                # same writer wrote every generation — reuse its
                # schema instead of re-inferring from footers
                reader = reader.schema(self._state_schema)
            parts.append(
                reader.parquet(full).filter(F.col("bucket").isin(keep))
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def state(self) -> DataFrame | None:
        """Full compacted state (tombstones included)."""
        return self._read_buckets(None)

    def current_rows(self, row_schema: T.StructType) -> DataFrame | None:
        """Typed live rows: tombstones filtered, payloads decoded."""
        state = self.state()
        if state is None:
            return None
        return decode_rows(drop_tombstones(state), row_schema)

    # -- the merge --------------------------------------------------
    def _commit_buckets(
        self, rows: DataFrame, touched: list[int], bucketed: bool = False
    ) -> None:
        """Write ``rows`` (the new full content of exactly the
        ``touched`` buckets) as the next generation and flip the
        manifest. A touched bucket with no surviving rows produces no
        ``bucket=`` partition and leaves the mapping — which is how
        :meth:`expire_tombstones` physically empties a bucket (dynamic
        partition overwrite silently could not: a partition with no
        new rows was left untouched).

        ``bucketed=True``: the plan is ALREADY hash-partitioned by
        ``bucket`` (the merge path establishes that partitioning once
        and every downstream step reuses it) — skip the write-side
        repartition instead of shuffling the state a second time."""
        staged = self._mstate.staging_path()
        if not bucketed:
            rows = rows.repartition(self.n_buckets, "bucket")
        (
            rows.write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(staged)
        )
        self._mstate.promote(staged, touched)
        if self._state_schema is None:
            # what a read of this dir yields: the data columns as
            # written, with the partition column appended last
            self._state_schema = T.StructType(
                [rows.schema[c] for c in STATE_COLS]
                + [T.StructField("bucket", T.IntegerType())]
            )

    def merge_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """Upsert one micro-batch of envelope events into the state.

        Reads and rewrites only the buckets the batch's keys hash to;
        safe to re-run on the same batch (foreachBatch replay): the
        merge is latest-by-lsn, and a replay after a crash BEFORE the
        pointer flip overwrites its own orphaned staging dir.
        """
        dml = batch.filter(
            F.col("op").isin(*DML_OPS) & F.col("key").isNotNull()
        )
        bucketed = self._bucket(dml)
        # r15: the touched-bucket probe reads ONLY the key column —
        # a narrow partial-aggregated distinct over at most n_buckets
        # values (driver-safe at any data scale). The pre-r15 shape
        # persisted a full batch compaction (max_by over the event
        # payloads) just to learn the touched set, which cost the
        # write's whole shuffle once more per micro-batch; the merge
        # aggregation below compacts the RAW batch events instead —
        # winners are identical (latest-by-lsn over prev ∪ batch
        # equals latest-by-lsn over prev ∪ compact(batch); lsn ties
        # can only be exact replays of the same event). Isolated A/B:
        # merge_batch 1.0 -> 0.7 s/batch, 6 -> 4 jobs.
        touched = [
            r["bucket"]
            for r in bucketed.select("bucket").distinct().collect()
        ]
        if not touched:
            return  # empty batch: no commit at all
        prev = self._read_buckets(touched)
        side = bucketed.select(*STATE_COLS, "bucket")
        if prev is not None:
            side = prev.select(*STATE_COLS, "bucket").unionByName(side)
        # ONE exchange for compaction + merge + write: partition the
        # union by bucket; the (bucket, key) aggregation REUSES that
        # partitioning (bucket is a subset of the grouping keys) and
        # its output is still bucket-partitioned, so the
        # partitionBy("bucket") write needs no further shuffle. The
        # batch side shuffles raw events (not pre-compacted rows) —
        # one pass over the batch instead of two, for a shuffle that
        # carries each key's few in-batch events instead of one.
        merged = self._latest_by_bucket_key(
            side.repartition(self.n_buckets, "bucket")
        )
        self._commit_buckets(merged, touched, bucketed=True)

    # -- maintenance ------------------------------------------------
    def expire_tombstones(self, min_live_lsn: int) -> int:
        """Kafka-compaction-style grace-period cleanup: physically drop
        tombstones with ``lsn < min_live_lsn`` — safe once no replay
        can deliver events older than that watermark (the reference
        relies on Kafka's ``delete.retention.ms`` for the same thing).

        Rewrites ONLY buckets that contain expired tombstones; returns
        how many buckets were rewritten. Run it off the hot path as a
        maintenance job, like topic compaction.
        """
        state = self.state()
        if state is None:
            return 0
        expired = (F.col("op") == "delete") & (F.col("lsn") < min_live_lsn)
        affected = [
            r["bucket"]
            for r in state.filter(expired).select("bucket").distinct().collect()
        ]
        if not affected:
            return 0
        survivors = (
            self._read_buckets(affected)
            .filter(~expired)
            .select(*STATE_COLS, "bucket")
        )
        self._commit_buckets(survivors, affected)
        return len(affected)

    def compact_state(self) -> int:
        """Squash every live bucket into ONE generation directory —
        bounds the read-side union width (the number of distinct
        generation dirs the manifest references, which otherwise grows
        toward min(n_buckets, commit count)). O(state) by design; run
        it as a periodic maintenance job, like a full topic
        compaction. Returns the number of buckets rewritten."""
        state = self.state()
        if state is None:
            return 0
        live = sorted(self._mstate.bucket_map())
        self._commit_buckets(state.select(*STATE_COLS, "bucket"), live)
        return len(live)

    # -- streaming entry -------------------------------------------
    def start(self, events_stream: DataFrame, checkpoint_dir: str):
        """Maintain the state from a streaming envelope source; the
        checkpoint + idempotent merge give exactly-once effective
        semantics."""
        return (
            events_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .start()
        )
