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


def delta_group_agg(
    events: DataFrame,
    row_schema: T.StructType,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """The raw delta aggregate of one event set: ``(group_col, n_rows,
    total_dec)`` where both measures may be NEGATIVE (a batch that only
    deletes produces negative deltas). ``total_dec`` stays decimal so
    deltas from different batches add exactly."""
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
    return contribs.groupBy(
        F.col("r").getField(group_col).alias(group_col)
    ).agg(
        F.sum("sign").cast("long").alias("n_rows"),
        F.sum(signed_value).alias("total_dec"),
    )


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
    return (
        delta_group_agg(events, row_schema, group_col, value_col)
        .filter(F.col("n_rows") > 0)
        .select(
            group_col, "n_rows", F.col("total_dec").cast("double").alias("total")
        )
    )


class StreamingAggMaintainer:
    """foreachBatch IVM: per micro-batch, ADD the batch's delta
    aggregate to a tiny persisted per-group table — the streaming form
    of :func:`incremental_group_agg`, with per-epoch dedup.

    Delta folding is NOT naturally idempotent (replaying a batch would
    double-add), so applied epoch ids are recorded with the state and
    a replayed epoch is skipped — the standard transactional
    foreachBatch pattern, giving exactly-once effective aggregates on
    top of Structured Streaming's at-least-once replay. The applied-
    epoch ledger lives INSIDE the swapped state directory
    (``state/_epochs.txt`` — underscore-prefixed, so parquet readers
    ignore it like ``_SUCCESS``): the directory swap commits the new
    aggregates AND their epoch mark in one rename, closing the
    crash window a beside-the-state ledger had (crash after swap,
    before mark -> the replayed epoch re-folded an already-folded
    delta and double-added; crash in the other order would have
    under-counted). A restarted instance content-checks the standing
    state (and promotes a ``state.old`` left by a crash between the
    two swap renames) instead of silently starting over.

    Scale: the persisted state is |groups| rows — for dashboard-style
    views that is kilobytes regardless of stream volume; each batch
    costs one narrow explode + one tiny shuffle + one tiny rewrite.
    """

    def __init__(self, spark, state_dir: str, row_schema: T.StructType,
                 group_col: str, value_col: str):
        from bottledwater_pg_spark.streaming import fsio

        self.spark = spark
        self.state_dir = state_dir
        self.row_schema = row_schema
        self.group_col = group_col
        self.value_col = value_col
        fsio.makedirs(state_dir)
        self._recover_state()
        self._have_state = self._state_on_disk()

    def _path(self, name: str) -> str:
        import os

        return os.path.join(self.state_dir, name)

    def _state_on_disk(self) -> bool:
        from bottledwater_pg_spark.streaming import fsio

        p = self._path("state")
        return fsio.isdir(p) and any(
            f.endswith(".parquet") for f in fsio.listdir(p)
        )

    def _recover_state(self) -> None:
        """A crash between the two swap renames leaves no 'state' but
        a complete 'state.old' — promote it back (the materializer's
        discipline)."""
        from bottledwater_pg_spark.streaming import fsio

        final = self._path("state")
        swap = final + ".old"
        if not fsio.isdir(final) and fsio.isdir(swap):
            fsio.rename(swap, final)

    def _applied_epochs(self) -> set[int]:
        from bottledwater_pg_spark.streaming import fsio

        eps: set[int] = set()
        # in-state ledger (authoritative) + the legacy beside-state
        # file from pre-r12 incarnations (unioned until the first
        # post-upgrade swap folds and deletes it)
        for p in (self._path("state/_epochs.txt"),
                  self._path("epochs.txt")):
            if fsio.exists(p):
                eps |= {int(x) for x in fsio.read_text(p).split() if x}
        return eps

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        import os

        from bottledwater_pg_spark.streaming import fsio

        applied = self._applied_epochs()
        if epoch_id in applied:
            return  # replayed epoch: already folded in
        delta = delta_group_agg(
            batch, self.row_schema, self.group_col, self.value_col
        )
        if self._have_state:
            prev = self.spark.read.parquet(self._path("state"))
            merged = (
                prev.unionByName(delta)
                .groupBy(self.group_col)
                .agg(
                    F.sum("n_rows").cast("long").alias("n_rows"),
                    F.sum("total_dec").alias("total_dec"),
                )
            )
        else:
            merged = delta
        tmp = self._path(f"state.epoch{epoch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        # ledger INSIDE the about-to-be-swapped dir: the swap commits
        # aggregates + epoch mark atomically
        fsio.write_text(
            os.path.join(tmp, "_epochs.txt"),
            "\n".join(str(e) for e in sorted(applied | {epoch_id}))
            + "\n",
        )
        final = self._path("state")
        swap = final + ".old"
        if fsio.exists(swap):
            fsio.rmtree(swap)
        if fsio.exists(final):
            fsio.rename(final, swap)
        fsio.rename(tmp, final)
        if fsio.exists(swap):
            fsio.rmtree(swap)
        legacy = self._path("epochs.txt")
        if fsio.exists(legacy):
            # the in-state ledger now supersets it
            fsio.remove(legacy)
        self._have_state = True

    def current(self) -> DataFrame | None:
        """The maintained view: groups with surviving rows."""
        if not self._have_state:
            return None
        return (
            self.spark.read.parquet(self._path("state"))
            .filter(F.col("n_rows") > 0)
            .select(
                self.group_col,
                "n_rows",
                F.col("total_dec").cast("double").alias("total"),
            )
        )

    def start(self, events_stream: DataFrame, checkpoint_dir: str):
        return (
            events_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .start()
        )
