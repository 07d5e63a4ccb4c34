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


def delta_value_support(
    events: DataFrame,
    row_schema: T.StructType,
    group_col: str,
    value_col: str,
    quantize: float | None = None,
) -> DataFrame:
    """Signed per-(group, value) SUPPORT COUNTS of one event set:
    ``(group_col, val_dec, cnt)`` where ``cnt`` is the net number of
    surviving rows holding that exact value (may be negative within a
    deletion-heavy delta; deltas from different batches add).

    This is the classic fix for the non-invertible aggregates: SUM and
    COUNT telescope from signed deltas directly, but a deleted MAX
    cannot be "subtracted" — the maintainer must know what the
    runner-up was. Per-(group, value) support counts ARE that
    knowledge: MIN/MAX over values with ``cnt > 0`` is exact under any
    insert/update/delete history. State is O(distinct values per
    group) — for categorical/priced domains that is small; for
    unbounded continuous domains, pass ``quantize``.

    ``quantize=w`` switches to the HISTOGRAM support table — the
    standard continuous-domain trade, now implemented: rows are
    ``(group, qb, cnt, sum_dec)`` where ``qb = floor(value / w)`` is
    the bucket index, ``cnt`` the signed live-row count and
    ``sum_dec`` the signed sum of ACTUAL values in the bucket. State
    is O(occupied buckets per group) regardless of distinct-value
    cardinality. COUNT and SUM stay EXACT (each row's lifetime
    contributions ``+v1 -v1 +v2 ... ±vk`` telescope per bucket: a
    bucket's ``sum_dec`` is exactly the sum of its live rows' current
    values, and ``cnt == 0`` implies ``sum_dec == 0``); MIN/MAX come
    back as BOUNDS exact to the declared width: the min live bucket's
    lower edge and the max live bucket's upper edge, i.e.
    ``min_bound = floor(true_min/w)*w <= true_min < min_bound + w``
    (and symmetrically for max) — a deterministic function of the
    final state, which is what the DuckDB oracle certifies."""
    if quantize is not None:
        contribs = _signed_contribs(events, row_schema)
        val = F.col("r").getField(value_col).cast(DEC)
        return contribs.groupBy(
            F.col("r").getField(group_col).alias(group_col),
            F.floor(val / F.lit(quantize)).cast("long").alias("qb"),
        ).agg(
            F.sum("sign").cast("long").alias("cnt"),
            F.sum(F.col("sign") * val).alias("sum_dec"),
        )
    contribs = _signed_contribs(events, row_schema)
    return contribs.groupBy(
        F.col("r").getField(group_col).alias(group_col),
        F.col("r").getField(value_col).cast(DEC).alias("val_dec"),
    ).agg(F.sum("sign").cast("long").alias("cnt"))


def _signed_contribs(events: DataFrame, row_schema: T.StructType) -> DataFrame:
    """One narrow explode: ``(sign, r)`` rows — +1 with the new image
    for insert/update, -1 with the old image for update/delete."""
    plus = F.when(
        F.col("op").isin(OP_INSERT, OP_UPDATE) & F.col("new_row").isNotNull(),
        F.struct(F.lit(1).alias("sign"), F.col("new_row").alias("payload")),
    )
    minus = F.when(
        F.col("op").isin(OP_UPDATE, OP_DELETE) & F.col("old_row").isNotNull(),
        F.struct(F.lit(-1).alias("sign"), F.col("old_row").alias("payload")),
    )
    return (
        events.select(F.explode(F.array(plus, minus)).alias("c"))
        .filter(F.col("c").isNotNull())
        .select(
            F.col("c.sign").alias("sign"),
            F.from_json(F.col("c.payload"), row_schema, ROW_JSON_OPTIONS).alias("r"),
        )
    )


def support_to_group_agg(support: DataFrame, group_col: str) -> DataFrame:
    """Fold a (group, val_dec, cnt) support table to the full aggregate
    row ``(group_col, n_rows, total, min_val, max_val)`` over surviving
    rows. NULL values count toward n_rows but are skipped by
    SUM/MIN/MAX — ANSI aggregate semantics, so the result equals
    aggregating the materialized final state."""
    live = support.filter(F.col("cnt") > 0)
    return (
        live.groupBy(group_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum(F.col("val_dec") * F.col("cnt")).alias("total_dec"),
            F.min("val_dec").alias("min_dec"),
            F.max("val_dec").alias("max_dec"),
        )
        .filter(F.col("n_rows") > 0)
        .select(
            group_col,
            "n_rows",
            F.col("total_dec").cast("double").alias("total"),
            F.col("min_dec").cast("double").alias("min_val"),
            F.col("max_dec").cast("double").alias("max_val"),
        )
    )


def support_hist_to_group_agg(
    support: DataFrame, group_col: str, width: float
) -> DataFrame:
    """Fold a quantized ``(group, qb, cnt, sum_dec)`` histogram
    support table to ``(group_col, n_rows, total, min_bound,
    max_bound)``: COUNT/SUM exact (bucket sums telescope), MIN/MAX as
    bucket-edge bounds exact to ``width`` — ``min_bound`` is the min
    live bucket's lower edge, ``max_bound`` the max live bucket's
    UPPER edge, so ``min_bound <= true_min <= true_max < max_bound``
    always."""
    live = support.filter(F.col("cnt") > 0)
    w = F.lit(width).cast(DEC)
    return (
        live.groupBy(group_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum("sum_dec").alias("total_dec"),
            F.min("qb").alias("min_qb"),
            F.max("qb").alias("max_qb"),
        )
        .filter(F.col("n_rows") > 0)
        .select(
            group_col,
            "n_rows",
            F.col("total_dec").cast("double").alias("total"),
            (F.col("min_qb").cast(DEC) * w).cast("double").alias("min_bound"),
            ((F.col("max_qb") + 1).cast(DEC) * w)
            .cast("double")
            .alias("max_bound"),
        )
    )


def incremental_group_agg(
    events: DataFrame,
    row_schema: T.StructType,
    group_col: str,
    value_col: str,
    minmax: bool = False,
    quantize: float | None = None,
) -> DataFrame:
    """COUNT(*) + SUM(value) per group, folded from signed CDC deltas
    — with ``minmax=True``, also exact MIN(value) / MAX(value), via
    per-(group, value) support counts (see :func:`delta_value_support`
    for why min/max need them: they are not invertible under deletes).

    Returns ``(group_col, n_rows, total[, min_val, max_val])`` for
    groups with surviving rows — identical to aggregating the
    materialized final state, but computed without maintaining it.
    With ``minmax=True, quantize=w`` the state is the bucketed
    histogram (O(occupied buckets), the continuous-domain shape) and
    the extrema come back as width-exact bounds ``min_bound`` /
    ``max_bound`` instead of ``min_val`` / ``max_val``.
    """
    if minmax and quantize is not None:
        return support_hist_to_group_agg(
            delta_value_support(
                events, row_schema, group_col, value_col, quantize=quantize
            ),
            group_col,
            quantize,
        )
    if minmax:
        return support_to_group_agg(
            delta_value_support(events, row_schema, group_col, value_col),
            group_col,
        )
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
    double-add), so an applied-epoch HIGH-WATERMARK is recorded with
    the state and a replayed epoch is skipped — the standard
    transactional foreachBatch pattern, giving exactly-once effective
    aggregates on top of Structured Streaming's at-least-once replay.
    A high-watermark suffices because foreachBatch epoch ids are
    monotone and only the LAST uncommitted epoch can ever replay, so
    "applied" is exactly ``epoch_id <= hwm`` — and unlike the full
    applied-set ledger it once was, the mark is O(1) forever instead
    of growing one entry per epoch for the stream's lifetime.

    The mark lives INSIDE the state generation directory
    (``_epochs.txt`` — underscore-prefixed, so parquet readers ignore
    it like ``_SUCCESS``), and the generation is committed by manifest
    pointer flip (streaming/statecommit.py): one small-file commit
    publishes the new aggregates AND their epoch mark together, with
    no directory rename — correct on object stores, where the old
    swap's rename was a non-atomic per-file copy (a crash mid-swap
    could leave a partially populated dir that passed the bare
    content check, re-opening the double-add window the in-state
    ledger claims to close). A restarted instance resolves the
    standing state through the manifest (pre-r13 swap layouts,
    including an orphaned ``state.old``, are adopted) instead of
    silently starting over.

    Scale: the persisted state is |groups| rows — for dashboard-style
    views that is kilobytes regardless of stream volume; each batch
    costs one narrow explode + one tiny shuffle + one tiny rewrite.
    """

    def __init__(self, spark, state_dir: str, row_schema: T.StructType,
                 group_col: str, value_col: str, minmax: bool = False,
                 quantize: float | None = None):
        """``minmax=True`` switches the persisted state from the
        per-group (n_rows, total_dec) sums to the per-(group, value)
        SUPPORT table that exact MIN/MAX under deletes requires
        (:func:`delta_value_support`); :meth:`current` then also
        reports ``min_val`` / ``max_val``. Adding ``quantize=w``
        switches that to the bucketed HISTOGRAM support table —
        O(occupied buckets per group) state for continuous value
        domains, COUNT/SUM exact, extrema as width-``w`` bucket-edge
        bounds. The layouts are not interchangeable (and a histogram
        is only exact for ITS declared width), so a standing state
        built under another mode or width is refused with the rebuild
        path in the error (the same meta-gate discipline as the
        streaming containment index)."""
        import os

        from bottledwater_pg_spark.streaming import fsio
        from bottledwater_pg_spark.streaming.statecommit import (
            GenerationalState,
        )

        self.spark = spark
        self.state_dir = state_dir
        self.row_schema = row_schema
        if quantize is not None and not minmax:
            raise ValueError("quantize requires minmax=True")
        self.group_col = group_col
        self.value_col = value_col
        self.minmax = minmax
        self.quantize = quantize
        fsio.makedirs(state_dir)
        self._state = GenerationalState(state_dir, "state")
        layout_p = os.path.join(state_dir, "state_layout.json")
        if quantize is not None:
            want_layout = f"support_hist_w{quantize}"
        elif minmax:
            want_layout = "support"
        else:
            want_layout = "sums"
        meta = fsio.read_json_meta(layout_p)
        if self._state.current_path() is not None:
            # legacy pre-minmax states carry no layout file: they are
            # the sums layout by construction
            have_layout = meta["layout"] if meta is not None else "sums"
            if have_layout != want_layout:
                raise ValueError(
                    f"state at {state_dir!r} was built with "
                    f"layout={have_layout!r} but this maintainer needs "
                    f"{want_layout!r} (minmax={minmax}); point it at a "
                    "fresh state_dir (and replay the stream) or delete "
                    "the standing state to rebuild"
                )
        if meta is None or meta["layout"] != want_layout:
            fsio.write_json_meta(layout_p, {"layout": want_layout})
        self._have_state = self._state.current_path() is not None

    def _path(self, name: str) -> str:
        import os

        return os.path.join(self.state_dir, name)

    def _applied_hwm(self) -> int | None:
        """Highest applied epoch id, or None before the first commit.
        Reads the in-state mark (current generation) plus legacy
        formats: the pre-r13 full applied-set ``_epochs.txt`` (max of
        the set == hwm, since epochs apply in monotone order) and the
        pre-r12 beside-state ``epochs.txt``."""
        import os

        from bottledwater_pg_spark.streaming import fsio

        hwm: int | None = None
        cur = self._state.current_path()
        paths = [self._path("epochs.txt")]
        if cur is not None:
            paths.append(os.path.join(cur, "_epochs.txt"))
        for p in paths:
            if not fsio.exists(p):
                continue
            for tok in fsio.read_text(p).split():
                v = int(tok[4:]) if tok.startswith("hwm=") else int(tok)
                hwm = v if hwm is None else max(hwm, v)
        return hwm

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        import os

        from bottledwater_pg_spark.streaming import fsio

        hwm = self._applied_hwm()
        if hwm is not None and epoch_id <= hwm:
            return  # replayed epoch: already folded in
        if self.minmax:
            delta = delta_value_support(
                batch, self.row_schema, self.group_col, self.value_col,
                quantize=self.quantize,
            )
        else:
            delta = delta_group_agg(
                batch, self.row_schema, self.group_col, self.value_col
            )
        cur = self._state.current_path()
        if cur is None:
            # first commit still needs the zero-support prune: an
            # intra-batch insert+delete (or same-value update) nets to
            # cnt=0 and must not be persisted — state tracks LIVE
            # distinct values from generation 1, not just from the
            # second commit on
            merged = delta.filter(F.col("cnt") != 0) if self.minmax else delta
        elif self.minmax and self.quantize is not None:
            prev = self.spark.read.parquet(cur)
            merged = (
                prev.unionByName(delta)
                .groupBy(self.group_col, "qb")
                .agg(
                    F.sum("cnt").cast("long").alias("cnt"),
                    F.sum("sum_dec").alias("sum_dec"),
                )
                # cnt==0 implies sum_dec==0 (per-bucket telescoping),
                # so the prune keeps only live-occupied buckets
                .filter(F.col("cnt") != 0)
            )
        elif self.minmax:
            prev = self.spark.read.parquet(cur)
            merged = (
                prev.unionByName(delta)
                .groupBy(self.group_col, "val_dec")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
                # zero-support values are dead weight — drop them so
                # state tracks LIVE distinct values, not ever-seen ones
                .filter(F.col("cnt") != 0)
            )
        else:
            prev = self.spark.read.parquet(cur)
            merged = (
                prev.unionByName(delta)
                .groupBy(self.group_col)
                .agg(
                    F.sum("n_rows").cast("long").alias("n_rows"),
                    F.sum("total_dec").alias("total_dec"),
                )
            )
        staged = self._state.staging_path()
        merged.write.mode("overwrite").parquet(staged)
        # epoch mark INSIDE the staged generation: the pointer flip
        # commits aggregates + mark in one small-file write
        fsio.write_text(
            os.path.join(staged, "_epochs.txt"),
            f"hwm={max(epoch_id, hwm if hwm is not None else epoch_id)}\n",
        )
        self._state.promote(staged)
        legacy = self._path("epochs.txt")
        if fsio.exists(legacy):
            # the in-state mark now supersets it
            fsio.remove(legacy)
        self._have_state = True

    def current(self) -> DataFrame | None:
        """The maintained view: groups with surviving rows. With
        ``minmax=True`` the row also carries exact ``min_val`` /
        ``max_val`` (a deleted extremum falls back to the runner-up,
        because the support state knows it)."""
        cur = self._state.current_path()
        if cur is None:
            return None
        state = self.spark.read.parquet(cur)
        if self.minmax and self.quantize is not None:
            return support_hist_to_group_agg(
                state, self.group_col, self.quantize
            )
        if self.minmax:
            return support_to_group_agg(state, self.group_col)
        return (
            state.filter(F.col("n_rows") > 0)
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
