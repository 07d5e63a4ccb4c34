"""Deterministic CDC event generator — the stand-in for the reference's
capture side (Postgres logical decoding + snapshot SRF).

Spark cannot run inside Postgres, so the capture components of the
reference (/root/reference/ext/logdecoder.c, ext/snapshot.c,
client/replication.c) are emulated by replaying a fixture table as:

1. a **snapshot phase** — every existing row emitted as an Insert with
   pseudo-transaction xid=0, mirroring the reference's snapshot that
   pins an exported snapshot and streams every row as Insert frames
   (snapshot.c:103-189, connect.c:321-363, xid 0 at connect.c:356-362);
2. a **stream phase** — deterministic update / delete / PK-change
   transactions derived from the primary key, so the final materialized
   state is exactly expressible as SQL over the base table (this is what
   makes the DuckDB oracle possible).

Everything is a narrow DataFrame transformation (select/filter/union) —
no shuffle, no driver-side loop — so generation itself scales linearly
with input splits on a real cluster.

Reference semantics reproduced here:

* **Update→(Delete+Insert) rewrite (P5)**: an UPDATE that changes the
  primary key is rewritten as Delete(old key) + Insert(new key) so
  per-key log compaction stays correct
  (protocol_server.c:103-143, rewrite at 129-136).
* **Unkeyed-table policy (X2)**: tables without a primary key emit
  events with a null key, and deletes on them are dropped
  (snapshot.c:286-297; bottledwater.c:537-541).
* **Transaction markers (T1)**: begin/commit control events per xid,
  in commit order — only committed transactions appear, mirroring PG
  logical decoding (logdecoder.c:93-124; README.md:55-57).
* **Topic routing (R1)**: each event carries its
  ``[prefix.][namespace.]table`` topic, 'public' namespace omitted
  (bottledwater.c:386-415; README.md:326-358).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bottledwater_pg_spark.plans.envelope import (
    ENVELOPE_SCHEMA,
    ROW_JSON_OPTIONS,
    OP_BEGIN,
    OP_COMMIT,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
)
from bottledwater_pg_spark.routing import topic_name

# lsn = pk_num * LSN_STRIDE + phase: unique, per-key monotonic, and
# computable without any shuffle or global ordering pass.
LSN_STRIDE = 10
PHASE_SNAPSHOT = 0
PHASE_UPDATE = 1
PHASE_PKCHANGE = 2
PHASE_DELETE = 3

XID_SNAPSHOT = 0  # snapshot pseudo-transaction (connect.c:356-362)
XID_UPDATE = 1
XID_PKCHANGE = 2
XID_DELETE = 3


@dataclass
class MutationSpec:
    """Deterministic stream-phase rules keyed off an integer pk.

    With the defaults, a row with numeric key ``k`` experiences:

    * ``k % update_mod == 0``  → UPDATE applying ``update_exprs``
    * ``k % pkchange_mod == 0``→ UPDATE changing the PK to
      ``k + pk_shift`` (emitted as Delete+Insert per P5)
    * ``k % delete_mod == 0``  → DELETE of the original key

    Final state (the oracle contract)::

        SELECT [pk shifted if k%pkchange_mod=0]
               [update_exprs applied if k%update_mod=0]
        FROM base
        WHERE k % delete_mod <> 0 OR k % pkchange_mod = 0
    """

    update_mod: int = 5
    delete_mod: int = 7
    pkchange_mod: int = 11
    pk_shift: int = 1_000_000
    # column name -> SQL expression string for the updated value
    update_exprs: dict[str, str] = field(default_factory=dict)


def _encode(
    df: DataFrame,
    op: str,
    pk_cols: list[str],
    pk_num: Column,
    phase: int,
    xid: int,
    relid: int,
    topic: str,
    new_row: Column | None,
    old_row: Column | None,
    key_override: Column | None = None,
) -> DataFrame:
    """Project a table DataFrame into envelope rows for one event kind.
    ``key_override`` substitutes the key expression (the pk-change
    Insert carries the NEW key) — one encoding of the envelope column
    list, not two drifting copies."""
    if key_override is not None:
        key = key_override
    else:
        key = (
            F.to_json(F.struct(*[F.col(c) for c in pk_cols]), ROW_JSON_OPTIONS)
            if pk_cols
            else F.lit(None).cast("string")
        )
    return df.select(
        F.lit(op).alias("op"),
        F.lit(relid).cast("long").alias("relid"),
        F.lit(xid).cast("long").alias("xid"),
        (pk_num.cast("long") * LSN_STRIDE + phase).alias("lsn"),
        key.alias("key"),
        (old_row if old_row is not None else F.lit(None).cast("string")).alias(
            "old_row"
        ),
        (new_row if new_row is not None else F.lit(None).cast("string")).alias(
            "new_row"
        ),
        F.lit(None).cast("string").alias("schema_json"),
        F.lit(topic).alias("topic"),
    )


def _row_json(df: DataFrame, overrides: dict[str, str] | None = None) -> Column:
    """JSON-encode the full row, optionally overriding columns with SQL
    expressions (the Spark analog of the reference's tuple→Avro encode,
    oid2avro.c:187-213, but via to_json)."""
    cols = []
    for name in df.columns:
        if overrides and name in overrides:
            cols.append(F.expr(overrides[name]).alias(name))
        else:
            cols.append(F.col(name))
    return F.to_json(F.struct(*cols), ROW_JSON_OPTIONS)


def snapshot_events(
    df: DataFrame,
    pk_cols: list[str],
    pk_num: Column,
    relid: int,
    table: str,
    namespace: str = "public",
    topic_prefix: str | None = None,
) -> DataFrame:
    """Snapshot phase: every row as Insert, xid=0 (snapshot.c:103-189)."""
    topic = topic_name(table, namespace, topic_prefix)
    return _encode(
        df,
        OP_INSERT,
        pk_cols,
        pk_num,
        PHASE_SNAPSHOT,
        XID_SNAPSHOT,
        relid,
        topic,
        new_row=_row_json(df),
        old_row=None,
    )


def _event_struct(
    op: str,
    relid: int,
    xid: int,
    lsn: Column,
    key: Column,
    old_row: Column,
    new_row: Column,
    topic: str,
) -> Column:
    """One envelope event as a struct literal-projection — the
    single-pass generator's unit (field order/typing identical to
    :func:`_encode`'s select list)."""
    return F.struct(
        F.lit(op).alias("op"),
        F.lit(relid).cast("long").alias("relid"),
        F.lit(xid).cast("long").alias("xid"),
        lsn.alias("lsn"),
        key.alias("key"),
        old_row.alias("old_row"),
        new_row.alias("new_row"),
        F.lit(None).cast("string").alias("schema_json"),
        F.lit(topic).alias("topic"),
    )


def mutation_events(
    df: DataFrame,
    pk_cols: list[str],
    pk_num: Column,
    relid: int,
    table: str,
    spec: MutationSpec,
    namespace: str = "public",
    topic_prefix: str | None = None,
    _extra_events: "list[Column] | None" = None,
) -> DataFrame:
    """Stream phase: deterministic updates, PK-changes, deletes.

    SINGLE-PASS shape: every row projects an array of its (0-4)
    conditional event structs which is then exploded — one read of the
    base table however many event kinds fire, where the previous form
    unioned one filtered scan PER event kind (7 passes over the source;
    with the read-side repartition each pass also became its own
    exchange because the pushed-down branch filters made every scan
    subtree unique). Event values are expression-identical to the old
    branches, so the emitted rows are the same multiset.

    ``_extra_events``: additional per-row event structs prepended to
    the array (the snapshot insert, when :func:`generate_cdc` wants
    snapshot + mutations in the same single pass).
    """
    topic = topic_name(table, namespace, topic_prefix)
    keyed = bool(pk_cols)

    is_updated = pk_num % spec.update_mod == 0
    is_moved = pk_num % spec.pkchange_mod == 0
    is_deleted = pk_num % spec.delete_mod == 0

    null_s = F.lit(None).cast("string")
    key = (
        F.to_json(F.struct(*[F.col(c) for c in pk_cols]), ROW_JSON_OPTIONS)
        if keyed
        else null_s
    )
    plain_json = _row_json(df)
    upd_json = _row_json(df, spec.update_exprs)
    # old image = the row AS IT WAS at event time (the xid-1 update
    # already applied for k%update_mod keys) — PG logical decoding
    # emits the actual old tuple, and incremental view maintenance
    # (operators/ivm.py) relies on images telescoping exactly
    old_img = F.when(is_updated, upd_json).otherwise(plain_json)

    def lsn(phase: int) -> Column:
        return pk_num.cast("long") * LSN_STRIDE + phase

    events: list[Column] = list(_extra_events or [])

    # xid 1: plain updates (new image carries the updated values).
    events.append(
        F.when(
            is_updated,
            _event_struct(
                OP_UPDATE, relid, XID_UPDATE, lsn(PHASE_UPDATE), key,
                old_row=plain_json, new_row=upd_json, topic=topic,
            ),
        )
    )

    if keyed:
        # xid 2: PK-change updates, rewritten as Delete(old)+Insert(new)
        # exactly like protocol_server.c:129-136 — per-key compaction
        # would otherwise resurrect the old key. The moved row keeps
        # updated values if it was also updated.
        pk0 = pk_cols[0]
        shifted_overrides = dict(spec.update_exprs)
        shifted_overrides[pk0] = f"{pk0} + {spec.pk_shift}"
        del_overrides = {pk0: f"{pk0} + {spec.pk_shift}"}
        shifted_keys = [
            F.expr(del_overrides[c]).alias(c) if c == pk0 else F.col(c)
            for c in pk_cols
        ]
        shifted_key = F.to_json(F.struct(*shifted_keys), ROW_JSON_OPTIONS)
        events.append(
            F.when(
                is_moved,
                _event_struct(
                    OP_DELETE, relid, XID_PKCHANGE, lsn(PHASE_PKCHANGE), key,
                    old_row=old_img, new_row=null_s, topic=topic,
                ),
            )
        )
        events.append(
            F.when(
                is_moved,
                _event_struct(
                    OP_INSERT, relid, XID_PKCHANGE, lsn(PHASE_PKCHANGE),
                    shifted_key,
                    old_row=null_s,
                    new_row=F.when(
                        is_updated, _row_json(df, shifted_overrides)
                    ).otherwise(_row_json(df, del_overrides)),
                    topic=topic,
                ),
            )
        )

        # xid 3: deletes of original keys. Rows that also moved are
        # EXCLUDED: their original key was already deleted in xid 2, and
        # PG logical decoding never emits a delete for a row that no
        # longer exists (the moved-to key survives, matching the
        # oracle's OR k%pkchange_mod=0). Old image carries the xid-1
        # update for k%update_mod keys (see the xid-2 comment).
        events.append(
            F.when(
                is_deleted & ~is_moved,
                _event_struct(
                    OP_DELETE, relid, XID_DELETE, lsn(PHASE_DELETE), key,
                    old_row=old_img, new_row=null_s, topic=topic,
                ),
            )
        )
    # Unkeyed tables: deletes are dropped entirely (X2,
    # bottledwater.c:537-541) — we simply never emit them.

    return df.select(
        F.explode(F.array_compact(F.array(*events))).alias("_e")
    ).select("_e.*")


def txn_markers(spark: SparkSession, relid: int, xids: list[int]) -> DataFrame:
    """Begin/Commit control events per transaction (logdecoder.c:93-124).

    Marker lsns live in their own compact CONTROL sequence
    (begin=xid*2, commit=xid*2+1) whose order is commit order; they
    are NOT interleaved with the data-event lsn domain (pk*10+phase),
    which orders events per key, not per transaction. Consumers gate
    by XID (operators/txn.committed_only), never by comparing a
    marker lsn against a data lsn — see max_complete_lsn for the
    checkpoint-cursor semantics this implies.
    """
    rows = []
    for xid in xids:
        rows.append((OP_BEGIN, relid, xid, xid * 2, None, None, None, None, None))
        rows.append((OP_COMMIT, relid, xid, xid * 2 + 1, None, None, None, None, None))
    # explicit single slice: createDataFrame alone parallelizes even 8
    # marker rows across defaultParallelism near-empty partitions that
    # every downstream union stage drags along (and .coalesce(1) would
    # block filter pushdown through the consuming union — see
    # schema_tracker.table_schema_events)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema=ENVELOPE_SCHEMA
    )


def generate_cdc(
    df: DataFrame,
    pk_cols: list[str],
    pk_num: Column,
    relid: int,
    table: str,
    spec: MutationSpec | None = None,
    namespace: str = "public",
    topic_prefix: str | None = None,
    include_txn_markers: bool = False,
    skip_snapshot: bool = False,
) -> DataFrame:
    """Full CDC replay: snapshot inserts + deterministic mutations.

    ``pk_num`` is an integer-valued Column used for the deterministic
    mutation rules and lsn assignment; for composite keys pass a fused
    expression (e.g. ``l_orderkey*8 + l_linenumber``).

    ``skip_snapshot`` mirrors the reference's ``--skip-snapshot`` /
    ``skip_snapshot=true`` startup option (bottledwater.c option table;
    spec/functional/snapshot_spec.rb:55-61 — "doesn't emit a snapshot
    when skip snapshot is configured"): the replication slot is created
    but no initial snapshot is streamed, so consumers see ONLY keys the
    stream subsequently mutates.

    Constraints (validated where cheap, pinned by tests otherwise):
    ``spec.update_exprs`` must not touch the primary-key column — a
    pk change must go through the Delete+Insert rewrite (P5), never a
    plain update (the event's key would disagree with its payload);
    and ``spec.pk_shift`` must exceed the table's maximum pk value or
    a shifted key collides with an existing base key (compaction then
    silently drops the pk-change insert) —
    tests/test_cdc_plane.py pins shift > max(pk) for every fixture SF.
    """
    spec = spec or MutationSpec()
    if pk_cols and pk_cols[0] in spec.update_exprs:
        raise ValueError(
            f"update_exprs must not touch the pk column "
            f"{pk_cols[0]!r}: pk changes go through the "
            f"Delete+Insert rewrite (set pkchange_mod), not a plain "
            f"update — the update event's key would disagree with "
            f"its new_row payload"
        )
    # No read-side repartition here, deliberately: the A/B showed the
    # single-pass explode below already recovers the CDC family's time
    # without it, while the extra exchange + AQE stage per action
    # taxed every multi-action consumer (merge sink 5.0->9.1 s,
    # many-table fanout 2.2->4.8 s, stream-table join 2.7->3.7 s with
    # it ON). Callers that DO want it can parallel_scan(df) the input
    # themselves.
    # Snapshot + mutations in ONE pass over the base table: the
    # snapshot insert rides the same per-row event array the mutation
    # kinds explode from (see mutation_events) — the whole replay is a
    # single scan + narrow projection, not a union of per-event-kind
    # filtered scans.
    extra: list[Column] = []
    if not skip_snapshot:
        topic = topic_name(table, namespace, topic_prefix)
        null_s = F.lit(None).cast("string")
        key = (
            F.to_json(
                F.struct(*[F.col(c) for c in pk_cols]), ROW_JSON_OPTIONS
            )
            if pk_cols
            else null_s
        )
        extra.append(
            _event_struct(
                OP_INSERT, relid, XID_SNAPSHOT,
                pk_num.cast("long") * LSN_STRIDE + PHASE_SNAPSHOT, key,
                old_row=null_s, new_row=_row_json(df), topic=topic,
            )
        )
    out = mutation_events(
        df, pk_cols, pk_num, relid, table, spec, namespace, topic_prefix,
        _extra_events=extra,
    )
    if include_txn_markers:
        spark = df.sparkSession
        xids = [XID_SNAPSHOT, XID_UPDATE, XID_PKCHANGE, XID_DELETE]
        out = out.unionByName(txn_markers(spark, relid, xids))
    return out


def oracle_final_state_sql(
    table: str,
    pk_cols: list[str],
    pk_num_sql: str,
    all_cols: list[str],
    spec: MutationSpec | None = None,
) -> str:
    """ANSI SQL (DuckDB-compatible) computing the exact final state that
    materializing :func:`generate_cdc`'s stream must produce — the
    correctness oracle for the whole CDC plane."""
    spec = spec or MutationSpec()
    if not pk_cols:
        raise ValueError(
            "oracle_final_state_sql models latest-by-key state; an "
            "unkeyed table materializes append-only (inserts + the "
            "update wave, no deletes/pk-changes) — use a count/append "
            "formula instead (see cdc_queries._replicate_counts_sql)"
        )
    pk0 = pk_cols[0]
    select_parts = []
    for c in all_cols:
        expr = c
        if c in spec.update_exprs:
            expr = (
                f"CASE WHEN ({pk_num_sql}) % {spec.update_mod} = 0 "
                f"THEN {spec.update_exprs[c]} ELSE {c} END"
            )
        if pk0 is not None and c == pk0:
            inner = expr
            expr = (
                f"CASE WHEN ({pk_num_sql}) % {spec.pkchange_mod} = 0 "
                f"THEN ({inner}) + {spec.pk_shift} ELSE ({inner}) END"
            )
        select_parts.append(f"{expr} AS {c}")
    where = (
        f"({pk_num_sql}) % {spec.delete_mod} <> 0 "
        f"OR ({pk_num_sql}) % {spec.pkchange_mod} = 0"
    )
    return f"SELECT {', '.join(select_parts)} FROM {table} WHERE {where}"
