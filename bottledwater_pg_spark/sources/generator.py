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


def mutation_events(
    df: DataFrame,
    pk_cols: list[str],
    pk_num: Column,
    relid: int,
    table: str,
    spec: MutationSpec,
    namespace: str = "public",
    topic_prefix: str | None = None,
) -> DataFrame:
    """Stream phase: deterministic updates, PK-changes, deletes."""
    topic = topic_name(table, namespace, topic_prefix)
    keyed = bool(pk_cols)
    parts: list[DataFrame] = []

    is_updated = pk_num % spec.update_mod == 0
    is_moved = pk_num % spec.pkchange_mod == 0
    is_deleted = pk_num % spec.delete_mod == 0

    # xid 1: plain updates (new image carries the updated values).
    upd = df.filter(is_updated)
    parts.append(
        _encode(
            upd,
            OP_UPDATE,
            pk_cols,
            pk_num,
            PHASE_UPDATE,
            XID_UPDATE,
            relid,
            topic,
            new_row=_row_json(upd, spec.update_exprs),
            old_row=_row_json(upd),
        )
    )

    if keyed:
        # xid 2: PK-change updates, rewritten as Delete(old)+Insert(new)
        # exactly like protocol_server.c:129-136 — per-key compaction
        # would otherwise resurrect the old key.
        moved = df.filter(is_moved)
        pk0 = pk_cols[0]
        shifted_overrides = dict(spec.update_exprs)
        shifted_overrides[pk0] = f"{pk0} + {spec.pk_shift}"
        # the moved row keeps updated values if it was also updated
        moved_upd = moved.filter(is_updated)
        moved_not_upd = moved.filter(~is_updated)
        del_overrides = {pk0: f"{pk0} + {spec.pk_shift}"}
        # old image = the row AS IT WAS at event time (the xid-1 update
        # already applied for k%update_mod keys) — PG logical decoding
        # emits the actual old tuple, and incremental view maintenance
        # (operators/ivm.py) relies on images telescoping exactly
        for part_df, old_overrides in (
            (moved_upd, spec.update_exprs),
            (moved_not_upd, None),
        ):
            parts.append(
                _encode(
                    part_df,
                    OP_DELETE,
                    pk_cols,
                    pk_num,
                    PHASE_PKCHANGE,
                    XID_PKCHANGE,
                    relid,
                    topic,
                    new_row=None,
                    old_row=_row_json(part_df, old_overrides),
                )
            )
        for part_df, overrides in (
            (moved_upd, shifted_overrides),
            (moved_not_upd, del_overrides),
        ):
            shifted_keys = [
                F.expr(overrides.get(c, c)).alias(c) if c == pk0 else F.col(c)
                for c in pk_cols
            ]
            parts.append(
                _encode(
                    part_df,
                    OP_INSERT,
                    pk_cols,
                    pk_num,
                    PHASE_PKCHANGE,
                    XID_PKCHANGE,
                    relid,
                    topic,
                    new_row=_row_json(part_df, overrides),
                    old_row=None,
                    key_override=F.to_json(
                        F.struct(*shifted_keys), ROW_JSON_OPTIONS
                    ),
                )
            )

        # xid 3: deletes of original keys. Rows that also moved are
        # EXCLUDED: their original key was already deleted in xid 2, and
        # PG logical decoding never emits a delete for a row that no
        # longer exists (the moved-to key survives, matching the
        # oracle's OR k%pkchange_mod=0). Old image carries the xid-1
        # update for k%update_mod keys (see the xid-2 comment).
        for dele, old_overrides in (
            (df.filter(is_deleted & ~is_moved & is_updated), spec.update_exprs),
            (df.filter(is_deleted & ~is_moved & ~is_updated), None),
        ):
            parts.append(
                _encode(
                    dele,
                    OP_DELETE,
                    pk_cols,
                    pk_num,
                    PHASE_DELETE,
                    XID_DELETE,
                    relid,
                    topic,
                    new_row=None,
                    old_row=_row_json(dele, old_overrides),
                )
            )
    # Unkeyed tables: deletes are dropped entirely (X2,
    # bottledwater.c:537-541) — we simply never emit them.

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    return spark.createDataFrame(rows, schema=ENVELOPE_SCHEMA)


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
    muts = mutation_events(
        df, pk_cols, pk_num, relid, table, spec, namespace, topic_prefix
    )
    if skip_snapshot:
        out = muts
    else:
        snap = snapshot_events(
            df, pk_cols, pk_num, relid, table, namespace, topic_prefix
        )
        out = snap.unionByName(muts)
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
