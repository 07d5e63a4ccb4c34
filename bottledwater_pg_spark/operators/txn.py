"""Transaction-consistency gate (T1) — only committed transactions are
visible downstream.

Reference: PG logical decoding only streams *committed* transactions in
commit order (README.md:55-57), and the client buffers <=1000 in-flight
transactions so a consumer never checkpoints past a half-acked one
(/root/reference/kafka/bottledwater.c:48-113, 439-489). In Spark the
micro-batch is the atomicity unit; this operator enforces the
batch-level invariant: a DML event is applied only if its transaction's
commit marker is present in (or before) the same batch.

One broadcast-able semi-join against the tiny set of commit markers —
no extra shuffle of the event stream at scale (commit markers are
O(#txns), orders of magnitude smaller than the stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bottledwater_pg_spark.plans.envelope import DML_OPS, OP_COMMIT


def committed_only(events: DataFrame) -> DataFrame:
    """Filter the stream to DML events of committed transactions.

    Control events pass through unchanged; DML of an uncommitted xid
    (no commit marker seen) is held back — the reference would keep it
    buffered until the commit arrives (bottledwater.c:439-489).
    """
    commits = events.filter(F.col("op") == OP_COMMIT).select("xid").distinct()
    dml = events.filter(F.col("op").isin(*DML_OPS))
    ctl = events.filter(~F.col("op").isin(*DML_OPS))
    gated = dml.join(F.broadcast(commits), "xid", "left_semi")
    return gated.unionByName(ctl)


def max_complete_lsn(events: DataFrame) -> int | None:
    """The checkpoint cursor (T2 analog): the highest commit-marker
    lsn (fsync_lsn semantics, bottledwater.c:678-715). Marker lsns
    form their own commit-ordered control sequence (generator
    txn_markers), so the restart-safety statement is per-TRANSACTION:
    every xid whose commit lsn is at or below the cursor has had all
    its events applied (committed_only gates by xid) — the cursor is
    NOT comparable against data-event lsns, which order per key."""
    row = (
        events.filter(F.col("op") == OP_COMMIT)
        .agg(F.max("lsn").alias("lsn"))
        .collect()
    )
    return row[0]["lsn"] if row else None
