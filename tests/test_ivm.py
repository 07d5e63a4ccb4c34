"""IVM delta-fold semantics: group-moving updates, delete-after-update,
and equivalence with materialize-then-aggregate on a real CDC stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
from bottledwater_pg_spark.operators.ivm import incremental_group_agg
from bottledwater_pg_spark.operators.materialize import materialize
from bottledwater_pg_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ev(op, key, old, new, lsn):
    return (op, key, old, new, lsn)


def test_group_moving_update_and_delete_after_update(spark):
    schema = "grp string, v double"
    rows = [
        # k1: insert into A, update moves it to B (value changes too)
        _ev("insert", "k1", None, '{"grp":"A","v":10.0}', 1),
        _ev("update", "k1", '{"grp":"A","v":10.0}', '{"grp":"B","v":12.0}', 2),
        # k2: insert into A, update in place, then delete (old = updated!)
        _ev("insert", "k2", None, '{"grp":"A","v":5.0}', 3),
        _ev("update", "k2", '{"grp":"A","v":5.0}', '{"grp":"A","v":6.0}', 4),
        _ev("delete", "k2", '{"grp":"A","v":6.0}', None, 5),
        # k3: plain insert into B
        _ev("insert", "k3", None, '{"grp":"B","v":1.0}', 6),
    ]
    events = spark.createDataFrame(
        rows, "op string, key string, old_row string, new_row string, lsn long"
    )
    from pyspark.sql import types as T

    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in incremental_group_agg(
            events, T.StructType.fromDDL(schema), "grp", "v"
        ).collect()
    }
    # A nets to zero rows -> filtered out; B has k1(12.0) + k3(1.0)
    assert got == {"B": (2, 13.0)}


def test_ivm_equals_materialize_then_aggregate(spark):
    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    ivm = {
        r["c_mktsegment"]: (r["n_rows"], r["total"])
        for r in incremental_group_agg(
            events, cust.schema, "c_mktsegment", "c_acctbal"
        ).collect()
    }
    mat = {
        r["c_mktsegment"]: (r["n_rows"], r["total"])
        for r in materialize(events, cust.schema)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert ivm == mat
    events.unpersist()


def test_streaming_ivm_matches_batch_and_skips_replayed_epoch(spark, tmp_path):
    from bottledwater_pg_spark.operators.ivm import StreamingAggMaintainer
    from bottledwater_pg_spark.streaming.stream import (
        read_envelope_stream,
        write_envelope_stream,
    )

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR)
    src = str(tmp_path / "src")
    write_envelope_stream(events, src, num_files=4)
    maint = StreamingAggMaintainer(
        spark, str(tmp_path / "st"), cust.schema, "c_mktsegment", "c_acctbal"
    )
    q = maint.start(
        read_envelope_stream(spark, src, files_per_trigger=1),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["c_mktsegment"]: (r["n_rows"], r["total"])
        for r in maint.current().collect()
    }
    want = {
        r["c_mktsegment"]: (r["n_rows"], r["total"])
        for r in incremental_group_agg(
            events, cust.schema, "c_mktsegment", "c_acctbal"
        ).collect()
    }
    assert got == want

    # crash-replay of an applied epoch must be a no-op
    maint.process_batch(spark.read.parquet(src), 0)
    got2 = {
        r["c_mktsegment"]: (r["n_rows"], r["total"])
        for r in maint.current().collect()
    }
    assert got2 == got


def test_streaming_ivm_restart_resumes_and_crash_windows(spark, tmp_path):
    """The r12 transactional hardening: (1) a RESTARTED maintainer
    must resume the standing aggregates (not silently start over);
    (2) a replayed epoch is a no-op even for a fresh instance — the
    applied-epoch ledger rides INSIDE the swapped state dir, so the
    swap commits aggregates + mark atomically (the old beside-state
    ledger left a crash window where a replay double-added);
    (3) a crash between the two swap renames (state gone, state.old
    complete) recovers on construction."""
    import os

    from bottledwater_pg_spark.operators.ivm import StreamingAggMaintainer
    from bottledwater_pg_spark.streaming import fsio

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        b0 = events.filter(F.col("lsn") <= mid)
        b1 = events.filter(F.col("lsn") > mid)
        st = str(tmp_path / "st")
        m1 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m1.process_batch(b0, 0)
        snap = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m1.current().collect()
        }

        # (2) fresh instance, same state dir: replay of epoch 0 is a
        # no-op purely from the durable ledger
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        assert m2._have_state  # (1) standing state seen
        m2.process_batch(b0, 0)
        got = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m2.current().collect()
        }
        assert got == snap

        # (1) and the restarted instance MERGES new epochs into the
        # standing state (the pre-r12 instance overwrote it)
        m2.process_batch(b1, 1)
        want = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in incremental_group_agg(
                events, cust.schema, "c_mktsegment", "c_acctbal"
            ).collect()
        }
        got = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m2.current().collect()
        }
        assert got == want

        # (3) pre-r13 crash layout (the old swap's between-renames
        # window: committed state only under 'state.old', no manifest)
        # -> a new instance adopts it and the standing aggregates
        # survive
        import shutil

        cur = m2._state.current_path()
        shutil.move(cur, os.path.join(st, "state.old"))
        os.remove(os.path.join(st, "state_manifest.json"))
        m3 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        assert m3._have_state
        got = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m3.current().collect()
        }
        assert got == want

        # the epoch mark is invisible to the parquet reader and rides
        # inside the committed generation
        assert fsio.exists(
            os.path.join(m3._state.current_path(), "_epochs.txt")
        )
    finally:
        events.unpersist()


def test_streaming_ivm_legacy_ledger_migration(spark, tmp_path):
    """A pre-r12 state dir (ledger beside the state) keeps its replay
    protection: the legacy epochs.txt is honored, and the first
    post-upgrade swap folds it into the in-state ledger and removes
    the file."""
    import os

    from bottledwater_pg_spark.operators.ivm import StreamingAggMaintainer

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        st = str(tmp_path / "st")
        m1 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m1.process_batch(events, 0)
        snap = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m1.current().collect()
        }
        # forge the legacy layout: ledger beside the state only
        os.remove(os.path.join(m1._state.current_path(), "_epochs.txt"))
        with open(os.path.join(st, "epochs.txt"), "w") as f:
            f.write("0\n")
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m2.process_batch(events, 0)  # replay honored via legacy file
        got = {
            r["c_mktsegment"]: (r["n_rows"], r["total"])
            for r in m2.current().collect()
        }
        assert got == snap
        # a new epoch folds the legacy ledger in and removes the file
        m2.process_batch(events.limit(0), 1)
        assert not os.path.exists(os.path.join(st, "epochs.txt"))
        assert m2._applied_hwm() == 1
    finally:
        events.unpersist()

def test_minmax_deleted_extremum_falls_back(spark):
    """The canonical non-invertible case: the group's MAX is deleted,
    then the new MAX is updated away — min/max must fall back to the
    surviving runner-up each time (support counts, not subtraction)."""
    from pyspark.sql import types as T

    schema = "grp string, v double"
    rows = [
        _ev("insert", "k1", None, '{"grp":"A","v":10.0}', 1),
        _ev("insert", "k2", None, '{"grp":"A","v":7.0}', 2),
        _ev("insert", "k3", None, '{"grp":"A","v":3.0}', 3),
        _ev("insert", "k4", None, '{"grp":"A","v":3.0}', 4),
        # delete the max -> max falls back to 7
        _ev("delete", "k1", '{"grp":"A","v":10.0}', None, 5),
        # update the new max down -> max falls back to 3 (twice-held)
        _ev("update", "k2", '{"grp":"A","v":7.0}', '{"grp":"A","v":1.0}', 6),
        # delete ONE of the duplicate 3s -> the other still holds max
        _ev("delete", "k3", '{"grp":"A","v":3.0}', None, 7),
    ]
    events = spark.createDataFrame(
        rows, "op string, key string, old_row string, new_row string, lsn long"
    )
    got = {
        r["grp"]: (r["n_rows"], r["total"], r["min_val"], r["max_val"])
        for r in incremental_group_agg(
            events, T.StructType.fromDDL(schema), "grp", "v", minmax=True
        ).collect()
    }
    assert got == {"A": (2, 4.0, 1.0, 3.0)}


def test_minmax_equals_materialize_then_aggregate(spark):
    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        ivm = {
            r["c_mktsegment"]: (
                r["n_rows"], r["total"], r["min_val"], r["max_val"]
            )
            for r in incremental_group_agg(
                events, cust.schema, "c_mktsegment", "c_acctbal",
                minmax=True,
            ).collect()
        }
        dec = F.col("c_acctbal").cast("decimal(18,2)")
        mat = {
            r["c_mktsegment"]: (
                r["n_rows"], r["total"], r["min_val"], r["max_val"]
            )
            for r in materialize(events, cust.schema)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(dec).cast("double").alias("total"),
                F.min(dec).cast("double").alias("min_val"),
                F.max(dec).cast("double").alias("max_val"),
            )
            .collect()
        }
        assert ivm == mat
        # sanity: the fixture's deletes actually move some extremum,
        # or this test proves nothing about fallback
        from bottledwater_pg_spark.operators.ivm import delta_value_support

        support = delta_value_support(
            events, cust.schema, "c_mktsegment", "c_acctbal"
        )
        assert support.filter(F.col("cnt") <= 0).count() > 0
    finally:
        events.unpersist()


def test_streaming_minmax_replay_restart_and_layout_gate(spark, tmp_path):
    """StreamingAggMaintainer(minmax=True): two epochs converge to the
    one-shot fold (min/max included), a replayed epoch is a no-op for
    a fresh instance, and a maintainer opened in the WRONG mode over a
    standing state is refused with the rebuild path in the error."""
    import os

    import pytest

    from bottledwater_pg_spark.operators.ivm import StreamingAggMaintainer

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        b0 = events.filter(F.col("lsn") <= mid)
        b1 = events.filter(F.col("lsn") > mid)
        st = str(tmp_path / "st")
        m1 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal",
            minmax=True,
        )
        m1.process_batch(b0, 0)
        m1.process_batch(b1, 1)
        # fresh instance, replayed epoch: no-op
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal",
            minmax=True,
        )
        m2.process_batch(b1, 1)
        want = {
            r["c_mktsegment"]: (
                r["n_rows"], round(r["total"], 2),
                r["min_val"], r["max_val"],
            )
            for r in incremental_group_agg(
                events, cust.schema, "c_mktsegment", "c_acctbal",
                minmax=True,
            ).collect()
        }
        got = {
            r["c_mktsegment"]: (
                r["n_rows"], round(r["total"], 2),
                r["min_val"], r["max_val"],
            )
            for r in m2.current().collect()
        }
        assert got == want
        # the support state tracks LIVE values only (zero-support rows
        # are pruned at merge time)
        state = spark.read.parquet(m2._state.current_path())
        assert state.filter(F.col("cnt") <= 0).count() == 0
        # mode gate: a sums-mode maintainer over this state must refuse
        with pytest.raises(ValueError, match="layout"):
            StreamingAggMaintainer(
                spark, st, cust.schema, "c_mktsegment", "c_acctbal",
                minmax=False,
            )
        # and a legacy pre-minmax state (no layout file) is sums-mode:
        # a minmax maintainer over it must refuse too
        st2 = str(tmp_path / "st2")
        m3 = StreamingAggMaintainer(
            spark, st2, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m3.process_batch(b0, 0)
        os.remove(os.path.join(st2, "state_layout.json"))
        with pytest.raises(ValueError, match="layout"):
            StreamingAggMaintainer(
                spark, st2, cust.schema, "c_mktsegment", "c_acctbal",
                minmax=True,
            )
    finally:
        events.unpersist()


def test_quantized_hist_bounds_and_bucket_churn(spark):
    """Quantized histogram support (continuous-domain IVM): COUNT/SUM
    stay exact under cross-bucket updates and deletes (bucket sums
    telescope), min/max come back as width-exact bucket-edge bounds,
    and an emptied extreme bucket falls back to the next live one."""
    from pyspark.sql import types as T

    schema = "grp string, v double"
    rows = [
        _ev("insert", "k1", None, '{"grp":"A","v":955.0}', 1),   # qb 9
        _ev("insert", "k2", None, '{"grp":"A","v":120.0}', 2),   # qb 1
        _ev("insert", "k3", None, '{"grp":"A","v":-30.0}', 3),   # qb -1
        # cross-bucket update: k1 955 -> 410 (qb 9 empties, qb 4 opens)
        _ev("update", "k1", '{"grp":"A","v":955.0}',
            '{"grp":"A","v":410.0}', 4),
        # delete the min -> min bound falls back to k2's bucket
        _ev("delete", "k3", '{"grp":"A","v":-30.0}', None, 5),
    ]
    events = spark.createDataFrame(
        rows, "op string, key string, old_row string, new_row string, lsn long"
    )
    got = {
        r["grp"]: (
            r["n_rows"], r["total"], r["min_bound"], r["max_bound"]
        )
        for r in incremental_group_agg(
            events, T.StructType.fromDDL(schema), "grp", "v",
            minmax=True, quantize=100,
        ).collect()
    }
    # survivors: 410 + 120 -> total exact; buckets 4 and 1 live
    assert got == {"A": (2, 530.0, 100.0, 500.0)}

    # the support table itself: emptied buckets pruned (cnt==0 implies
    # sum==0 by telescoping)
    from bottledwater_pg_spark.operators.ivm import delta_value_support

    sup = delta_value_support(
        events, T.StructType.fromDDL(schema), "grp", "v", quantize=100
    )
    live = {(r["grp"], r["qb"]): (r["cnt"], float(r["sum_dec"]))
            for r in sup.collect() if r["cnt"] != 0}
    assert live == {("A", 4): (1, 410.0), ("A", 1): (1, 120.0)}
    dead = [r for r in sup.collect() if r["cnt"] == 0]
    assert all(float(r["sum_dec"]) == 0.0 for r in dead)


def test_streaming_quantized_hist_replay_restart_and_width_gate(
    spark, tmp_path
):
    """StreamingAggMaintainer(minmax=True, quantize=w): epochs
    converge to the one-shot quantized fold, a replayed epoch is a
    no-op across a restart, and a standing histogram state is refused
    under a DIFFERENT width or mode (bounds are only exact for the
    width they were bucketed under)."""
    import pytest

    from bottledwater_pg_spark.operators.ivm import StreamingAggMaintainer

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        b1 = events.filter(F.col("lsn") <= mid)
        b2 = events.filter(F.col("lsn") > mid)
        st = str(tmp_path / "hist")
        m = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal",
            minmax=True, quantize=500,
        )
        m.process_batch(b1, 0)
        m.process_batch(b2, 1)
        want = sorted(
            map(
                tuple,
                incremental_group_agg(
                    events, cust.schema, "c_mktsegment", "c_acctbal",
                    minmax=True, quantize=500,
                ).collect(),
            )
        )
        assert sorted(map(tuple, m.current().collect())) == want

        # restart + replayed epoch: no double-fold
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal",
            minmax=True, quantize=500,
        )
        m2.process_batch(b2, 1)
        assert sorted(map(tuple, m2.current().collect())) == want

        # width gate: a different w (or the un-quantized mode) refuses
        for kw in (dict(minmax=True, quantize=100), dict(minmax=True),
                   dict(minmax=False)):
            with pytest.raises(ValueError, match="layout"):
                StreamingAggMaintainer(
                    spark, st, cust.schema, "c_mktsegment", "c_acctbal",
                    **kw,
                )
    finally:
        events.unpersist()
