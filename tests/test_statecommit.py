"""Manifest/pointer state commits (streaming/statecommit.py).

The r12 swap committed state by directory rename — atomic on local/
HDFS, a non-atomic O(data) per-file copy on object stores (s3a, gcs).
These tests pin the r13 replacement: commits flip a small JSON pointer,
NO directory is ever renamed, and every crash window (staged-but-not-
promoted, pointer mid-flip, post-flip pre-GC) recovers.

The rename-hostile lifecycle is the headline: the full materializer
and IVM flows run with ``fsio.rename`` stubbed to RAISE — an executable
proof that the commit path works on a filesystem whose rename cannot
be trusted, which is exactly the s3a seam the r12 verdict named.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.sources.generator import snapshot_events
from bottledwater_pg_spark.streaming import fsio
from bottledwater_pg_spark.streaming.statecommit import (
    GenerationalState,
    StateCorruptionError,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_rename(monkeypatch):
    """Simulate a filesystem with no usable rename: any fsio.rename is
    an immediate failure. write_json_meta's local branch commits via
    os.replace (a same-directory small-file swap object stores emulate
    with PUT-overwrite), so the pointer flip itself never routes
    through the stubbed call."""
    calls = []

    def _refuse(src, dst):
        calls.append((src, dst))
        raise OSError(f"rename unavailable on this filesystem: {src}")

    monkeypatch.setattr(fsio, "rename", _refuse)
    return calls


def _gen_state(spark, tmp_path, rows):
    gs = GenerationalState(str(tmp_path), "state")
    staged = gs.staging_path()
    spark.createDataFrame(rows, "k long, v string").write.mode(
        "overwrite"
    ).parquet(staged)
    gs.promote(staged)
    return gs


def test_commit_flip_and_gc(spark, tmp_path):
    """Each commit lands in a fresh generation dir; the pointer names
    it; superseded generations are GC'd; no rename is involved."""
    gs = _gen_state(spark, tmp_path, [(1, "a")])
    p1 = gs.current_path()
    assert os.path.basename(p1) == "state-g1"
    gs2 = _gen_state(spark, tmp_path, [(2, "b")])
    p2 = gs2.current_path()
    assert os.path.basename(p2) == "state-g2"
    assert not os.path.exists(p1)  # GC'd after the flip
    got = spark.read.parquet(p2).collect()
    assert [(r["k"], r["v"]) for r in got] == [(2, "b")]


def test_staged_but_not_promoted_is_invisible_then_overwritten(
    spark, tmp_path
):
    """Crash between the generation write and the pointer flip: the
    staged dir is a complete orphan; readers still see the old state;
    the replayed attempt reuses the same generation number (overwrite)
    and the commit completes."""
    gs = _gen_state(spark, tmp_path, [(1, "a")])
    staged = gs.staging_path()
    spark.createDataFrame([(9, "crash")], "k long, v string").write.mode(
        "overwrite"
    ).parquet(staged)
    # no promote — reader resolves the OLD generation
    assert os.path.basename(gs.current_path()) == "state-g1"
    # replay: same staging target, overwritten, then promoted
    staged2 = gs.staging_path()
    assert staged2 == staged
    spark.createDataFrame([(2, "b")], "k long, v string").write.mode(
        "overwrite"
    ).parquet(staged2)
    gs.promote(staged2)
    got = spark.read.parquet(gs.current_path()).collect()
    assert [(r["k"], r["v"]) for r in got] == [(2, "b")]


def test_pointer_midflip_tmp_recovery(spark, tmp_path):
    """The object-store pointer window (final deleted, complete .tmp
    on disk — fsio's URI branch is delete-then-rename): the next read
    promotes the .tmp and resolves the NEW generation."""
    gs = _gen_state(spark, tmp_path, [(1, "a")])
    gs2 = _gen_state(spark, tmp_path, [(2, "b")])
    manifest = os.path.join(str(tmp_path), "state_manifest.json")
    # forge the mid-flip window: tmp holds the new pointer, final gone
    shutil.copy(manifest, manifest + ".tmp")
    os.remove(manifest)
    fresh = GenerationalState(str(tmp_path), "state")
    assert os.path.basename(fresh.current_path()) == "state-g2"
    assert os.path.exists(manifest)  # promoted by the read
    del gs, gs2


def test_manifest_naming_missing_dir_raises(spark, tmp_path):
    """A pointer to a vanished generation is corruption (the flip only
    ever follows a committed write) and must surface loudly, not read
    as 'no state yet'."""
    gs = _gen_state(spark, tmp_path, [(1, "a")])
    shutil.rmtree(gs.current_path())
    with pytest.raises(StateCorruptionError):
        GenerationalState(str(tmp_path), "state").current_path()


def test_promote_refuses_uncommitted_dir(spark, tmp_path):
    gs = GenerationalState(str(tmp_path), "state")
    staged = gs.staging_path()
    os.makedirs(staged)  # empty dir: no _SUCCESS, no part files
    with pytest.raises(ValueError):
        gs.promote(staged)


def test_materializer_lifecycle_without_rename(
    spark, sf_dir, tmp_path, no_rename
):
    """Full materializer flow — two batches, process restart, replayed
    batch, read-back — with fsio.rename stubbed to raise: the commit
    path must never need it. (The r12 swap called it three times per
    batch.)"""
    from bottledwater_pg_spark.operators.materialize import compact
    from bottledwater_pg_spark.streaming.stream import (
        StreamingMaterializer,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    ev = snapshot_events(
        base, ["c_custkey"], F.col("c_custkey"), 1, "customer"
    ).cache()
    try:
        half_a = ev.filter(F.col("lsn") % 2 == 0)
        half_b = ev.filter(F.col("lsn") % 2 == 1)
        st = str(tmp_path / "state")
        mat = StreamingMaterializer(spark, st, base.schema)
        mat.process_batch(half_a, 0)
        mat.process_batch(half_b, 1)
        # process restart + replay of the last epoch
        mat2 = StreamingMaterializer(spark, st, base.schema)
        assert mat2.current_rows() is not None
        mat2.process_batch(half_b, 1)
        want = compact(ev).count()
        assert mat2.read_state().count() == want
        assert mat2.current_rows().count() == base.count()
        assert no_rename == []  # never even attempted
    finally:
        ev.unpersist()


def test_ivm_lifecycle_without_rename(spark, tmp_path, no_rename):
    """Full IVM flow — two epochs, restart, replayed epoch — with
    fsio.rename stubbed to raise; totals equal the one-shot fold and
    the replay is a no-op (hwm mark committed with the state)."""
    from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
    from bottledwater_pg_spark.operators.ivm import (
        StreamingAggMaintainer,
        incremental_group_agg,
    )

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        st = str(tmp_path / "st")
        m1 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m1.process_batch(events.filter(F.col("lsn") <= mid), 0)
        m1.process_batch(events.filter(F.col("lsn") > mid), 1)
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m2.process_batch(events.filter(F.col("lsn") > mid), 1)  # replay
        want = {
            r["c_mktsegment"]: (r["n_rows"], round(r["total"], 2))
            for r in incremental_group_agg(
                events, cust.schema, "c_mktsegment", "c_acctbal"
            ).collect()
        }
        got = {
            r["c_mktsegment"]: (r["n_rows"], round(r["total"], 2))
            for r in m2.current().collect()
        }
        assert got == want
        assert m2._applied_hwm() == 1
        assert no_rename == []
    finally:
        events.unpersist()


def test_ivm_crash_before_promote_replays_without_double_add(
    spark, tmp_path
):
    """Crash AFTER the staged generation (aggregates + epoch mark) is
    fully written but BEFORE the pointer flip: the mark rode inside
    the unreferenced dir, so the epoch replays and folds exactly
    once — the double-add window the manifest commit closes."""
    from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
    from bottledwater_pg_spark.operators.ivm import (
        StreamingAggMaintainer,
        incremental_group_agg,
    )

    cust = load_table(spark, SF_DIR, "customer")
    events = customer_cdc(spark, SF_DIR).cache()
    try:
        st = str(tmp_path / "st")
        m1 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        m1.process_batch(events, 0)
        # epoch 1: stage fully, crash at the flip
        orig_promote = m1._state.promote

        def crash_at_flip(staged):
            raise RuntimeError("injected crash before pointer flip")

        m1._state.promote = crash_at_flip
        with pytest.raises(RuntimeError):
            m1.process_batch(events.limit(50), 1)
        m1._state.promote = orig_promote
        # restart: epoch 1 replays; epoch 0 must not re-fold
        m2 = StreamingAggMaintainer(
            spark, st, cust.schema, "c_mktsegment", "c_acctbal"
        )
        assert m2._applied_hwm() == 0
        m2.process_batch(events, 0)  # replayed: no-op
        m2.process_batch(events.limit(0), 1)  # the interrupted epoch
        want = {
            r["c_mktsegment"]: (r["n_rows"], round(r["total"], 2))
            for r in incremental_group_agg(
                events, cust.schema, "c_mktsegment", "c_acctbal"
            ).collect()
        }
        got = {
            r["c_mktsegment"]: (r["n_rows"], round(r["total"], 2))
            for r in m2.current().collect()
        }
        assert got == want
    finally:
        events.unpersist()


def test_materializer_commit_on_file_uri_state(spark, sf_dir, tmp_path):
    """The manifest commit through the REAL Hadoop FileSystem classes
    (file:// URI): pointer flip uses the delete-then-rename window +
    tmp recovery, generations GC through fs.delete — the same code
    path an s3a:// deployment exercises."""
    from bottledwater_pg_spark.streaming.stream import (
        StreamingMaterializer,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    ev = snapshot_events(
        base, ["c_custkey"], F.col("c_custkey"), 1, "customer"
    )
    st = "file://" + str(tmp_path / "state")
    mat = StreamingMaterializer(spark, st, base.schema)
    mat.process_batch(ev, 0)
    mat.process_batch(
        ev.limit(10).withColumn("lsn", F.col("lsn") + 1000), 1
    )
    assert os.path.basename(mat._state_path()) == "state-g2"
    assert mat.current_rows().count() == base.count()
    # local view of the URI dir: exactly one generation + the manifest
    local = str(tmp_path / "state")
    dirs = [d for d in os.listdir(local) if os.path.isdir(
        os.path.join(local, d))]
    assert dirs == ["state-g2"]


def test_merge_sink_lifecycle_without_rename(spark, tmp_path, no_rename):
    """Full BucketedMergeSink flow — sequenced merges, process
    restart, replayed batch, tombstone expiry — with ``fsio.rename``
    stubbed to RAISE: the per-bucket manifest commit must never need a
    directory rename (the pre-r14 sink committed via dynamic partition
    overwrite — Spark's rename-based committer — the last component
    with the object-store rename seam)."""
    from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
    from bottledwater_pg_spark.operators.materialize import (
        compact,
        latest_by_key,
    )
    from bottledwater_pg_spark.operators.merge_sink import BucketedMergeSink

    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        b1 = events.filter(F.col("lsn") <= mid)
        b2 = events.filter(F.col("lsn") > mid)
        st = str(tmp_path / "st")
        sink = BucketedMergeSink(spark, st, n_buckets=8)
        sink.merge_batch(b1, 0)
        sink.merge_batch(b2, 1)
        # process restart resolves the standing state via the manifest
        sink2 = BucketedMergeSink(spark, st, n_buckets=8)
        before = sorted(map(tuple, sink2.state().collect()))
        sink2.merge_batch(b2, 1)  # foreachBatch replay: idempotent
        assert sorted(map(tuple, sink2.state().collect())) == before
        want = sorted(
            map(
                tuple,
                compact(events)
                .select("key", "op", "lsn", "new_row")
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                sink2.state().select("key", "op", "lsn", "new_row").collect(),
            )
        )
        assert got == want
        # expiry commits through the same pointer discipline
        cutoff = events.agg(F.max("lsn")).first()[0] + 1
        assert sink2.expire_tombstones(cutoff) > 0
        live = sorted(
            map(
                tuple,
                latest_by_key(events).select("key", "lsn").collect(),
            )
        )
        assert (
            sorted(map(tuple, sink2.state().select("key", "lsn").collect()))
            == live
        )
        assert no_rename == []  # never even attempted
    finally:
        events.unpersist()


def test_merge_sink_crash_before_flip_replays_clean(spark, tmp_path):
    """Crash AFTER the staged generation write but BEFORE the pointer
    flip: the manifest still maps every bucket to the old generation,
    the orphan is invisible, and the replayed batch overwrites it and
    commits — no duplicate or stale row."""
    from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
    from bottledwater_pg_spark.operators.materialize import compact
    from bottledwater_pg_spark.operators.merge_sink import BucketedMergeSink

    events = customer_cdc(spark, SF_DIR).cache()
    try:
        lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
        mid = (lo + hi) // 2
        b1 = events.filter(F.col("lsn") <= mid)
        b2 = events.filter(F.col("lsn") > mid)
        st = str(tmp_path / "st")
        sink = BucketedMergeSink(spark, st, n_buckets=8)
        sink.merge_batch(b1, 0)
        snap = sorted(map(tuple, sink.state().collect()))

        # stage batch 2's generation fully, "crash" before promote
        real_promote = sink._mstate.promote
        sink._mstate.promote = lambda staged, touched: None
        sink.merge_batch(b2, 1)
        sink._mstate.promote = real_promote
        orphan = [
            d for d in os.listdir(st) if d.startswith("state-g")
        ]
        # a fresh instance sees only the committed generation
        sink2 = BucketedMergeSink(spark, st, n_buckets=8)
        assert sorted(map(tuple, sink2.state().collect())) == snap
        sink2.merge_batch(b2, 1)  # the replay
        want = sorted(
            map(
                tuple,
                compact(events)
                .select("key", "op", "lsn", "new_row")
                .collect(),
            )
        )
        assert (
            sorted(
                map(
                    tuple,
                    sink2.state()
                    .select("key", "op", "lsn", "new_row")
                    .collect(),
                )
            )
            == want
        )
        # the orphan generation was overwritten or GC'd, not leaked
        live_dirs = set(sink2._mstate.dir_buckets())
        for d in os.listdir(st):
            if d.startswith("state-g"):
                assert d in live_dirs
        assert orphan  # the crash really staged something
    finally:
        events.unpersist()
