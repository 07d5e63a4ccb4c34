"""BucketedMergeSink: sequenced batch merges must equal one-shot
materialization; replays must be no-ops; untouched buckets must not be
rewritten (the property that makes the sink O(batch), not O(state))."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
from bottledwater_pg_spark.operators.materialize import latest_by_key
from bottledwater_pg_spark.operators.merge_sink import BucketedMergeSink
from bottledwater_pg_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def _lsn_batches(events, n=3):
    lo, hi = events.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // n + 1
    return [
        events.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        for i in range(n)
    ]


def _bucket_listing(sink):
    """bucket -> (generation dir, parquet files) from the live
    manifest — the physical identity of each bucket's current state."""
    out = {}
    for d, bs in sink._mstate.dir_buckets().items():
        for b in bs:
            p = os.path.join(sink.state_dir, d, f"bucket={b}")
            out[b] = (
                d,
                sorted(f for f in os.listdir(p) if f.endswith(".parquet")),
            )
    return out


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sequenced_merges_equal_one_shot(spark, tmp_path):
    events = customer_cdc(spark, SF_DIR).cache()
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    for b in _lsn_batches(events):
        sink.merge_batch(b)
    expected = latest_by_key(events).select("key", "op", "lsn", "new_row")
    got = sink.state()
    from bottledwater_pg_spark.operators.materialize import drop_tombstones

    assert _rows(drop_tombstones(got).select("key", "op", "lsn", "new_row")) == _rows(
        expected
    )
    # typed decode round-trips
    schema = load_table(spark, SF_DIR, "customer").schema
    assert sink.current_rows(schema).count() == expected.count()
    events.unpersist()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    events = customer_cdc(spark, SF_DIR).cache()
    batches = _lsn_batches(events)
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    for b in batches:
        sink.merge_batch(b)
    before = _rows(sink.state())
    sink.merge_batch(batches[-1])  # foreachBatch replay after "crash"
    assert _rows(sink.state()) == before
    events.unpersist()


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    events = customer_cdc(spark, SF_DIR).cache()
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    sink.merge_batch(events)  # full load
    before = _bucket_listing(sink)

    # a second batch touching exactly one key
    one = events.filter(F.col("key").isNotNull()).orderBy("lsn").limit(1)
    bumped = one.withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    touched_bucket = (
        sink._bucket(bumped).select("bucket").first()["bucket"]
    )
    sink.merge_batch(bumped)

    after = _bucket_listing(sink)
    changed = {b for b in before if before[b] != after.get(b)}
    assert changed <= {touched_bucket}
    # and the touched bucket actually took the new event
    winner = sink.state().filter(
        F.col("key") == one.first()["key"]
    ).first()
    assert winner["lsn"] == one.first()["lsn"] + 10_000_000
    events.unpersist()


def test_streaming_merge_sink_matches_batch(spark, tmp_path):
    """Drive the sink from a file-replayed envelope stream (1 file per
    trigger => multiple micro-batches) and compare against one-shot
    batch materialization."""
    from bottledwater_pg_spark.streaming.stream import (
        read_envelope_stream,
        write_envelope_stream,
    )

    events = customer_cdc(spark, SF_DIR)
    src = str(tmp_path / "src")
    write_envelope_stream(events, src, num_files=4)
    stream = read_envelope_stream(spark, src, files_per_trigger=1)
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    q = sink.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    schema = load_table(spark, SF_DIR, "customer").schema
    got = _rows(sink.current_rows(schema))
    from bottledwater_pg_spark.operators.materialize import materialize

    assert got == _rows(materialize(events, schema))


def test_state_read_partition_prunes_on_bucket(spark, tmp_path):
    """The O(batch) claim rests on the state read PRUNING untouched
    bucket partitions — assert the scan's partition filters carry the
    bucket predicate, so unread buckets never hit the IO layer."""
    from bottledwater_pg_spark.plans.inspect import formatted_plan

    events = customer_cdc(spark, SF_DIR)
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    sink.merge_batch(events)
    pruned = sink.state().filter(F.col("bucket").isin([3, 7]))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:120]
    # and the pruned read returns only those buckets' keys
    assert set(
        r["bucket"] for r in pruned.select("bucket").distinct().collect()
    ) <= {3, 7}


def test_expire_tombstones_drops_only_expired(spark, tmp_path):
    events = customer_cdc(spark, SF_DIR)
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    sink.merge_batch(events)
    state = sink.state()
    n_tomb = state.filter(F.col("op") == "delete").count()
    n_live = state.filter(F.col("op") != "delete").count()
    assert n_tomb > 0
    cutoff = state.agg(F.max("lsn")).first()[0] + 1
    rewritten = sink.expire_tombstones(cutoff)
    assert rewritten > 0
    after = sink.state()
    assert after.filter(F.col("op") == "delete").count() == 0
    assert after.filter(F.col("op") != "delete").count() == n_live
    # a second expiry pass is a no-op
    assert sink.expire_tombstones(cutoff) == 0


def _legacy_write(spark, sink_cls, events, path, n_buckets):
    """Forge a pre-r14 layout: dynamic-partition-overwrite state dir
    (bucket= children + root _SUCCESS), no manifest."""
    from bottledwater_pg_spark.operators.materialize import compact

    tmp_sink = sink_cls(spark, str(path) + ".scratch", n_buckets=n_buckets)
    bucketed = tmp_sink._bucket(compact(events)).select(
        "key", "op", "lsn", "new_row", "bucket"
    )
    (
        bucketed.repartition(n_buckets, "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(os.path.join(str(path), "state"))
    )


def test_legacy_layout_adopted_then_superseded(spark, tmp_path):
    """A pre-r14 dynamic-overwrite state dir is adopted as generation
    0 through the manifest, reads identically, and is superseded
    partition-by-partition (GC'd once no bucket references it)."""
    events = customer_cdc(spark, SF_DIR).cache()
    st = tmp_path / "st"
    os.makedirs(st)
    _legacy_write(spark, BucketedMergeSink, events, st, 8)
    from bottledwater_pg_spark.operators.materialize import compact

    sink = BucketedMergeSink(spark, str(st), n_buckets=8)
    assert _rows(sink.state().select("key", "lsn")) == _rows(
        compact(events).select("key", "lsn")
    )
    assert os.path.exists(st / "state_manifest.json")
    # merging every bucket again supersedes the whole legacy dir
    bumped = events.withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    sink.merge_batch(bumped)
    assert not os.path.isdir(st / "state")  # GC'd away
    assert sink.state().agg(F.min("lsn")).first()[0] > 10_000_000
    events.unpersist()


def test_legacy_parts_without_success_refused(spark, tmp_path):
    """A legacy dir holding bucket partitions but no root _SUCCESS is
    a crashed write's partial output — adoption must refuse loudly,
    not trust it as the current state."""
    import pytest

    from bottledwater_pg_spark.streaming.statecommit import (
        StateCorruptionError,
    )

    events = customer_cdc(spark, SF_DIR)
    st = tmp_path / "st"
    os.makedirs(st)
    _legacy_write(spark, BucketedMergeSink, events, st, 8)
    os.remove(st / "state" / "_SUCCESS")
    sink = BucketedMergeSink(spark, str(st), n_buckets=8)
    with pytest.raises(StateCorruptionError, match="_SUCCESS"):
        sink.state()


def test_n_buckets_gate_refuses_mismatch(spark, tmp_path):
    """n_buckets is persisted in the manifest; a reopen under a
    different N is refused (bucket assignment is hashed at write time,
    so a changed N would misroute every merge)."""
    import pytest

    events = customer_cdc(spark, SF_DIR)
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    sink.merge_batch(events)
    other = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        other.state()


def test_expiry_can_empty_a_bucket(spark, tmp_path):
    """A bucket whose every row is an expired tombstone disappears
    from the manifest entirely — the dynamic-overwrite sink could not
    physically empty a partition (a write with no rows for it left the
    old files in place)."""
    from pyspark.sql import Row

    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=4)
    # craft one bucket that holds ONLY tombstones
    rows = [
        Row(key=f'{{"k":{i}}}', op="delete", lsn=i + 1, new_row=None)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "key string, op string, lsn long, new_row string")
    sink.merge_batch(df)
    assert len(sink._mstate.bucket_map()) > 0
    n = sink.expire_tombstones(10_000)
    assert n > 0
    assert sink.state() is None  # every bucket emptied and unmapped
    assert sink._mstate.bucket_map() == {}


def test_compact_state_bounds_generation_count(spark, tmp_path):
    """Many partial-touch merges accumulate generation dirs; the
    maintenance compaction squashes every live bucket into ONE
    generation without changing the state."""
    events = customer_cdc(spark, SF_DIR).cache()
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=16)
    batches = _lsn_batches(events, n=5)
    for b in batches:
        sink.merge_batch(b)
    before = _rows(sink.state())
    assert len(sink._mstate.dir_buckets()) > 1
    assert sink.compact_state() == len(sink._mstate.bucket_map())
    assert len(sink._mstate.dir_buckets()) == 1
    assert _rows(sink.state()) == before
    # on-disk: exactly one generation dir remains
    gens = [
        d for d in os.listdir(tmp_path / "st") if d.startswith("state-g")
    ]
    assert len(gens) == 1
    events.unpersist()


def test_multi_event_keys_and_replay_ties_in_one_batch(spark, tmp_path):
    """r15 pins the single-pass merge internals: merge_batch now
    unions RAW batch events into the (bucket, key) merge aggregation
    (no pre-compaction pass), so a batch where one key carries several
    events — including an exact duplicate of the winning event, the
    foreachBatch replay shape — must still leave exactly the
    latest-by-lsn row per key, and a later batch must still lose to
    (or tie exactly with) what the state holds."""
    sink = BucketedMergeSink(spark, str(tmp_path / "st"), n_buckets=4)
    b1 = spark.createDataFrame(
        [
            ("k1", "insert", 10, "v1"),
            ("k1", "update", 20, "v2"),
            ("k1", "update", 20, "v2"),  # exact in-batch replay tie
            ("k2", "insert", 11, "w1"),
            ("k2", "delete", 15, None),
            ("k3", "insert", 12, "x1"),
        ],
        "key string, op string, lsn long, new_row string",
    )
    sink.merge_batch(b1)
    state = {r["key"]: (r["op"], r["lsn"], r["new_row"])
             for r in sink.state().collect()}
    assert state == {
        "k1": ("update", 20, "v2"),
        "k2": ("delete", 15, None),   # tombstone kept in state
        "k3": ("insert", 12, "x1"),
    }
    # second batch: an OLD replayed event must lose to the state row,
    # a newer one must win
    b2 = spark.createDataFrame(
        [
            ("k1", "insert", 10, "v1"),   # stale replay: loses
            ("k3", "update", 30, "x2"),   # newer: wins
        ],
        "key string, op string, lsn long, new_row string",
    )
    sink.merge_batch(b2)
    state = {r["key"]: (r["op"], r["lsn"], r["new_row"])
             for r in sink.state().collect()}
    assert state == {
        "k1": ("update", 20, "v2"),
        "k2": ("delete", 15, None),
        "k3": ("update", 30, "x2"),
    }
