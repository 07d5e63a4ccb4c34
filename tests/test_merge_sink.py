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


def _bucket_listing(state_path):
    out = {}
    for d in os.listdir(state_path):
        if d.startswith("bucket="):
            out[d] = sorted(
                f for f in os.listdir(os.path.join(state_path, d))
                if f.endswith(".parquet")
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
    state_path = sink._state_path()
    before = _bucket_listing(state_path)

    # a second batch touching exactly one key
    one = events.filter(F.col("key").isNotNull()).orderBy("lsn").limit(1)
    bumped = one.withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    touched_bucket = (
        sink._bucket(bumped).select("bucket").first()["bucket"]
    )
    sink.merge_batch(bumped)

    after = _bucket_listing(state_path)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed <= {f"bucket={touched_bucket}"}
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
    pruned = spark.read.parquet(sink._state_path()).filter(
        F.col("bucket").isin([3, 7])
    )
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
