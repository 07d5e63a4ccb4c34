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
