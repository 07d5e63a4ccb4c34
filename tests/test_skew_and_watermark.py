"""Skew helpers (exactness of the salted plans) and streaming
watermark/late-data semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.skew import (
    replicate_broadcast_join,
    salted_sum_count,
)
from bottledwater_pg_spark.session import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_sum_count(
        ev,
        ["event_type"],
        {"total": F.col("value").cast("decimal(18,2)"), "n": F.lit(1)},
        salt_buckets=8,
    ).toPandas().sort_values("event_type").reset_index(drop=True)
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.sum(F.lit(1)).alias("n"),
        )
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(salted[plain.columns.tolist()], plain)


def test_replicate_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = replicate_broadcast_join(orders, cust, "o_custkey", 8).count()
    assert salted == plain


def test_watermark_drops_late_events(spark):
    """Streaming windowed agg in append mode: an event arriving far
    behind the watermark is discarded; on-time events aggregate
    normally (the reference has no late-data story at all — this is
    Structured Streaming's)."""
    from bottledwater_pg_spark.streaming.stream import windowed_event_counts

    import datetime as dt

    def t(h, m, s=0):
        return dt.datetime(2024, 1, 1, h, m, s)

    rows_batch1 = [
        (1, t(10, 0, 10), 5, "click", 1.0, "{}"),
        (2, t(10, 20), 5, "click", 1.0, "{}"),
        (3, t(14, 0), 5, "click", 1.0, "{}"),  # advances watermark
    ]
    rows_batch2 = [
        # event time 10:30 << watermark (14:00 - 2h) -> must be dropped
        (4, t(10, 30), 5, "click", 1.0, "{}"),
        (5, t(15, 0), 5, "click", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        spark.createDataFrame(rows_batch1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("wmtest")
            .option("checkpointLocation", f"{tmp}/ck")
            .start()
        )
        q.processAllAvailable()
        spark.createDataFrame(rows_batch2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        q.stop()

        got = {
            (str(r["window_start"]), r["n_events"])
            for r in spark.sql("SELECT * FROM wmtest").collect()
        }
        # the 10:00 window must have exactly 2 events — the late
        # event_id=4 (10:30, behind the watermark) was dropped
        ten_oclock = [n for (w, n) in got if w.startswith("2024-01-01 10:00")]
        assert ten_oclock == [2], f"got emitted windows {got}"


def test_streaming_fraud_matches_batch_flags(spark):
    """The stateful deque scorer must flag exactly the events the
    batch window formulation flags (self-excluding trailing-10
    baseline, >= 5 observations, 3-sigma squared test)."""
    import tempfile

    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.queries import fraud_flag_events
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.streaming.queries import (
        streaming_fraud_anomalies,
    )

    ev = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .filter(F.col("user_id") < 80)
        .select("event_id", "user_id", "ts", "value")
    )
    expected = {
        r["event_id"]
        for r in fraud_flag_events(ev).filter(F.col("anom") == 1).collect()
    }
    assert expected, "fixture subset must contain at least one anomaly"

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events"
        # two chronological chunks -> at least two micro-batches, so
        # deque state genuinely carries across batch boundaries
        cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
        ev.filter(F.col("ts") <= cut).coalesce(1).write.parquet(src)
        ev.filter(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_fraud_anomalies(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("fraud_stream")
            .option("checkpointLocation", f"{tmp}/ck")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r["event_id"]
            for r in spark.sql("SELECT event_id FROM fraud_stream").collect()
        }
    assert got == expected


def test_streaming_fraud_multichunk_arrow_parity(spark):
    """A user's rows inside ONE micro-batch must score identically even
    when Arrow splits the group across many record batches and the
    rows arrive unsorted: the scorer concatenates all chunks before
    its single (ts, event_id) sort, and its decimal(18,4) moment
    arithmetic mirrors the batch window bit-for-bit — so borderline
    3-sigma events cannot flip between the two formulations."""
    import tempfile

    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.queries import fraud_flag_events
    from bottledwater_pg_spark.streaming.queries import (
        streaming_fraud_anomalies,
    )

    # deterministic synthetic stream: 3 users x 60 events, values with
    # 6 decimal digits (stresses the decimal quantization) and an
    # occasional spike whose deviation sits near the 3-sigma edge
    rows = []
    for u in range(3):
        for i in range(60):
            v = 100.0 + ((i * 7919 + u * 104729) % 1000) / 997.0
            if i % 17 == 0:
                v += 2.9 + (i % 5) * 0.05  # straddles the flag boundary
            ts = 1_700_000_000_000_000 + i * 1_000_000 + u
            rows.append((u, u * 1000 + i, ts, v))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double"
    ).select(
        "user_id", "event_id",
        F.timestamp_micros("ts").alias("ts"), "value",
    )
    expected = {
        r["event_id"]
        for r in fraud_flag_events(ev).filter(F.col("anom") == 1).collect()
    }
    assert expected, "synthetic stream must contain at least one anomaly"

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/events"
            # one file (one micro-batch), rows written in SHUFFLED
            # order so chunk-local sorting would interleave wrongly
            ev.orderBy(F.expr("hash(event_id)")).coalesce(1).write.parquet(src)
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = (
                streaming_fraud_anomalies(stream)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName("fraud_multichunk")
                .option("checkpointLocation", f"{tmp}/ck")
                .start()
            )
            q.processAllAvailable()
            got = {
                r["event_id"]
                for r in spark.sql(
                    "SELECT event_id FROM fraud_multichunk"
                ).collect()
            }
            q.stop()
        assert got == expected
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
