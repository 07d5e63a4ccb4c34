"""URI-state soak: the many-table routing soak and a tiered fold soak
with the engine state dirs addressed as ``file://`` URIs — every
listing/meta/slice op routed through fsio's Hadoop FileSystem branch
(one JVM round-trip per metadata op), the code path an HDFS/S3/GCS
deployment exercises. Reports the plain-vs-URI per-table / per-epoch
overhead in the SAME session so the comparison is host-matched.

    python scripts/uri_soak.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDTHS = (10, 50, 200, 500, 1000)
FOLD_EPOCHS, FOLD_EVERY, L1_MAX = 80, 20, 3


def many_table(spark, n_tables: int, uri: bool,
               touch_fraction: float = 1.0) -> float:
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.cdc_queries import CUSTOMER_SPEC
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import generate_cdc
    from bottledwater_pg_spark.streaming.stream import (
        MultiTableMaterializer,
        read_envelope_stream,
        write_envelope_stream,
    )

    cust = load_table(spark, SF_DIR, "customer")
    # touch_fraction < 1: events land in only the first k tables — the
    # realistic sparse-batch shape; the distinct-relid pass must keep
    # per-batch cost proportional to TOUCHED tables, not registered
    n_touch = max(1, int(n_tables * touch_fraction))
    stream = generate_cdc(
        cust, ["c_custkey"], F.col("c_custkey"), 0, "t", CUSTOMER_SPEC
    ).withColumn(
        "relid",
        (F.lit(20000) + F.pmod(F.xxhash64("key"), F.lit(n_touch)))
        .cast("long"),
    ).withColumn("topic", F.concat(F.lit("t"), (F.col("relid") - 20000)))
    tmp = tempfile.mkdtemp(prefix=f"uri_mt{n_tables}_")
    try:
        src = os.path.join(tmp, "events")
        write_envelope_stream(stream, src, num_files=2)
        state = os.path.join(tmp, "state")
        if uri:
            state = "file://" + state
        mat = MultiTableMaterializer(
            spark, state,
            {20000 + i: (f"t{i}", cust.schema) for i in range(n_tables)},
        )
        t0 = time.perf_counter()
        q = mat.start(read_envelope_stream(spark, src, 1),
                      os.path.join(tmp, "ckpt"))
        q.processAllAvailable()
        q.stop()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def fold_soak(spark, uri: bool) -> dict:
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.streaming.stream import (
        StreamingSourceQuotaIndex,
    )

    tmp = tempfile.mkdtemp(prefix="uri_fold_")
    state = os.path.join(tmp, "state")
    if uri:
        state = "file://" + state
    try:
        idx = StreamingSourceQuotaIndex(
            spark, state, cap=10**9,
            fold_every=FOLD_EVERY, l1_max=L1_MAX,
        )
        secs = []
        for e in range(FOLD_EPOCHS):
            b = spark.range(e * 30, (e + 1) * 30).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("src"), (F.col("id") % 10)).alias("source"),
                F.concat(F.lit("doc "), "id").alias("text"),
            )
            t0 = time.perf_counter()
            idx.process_batch(b, e)
            secs.append(time.perf_counter() - t0)
        half = len(secs) // 2
        p50 = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        return {
            "p50_first_half_sec": round(p50(secs[:half]), 3),
            "p50_second_half_sec": round(p50(secs[half:]), 3),
            "accepted": idx.accepted_ids().count(),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("uri_soak")
    spark.range(1).count()
    out: dict = {"many_table": {}, "fold": {}}
    for n in WIDTHS:
        plain = many_table(spark, n, uri=False)
        via_uri = many_table(spark, n, uri=True)
        cell = {
            "plain_sec": round(plain, 3),
            "uri_sec": round(via_uri, 3),
            "per_table_batch_plain": round(plain / (n * 2), 4),
            "per_table_batch_uri": round(via_uri / (n * 2), 4),
            "uri_overhead_ratio": round(via_uri / plain, 3),
        }
        out["many_table"][str(n)] = cell
        print(json.dumps({f"many_table_{n}": cell}), flush=True)
    out["many_table"]["flatness_uri_1000_vs_500"] = round(
        out["many_table"]["1000"]["per_table_batch_uri"]
        / out["many_table"]["500"]["per_table_batch_uri"], 3,
    )
    # sparse-touch cell: 1000 registered tables, 5% touched per batch —
    # wall must track the touched count (compare per-TOUCHED-table cost
    # with the dense 50-table cell, which commits the same ~50 states)
    sparse_plain = many_table(spark, 1000, uri=False, touch_fraction=0.05)
    sparse_uri = many_table(spark, 1000, uri=True, touch_fraction=0.05)
    out["many_table"]["sparse_1000x5pct"] = {
        "plain_sec": round(sparse_plain, 3),
        "uri_sec": round(sparse_uri, 3),
        "per_touched_table_batch_plain": round(sparse_plain / (50 * 2), 4),
        "per_touched_table_batch_uri": round(sparse_uri / (50 * 2), 4),
        "uri_overhead_ratio": round(sparse_uri / sparse_plain, 3),
    }
    print(json.dumps(
        {"many_table_sparse_1000x5pct": out["many_table"]["sparse_1000x5pct"]}
    ), flush=True)
    for label, uri in (("plain", False), ("uri", True)):
        out["fold"][label] = fold_soak(spark, uri)
        print(json.dumps({f"fold_{label}": out["fold"][label]}), flush=True)
    out["fold"]["uri_overhead_second_half"] = round(
        out["fold"]["uri"]["p50_second_half_sec"]
        / out["fold"]["plain"]["p50_second_half_sec"], 3,
    )
    print(json.dumps({"uri_soak": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
