"""Focused pins for the r14 optimization internals: the opt-in
read-side repartition gate, single-slice control frames, and the
single-pass (one-scan) CDC generator."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_load_table_parallel_gate_repartitions_undersplit(spark, sf_dir):
    """parallel=True round-robins an under-split (single-row-group)
    file to default parallelism; parallel=False (the default) leaves
    the scan partitioning alone; the byte floor keeps tiny tables out
    even when opted in."""
    from bottledwater_pg_spark import session as S

    par = spark.sparkContext.defaultParallelism
    plain = S.load_table(spark, sf_dir, "documents")
    assert plain.rdd.getNumPartitions() < par

    old_floor = S._SCAN_REPARTITION_MIN_BYTES
    try:
        S._SCAN_REPARTITION_MIN_BYTES = 1  # sf0.001/0.01 files are tiny
        opted = S.load_table(spark, sf_dir, "documents", parallel=True)
        assert opted.rdd.getNumPartitions() == par
        # results identical either way (order-insensitive contract)
        a = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
        b = sorted(r["doc_id"] for r in opted.select("doc_id").collect())
        assert a == b
        # byte floor: below it the opt-in is a no-op
        S._SCAN_REPARTITION_MIN_BYTES = 1 << 40
        floored = S.load_table(spark, sf_dir, "documents", parallel=True)
        assert floored.rdd.getNumPartitions() < par
    finally:
        S._SCAN_REPARTITION_MIN_BYTES = old_floor


def test_parallel_scan_noop_when_already_parallel(spark, sf_dir):
    from bottledwater_pg_spark.session import load_table, parallel_scan

    par = spark.sparkContext.defaultParallelism
    df = load_table(spark, sf_dir, "customer").repartition(par)
    assert parallel_scan(df).rdd.getNumPartitions() == par  # unchanged
    under = load_table(spark, sf_dir, "customer")
    assert parallel_scan(under).rdd.getNumPartitions() == par


def test_control_frames_are_single_partition(spark, sf_dir):
    """txn markers / schema announcements are a handful of driver-built
    rows; they must not fan 32 near-empty partitions into every union
    stage (and must NOT use coalesce(1), which blocks filter pushdown
    through the consuming union — pinned here only by partition
    count + plan shape of the consumer)."""
    from bottledwater_pg_spark.schema_tracker import table_schema_events
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import txn_markers

    assert txn_markers(spark, 16385, [0, 1]).rdd.getNumPartitions() == 1
    cust = load_table(spark, sf_dir, "customer")
    ctl = table_schema_events(cust, 16385, "customer", lsn=0)
    assert ctl.rdd.getNumPartitions() == 1
    # pushdown survival: a literal-op filter over ctl ∪ data stream
    # still constant-folds the data branches away (the collect in
    # ddl_registry_fold relies on it) — no Repartition node may sit
    # between the union and the frames
    from bottledwater_pg_spark.plans.inspect import formatted_plan

    probe = ctl.unionByName(
        cust.select(
            F.lit("insert").alias("op"),
            F.lit(16385).cast("long").alias("relid"),
            F.lit(0).cast("long").alias("xid"),
            F.col("c_custkey").cast("long").alias("lsn"),
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("old_row"),
            F.lit(None).cast("string").alias("new_row"),
            F.lit(None).cast("string").alias("schema_json"),
            F.lit("t").alias("topic"),
        )
    ).filter(F.col("op") == "table_schema")
    plan = formatted_plan(probe)
    assert "Scan parquet" not in plan  # data branch constant-folded away


def test_generate_cdc_is_single_pass_over_the_base_table(spark, sf_dir):
    """The r14 single-pass generator: snapshot + every mutation kind
    ride ONE per-row event array (one scan + one explode), not a union
    of per-event-kind filtered scans."""
    from bottledwater_pg_spark.operators.cdc_queries import CUSTOMER_SPEC
    from bottledwater_pg_spark.plans.inspect import formatted_plan
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import generate_cdc

    cust = load_table(spark, sf_dir, "customer")
    stream = generate_cdc(
        cust, ["c_custkey"], F.col("c_custkey"), 16385, "customer",
        CUSTOMER_SPEC,
    )
    import re

    plan = formatted_plan(stream)
    # tree nodes render as 'Scan parquet  (n)'; the details section
    # repeats them as '(n) Scan parquet' — count the tree only
    assert len(re.findall(r"Scan parquet\s+\(\d+\)", plan)) == 1, plan
    assert plan.count("Generate") >= 1
    # event multiset invariants (closed form from the mutation spec):
    # inserts = rows + moved, updates = rows%5 hits, deletes = moved +
    # (deleted & not moved)
    rows = cust.count()
    moved = cust.filter(F.col("c_custkey") % 11 == 0).count()
    upd = cust.filter(F.col("c_custkey") % 5 == 0).count()
    dele = cust.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 11 != 0)
    ).count()
    got = {
        r["op"]: r["n"]
        for r in stream.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    assert got["insert"] == rows + moved
    assert got["update"] == upd
    assert got["delete"] == dele + moved
