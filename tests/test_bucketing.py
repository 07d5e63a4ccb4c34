"""Bucketed tables for co-located joins (SCALE.md): writing both fact
tables bucketed by the join key lets Spark sort-merge-join them with
ZERO exchanges — at 100 TB this turns the biggest shuffle in every
orders-lineitem query into a local merge. The reference's analog is
key-hash partitioning so consumers can join streams without resorting
(/root/reference/kafka/bottledwater.c:784-808, README.md:384-398).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    """Bucketed saveAsTable copies of orders/lineitem (16 buckets on
    the join key), registered in the session catalog."""
    for tbl, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        name = f"bkt_{tbl}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, sf_dir, tbl)
            .write.mode("overwrite")
            .bucketBy(16, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield spark
    for tbl in ["orders", "lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS bkt_{tbl}")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    orders = spark.table("bkt_orders")
    li = spark.table("bkt_lineitem")
    joined = li.join(
        orders.hint("merge"), li.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the join introduces no exchange; the only hash
    # exchange allowed is the post-join aggregation on the status key
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert all(e.startswith("o_orderstatus") for e in exchanges), exchanges


def test_bucketed_join_matches_unbucketed(warehouse, sf_dir):
    spark = warehouse
    got = (
        spark.table("bkt_lineitem")
        .join(
            spark.table("bkt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    exp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)


def test_zvalue_matches_hand_computed_morton(spark):
    """morton(3, 5) with 3 bits: x=011 at even positions, y=101 at odd
    -> bits 0,2 (x) + 1,5 (y) ... = 1+2+4+32 = 39."""
    from bottledwater_pg_spark.operators.layout import with_zvalue

    df = spark.createDataFrame([(3, 5), (0, 0), (7, 7)], "x long, y long")
    got = {
        (r.x, r.y): r.zval
        for r in with_zvalue(df, "x", "y", bits=3).collect()
    }
    assert got == {(3, 5): 39, (0, 0): 0, (7, 7): 63}


def test_zorder_repartition_bounds_both_dims(spark, sf_dir):
    """After zorder_repartition each partition must cover a DISJOINT
    z-range (range partitioning by zval), i.e. every file a ZORDER
    write produces is one contiguous Morton rectangle — the property
    that makes min/max stats selective on both columns."""
    from bottledwater_pg_spark.operators.layout import zorder_repartition

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = zorder_repartition(li, "l_partkey", "l_suppkey", 8)
    bounds = (
        z.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(bounds) > 1
    for prev, cur in zip(bounds, bounds[1:]):
        assert prev["hi"] <= cur["lo"]


def test_zvalue_negative_inputs_use_positive_modulus(spark):
    from bottledwater_pg_spark.operators.layout import with_zvalue

    df = spark.createDataFrame([(-1, 0), (-8, -8)], "x long, y long")
    got = {
        (r.x, r.y): r.zval
        for r in with_zvalue(df, "x", "y", bits=3).collect()
    }
    # -1 % 8 -> 7 (not -1): x=111 at even bits = 1+4+16 = 21
    assert got[(-1, 0)] == 21
    # -8 % 8 -> 0 both dims
    assert got[(-8, -8)] == 0
