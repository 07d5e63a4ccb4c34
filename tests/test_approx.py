"""Approximate aggregates (SURVEY §2.2 lists approx_count_distinct as
part of the consumer-side aggregation surface). HLL sketches are
engine-specific, so there is no cross-engine oracle — the contract is
bounded relative error against the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    # 0.02 rsd -> generous 5-sigma-ish bound; the point is the sketch
    # path works over the engine's tables, not its exact statistics
    assert abs(approx - exact) / exact < 0.1


def test_approx_percentiles_ordered(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    p25, p50, p95 = orders.select(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.95], 10000).alias("p")
    ).collect()[0]["p"]
    mn, mx = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    assert mn <= p25 <= p50 <= p95 <= mx
