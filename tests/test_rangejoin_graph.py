"""Semantics pins for the bucketed interval join and connected
components (beyond the driver-gate oracle match): boundary rules,
single-match guarantee across bucket spans, chain convergence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.graph import connected_components
from bottledwater_pg_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_interval_join_half_open_and_multi_bucket(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: in
            (2, _ts("2024-01-01 03:59:59")),  # inside, 4th bucket
            (3, _ts("2024-01-01 04:00:00")),  # == end: out
            (4, _ts("2023-12-31 23:59:59")),  # before: out
        ],
        "event_id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 04:00:00"))],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    # 1-hour buckets: the window spans 4 buckets, yet each point must
    # match exactly once
    got = interval_join(points, windows, "ts", "w_start", "w_end", 3600)
    rows = sorted(r["event_id"] for r in got.collect())
    assert rows == [1, 2]


def test_interval_join_inverted_and_empty_windows_match_nothing(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"))], "event_id long, ts timestamp"
    )
    windows = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 00:00:00")),
            (11, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:00:00")),
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    assert interval_join(points, windows, "ts", "w_start", "w_end", 60).count() == 0


def test_connected_components_chain_and_separate(spark):
    # chain 1-2-3-4 (diameter 3 -> needs >1 round) plus pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    comp = connected_components(edges)
    assert comp.select(F.countDistinct("comp")).first()[0] == 1
    assert {r["comp"] for r in comp.collect()} == {0}


def test_star_cc_matches_propagation_on_chain_pair_and_random(spark):
    from bottledwater_pg_spark.operators.graph import connected_components_star

    # adversarial long chain (diameter 29) + separate pair + singleton-free
    edges = [(i, i + 1) for i in range(30)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    comp = {r["id"]: r["comp"] for r in connected_components_star(df).collect()}
    assert all(comp[i] == 0 for i in range(31))
    assert comp[100] == comp[101] == 100

    # deterministic pseudo-random graph: star output == propagation output
    import random

    rng = random.Random(7)
    redges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    rdf = spark.createDataFrame(redges, "src long, dst long").filter(
        "src <> dst"
    )
    star = {
        r["id"]: r["comp"] for r in connected_components_star(rdf).collect()
    }
    prop = {r["id"]: r["comp"] for r in connected_components(rdf).collect()}
    assert star == prop


def test_star_cc_round_count_logarithmic_on_chain(spark):
    """A 64-node path must converge well under the 50-round cap —
    star halving needs ~log2(64)+const rounds, propagation would need
    63; max_iters=8 bounds the round count observably."""
    from bottledwater_pg_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    comp = connected_components_star(df, max_iters=10)
    assert {r["comp"] for r in comp.collect()} == {0}


def test_propagation_cc_raises_rather_than_returning_partial_labels(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=3)


def test_pagerank_integer_hand_computed_path_graph(spark):
    """3-node path a-b-c (bidirectional), scale=100, one iteration,
    hand-computed: contrib a->b=100, b->{a,c}=50 each, c->b=100;
    r1 = base 15 + 85%*in_sum with floor division at each step."""
    from bottledwater_pg_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    r1 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iters=1, scale=100).collect()
    }
    assert r1 == {1: 57, 2: 185, 3: 57}
    # two iterations: contribs 57//1=57, 185//2=92, 57//1=57
    # in: a=92, b=114, c=92 -> a=c=15+78=93, b=15+96=111
    r2 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iters=2, scale=100).collect()
    }
    assert r2 == {1: 93, 2: 111, 3: 93}


def test_triangle_counts_hand_graph(spark):
    """Triangle semantics pinned: K4 has C(4,3)=4 triangles, every
    vertex in 3; adding a pendant vertex changes nothing; a square
    (4-cycle) has none; each triangle counted once (sum = 3x count)."""
    from bottledwater_pg_spark.operators.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "a long, b long")
        ).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant 5 absent
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert (
        triangle_counts(
            spark.createDataFrame(square, "a long, b long")
        ).count()
        == 0
    )


def test_kcore_hand_graph(spark):
    """K-core semantics pinned: K4 plus a pendant chain — the 3-core
    is exactly the K4 (each with in-core degree 3); a 2-core keeps the
    triangle-of-triangles cycle; k above the max degree empties."""
    import pytest

    from bottledwater_pg_spark.operators.graph import kcore_members

    # K4 (1-4) with a tail 4-5-6
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    core3 = {
        r["node"]: r["core_deg"] for r in kcore_members(df, k=3).collect()
    }
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=1 keeps everyone (degrees measured within the survivors)
    assert kcore_members(df, k=1).count() == 6
    # k beyond max degree -> empty fixpoint
    assert kcore_members(df, k=7).count() == 0
    # non-convergence within max_rounds refuses loudly: a long chain
    # peels one END PAIR per round under k=2
    chain = [(i, i + 1) for i in range(1, 12)]
    cdf = spark.createDataFrame(chain, "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        kcore_members(cdf, k=2, max_rounds=2)
