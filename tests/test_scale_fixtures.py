"""Invariants of the synthetic scale-up fixtures (scale_fixtures.py):
replication must multiply rows exactly, keep every join replica-local,
and keep replica documents textually disjoint — the properties that
make a x10 soak behave like 10 independent shards instead of a
quadratic cross-replica near-dup explosion."""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.scale_fixtures import (
    KEY_OFFSET,
    replicated_table,
)
from bottledwater_pg_spark.session import load_table


def test_replication_multiplies_rows_and_offsets_keys(spark, sf_dir):
    base = load_table(spark, sf_dir, "customer")
    rep = replicated_table(spark, sf_dir, "customer", 3)
    assert rep.count() == 3 * base.count()
    assert rep.schema == base.schema
    # replica key spaces are disjoint bands
    bands = (
        rep.select((F.col("c_custkey") / KEY_OFFSET).cast("int").alias("b"))
        .distinct()
        .collect()
    )
    assert sorted(r["b"] for r in bands) == [0, 1, 2]
    # no key collides across replicas
    assert rep.select("c_custkey").distinct().count() == rep.count()


def test_replication_keeps_joins_replica_local(spark, sf_dir):
    orders = replicated_table(spark, sf_dir, "orders", 2)
    cust = replicated_table(spark, sf_dir, "customer", 2)
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        (F.col("o_orderkey") / KEY_OFFSET).cast("int").alias("ob"),
        (F.col("c_custkey") / KEY_OFFSET).cast("int").alias("cb"),
    )
    # every joined pair sits inside one replica band
    assert j.filter(F.col("ob") != F.col("cb")).count() == 0
    # and the x2 join is exactly two copies of the x1 join
    base_j = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert j.count() == 2 * base_j


def test_replica_documents_share_no_tokens(spark, sf_dir):
    from bottledwater_pg_spark.functions.text import tokens

    rep = replicated_table(spark, sf_dir, "documents", 2)
    toks = rep.select(
        (F.col("doc_id") / KEY_OFFSET).cast("int").alias("b"),
        F.explode(tokens("text")).alias("tok"),
    )
    t0 = toks.filter(F.col("b") == 0).select("tok").distinct()
    t1 = toks.filter(F.col("b") == 1).select("tok").distinct()
    # token prefixing makes replica vocabularies fully disjoint, so
    # no dedup modality (shingles, SimHash tokens, char k-grams over
    # prefixed tokens) can produce a cross-replica pair
    assert t1.join(t0, "tok").count() == 0
    # replica 0 is the raw table, bit-for-bit
    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rep0 = rep.filter(F.col("doc_id") < KEY_OFFSET).select("doc_id", "text")
    assert rep0.exceptAll(raw).count() == 0 and raw.exceptAll(rep0).count() == 0


def test_stitched_replicas_give_connected_budgeted_graph(
    spark, sf_dir, tmp_path
):
    """The xN lineitem fixture stitches adjacent replicas through
    deterministic supplier ring-communities (scale_fixtures.py), so
    the BUDGETED co-occurrence graph the triangle/k-core soak analyzes
    is structurally meaningful at scale, not N disjoint thinned
    copies: the 6-core is non-empty and spans multiple replica key
    bands, cross-replica edges survive the top-5000 budget, and the
    global triangle count grows over x1."""
    from bottledwater_pg_spark.operators.graph import kcore_members
    from bottledwater_pg_spark.operators.queries import (
        KCORE_K,
        KCORE_MAX_ROUNDS,
        _strongest_tie_pairs,
        supplier_triangle_counts,
    )
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.session import release_persisted

    d3 = build_scaled_dir(spark, sf_dir, str(tmp_path / "x3"), 3)
    pairs = _strongest_tie_pairs(spark, d3)
    band = lambda c: (F.col(c) / KEY_OFFSET).cast("int")  # noqa: E731
    assert pairs.filter(band("a") != band("b")).count() > 0

    core = kcore_members(pairs, k=KCORE_K, max_rounds=KCORE_MAX_ROUNDS)
    core_bands = {r["b"] for r in core.select(
        band("node").alias("b")).distinct().collect()}
    assert len(core_bands) >= 2, f"6-core stuck in bands {core_bands}"
    release_persisted()

    tri_x1 = supplier_triangle_counts(spark, sf_dir).collect()
    release_persisted()
    tri_x3 = supplier_triangle_counts(spark, d3).collect()
    release_persisted()
    assert tri_x3[0]["total_triangles"] > tri_x1[0]["total_triangles"]
