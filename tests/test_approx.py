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


def test_hll_sketch_accuracy_and_merge_invariance(spark, sf_dir):
    """HLL sketches: estimate within 5% of exact per group, and the
    union of per-day sketches must estimate the SAME value as one
    direct sketch over all rows (register max-merge invariance) — the
    property that lets 100 TB pipelines pre-aggregate sketches per
    partition and merge at read time."""
    from bottledwater_pg_spark.operators.queries import (
        hll_distinct_users_by_type,
    )
    from bottledwater_pg_spark.session import load_table

    out = hll_distinct_users_by_type(spark, sf_dir).toPandas()
    assert len(out) and (
        (out.approx_users - out.exact_users).abs() / out.exact_users < 0.05
    ).all()

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    direct = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .toPandas()
        .set_index("event_type")["est"]
    )
    merged = (
        ev.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .toPandas()
        .set_index("event_type")["est"]
    )
    for t in direct.index:
        assert abs(direct[t] - merged[t]) <= 1e-9 * max(1.0, direct[t])


def test_own_register_hll_harmonic_branch_cross_engine_and_merge(spark):
    """The own-register HLL (the hash-oracled estimator inside
    hll_distinct_users_by_type) on a 50k-cardinality synthetic — big
    enough that the HARMONIC branch fires (E > 2.5m), which the
    sf0.01/sf0.1 gates never reach (they sit in linear counting):
    (a) DuckDB replays the estimate bit-exactly, (b) the estimate is
    within 5% of truth (m=4096 → 1.6% standard error), and (c)
    max-merging per-shard register tables equals the whole-corpus
    registers — the 100 TB pre-aggregate-then-merge contract, now for
    OUR registers rather than DataSketches'."""
    import duckdb

    from bottledwater_pg_spark.operators.queries import (
        _HLL_M,
        _HLL_RMAX,
        HLL_OWN_SQL,
        hll_estimate_cols,
        hll_own_registers,
    )

    n = 50_000
    ev = spark.range(n).select(
        F.lit("t").alias("event_type"), F.col("id").alias("user_id")
    )
    regs = hll_own_registers(ev, ["event_type"], "user_id")
    est = (
        regs.groupBy("event_type")
        .agg(
            F.count("*").alias("_present"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - r)")
            ).alias("_s_present"),
        )
        .select(hll_estimate_cols("_present", "_s_present").alias("e"))
        .collect()[0]
        .e
    )
    assert est > 2.5 * _HLL_M  # proves the harmonic branch fired
    assert abs(est - n) / n < 0.05

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT 't' AS event_type, "
        f"range AS user_id FROM range({n})"
    )
    oracle = con.execute(HLL_OWN_SQL).fetchall()
    assert oracle == [("t", est, n)]

    # shard → max-merge invariance: registers of the union == merge of
    # per-shard registers under max(r) per (key, bkt)
    sharded = hll_own_registers(
        ev.withColumn("shard", F.col("user_id") % 7),
        ["event_type", "shard"],
        "user_id",
    )
    merged = (
        sharded.groupBy("event_type", "bkt").agg(F.max("r").alias("r"))
    )
    direct = regs.select("event_type", "bkt", "r")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_sketch_certification_companions_all_pass(spark, sf_dir):
    """The four driver-hashable accuracy certificates (LSH/IVF ANN
    recall, SimHash injected-pair recall, HLL error bound) must each
    report their property as holding — these are the queries that
    upgrade the rows-only sketch ops to hash-certified."""
    from bottledwater_pg_spark.operators.llm_queries import (
        ivf_ann_recall_vs_exact,
        lsh_ann_recall_vs_exact,
        simhash_injected_recall,
    )
    from bottledwater_pg_spark.operators.queries import (
        hll_error_bound_by_type,
    )

    for q, flag in (
        (lsh_ann_recall_vs_exact, "recall_ok"),
        (ivf_ann_recall_vs_exact, "recall_ok"),
        (simhash_injected_recall, "recall_ok"),
        (hll_error_bound_by_type, "within_bound"),
    ):
        rows = q(spark, sf_dir).collect()
        assert rows and all(r[flag] == 1 for r in rows), q.__name__


def test_bloom_screen_no_false_negatives_and_cms_bounds(spark, sf_dir):
    """The deterministic Bloom screen must flag every genuinely
    contaminated doc (no false negatives — structural) while letting
    a bounded set of deterministic false positives through; the CMS
    certificate's indicators must all hold."""
    from bottledwater_pg_spark.operators.llm_queries import (
        bloom_contamination_screen,
    )
    from bottledwater_pg_spark.operators.queries import (
        cms_heavy_users_certificate,
    )

    b = bloom_contamination_screen(spark, sf_dir).toPandas()
    assert len(b) and (b.no_false_negatives == 1).all()
    assert (b.n_flagged >= b.n_exact).all()
    # the injected contaminated docs (doc_id % 27 == 0, +600000) must
    # all be flagged with their full exact overlap
    injected = b[b.doc_id >= 600000]
    assert len(injected) and (injected.n_exact > 0).all()

    c = cms_heavy_users_certificate(spark, sf_dir).toPandas()
    assert len(c) == 10
    assert (c.overestimate_ok == 1).all() and (c.within_eps_ok == 1).all()


def test_bloom_dense_row_and_forall_probe_match_reference(spark):
    """The r14 single-pass probe internals: `_bloom_dense_row` must
    densify the sparse (word_idx, word) bitmap into ONE row whose
    array has exactly BLOOM_N_WORDS entries with zeros at the gaps,
    and `_bloom_flagged_grams` must flag exactly the grams whose k
    Kirsch-Mitzenmacher positions are all set — checked against an
    independent per-position reference computed in Python."""
    import hashlib

    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.llm_queries import (
        BLOOM_K,
        BLOOM_M_BITS,
        BLOOM_N_WORDS,
        _bloom_dense_row,
        _bloom_flagged_grams,
        _bloom_positions,
    )

    def ref_positions(gram: str) -> list[int]:
        h = hashlib.md5(gram.encode()).hexdigest()
        h1, h2 = int(h[0:15], 16), int(h[15:30], 16)
        return [(h1 + i * h2) % BLOOM_M_BITS for i in range(BLOOM_K)]

    members = [f"gram{i}" for i in range(40)]
    probes = members + [f"other{i}" for i in range(60)]
    bitmap = (
        spark.createDataFrame([(g,) for g in members], "gram string")
        .select(
            F.explode(F.array(*_bloom_positions("gram"))).alias("pos")
        )
        .groupBy((F.col("pos") / 63).cast("int").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
            ).alias("word")
        )
    )
    dense = _bloom_dense_row(bitmap).collect()
    assert len(dense) == 1 and len(dense[0]["bm"]) == BLOOM_N_WORDS
    words = dense[0]["bm"]
    sparse = {r["word_idx"]: r["word"] for r in bitmap.collect()}
    assert all(
        w == sparse.get(i, 0) for i, w in enumerate(words)
    )

    grams = spark.createDataFrame(
        [(i, g) for i, g in enumerate(probes)], "doc_id long, gram string"
    )
    got = sorted(
        r["gram"] for r in _bloom_flagged_grams(grams, bitmap).collect()
    )
    want = sorted(
        g for g in probes
        if all((words[p // 63] >> (p % 63)) & 1 for p in ref_positions(g))
    )
    assert got == want
    assert set(members) <= set(got)  # no false negatives


def test_approx_quantile_rank_certificate_holds(spark, sf_dir):
    from bottledwater_pg_spark.operators.queries import (
        approx_quantile_rank_certificate,
    )

    c = approx_quantile_rank_certificate(spark, sf_dir).toPandas()
    assert len(c) and (c.p50_rank_ok == 1).all() and (c.p95_rank_ok == 1).all()
