"""Semantics pins for corpus split/sample/pack (operators/sampling.py):
determinism, exactness, and the packing offset rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.sampling import (
    hash_split,
    sequence_pack,
    stratified_sample,
)
from bottledwater_pg_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hash_split_is_deterministic_and_total(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs, "doc_id").select("doc_id", "split")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    counts = dict(a.groupBy("split").count().collect())
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # 12/2/2 nibbles: train ~75%, generous tolerance for a small corpus
    assert 0.6 < counts["train"] / n < 0.9


def test_hash_split_salt_changes_assignment(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = hash_split(docs, "doc_id", salt="v1").select("doc_id", "split")
    b = hash_split(docs, "doc_id", salt="v2").select("doc_id", "split")
    assert a.subtract(b).count() > 0  # re-salt actually re-splits


def test_stratified_sample_exact_n_and_stable(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    s = stratified_sample(docs, "source", "doc_id", 5)
    per = dict(s.groupBy("source").count().collect())
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources and all(v == 5 for v in per.values())
    s2 = stratified_sample(docs, "source", "doc_id", 5)
    assert s.select("doc_id").subtract(s2.select("doc_id")).count() == 0


def test_sequence_pack_offsets_are_exclusive_prefix_sums(spark):
    rows = [("s", i, 100) for i in range(1, 6)] + [("t", 1, 50)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    packed = sequence_pack(df, "source", "doc_id", "n_chars", 250)
    got = {
        (r["source"], r["doc_id"]): (r["pack_offset"], r["bin"])
        for r in packed.collect()
    }
    # offsets 0,100,200,300,400 -> bins 0,0,0,1,1 (doc 3 straddles the
    # 250 cut but belongs to the bin its first unit lands in)
    assert got == {
        ("s", 1): (0, 0),
        ("s", 2): (100, 0),
        ("s", 3): (200, 0),
        ("s", 4): (300, 1),
        ("s", 5): (400, 1),
        ("t", 1): (0, 0),
    }


def test_sequence_pack_bins_monotone_in_doc_order(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    packed = sequence_pack(docs, "source", "doc_id", "n_chars", 4096)
    # within a source, bin must be non-decreasing in doc_id order
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    bad = packed.withColumn("prev_bin", F.lag("bin").over(w)).filter(
        F.col("prev_bin").isNotNull() & (F.col("bin") < F.col("prev_bin"))
    )
    assert bad.count() == 0


def test_negative_sampling_deterministic_self_free_and_salted(spark):
    from bottledwater_pg_spark.operators.sampling import negative_sample_pairs

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    p1 = negative_sample_pairs(docs, "doc_id", k=3).collect()
    p2 = negative_sample_pairs(docs, "doc_id", k=3).collect()
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))  # bit-stable
    assert all(r["id"] != r["neg_id"] for r in p1)
    per_doc = {}
    for r in p1:
        per_doc.setdefault(r["id"], set()).add(r["j"])
    assert all(js <= {1, 2, 3} for js in per_doc.values())
    # a different salt redraws the pairing
    p3 = negative_sample_pairs(docs, "doc_id", k=3, salt="v2").collect()
    assert sorted(map(tuple, p1)) != sorted(map(tuple, p3))


def test_global_shuffle_index_is_dense_permutation(spark):
    from bottledwater_pg_spark.operators.sampling import global_shuffle_index

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    out = global_shuffle_index(docs, "doc_id")
    rows = out.select("pos").collect()
    assert sorted(r["pos"] for r in rows) == list(range(n))  # dense 0..n-1
    # deterministic across runs
    again = global_shuffle_index(docs, "doc_id").select("doc_id", "pos")
    assert out.select("doc_id", "pos").subtract(again).count() == 0


def test_global_shuffle_index_salt_reshuffles(spark):
    from bottledwater_pg_spark.operators.sampling import global_shuffle_index

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = global_shuffle_index(docs, "doc_id", salt="v1").select("doc_id", "pos")
    b = global_shuffle_index(docs, "doc_id", salt="v2").select("doc_id", "pos")
    assert a.subtract(b).count() > 0


def test_budget_mix_exclusive_cut_and_determinism(spark):
    from bottledwater_pg_spark.operators.sampling import budget_mix

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = budget_mix(docs, "source", "doc_id", "n_chars", 5000)
    per = kept.groupBy("source").agg(
        F.sum("n_chars").alias("chars"), F.count("*").alias("n")
    )
    for r in per.collect():
        # exclusive cut: strictly fewer than budget chars taken BEFORE
        # the last kept doc, so total is < budget + max doc size, and
        # dropping the largest doc goes under budget
        assert r["chars"] >= 5000 or r["n"] == docs.filter(
            F.col("source") == r["source"]
        ).count()  # source exhausted below budget
    again = budget_mix(docs, "source", "doc_id", "n_chars", 5000)
    assert kept.subtract(again).count() == 0 and again.subtract(kept).count() == 0
    # salt redraws the selection
    resalted = budget_mix(docs, "source", "doc_id", "n_chars", 5000, salt="v2")
    assert kept.subtract(resalted).count() > 0


def test_weighted_systematic_sample_properties(spark, sf_dir):
    """Kept count ~ n_samples; every kept row spans a stride boundary;
    selection is salt-sensitive but deterministic per salt; a heavy
    row is proportionally more likely kept than a light one (checked
    structurally: total kept weight >= kept_count * E[weight])."""
    from bottledwater_pg_spark.operators.sampling import (
        weighted_systematic_sample,
    )
    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    n = 20
    stride = max(1, total // n)
    s1 = weighted_systematic_sample(docs, "doc_id", "n_chars", n).toPandas()
    # boundary property, exact
    assert ((s1.cum_before // stride)
            < ((s1.cum_before + s1.n_chars) // stride)).all()
    assert n <= len(s1) <= n + 1 + total // stride - n  # floor(total/stride) bounds
    # deterministic: second run identical
    s2 = weighted_systematic_sample(docs, "doc_id", "n_chars", n).toPandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)
    # re-salt redraws
    s3 = weighted_systematic_sample(
        docs, "doc_id", "n_chars", n, salt="v2"
    ).toPandas()
    assert sorted(s1.doc_id) != sorted(s3.doc_id)
    # weighted: mean sampled length exceeds corpus mean length
    # (length-proportional inclusion biases toward long docs)
    corpus_mean = total / docs.count()
    assert s1.n_chars.mean() > corpus_mean


def test_unimax_waterfill_hand_fixture(spark):
    """Hand-checkable UniMax: sizes {a:10, b:10, c:100}, cap 2 epochs,
    budget 60. Capacities 20/20/200; a and b cap at 2 epochs (20
    each), c water-fills the residual 20 (0.2 epochs) — far below its
    own 200 capacity. Allocations sum exactly to the budget."""
    from bottledwater_pg_spark.operators.sampling import (
        unimax_allocations,
    )

    sizes = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 100)], "lang string, n_tokens long"
    )
    got = {r.lang: r for r in
           unimax_allocations(sizes, 60, 2).collect()}
    assert (got["a"].capped, got["a"].allocation,
            got["a"].epochs_bp) == (1, 20, 20000)
    assert (got["b"].capped, got["b"].allocation,
            got["b"].epochs_bp) == (1, 20, 20000)
    assert (got["c"].capped, got["c"].allocation,
            got["c"].epochs_bp) == (0, 20, 2000)
    assert sum(r.allocation for r in got.values()) == 60


def test_unimax_all_capped_when_budget_exceeds_capacity(spark):
    """budget >= total capacity: every stratum caps at epoch_cap and
    the leftover budget is deliberately unallocated (the paper's cap
    is a hard bound, not a target)."""
    from bottledwater_pg_spark.operators.sampling import (
        unimax_allocations,
    )

    sizes = spark.createDataFrame(
        [("a", 5), ("b", 50)], "lang string, n_tokens long"
    )
    got = {r.lang: r for r in
           unimax_allocations(sizes, 1000, 3).collect()}
    assert all(r.capped == 1 for r in got.values())
    assert got["a"].allocation == 15 and got["b"].allocation == 150
