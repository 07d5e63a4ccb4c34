"""Tiered (O(delta)) slice compaction: minor folds write only the
epochs-since-last-fold into ``run=__l1__`` delta runs (never touching
the base), and one major fold per ``l1_max`` minors merges L1 into the
base — the LSM / Kafka-segment discipline (reference analog: broker
log compaction rewrites dirty segments, not clean ones,
README.md:283-297). Pins: accepted-set parity with the unfolded and
one-tier twins, the per-minor-fold write being delta-sized (the whole
point), major-fold trigger + cleanup, crash/replay windows, and the
probe reading the tiers transparently."""

import os

from pyspark.sql import functions as F

from bottledwater_pg_spark.streaming.stream import (
    BASE_RUN_KEY,
    L1_RUN_KEY,
    StreamingDedupIndex,
)


def _accepted(idx):
    return {r.doc_id for r in idx.accepted_ids().collect()}


def _batches(corpus, bounds):
    return [
        corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in bounds
    ]


def _corpus(spark, sf_dir):
    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_near_dups,
    )

    return docs_with_near_dups(spark, sf_dir)


def test_tiered_fold_accepted_set_parity(spark, sf_dir, tmp_path):
    """Tiered folds every epoch (minor each batch, major after
    l1_max=2) decide identically to the unfolded twin and the
    one-tier folded twin — fold topology never changes an
    accept/reject decision."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(
        corpus, [(0, 90), (90, 180), (180, 300), (300, 10**9)]
    )
    tiered = StreamingDedupIndex(
        spark, str(tmp_path / "t"), threshold=0.8,
        fold_every=1, l1_max=2,
    )
    onetier = StreamingDedupIndex(
        spark, str(tmp_path / "o"), threshold=0.8, fold_every=1
    )
    plain = StreamingDedupIndex(spark, str(tmp_path / "p"), threshold=0.8)
    for e, b in enumerate(batches):
        tiered.process_batch(b, e)
        onetier.process_batch(b, e)
        plain.process_batch(b, e)
    want = _accepted(plain)
    assert _accepted(onetier) == want
    assert _accepted(tiered) == want

    # replay (same epoch) and fresh-epoch re-delivery over the tiers
    tiered.process_batch(batches[3], 3)
    assert _accepted(tiered) == want
    tiered.process_batch(batches[1], 99)
    assert _accepted(tiered) == want

    # a restart over the tiered layout sees the standing index and
    # keeps deciding identically
    idx2 = StreamingDedupIndex(spark, str(tmp_path / "t"), threshold=0.8)
    assert idx2._have_index
    assert _accepted(idx2) == want


def test_tiered_minor_fold_is_delta_sized(spark, sf_dir, tmp_path):
    """The write-amplification pin: each minor fold's L1 slice holds
    ONLY the rows of the epochs folded since the last fold — its row
    count must track the delta, not the standing state. (The one-tier
    fold would rewrite the whole corpus each time; the final L1 slice
    here must stay several times smaller than the standing index.)"""
    corpus = _corpus(spark, sf_dir)
    # 5 id slabs cut at exact doc_id quintiles (the injected near-dup
    # ids sit at a high offset, so equal-width slabs would be empty);
    # fold after every epoch, l1_max high enough that no major fold
    # runs in this test
    qs = corpus.approxQuantile("doc_id", [0.2, 0.4, 0.6, 0.8], 0.0)
    cuts = [0] + [int(q) for q in qs] + [10**18]
    bounds = list(zip(cuts, cuts[1:]))
    batches = _batches(corpus, bounds)
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "s"), threshold=0.8,
        fold_every=1, l1_max=100,
    )
    sizes = {}
    for e, b in enumerate(batches):
        sizes[e] = b.count()
        idx.process_batch(b, e)

    root = str(tmp_path / "s" / "index")
    l1 = os.path.join(root, f"run={L1_RUN_KEY}")
    eps = sorted(
        int(d[len("epoch="):]) for d in os.listdir(l1)
        if d.startswith("epoch=")
    )
    # folds ran at epochs 1..4, each folding exactly the one closed
    # epoch below it
    assert eps == [1, 2, 3, 4]
    total = 0
    for e in eps:
        got = spark.read.parquet(
            os.path.join(l1, f"epoch={e}")
        ).count()
        assert got == sizes[e - 1], (
            f"minor fold at {e} wrote {got} rows, expected the "
            f"delta {sizes[e - 1]} — an O(state) rewrite leaked in"
        )
        total += got
    # and no base was written (no major fold triggered)
    assert not os.path.isdir(os.path.join(root, f"run={BASE_RUN_KEY}"))
    # standing state (all L1 + live epoch) is ~5x any single fold's
    # write — the bound that holds as state keeps growing
    assert total > 3 * sizes[3]


def test_tiered_major_fold_merges_and_bounds_dirs(spark, sf_dir, tmp_path):
    """With l1_max=2, the fold at epoch 3 is the third minor -> a
    major fold merges base+L1 into run=__base__/epoch=3 and deletes
    the subsumed L1 runs; the index keeps deciding identically."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(
        corpus, [(0, 90), (90, 180), (180, 300), (300, 10**9)]
    )
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "m"), threshold=0.8,
        fold_every=1, l1_max=2,
    )
    for e, b in enumerate(batches):
        idx.process_batch(b, e)
    root = tmp_path / "m" / "index"
    # major fold at epoch 3: base holds epochs 0-2's rows
    assert (root / f"run={BASE_RUN_KEY}" / "epoch=3").is_dir()
    # subsumed L1 epochs (1,2,3) deleted by the major cleanup
    assert not (root / f"run={L1_RUN_KEY}").is_dir()
    base_rows = spark.read.parquet(
        str(root / f"run={BASE_RUN_KEY}" / "epoch=3")
    )
    want_rows = corpus.filter(F.col("doc_id") < 300).count()
    assert base_rows.count() == want_rows

    plain = StreamingDedupIndex(spark, str(tmp_path / "pl"), threshold=0.8)
    for e, b in enumerate(batches):
        plain.process_batch(b, e)
    assert _accepted(idx) == _accepted(plain)


def test_tiered_fold_crash_windows(spark, sf_dir, tmp_path):
    """The two interrupted-fold windows: (a) minor fold crashed
    between L1 write and cleanup — the re-run must NOT rewrite the
    committed L1 slice from now-partial sources, only finish the
    cleanup; (b) major fold crashed between base write and cleanup —
    duplicates visible across tiers, probes decide identically, next
    compact finishes."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(corpus, [(0, 120), (120, 260), (260, 10**9)])
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "c"), threshold=0.8, l1_max=10
    )
    for e, b in enumerate(batches[:2]):
        idx.process_batch(b, e)

    # (a) run the minor fold but suppress its cleanup = crash window
    real_minor = idx._cleanup_minor
    idx._cleanup_minor = lambda *a, **k: None
    idx.compact(1)
    idx._cleanup_minor = real_minor
    root = tmp_path / "c" / "index"
    l1_slice = root / f"run={L1_RUN_KEY}" / "epoch=1"
    assert l1_slice.is_dir()
    rows_before = spark.read.parquet(str(l1_slice)).count()
    # simulate the sources having been half-deleted before the crash:
    # the re-run sees a committed L1 slice and must not overwrite it
    idx.compact(1)
    assert spark.read.parquet(str(l1_slice)).count() == rows_before
    # epoch 0 source cleaned, live epoch 1 kept
    own = [
        d for d in os.listdir(root)
        if d.startswith("run=") and L1_RUN_KEY not in d
        and BASE_RUN_KEY not in d
    ]
    assert sorted(os.listdir(root / own[0])) == ["epoch=1"]

    # (b) major window: force the trigger with l1_max=0, suppress the
    # folded cleanup -> old tiers + new base both visible
    idx.process_batch(batches[2], 2)
    idx.l1_max = 0
    real_folded = idx._cleanup_folded
    idx._cleanup_folded = lambda *a, **k: None
    idx.compact(2)
    idx._cleanup_folded = real_folded
    assert (root / f"run={BASE_RUN_KEY}" / "epoch=2").is_dir()
    assert (root / f"run={L1_RUN_KEY}").is_dir()  # duplicates visible
    # decisions identical in the duplicate-visible window
    idx.process_batch(batches[2], 2)
    plain = StreamingDedupIndex(spark, str(tmp_path / "pl2"), threshold=0.8)
    for e, b in enumerate(batches):
        plain.process_batch(b, e)
    assert _accepted(idx) == _accepted(plain)
    # and the next compact at the same watermark finishes the cleanup
    idx.compact(2)
    assert not (root / f"run={L1_RUN_KEY}").is_dir()


def test_tiered_quota_index_budgets_survive_folds(spark, sf_dir, tmp_path):
    """The quota index (distinct-accepted budget counting) under
    tiered folds: per-source accepted counts never exceed the cap and
    equal the untied twin's — cross-tier duplicate rows must not
    inflate budgets."""
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.streaming.stream import (
        StreamingSourceQuotaIndex,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    batches = _batches(docs, [(0, 150), (150, 400), (400, 10**9)])
    tiered = StreamingSourceQuotaIndex(
        spark, str(tmp_path / "qt"), cap=20, fold_every=1, l1_max=1
    )
    plain = StreamingSourceQuotaIndex(
        spark, str(tmp_path / "qp"), cap=20
    )
    for e, b in enumerate(batches):
        tiered.process_batch(b, e)
        plain.process_batch(b, e)
    assert _accepted(tiered) == _accepted(plain)
    # replay after the folds
    tiered.process_batch(batches[1], 99)
    assert _accepted(tiered) == _accepted(plain)


def test_tiered_semdedup_cqv_partition_layout_uniform(
    spark, sf_dir, tmp_path
):
    """Tiered folds on the clustered SemDeDup index: the cqv slices
    carry an EXTRA data partition column (cent_id) that must stay
    uniform across live epochs, L1 delta runs, and the base — mixed
    layouts break partition discovery. Accepted set must equal the
    untied twin's, and both the L1 and base cqv slices must nest
    cent_id directories."""
    import os

    from bottledwater_pg_spark.operators.llm_queries import (
        COSINE_THRESHOLD,
        KMEANS_ITERS,
        KMEANS_K,
        embeddings_with_dups,
    )
    from bottledwater_pg_spark.streaming.stream import (
        StreamingClusteredSemDeDupIndex,
    )

    corpus = embeddings_with_dups(spark, sf_dir)
    batches = [
        corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        for lo, hi in [(0, 30), (30, 100), (100, 200), (200, 10**9)]
    ]
    tiered = StreamingClusteredSemDeDupIndex(
        spark, str(tmp_path / "ct"), threshold=COSINE_THRESHOLD,
        train_corpus=corpus, k=KMEANS_K, iters=KMEANS_ITERS,
        fold_every=1, l1_max=2,
    )
    plain = StreamingClusteredSemDeDupIndex(
        spark, str(tmp_path / "cp"), threshold=COSINE_THRESHOLD,
        train_corpus=corpus, k=KMEANS_K, iters=KMEANS_ITERS,
    )
    for e, b in enumerate(batches):
        tiered.process_batch(b, e)
        plain.process_batch(b, e)
    want = {r.vec_id for r in plain.accepted_ids().collect()}
    assert {r.vec_id for r in tiered.accepted_ids().collect()} == want

    # layout: major fold at epoch 3 -> base holds cent_id partitions;
    # the live L1-free window plus the live epoch remain readable
    cqv = tmp_path / "ct" / "cqv"
    base = cqv / f"run={BASE_RUN_KEY}" / "epoch=3"
    assert base.is_dir()
    assert any(d.startswith("cent_id=") for d in os.listdir(base))

    # replay (live + fresh epoch) over the tiered cqv layout
    tiered.process_batch(batches[3], 3)
    assert {r.vec_id for r in tiered.accepted_ids().collect()} == want
    tiered.process_batch(batches[1], 99)
    assert {r.vec_id for r in tiered.accepted_ids().collect()} == want
