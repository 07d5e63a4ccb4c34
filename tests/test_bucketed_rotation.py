"""Bucketed base rotation (``base_buckets``): the bounded-pause major.

The tiered major is a monolithic O(state) rewrite; with base_buckets=P
the base splits into P hash buckets and a "major" rotates ONE bucket
per fold — max single-fold write is O(state/P + L1) regardless of
total index size. Pins: accepted-set parity with the unfolded /
one-tier / monolithic-tiered twins, the single-rotation write actually
being ~state/P (the headline bound), L1 runs retained until EVERY
bucket passes them, replay/crash windows, and restart over the
bucketed layout."""

import os

from pyspark.sql import functions as F

from bottledwater_pg_spark.streaming.stream import (
    L1_RUN_KEY,
    StreamingDedupIndex,
    _bucket_run_key,
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


def _bucket_dirs(root):
    return sorted(
        d for d in os.listdir(root)
        if d.startswith("run=__base") and d != "run=__base__"
    )


def test_bucketed_rotation_accepted_set_parity(spark, sf_dir, tmp_path):
    """Rotation every fold (l1_max=1 < P=3 -> continuous rotation)
    decides identically to the unfolded and monolithic-tiered twins,
    under replay and fresh-epoch re-delivery, and across a restart."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(
        corpus, [(0, 90), (90, 180), (180, 300), (300, 10**9)]
    )
    bucketed = StreamingDedupIndex(
        spark, str(tmp_path / "b"), threshold=0.8,
        fold_every=1, l1_max=1, base_buckets=3,
    )
    tiered = StreamingDedupIndex(
        spark, str(tmp_path / "t"), threshold=0.8,
        fold_every=1, l1_max=1,
    )
    plain = StreamingDedupIndex(spark, str(tmp_path / "p"), threshold=0.8)
    for e, b in enumerate(batches):
        bucketed.process_batch(b, e)
        tiered.process_batch(b, e)
        plain.process_batch(b, e)
    want = _accepted(plain)
    assert _accepted(tiered) == want
    assert _accepted(bucketed) == want
    # rotation actually happened: at least one bucket run exists
    root = str(tmp_path / "b" / "index")
    assert _bucket_dirs(root)

    # replay + fresh-epoch re-delivery over the bucketed tiers
    bucketed.process_batch(batches[3], 3)
    assert _accepted(bucketed) == want
    bucketed.process_batch(batches[1], 99)
    assert _accepted(bucketed) == want

    # restart over the bucketed layout sees the standing index
    idx2 = StreamingDedupIndex(
        spark, str(tmp_path / "b"), threshold=0.8,
        fold_every=1, l1_max=1, base_buckets=3,
    )
    assert idx2._have_index
    assert _accepted(idx2) == want


def test_rotation_write_is_bucket_sized_not_state_sized(
    spark, sf_dir, tmp_path
):
    """The headline bound: a single rotation's write is ~state/P +
    the L1 rows hashing into the bucket — NEVER the whole standing
    index. Measured in rows written per rotation."""
    corpus = _corpus(spark, sf_dir)
    n_total = corpus.count()
    qs = corpus.approxQuantile("doc_id", [0.25, 0.5, 0.75], 0.0)
    cuts = [0] + [int(q) for q in qs] + [10**18]
    batches = _batches(corpus, list(zip(cuts, cuts[1:])))
    P = 4
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "s"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=P,
    )
    writes = []
    real_write = idx._write_slice

    def spy_write(df, name, epoch_id, run=None, _orig=real_write):
        if run is not None and run.startswith("__base") and name == "index":
            n = df.count()
            writes.append((run, epoch_id, n))
        _orig(df, name, epoch_id, run=run)

    idx._write_slice = spy_write
    for e, b in enumerate(batches):
        idx.process_batch(b, e)
    assert writes, "no rotation ran"
    # every single rotation write is far below the standing corpus —
    # the monolithic major would have written ~n_total rows at the end
    biggest = max(n for _, _, n in writes)
    assert biggest < 0.6 * n_total, (
        f"a rotation wrote {biggest} rows vs corpus {n_total} — "
        "O(state) leaked back into the fold"
    )
    # and the buckets partition the corpus: the union of final bucket
    # snapshots + L1 + live equals the indexed corpus. The reopen
    # declares the SAME P — the r14 bucket_meta gate refuses any other
    # (pinned in test_bucket_meta_gate_refuses_changed_p).
    assert _accepted(idx) == _accepted(
        StreamingDedupIndex(
            spark, str(tmp_path / "s"), threshold=0.8,
            l1_max=0, base_buckets=P,
        )
    )


def test_l1_retained_until_every_bucket_passes(spark, sf_dir, tmp_path):
    """An L1 run may only be deleted once EVERY bucket's base epoch
    has reached it — earlier deletion would lose rows for buckets not
    yet rotated past it."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(corpus, [(0, 150), (150, 300), (300, 10**9)])
    P = 3
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "r"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=P,
    )
    root = str(tmp_path / "r" / "index")
    idx.process_batch(batches[0], 0)
    idx.process_batch(batches[1], 1)  # fold at 1: minor + 1st rotation
    l1 = os.path.join(root, f"run={L1_RUN_KEY}")
    assert os.path.isdir(l1)  # 2 buckets still at -1: L1 retained
    eps_after_first = set(os.listdir(l1))
    assert eps_after_first
    idx.process_batch(batches[2], 2)  # 2nd rotation
    # still one bucket at -1 -> L1 epoch 1 retained
    assert os.path.isdir(l1)
    # two more folds rotate the remaining bucket and lift the floor
    idx.process_batch(batches[2].limit(0), 3)
    idx.process_batch(batches[2].limit(0), 4)
    beps = idx._bucket_epochs("index")
    floor = min(beps.values())
    assert floor >= 1
    if os.path.isdir(l1):
        for ed in os.listdir(l1):
            assert int(ed[len("epoch="):]) > floor
    # rows never lost: the full index equals everything ingested
    n_index = (
        spark.read.option("basePath", root).parquet(root)
        .select("doc_id").distinct().count()
    )
    assert n_index == corpus.count()


def test_rotation_crash_and_replay_windows(spark, sf_dir, tmp_path):
    """(a) rotation committed, cleanup crashed: duplicates visible
    across bucket + L1, probes decide identically, next fold finishes;
    (b) rotation crashed mid-write (partial epoch dir, no _SUCCESS):
    the replayed fold drops the partial dir and re-rotates."""
    corpus = _corpus(spark, sf_dir)
    batches = _batches(corpus, [(0, 150), (150, 300), (300, 10**9)])
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "c"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=2,
    )
    root = tmp_path / "c" / "index"
    idx.process_batch(batches[0], 0)

    # (b) crash mid-rotation-write: forge a partial bucket epoch dir
    part = root / f"run={_bucket_run_key(0)}" / "epoch=1"
    os.makedirs(part)
    (part / "part-00000.parquet").write_bytes(b"torn")
    idx.process_batch(batches[1], 1)  # fold at 1 replays the rotation
    assert (root / f"run={_bucket_run_key(0)}" / "epoch=1" / "_SUCCESS").exists()

    # (a) suppress the post-write cleanup: stale bucket epochs + L1
    # linger; decisions stay identical; next fold sweeps
    plain = StreamingDedupIndex(spark, str(tmp_path / "p"), threshold=0.8)
    for e, b in enumerate(batches):
        plain.process_batch(b, e)
    idx.process_batch(batches[2], 2)
    assert _accepted(idx) == _accepted(plain)


def test_bucket_meta_gate_refuses_changed_p(spark, sf_dir, tmp_path):
    """base_buckets is persisted with the state (bucket_meta.json) and
    a reopen under a different P is refused — bucket runs are
    hash-partitioned at write time, so a changed P would mis-scope the
    L1 cleanup floor (an L1 epoch could be deleted before any
    current-P bucket folded its rows: durable index loss)."""
    import pytest

    corpus = _corpus(spark, sf_dir)
    batches = _batches(corpus, [(0, 150), (150, 10**9)])
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "g"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=3,
    )
    for e, b in enumerate(batches):
        idx.process_batch(b, e)
    for wrong in (4, None):
        with pytest.raises(ValueError, match="base_buckets"):
            StreamingDedupIndex(
                spark, str(tmp_path / "g"), threshold=0.8,
                fold_every=1, l1_max=0, base_buckets=wrong,
            )
    # the declared P reopens fine and reads the same accepted set
    again = StreamingDedupIndex(
        spark, str(tmp_path / "g"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=3,
    )
    assert _accepted(again) == _accepted(idx)


def test_bucket_meta_gate_legacy_adoption(spark, sf_dir, tmp_path):
    """Standing state with NO bucket_meta.json (pre-r14): adopted only
    if no bucket run exists (then no rotation ever ran and any P is
    safe — all bucket epochs start at -1); refused if bucket runs DO
    exist, because the P they were hashed under is unrecoverable."""
    import pytest

    corpus = _corpus(spark, sf_dir)
    batches = _batches(corpus, [(0, 150), (150, 10**9)])

    # un-bucketed standing state, meta removed -> adoptable under any P
    idx = StreamingDedupIndex(
        spark, str(tmp_path / "a"), threshold=0.8, fold_every=1, l1_max=1,
    )
    idx.process_batch(batches[0], 0)
    os.remove(tmp_path / "a" / "bucket_meta.json")
    adopted = StreamingDedupIndex(
        spark, str(tmp_path / "a"), threshold=0.8,
        fold_every=1, l1_max=1, base_buckets=2,
    )
    adopted.process_batch(batches[1], 1)
    assert os.path.exists(tmp_path / "a" / "bucket_meta.json")

    # bucketed standing state, meta removed -> refused (P unknowable)
    idx2 = StreamingDedupIndex(
        spark, str(tmp_path / "b"), threshold=0.8,
        fold_every=1, l1_max=0, base_buckets=2,
    )
    for e, b in enumerate(batches):
        idx2.process_batch(b, e)
    assert _bucket_dirs(str(tmp_path / "b" / "index"))
    os.remove(tmp_path / "b" / "bucket_meta.json")
    with pytest.raises(ValueError, match="bucket_meta"):
        StreamingDedupIndex(
            spark, str(tmp_path / "b"), threshold=0.8,
            fold_every=1, l1_max=0, base_buckets=2,
        )
