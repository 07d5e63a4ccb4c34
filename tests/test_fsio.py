"""The filesystem adapter behind the streaming state machinery
(streaming/fsio.py): URI paths route through the Hadoop FileSystem
API — the seam that makes the slice/fold/meta discipline run where
cluster state actually lives (HDFS/S3/GCS) instead of assuming a
local filesystem. ``file://`` URIs exercise the REAL Hadoop code path
end-to-end on this sandbox (same Java classes, different scheme in
production)."""

import os

import pytest

from bottledwater_pg_spark.streaming import fsio


def _uri(p) -> str:
    return "file://" + str(p)


def test_fsio_ops_parity_on_file_uri(spark, tmp_path):
    """Every adapter op, driven through the Hadoop branch via a
    file:// URI, must leave the same on-disk state the os branch
    would — verified by inspecting the directory locally."""
    root = _uri(tmp_path / "root")
    fsio.makedirs(root)
    fsio.makedirs(root)  # exist_ok semantics
    assert fsio.isdir(root) and fsio.exists(root)
    assert (tmp_path / "root").is_dir()

    fsio.makedirs(root + "/run=a/epoch=0")
    fsio.makedirs(root + "/run=a/epoch=1")
    assert sorted(fsio.listdir(root + "/run=a")) == ["epoch=0", "epoch=1"]

    # rename moves; rmtree is recursive; rmdir only takes empty dirs
    fsio.rename(root + "/run=a/epoch=1", root + "/run=b")
    assert fsio.isdir(root + "/run=b")
    assert fsio.listdir(root + "/run=a") == ["epoch=0"]
    with pytest.raises(OSError):
        fsio.rmdir(root + "/run=a")  # not empty
    fsio.rmtree(root + "/run=a")
    assert not fsio.exists(root + "/run=a")
    fsio.rmdir(root + "/run=b")
    assert not fsio.exists(root + "/run=b")

    # small-text ledger ops
    ledger = root + "/epochs.txt"
    fsio.append_text(ledger, "0\n")
    fsio.append_text(ledger, "1\n")
    assert fsio.read_text(ledger) == "0\n1\n"
    assert (tmp_path / "root" / "epochs.txt").read_text() == "0\n1\n"


def test_fsio_rename_refuses_existing_target(spark, tmp_path):
    """Hadoop's rename onto an existing directory silently moves src
    INSIDE dst (POSIX mv) — the adapter must refuse instead, matching
    the os.rename contract the swap/fold discipline depends on."""
    a, b = _uri(tmp_path / "a"), _uri(tmp_path / "b")
    fsio.makedirs(a)
    fsio.makedirs(b)
    with pytest.raises(FileExistsError):
        fsio.rename(a, b)
    # and the source was not nested into the target
    assert fsio.listdir(b) == []


def test_fsio_json_meta_roundtrip_and_crash_recovery(spark, tmp_path):
    """write_json_meta/read_json_meta on a URI: normal round-trip,
    promotion of a complete .tmp when a crash landed between the
    Hadoop delete and rename, and a garbage .tmp (crash mid-write)
    reading as absent — the pre-write state."""
    meta = _uri(tmp_path / "meta.json")
    fsio.write_json_meta(meta, {"cap": 20, "family": "x"})
    assert fsio.read_json_meta(meta) == {"cap": 20, "family": "x"}
    # overwrite (the delete-then-rename branch)
    fsio.write_json_meta(meta, {"cap": 21, "family": "x"})
    assert fsio.read_json_meta(meta)["cap"] == 21

    # crash window: final deleted, complete .tmp present -> recovered
    # and promoted
    fsio._write_text(meta + ".tmp", '{"cap": 22, "family": "x"}')
    fsio.rmtree(meta)
    assert fsio.read_json_meta(meta)["cap"] == 22
    assert fsio.exists(meta) and not fsio.exists(meta + ".tmp")

    # crash mid-tmp-write: garbage .tmp, no final -> absent
    broken = _uri(tmp_path / "broken.json")
    fsio._write_text(broken + ".tmp", '{"cap": 2')
    assert fsio.read_json_meta(broken) is None


def test_fsio_normkey_uri_and_local(tmp_path):
    """Run-key canonicalization: URI spellings differing only by
    trailing slash hash identically; local paths still realpath
    (symlink spellings collapse)."""
    assert fsio.normkey("file:///a/b/") == fsio.normkey("file:///a/b")
    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "link"
    link.symlink_to(real)
    assert fsio.normkey(str(link)) == fsio.normkey(str(real))


def test_streaming_dedup_index_on_file_uri_state(spark, sf_dir, tmp_path):
    """The full sliced-index lifecycle — probe, per-epoch slice
    writes, mid-stream compaction folds, same-epoch replay, restart
    of a fresh instance — against a ``file://`` URI state dir, i.e.
    entirely through the Hadoop FileSystem branch. The accepted set
    must equal the batch min-id-witness rule and survive replay and
    restart, exactly like the local-path twin in test_streaming."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_near_dups,
    )
    from bottledwater_pg_spark.streaming.stream import StreamingDedupIndex

    corpus = docs_with_near_dups(spark, sf_dir)
    state = _uri(tmp_path / "dedup_state")
    # fold_every=1 forces a compact() (minor fold + cleanup) through
    # the URI branch during the run, not just slice writes
    idx = StreamingDedupIndex(spark, state, threshold=0.8, fold_every=1)
    batches = [
        corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 120), (120, 260), (260, 10**9)]
    ]
    for e, b in enumerate(batches):
        idx.process_batch(b, e)
    accepted = {r.doc_id for r in idx.accepted_ids().collect()}

    pairs = dedup.jaccard_pairs(corpus, 0.8).toPandas()
    expected = {
        r.doc_id for r in corpus.select("doc_id").collect()
    } - set(pairs.b_id)
    assert accepted == expected

    # same-epoch replay through the URI branch
    idx.process_batch(batches[2], 2)
    assert {r.doc_id for r in idx.accepted_ids().collect()} == accepted

    # restart: a NEW instance over the same URI state dir must see the
    # standing index (content-gated via Hadoop listings) and the meta
    # gate must accept its own family
    idx2 = StreamingDedupIndex(spark, state, threshold=0.8)
    assert idx2._have_index and idx2._have_accepted
    assert {r.doc_id for r in idx2.accepted_ids().collect()} == accepted
    # and the state genuinely lives where the URI says
    assert (tmp_path / "dedup_state" / "meta.json").exists()


def test_merge_sink_on_file_uri_state(spark, sf_dir, tmp_path):
    """BucketedMergeSink (the exactly-once CDC sink) against a
    ``file://`` state dir: initial write, an idempotent re-merge, and
    partition-pruned read-back all through the Hadoop branch."""
    from bottledwater_pg_spark.operators.cdc_queries import customer_cdc
    from bottledwater_pg_spark.operators.materialize import (
        drop_tombstones,
        latest_by_key,
    )
    from bottledwater_pg_spark.operators.merge_sink import BucketedMergeSink

    events = customer_cdc(spark, "/root/testdata/sf0.001").cache()
    try:
        sink = BucketedMergeSink(
            spark, _uri(tmp_path / "sink_state"), n_buckets=8
        )
        sink.merge_batch(events, 0)
        expected = latest_by_key(events).count()
        n = drop_tombstones(sink.state()).count()
        assert n == expected
        # replay is idempotent through the URI branch too
        sink.merge_batch(events, 0)
        assert drop_tombstones(sink.state()).count() == n
        # r14 layout: manifest + generation dirs, committed through
        # the Hadoop branch
        assert (tmp_path / "sink_state" / "state_manifest.json").is_file()
        assert any(
            d.startswith("state-g")
            for d in os.listdir(tmp_path / "sink_state")
        )
    finally:
        events.unpersist()


def test_fsio_uri_ops_work_from_worker_threads(spark, tmp_path):
    """getActiveSession is THREAD-LOCAL: a state op running on a
    driver worker thread (the multi-table materializer fans per-table
    work out to a pool) sees None there even while the session is
    alive. fsio must fall back to the process-wide session — without
    it, every URI-state multi-table deployment crashes on its first
    batch."""
    from concurrent.futures import ThreadPoolExecutor

    from bottledwater_pg_spark.streaming import fsio

    uri = "file://" + str(tmp_path / "probe")
    fsio.makedirs(uri)
    fsio.write_json_meta(uri + "/m.json", {"ok": 1})

    def probe():
        # would raise RuntimeError before the fallback
        return (
            fsio.exists(uri),
            fsio.read_json_meta(uri + "/m.json")["ok"],
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        results = list(pool.map(lambda _: probe(), range(4)))
    assert all(r == (True, 1) for r in results)


def test_fold_legacy_run_slices_is_noop_on_uri_paths(spark, tmp_path):
    """The legacy run-key fold moves epoch dirs by RENAME — fine on
    the atomic-rename local filesystems that could have produced a
    legacy layout, hostile on object stores. URI checkpoints/roots
    cannot hold legacy-keyed runs (the pre-normalization machinery was
    os.path-only, predating URI support), so the shim must skip them
    entirely — even if a same-shaped directory exists."""
    import hashlib

    from bottledwater_pg_spark.streaming.stream import (
        _fold_legacy_run_slices,
        _run_key_of,
    )

    ckpt = str(tmp_path / "ckpt")
    root = tmp_path / "root"
    # forge a dir named like a legacy-keyed run
    legacy_key = hashlib.md5(ckpt.encode("utf-8")).hexdigest()[:12]
    legacy_dir = root / f"run={legacy_key}" / "epoch=0"
    os.makedirs(legacy_dir)
    (legacy_dir / "marker.txt").write_text("x")

    # URI root: no-op, nothing moved, nothing raised
    assert _fold_legacy_run_slices((_uri(root),), ckpt) == 0
    assert legacy_dir.is_dir()
    # URI checkpoint: same
    assert _fold_legacy_run_slices((str(root),), "file://" + ckpt) == 0
    assert legacy_dir.is_dir()

    # plain local paths still fold (the pre-r14 behavior)
    folded = _fold_legacy_run_slices((str(root),), ckpt)
    assert folded == 1
    assert not (root / f"run={legacy_key}").exists()
    assert (
        root / f"run={_run_key_of(ckpt)}" / "epoch=0" / "marker.txt"
    ).is_file()
