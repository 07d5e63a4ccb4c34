"""StreamingContainmentIndex: ingest-time quote-expansion rejection —
batch-rule parity over in-id-order batches, BOTH probe directions
(new doc quoted by a stored container / new container quoting a
stored original), replay and restart idempotence, fold interleaving
(one-tier and tiered), and the threshold meta gate. Reference analog:
the per-key ordered stream that makes incremental decisions valid
(kafka/bottledwater.c:784-808)."""

from pyspark.sql import functions as F

from bottledwater_pg_spark.streaming.stream import (
    StreamingContainmentIndex,
)

THRESH_BP = 8000


def _accepted(idx):
    return {r.doc_id for r in idx.accepted_ids().collect()}


def _expected(spark, corpus):
    """The batch min-id-witness rule: every containment pair rejects
    its higher id."""
    from bottledwater_pg_spark.operators import dedup

    pairs = dedup.containment_prefix_pairs(corpus, THRESH_BP).select(
        F.greatest("a_id", "b_id").alias("doc_id")
    )
    rejected = {r.doc_id for r in pairs.collect()}
    return {
        r.doc_id for r in corpus.select("doc_id").collect()
    } - rejected


def test_streaming_containment_equals_batch_rule_and_replays(
    spark, sf_dir, tmp_path
):
    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_contained_dups,
    )

    corpus = docs_with_contained_dups(spark, sf_dir)
    idx = StreamingContainmentIndex(
        spark, str(tmp_path / "c"), threshold_bp=THRESH_BP
    )
    # id-ordered: originals (low ids) land before their injected
    # containers (+400000), so earlier-seen == lower-id
    batches = [
        corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 250), (250, 400000), (400000, 10**18)]
    ]
    for e, b in enumerate(batches):
        idx.process_batch(b, e)
    accepted = _accepted(idx)
    assert accepted == _expected(spark, corpus)

    # same-epoch replay (crash before checkpoint commit)
    idx.process_batch(batches[1], 1)
    assert _accepted(idx) == accepted
    # fresh-epoch re-delivery
    idx.process_batch(batches[0], 99)
    assert _accepted(idx) == accepted

    # restart: standing index probed from batch one; meta gate accepts
    idx2 = StreamingContainmentIndex(
        spark, str(tmp_path / "c"), threshold_bp=THRESH_BP
    )
    assert idx2._have_index
    assert _accepted(idx2) == accepted


def test_streaming_containment_probes_both_directions(spark, tmp_path):
    """Direction coverage with hand-built docs: a stored container
    rejects a later-arriving quoted original (new-contained-in-
    stored), and a stored original rejects a later-arriving container
    (stored-contained-in-new)."""
    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(12))  # prefix quote
    other = " ".join(f"z{i}" for i in range(30))

    # container first, quoted original later
    idx = StreamingContainmentIndex(
        spark, str(tmp_path / "d1"), threshold_bp=THRESH_BP
    )
    idx.process_batch(
        spark.createDataFrame(
            [(1, long_text), (2, other)], "doc_id long, text string"
        ),
        0,
    )
    idx.process_batch(
        spark.createDataFrame([(3, short_text)], "doc_id long, text string"),
        1,
    )
    assert _accepted(idx) == {1, 2}

    # original first, container later
    idx2 = StreamingContainmentIndex(
        spark, str(tmp_path / "d2"), threshold_bp=THRESH_BP
    )
    idx2.process_batch(
        spark.createDataFrame([(1, short_text)], "doc_id long, text string"),
        0,
    )
    idx2.process_batch(
        spark.createDataFrame(
            [(2, long_text), (3, other)], "doc_id long, text string"
        ),
        1,
    )
    assert _accepted(idx2) == {1, 3}


def test_streaming_containment_fold_parity(spark, sf_dir, tmp_path):
    """Folds interleaved (one-tier fold_every=1 and tiered l1_max=1)
    leave the accepted set equal to the unfolded twin's, and replay
    over the folded layout changes nothing."""
    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_contained_dups,
    )

    corpus = docs_with_contained_dups(spark, sf_dir)
    batches = [
        corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 150), (150, 300), (300, 400050), (400050, 10**18)]
    ]
    plain = StreamingContainmentIndex(
        spark, str(tmp_path / "p"), threshold_bp=THRESH_BP
    )
    onetier = StreamingContainmentIndex(
        spark, str(tmp_path / "o"), threshold_bp=THRESH_BP, fold_every=1
    )
    tiered = StreamingContainmentIndex(
        spark, str(tmp_path / "t"), threshold_bp=THRESH_BP,
        fold_every=1, l1_max=1,
    )
    for e, b in enumerate(batches):
        plain.process_batch(b, e)
        onetier.process_batch(b, e)
        tiered.process_batch(b, e)
    want = _accepted(plain)
    assert _accepted(onetier) == want
    assert _accepted(tiered) == want
    # legal replays over the tiered layout: the LIVE epoch (the only
    # one foreachBatch can re-deliver after the fold at its watermark)
    # and a fresh-epoch re-delivery
    tiered.process_batch(batches[3], 3)
    assert _accepted(tiered) == want
    tiered.process_batch(batches[1], 99)
    assert _accepted(tiered) == want
    assert tiered.slice_dir_count() < plain.slice_dir_count()


def test_streaming_containment_meta_gate(spark, sf_dir, tmp_path):
    """Stored prefixes are cut for ONE threshold: a restart with a
    different threshold_bp (or over pre-contract state without
    meta.json) must refuse rather than probe prefixes that are too
    short to be exact."""
    import os

    import pytest

    state = tmp_path / "g"
    idx = StreamingContainmentIndex(
        spark, str(state), threshold_bp=THRESH_BP
    )
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    idx.process_batch(docs, 0)
    with pytest.raises(LookupError, match="threshold"):
        StreamingContainmentIndex(spark, str(state), threshold_bp=9000)
    # pre-contract state (no meta.json) with standing slices refuses
    os.remove(state / "meta.json")
    with pytest.raises(LookupError, match="meta.json"):
        StreamingContainmentIndex(
            spark, str(state), threshold_bp=THRESH_BP
        )


def test_streaming_containment_runs_as_real_stream(spark, sf_dir):
    """StreamingContainmentIndex behind an actual readStream (file
    source, one file per trigger, checkpointed foreachBatch): the
    accepted set must equal the batch min-id-witness rule — the same
    end-to-end pin the text dedup index has."""
    import tempfile

    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_contained_dups,
    )

    corpus = docs_with_contained_dups(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/docs"
        for i, (lo, hi) in enumerate(
            [(0, 250), (250, 400000), (400000, 10**18)]
        ):
            corpus.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
        idx = StreamingContainmentIndex(
            spark, f"{tmp}/state", threshold_bp=THRESH_BP
        )
        for i in range(3):
            q = idx.start(
                spark.readStream.schema(corpus.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/b{i}"),
                f"{tmp}/ckpt{i}",
            )
            q.processAllAvailable()
            q.stop()
        accepted = _accepted(idx)
    assert accepted == _expected(spark, corpus)
