"""Degenerate-input robustness: every core operator must behave on
EMPTY (and near-empty) inputs — at warehouse scale empty tables,
empty partitions, and filters-that-match-nothing are routine, and an
operator that crashes or hangs on them is a production incident.
The reference's suites cover empty tables implicitly (snapshot of a
prepopulated-then-truncated table); here each operator family gets an
explicit zero-row contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_envelope(spark):
    from bottledwater_pg_spark.plans.envelope import ENVELOPE_SCHEMA

    return spark.createDataFrame([], ENVELOPE_SCHEMA)


def test_materialize_empty_stream(spark):
    from pyspark.sql import types as T

    from bottledwater_pg_spark.operators.materialize import (
        append_only,
        latest_by_key,
        materialize,
        scd2_history,
    )

    ev = _empty_envelope(spark)
    schema = T.StructType.fromDDL("k long, v string")
    assert materialize(ev, schema).count() == 0
    assert append_only(ev, schema).count() == 0
    assert latest_by_key(ev).count() == 0
    assert scd2_history(ev).count() == 0


def test_connected_components_empty_and_selfloop(spark):
    from bottledwater_pg_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
    assert connected_components_star(empty).count() == 0
    # self-loops only: every node is its own component
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    got = {
        (r["id"], r["comp"]) for r in connected_components(loops).collect()
    }
    assert got == {(1, 1), (2, 2)}
    got_star = {
        (r["id"], r["comp"])
        for r in connected_components_star(loops).collect()
    }
    assert got_star == {(1, 1), (2, 2)}


def test_dedup_ops_empty_corpus(spark):
    from bottledwater_pg_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        prefix_filter_jaccard_pairs,
        simhash_near_pairs,
    )

    docs = _empty_docs(spark)
    assert minhash_lsh_pairs(docs).count() == 0
    assert prefix_filter_jaccard_pairs(docs, 0.8).count() == 0
    assert simhash_near_pairs(docs).count() == 0
    assert exact_dedup(docs).count() == 0


def test_bucketed_ranks_single_row_group(spark):
    # n=1: lo == hi (zero-width range) and every target rank is 1
    from bottledwater_pg_spark.operators.queries import _bucketed_group_ranks

    j = spark.createDataFrame(
        [("A", 5.00), ("B", 1.00), ("B", 3.00)], "c_mktsegment string, v double"
    ).select("c_mktsegment", F.col("v").cast("decimal(18,2)").alias("v"))
    r = _bucketed_group_ranks(
        j, "c_mktsegment", ["(n + 1) div 2", "(n + 2) div 2"]
    ).collect()
    by_group = {}
    for row in r:
        by_group.setdefault(row["c_mktsegment"], set()).add(
            (row["rn"], float(row["v"]))
        )
    assert (1, 5.0) in by_group["A"]  # single-row group: rank 1 present
    # B: n=2 -> target ranks 1 and 2, values 1.0 and 3.0
    assert {(1, 1.0), (2, 3.0)} <= by_group["B"]


def test_funnel_and_retention_empty_events(spark):
    from bottledwater_pg_spark.operators.queries import (
        fraud_flag_events,
    )

    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp_ntz, "
            "event_type string, value double"
    )
    assert fraud_flag_events(ev).count() == 0


def test_winnow_and_text_ops_empty_and_tiny(spark):
    from bottledwater_pg_spark.functions.text import (
        kgram_hashes,
        winnow_mins,
    )

    # doc shorter than the k-gram: guarded sequence must not count down
    tiny = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    row = tiny.select(
        F.size(kgram_hashes("text", 8)).alias("ng"),
    ).first()
    assert row["ng"] == 1  # greatest(len-k+1, 1) floor
    out = tiny.withColumn("_g", kgram_hashes("text", 8)).select(
        F.explode(F.array_distinct(winnow_mins("_g", 4))).alias("fp")
    )
    assert out.count() == 1


def test_export_snapshot_empty_pattern_raises(spark, sf_dir):
    from bottledwater_pg_spark.sources.catalog import export_snapshot

    with pytest.raises(LookupError):
        export_snapshot(spark, sf_dir, "zzz_nothing_%")


def test_ppm_stats_empty_input(spark):
    from bottledwater_pg_spark.operators.multimodal import (
        ppm_channel_stats,
        synth_ppm_payloads,
    )

    docs = spark.createDataFrame([], "doc_id long")
    assert ppm_channel_stats(synth_ppm_payloads(docs)).count() == 0


def test_pagerank_empty_and_single_edge(spark):
    from bottledwater_pg_spark.operators.graph import pagerank_integer

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_integer(empty, iters=1).count() == 0
    # single bidirectional edge: symmetric ranks, full mass retained
    one = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r = {x["node"]: x["rank"] for x in pagerank_integer(one, iters=3).collect()}
    assert r[1] == r[2] and r[1] > 0


def test_semdedup_more_clusters_than_vectors(spark):
    from bottledwater_pg_spark.operators.similarity import semdedup_prune

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    # n_clusters > corpus: centroid limit() just returns all vectors
    out = semdedup_prune(df, n_clusters=8, threshold=0.99)
    assert out.count() == 0  # orthogonal vectors: nothing pruned


def test_weighted_sample_degenerate_weights(spark):
    from bottledwater_pg_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    # n_samples larger than total weight: stride floors to 1, every
    # positive-weight row spans a boundary -> all kept, none crash
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, w long"
    )
    out = weighted_systematic_sample(df, "doc_id", "w", 100).toPandas()
    assert sorted(out.doc_id) == [1, 2, 3]
    # empty input: no rows, no division crash
    empty = spark.createDataFrame([], "doc_id long, w long")
    assert weighted_systematic_sample(empty, "doc_id", "w", 5).count() == 0


def test_wav_stats_empty_clip(spark):
    import numpy as np

    from bottledwater_pg_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rate, s = decode_wav(encode_wav(8000, np.array([], dtype=np.int16)))
    assert rate == 8000 and len(s) == 0


def test_incremental_dedup_empty_batch(spark, sf_dir):
    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.incremental_lsh_matches(docs, empty).count() == 0


def test_incremental_cosine_requires_full_index(spark):
    """index_df=None with only ONE precomputed side must fail the
    contract loudly (ValueError naming the missing side), not die
    later with an opaque AttributeError inside banded_srp(None)."""
    import pytest

    from bottledwater_pg_spark.operators import dedup

    batch = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    sig = spark.createDataFrame([], "sid long, band int, bval long")
    qv = spark.createDataFrame(
        [], "sid long, qvec array<int>, qnorm double"
    )
    for banded, quant in ((sig, None), (None, qv), (None, None)):
        with pytest.raises(ValueError, match="index_df is required"):
            dedup.incremental_cosine_matches(
                None, batch, index_banded=banded, index_quant=quant
            )
    # both sides supplied → no index_df needed, call proceeds
    assert (
        dedup.incremental_cosine_matches(
            None, batch, index_banded=sig, index_quant=qv
        ).count()
        == 0
    )


def test_sequence_gaps_cross_bucket_and_missing_bucket(spark):
    """Gap ranges spanning bucket boundaries and ENTIRE missing
    buckets must come out identical to the naive global-lag answer."""
    from bottledwater_pg_spark.operators.integrity import (
        sequence_gap_ranges,
    )

    # ids 0..9, 5000..5002, 9000 with bucket_size 1024: gaps inside a
    # bucket, across a boundary, and over 3 fully-missing buckets
    ids = list(range(10)) + [5000, 5001, 5002] + [9000]
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    got = {
        (r.gap_start, r.gap_end)
        for r in sequence_gap_ranges(df, "event_id").collect()
    }
    want = set()
    s = sorted(ids)
    for a, b in zip(s, s[1:]):
        if b - a > 1:
            want.add((a + 1, b - 1))
    assert got == want
    # gap-free dense sequence -> empty
    dense = spark.createDataFrame([(i,) for i in range(100)], "event_id long")
    assert sequence_gap_ranges(dense, "event_id").count() == 0


def test_lm_surprise_degenerate_corpora(spark):
    """LM filter edge cases: a corpus with NO valid tokens (nothing
    survives the [a-z]+ pre-tokenization) and single-token documents
    (no bigrams) must yield an empty result, not a crash; a 1-doc
    corpus scores itself (everything maximally familiar)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        lm_surprise_outliers,
    )

    no_tokens = spark.createDataFrame(
        [(1, "123 456 !!!"), (2, "   ")], "doc_id long, text string"
    )
    assert lm_surprise_outliers(spark, "", docs=no_tokens).count() == 0
    singles = spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id long, text string"
    )
    assert lm_surprise_outliers(spark, "", docs=singles).count() == 0
    one = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    rows = lm_surprise_outliers(spark, "", docs=one).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["n_bigrams"] == 3


def test_bpe_single_char_vocabulary_refuses(spark):
    """A vocabulary of single-character words has no adjacent pairs —
    the trainer must refuse loudly at step 1 (silently returning zero
    merges would look like a trained tokenizer)."""
    import pytest

    from bottledwater_pg_spark.operators.llm_queries import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="exhausted"):
        bpe_learn_merges(spark, "", steps=1, docs=docs)


def test_exact_substring_spans_empty_and_short_docs(spark):
    """Empty corpus -> empty; docs shorter than k produce no grams and
    never crash the sequence() bound; identical SHORT docs (< k
    tokens) share no k-gram so they report nothing."""
    from bottledwater_pg_spark.operators.llm_queries import (
        exact_substring_spans,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_substring_spans(spark, "", docs=empty).count() == 0
    shorts = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    assert exact_substring_spans(spark, "", docs=shorts).count() == 0


def test_dsir_empty_and_no_target(spark):
    """Empty corpus -> empty result; a corpus with NO target-language
    docs still scores (the add-1-smoothed target model degrades to
    uniform — every bucket score is the same finite integer)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        dsir_importance_weights,
    )

    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    assert dsir_importance_weights(spark, "", docs=empty).count() == 0
    no_target = spark.createDataFrame(
        [(1, "de", "x y"), (2, "fr", "x z")],
        "doc_id long, lang string, text string",
    )
    rows = dsir_importance_weights(spark, "", docs=no_target).collect()
    assert len(rows) == 2
    assert all(isinstance(r["logw_q"], int) for r in rows)


def test_bpe_encode_stats_refuses_empty_vocab(spark):
    """A corpus with no alphabetic words exhausts the BPE vocabulary
    at step 1 — training refuses loudly (same contract as
    bpe_learn_merges), never returns an empty merge table silently."""
    import pytest

    from bottledwater_pg_spark.operators.llm_queries import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame(
        [(1, "s", "123 456 !!!")], "doc_id long, source string, text string"
    )
    with pytest.raises(RuntimeError, match="exhausted"):
        bpe_encode_stats(spark, "", docs=docs).collect()


def test_pq_handles_corpus_smaller_than_codebook(spark):
    """PQ with fewer corpus vectors than k_sub codebook slots: the
    deterministic sample just yields a smaller codebook; encode and
    ADC still run and return every non-self neighbor."""
    from bottledwater_pg_spark.operators import similarity

    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.topk_pq(
        vecs, vecs.filter(F.col("vec_id") == 0), k=3,
        n_sub=2, k_sub=16, refine=10,
    ).collect()
    assert len(out) == 3  # the 3 non-self vectors, ranked
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_streaming_vector_dedup_empty_batch(spark, tmp_path):
    """An empty micro-batch writes empty slices and leaves the
    accepted set unchanged — no crash, no state corruption."""
    from bottledwater_pg_spark.streaming.stream import (
        StreamingVectorDedupIndex,
    )

    idx = StreamingVectorDedupIndex(spark, str(tmp_path / "v"))
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    idx.process_batch(vecs, 0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    idx.process_batch(empty, 1)
    assert {r.vec_id for r in idx.accepted_ids().collect()} == {1, 2}


def test_sq_and_mrl_empty_and_single_vector(spark):
    """SQ8 and the MRL funnel on empty/one-vector corpora: empty in,
    empty out (stats fold yields null arrays on zero rows — the
    encode must not crash); a single vector has no neighbors."""
    from bottledwater_pg_spark.operators.similarity import (
        topk_mrl,
        topk_sq,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert topk_sq(empty, empty, k=3).count() == 0
    assert topk_mrl(empty, empty, k=3, prefix_dim=2, refine=5).count() == 0
    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert topk_sq(one, one, k=3).count() == 0
    assert topk_mrl(one, one, k=3, prefix_dim=1, refine=5).count() == 0


def test_containment_empty_and_identical_docs(spark):
    """Containment on an empty corpus is empty; two identical docs are
    mutual containment 1.0 emitted ONCE with the id tie-break."""
    from bottledwater_pg_spark.operators.dedup import (
        containment_prefix_pairs,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert containment_prefix_pairs(empty, 8000).count() == 0
    twins = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    got = containment_prefix_pairs(twins, 8000).collect()
    assert [(r.a_id, r.b_id, r.containment) for r in got] == [(1, 2, 1.0)]


def test_unimax_degenerate_budgets(spark):
    """Zero budget allocates zero everywhere; a single stratum takes
    min(budget, capacity); zero-size strata survive (0 tokens, 0
    allocation, epochs div guarded by the caller's data — here size
    >= 1 so the div is safe by the operator's contract)."""
    from bottledwater_pg_spark.operators.sampling import (
        unimax_allocations,
    )

    sizes = spark.createDataFrame(
        [("a", 7), ("b", 3)], "lang string, n_tokens long"
    )
    zero = {r.lang: r.allocation
            for r in unimax_allocations(sizes, 0, 3).collect()}
    assert zero == {"a": 0, "b": 0}
    solo = spark.createDataFrame([("x", 10)], "lang string, n_tokens long")
    got = unimax_allocations(solo, 7, 2).collect()[0]
    assert (got.capped, got.allocation) == (0, 7)
    got2 = unimax_allocations(solo, 1000, 2).collect()[0]
    assert (got2.capped, got2.allocation) == (1, 20)


def test_c4_gate_empty_and_unpunctuated(spark):
    """The streaming C4 gate on an empty frame stays empty; a page of
    unpunctuated one-line text (this fixture's natural shape) is
    dropped for too few kept lines — never a crash."""
    from bottledwater_pg_spark.streaming.stream import c4_gate

    empty = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    assert c4_gate(empty).count() == 0
    plain = spark.createDataFrame(
        [(1, "s", "just words with no punctuation at all here")],
        "doc_id long, source string, text string",
    )
    assert c4_gate(plain).count() == 0


def test_perceptron_single_class_and_empty(spark):
    """Training on a single-class corpus must not crash: with only
    positives every round's negative mean is zero, weights track the
    positive mean, and everything classifies positive (accuracy
    10000). An empty feature frame trains to zero weights."""
    from bottledwater_pg_spark.operators.llm_queries import (
        _perceptron_features,
        _perceptron_train,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma d{i} e{i}") for i in range(4)],
        "doc_id long, text string",
    )
    feats = _perceptron_features(docs)  # all labels +1
    w = _perceptron_train(spark, feats).collect()[0][0]
    assert len(w) == 5 and any(v != 0 for v in w)
    empty = spark.createDataFrame(
        [], "doc_id long, y long, x array<bigint>"
    )
    w0 = _perceptron_train(spark, empty).collect()[0][0]
    assert w0 == [0, 0, 0, 0, 0]


def test_incremental_containment_degenerate(spark):
    """incremental_containment_matches: refuses a lone precomputed
    side; empty batch or empty index yields no matches; an identical
    stored doc matches at containment 1.0 in both probe roles."""
    import pytest

    from bottledwater_pg_spark.operators.dedup import (
        containment_prefix,
        incremental_containment_matches,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    sh = shingle_table(docs)
    pfx = containment_prefix(sh, 8000)
    with pytest.raises(ValueError, match="lone precomputed"):
        incremental_containment_matches(None, docs, index_shingles=sh)
    assert incremental_containment_matches(
        None, empty, index_shingles=sh, index_prefix=pfx
    ).count() == 0
    assert incremental_containment_matches(docs, empty).count() == 0
    twin = spark.createDataFrame(
        [(2, "a b c d e f")], "doc_id long, text string"
    )
    m = incremental_containment_matches(
        None, twin, index_shingles=sh, index_prefix=pfx
    ).collect()
    assert [(r.new_id, r.match_id, r.containment) for r in m] == [
        (2, 1, 1.0)
    ]


def test_streaming_containment_empty_batch(spark, tmp_path):
    """An empty micro-batch (markers-only trigger) through the
    containment index: no crash, no state change."""
    from bottledwater_pg_spark.streaming.stream import (
        StreamingContainmentIndex,
    )

    idx = StreamingContainmentIndex(spark, str(tmp_path / "c"))
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "z y x w v")],
        "doc_id long, text string",
    )
    idx.process_batch(docs, 0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx.process_batch(empty, 1)
    assert {r.doc_id for r in idx.accepted_ids().collect()} == {1, 2}


def test_tiered_compact_on_empty_and_fresh_state(spark, tmp_path):
    """compact() with l1_max on a state dir with no slices at all, and
    on one live epoch only (nothing closed): both no-ops, no crash."""
    from bottledwater_pg_spark.streaming.stream import StreamingDedupIndex

    idx = StreamingDedupIndex(
        spark, str(tmp_path / "t"), threshold=0.8, l1_max=2
    )
    idx.compact(5)  # nothing on disk yet
    docs = spark.createDataFrame(
        [(1, "some document body here")], "doc_id long, text string"
    )
    idx.process_batch(docs, 0)
    idx.compact(0)  # epoch 0 is live at watermark 0: nothing closed
    assert {r.doc_id for r in idx.accepted_ids().collect()} == {1}


def test_mrl_encode_stored_prefix_equals_inline(spark):
    """topk_mrl with a stored mrl_encode table returns exactly the
    on-the-fly result (the r12 layout change is bytes-only)."""
    from bottledwater_pg_spark.operators.similarity import (
        mrl_encode,
        topk_mrl,
    )

    # +1 offsets keep every prefix slice nonzero-norm (zero-norm
    # vectors are the cosine family's documented degenerate input)
    vecs = spark.createDataFrame(
        [(i, [float(i % 3 + 1), float(i % 5 + 1), float(i % 7), 1.0])
         for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    qs = vecs.filter("vec_id < 3")
    inline = topk_mrl(vecs, qs, k=3, prefix_dim=2, refine=6)
    stored = topk_mrl(
        vecs, qs, k=3, prefix_dim=2, refine=6,
        index_prefix=mrl_encode(vecs, prefix_dim=2),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, stored.collect())
    )
