"""Semantic tests for the LLM-pipeline operators that have no SQL
oracle (SimHash, LSH ANN), plus recall/precision assertions for the
sketch-based dedup paths against their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators import dedup, similarity
from bottledwater_pg_spark.operators.llm_queries import (
    NEAR_COPY_MOD,
    docs_with_near_dups,
    embeddings_with_dups,
)
from bottledwater_pg_spark.session import load_table


def test_simhash_finds_injected_near_dups(spark, sf_dir):
    corpus = docs_with_near_dups(spark, sf_dir)
    pairs = dedup.simhash_near_pairs(corpus, max_hamming=6).toPandas()
    injected = {
        (r.doc_id, r.doc_id + 200000)
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % NEAR_COPY_MOD == 0)
        .select("doc_id")
        .collect()
    }
    found = {(a, b) for a, b in zip(pairs.a_id, pairs.b_id)}
    recall = len(injected & found) / len(injected)
    # appending 3 tokens flips few simhash bits; expect high recall
    assert recall >= 0.9, f"simhash recall {recall}"


def test_minhash_lsh_equals_bruteforce(spark, sf_dir):
    corpus = docs_with_near_dups(spark, sf_dir)
    brute = dedup.jaccard_pairs(corpus, 0.8).toPandas()
    lsh = dedup.minhash_lsh_pairs(corpus, num_hashes=32, bands=16,
                                  threshold=0.8).toPandas()
    bset = {(a, b) for a, b in zip(brute.a_id, brute.b_id)}
    lset = {(a, b) for a, b in zip(lsh.a_id, lsh.b_id)}
    assert lset == bset, f"missing={bset - lset} extra={lset - bset}"


def test_embedding_lsh_equals_bruteforce(spark, sf_dir):
    corpus = embeddings_with_dups(spark, sf_dir)
    brute = dedup.embedding_near_dup_pairs(corpus, 0.99).toPandas()
    lsh = dedup.hyperplane_lsh_near_dup(corpus, 0.99).toPandas()
    bset = {(a, b) for a, b in zip(brute.a_id, brute.b_id)}
    lset = {(a, b) for a, b in zip(lsh.a_id, lsh.b_id)}
    # identical vectors agree on every band -> recall is exactly 1
    assert lset == bset


def test_ann_ivf_cells_and_scores(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    approx = similarity.topk_ivf(emb, queries, k=5, n_list=32, n_probe=8).toPandas()
    assert (approx.groupby("query_id")["rank"].max() <= 5).all()
    assert approx.cos.between(-1.001, 1.001).all()
    # scores must equal brute force for every returned pair
    brute = similarity.topk_bruteforce(emb, queries, k=5).toPandas()
    merged = approx.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_i", "_b")
    )
    if len(merged):
        assert (merged.cos_i == merged.cos_b).all()
    # every returned neighbor must come from a cell the query probed —
    # the structural IVF invariant
    cent = similarity.ivf_centroids(emb, 32)
    assigned = similarity.ivf_assign(emb, cent).select("sid", "cent_id").toPandas()
    cell_of = dict(zip(assigned.sid, assigned.cent_id))
    qv = similarity.quantized_vectors(queries)
    qs = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn(
            "cos",
            similarity.cosine_pre("qvec", "cent_q", "qnorm", "cent_n"),
        )
        .toPandas()
    )
    probed = (
        qs.sort_values(["sid", "cos", "cent_id"], ascending=[True, False, True])
        .groupby("sid")
        .head(8)
        .groupby("sid")["cent_id"]
        .apply(set)
        .to_dict()
    )
    for q, n in zip(approx.query_id, approx.neighbor_id):
        assert cell_of[n] in probed[q]


def test_ann_lsh_subset_and_ranked(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    approx = similarity.topk_lsh(emb, queries, k=5).toPandas()
    assert (approx.groupby("query_id")["rank"].max() <= 5).all()
    assert approx.cos.between(-1.001, 1.001).all()
    # every (query, neighbor) the LSH returns must score exactly what
    # brute force scores for that pair (same cosine implementation)
    brute = similarity.topk_bruteforce(emb, queries, k=5).toPandas()
    merged = approx.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_l", "_b")
    )
    if len(merged):
        assert (merged.cos_l == merged.cos_b).all()


def test_training_pipeline_example_end_to_end(spark, sf_dir):
    """The examples/training_pipeline.py composition runs end-to-end
    and every stage preserves the invariants: dedup only removes rows,
    split is total, shards cover every surviving doc."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "training_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "training_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stages = mod.run(spark, sf_dir)
    n_current = stages["current"].count()
    n_canonical = stages["canonical"].count()
    n_gophered = stages["gophered"].count()
    n_capped = stages["capped"].count()
    n_clean = stages["clean"].count()
    assert (
        n_current >= n_canonical >= n_gophered >= n_capped >= n_clean > 0
    )
    # the quota stage caps every source at 400
    assert (
        stages["capped"].groupBy("source").count()
        .agg(F.max("count")).first()[0] <= 400
    )
    # span audit reports only canonical docs; the DSIR shortlist is
    # bounded and scores only clean (surviving) docs
    canon_ids = {r["doc_id"] for r in stages["canonical"].collect()}
    assert {
        r["doc_id"] for r in stages["span_audit"].collect()
    } <= canon_ids
    dsir_rows = stages["dsir_top"].collect()
    assert 0 < len(dsir_rows) <= 20
    clean_ids = {r["doc_id"] for r in stages["clean"].collect()}
    assert {r["doc_id"] for r in dsir_rows} <= clean_ids

    split_counts = dict(
        stages["split_docs"].groupBy("split").count().collect()
    )
    assert set(split_counts) == {"train", "val", "test"}
    assert sum(split_counts.values()) == n_clean
    sharded = stages["shards"].agg(F.sum("n_docs")).first()[0]
    assert sharded == n_clean
    # negatives: train-split only, no self-pairs, <= 2 per doc
    negs = stages["negatives"]
    train_ids = {
        r["doc_id"]
        for r in stages["split_docs"].filter("split = 'train'").collect()
    }
    nrows = negs.collect()
    assert nrows and all(r["id"] != r["neg_id"] for r in nrows)
    assert {r["id"] for r in nrows} <= train_ids
    assert negs.groupBy("id").count().agg(F.max("count")).first()[0] <= 2


def test_multimodal_resize_and_feature_stubs(spark, sf_dir):
    """Resize/feature-extract plumbing: Arrow batch transfer, output
    schemas, determinism, and bounded output sizes."""
    from bottledwater_pg_spark.operators import multimodal
    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    binary = multimodal.with_binary_payload(docs)

    resized = multimodal.resize_stub(binary, width=64, height=48)
    rows = resized.collect()
    assert len(rows) == 50
    target = 64 * 48 // 64
    assert all(len(r["data"]) <= target for r in rows)
    assert all((r["width"], r["height"]) == (64, 48) for r in rows)

    feats = multimodal.extract_features_stub(binary, dim=8)
    a = {r["doc_id"]: tuple(r["features"]) for r in feats.collect()}
    b = {r["doc_id"]: tuple(r["features"]) for r in feats.collect()}
    assert a == b  # deterministic
    assert all(len(v) == 8 and all(0 <= x <= 1 for x in v) for v in a.values())


def test_winnow_guarantee_shared_substring_yields_shared_fingerprint(spark):
    """Winnowing guarantee (Schleimer et al.): two docs sharing a
    substring of length >= k + w - 1 (= 11 for k=8, w=4) share at
    least one selected fingerprint; disjoint docs share none."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.functions.text import kgram_hashes, winnow_mins

    common = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + common + " BBBB"),
            (2, "cccc dddd " + common),
            (3, "totally unrelated content here"),
        ],
        "doc_id long, text string",
    )
    fps = (
        docs.withColumn("_g", kgram_hashes("text", 8))
        .select("doc_id", F.explode(winnow_mins("_g", 4)).alias("fp"))
        .distinct()
    )
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in fps.groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    }
    assert sets[1] & sets[2], "shared 25-char substring must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])


def test_ppm_codec_real_roundtrip(spark, sf_dir):
    """The PPM codec is a REAL decode: whitespace-looking pixel bytes
    survive (the str.split trap), encode->decode round-trips exactly,
    and the nearest-neighbor resize computes actual resampling."""
    import numpy as np
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_ppm,
        synth_ppm_payloads,
    )

    # pixel buffer starting with whitespace bytes (0x20, 0x0A)
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    px[0, 0] = (0x20, 0x0A, 0x09)
    data = encode_ppm(6, 4, px)
    w, h, back = decode_ppm(data)
    assert (w, h) == (6, 4) and np.array_equal(back, px)

    # nearest-neighbor resize: exact index-striding semantics
    w2, h2, small = decode_ppm(
        bytes(
            resize_ppm(
                spark.createDataFrame([(1, bytearray(data))], "doc_id long, data binary"),
                width=3, height=2,
            ).first()["data"]
        )
    )
    xs = (np.arange(3) * 6 // 3).clip(0, 5)
    ys = (np.arange(2) * 4 // 2).clip(0, 3)
    assert (w2, h2) == (3, 2)
    assert np.array_equal(small, px[np.ix_(ys, xs)])

    # synthesized corpus payloads decode to the closed-form dims
    docs = spark.createDataFrame([(17,), (40,)], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in synth_ppm_payloads(docs)
        .select("doc_id", "data")
        .collect()
    }
    for doc_id in (17, 40):
        w3, h3, arr = decode_ppm(bytes(out[doc_id]["data"]))
        assert (w3, h3) == (8 + doc_id % 9, 8 + doc_id % 7)
        flat = arr.reshape(-1).astype(int)
        assert flat[0] == doc_id % 251 % 256
        assert flat[-1] == (doc_id % 251 + len(flat) - 1) % 256


def test_simhash_md5_finds_planted_near_dups(spark, sf_dir):
    """The md5-hash SimHash (cross-engine-certified twin of the
    xxhash64 path) recovers most planted near-copy pairs. Banded
    blocking is probabilistic-recall BY DESIGN: a pair at hamming
    5-10 can miss all 4 bands — so the pin is a deterministic recall
    floor plus the invariant that every REPORTED pair really is
    within the hamming budget (the oracle certifies exactness)."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.llm_queries import (
        NEAR_COPY_MOD,
        simhash_md5_near_dup,
    )
    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = {
        (r["doc_id"], r["doc_id"] + 200000)
        for r in docs.filter(F.col("doc_id") % NEAR_COPY_MOD == 0)
        .select("doc_id")
        .collect()
    }
    rows = simhash_md5_near_dup(spark, sf_dir).collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    assert all(r["hamming"] <= 10 and r["a_id"] < r["b_id"] for r in rows)
    recall = len(planted & got) / len(planted)
    assert recall >= 0.8, f"recall {recall:.2f} below deterministic floor"


def test_semdedup_prunes_injected_twins_and_leaves_no_near_pair(spark, sf_dir):
    """Every injected exact-copy vector (id+100000) must be pruned by
    SemDeDup (its twin shares the cluster and has cos = 1.0 to it),
    and the surviving set must contain no within-cluster pair at or
    above the threshold (the operator's fixpoint property under the
    keep-lowest-id rule for threshold-transitive duplicate groups)."""
    corpus = embeddings_with_dups(spark, sf_dir)
    pruned = similarity.semdedup_prune(corpus, n_clusters=8, threshold=0.99)
    p = pruned.toPandas()
    injected = {
        r.vec_id + 100000
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id")
        .collect()
    }
    pruned_ids = set(p.pruned_id)
    assert injected <= pruned_ids, sorted(injected - pruned_ids)[:5]
    # kept_by witnesses must themselves survive OR be pruned by an even
    # lower id (min-id rule): a kept_by that is pruned implies its own
    # witness is < it, so the chain bottoms out at an unpruned id.
    assert (p.kept_by < p.pruned_id).all()
    # survivors (corpus minus pruned) must contain no remaining
    # within-cluster pair at/above threshold among the injected
    # exact-copy groups: cos 1.0 is transitive, so if any twin pair
    # both survived the min-id rule was violated
    cent = similarity.ivf_centroids(corpus, 8)
    assigned = similarity.ivf_assign(corpus, cent)
    survivors = assigned.join(
        pruned.select(F.col("pruned_id").alias("sid")), "sid", "left_anti"
    )
    leftover = similarity.semdedup_pairs_pruned(survivors, 0.99)
    twins_left = leftover.filter(
        F.col("pruned_id") >= 100000
    ).count()
    assert twins_left == 0


def test_incremental_dedup_finds_every_injected_copy_batchwise(spark, sf_dir):
    """Every near-copy in the new batch must match its index original
    (J ~ 0.9 >= 0.8 after the 3-token suffix), and cost asymmetry
    holds structurally: no index-index pairs appear."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    newb = docs.filter(F.col("doc_id") % NEAR_COPY_MOD == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    m = dedup.incremental_lsh_matches(docs, newb, threshold=0.99).toPandas()
    # exact copies here (no suffix): every new doc must hit its origin
    origins = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % NEAR_COPY_MOD == 0)
        .select("doc_id")
        .collect()
    }
    hit = dict(zip(m.new_id, m.match_id))
    for o in origins:
        assert hit.get(o + 200000) is not None
    assert (m.new_id >= 200000).all()
    assert (m.match_id < 200000).all()


def test_wav_codec_roundtrip_and_gates(spark):
    """Real RIFF parse: roundtrip exactness, tolerance of extra chunks
    before data, and hard gates on non-WAV / non-PCM16 payloads."""
    import struct

    import numpy as np
    import pytest

    from bottledwater_pg_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 1, -2, 32767, -32768, 513], dtype=np.int16)
    rate, out = decode_wav(encode_wav(44100, s))
    assert rate == 44100 and (out == s).all()

    # insert a LIST chunk between fmt and data: parser must skip it
    raw = encode_wav(8000, s)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    rate2, out2 = decode_wav(patched)
    assert rate2 == 8000 and (out2 == s).all()

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOTAWAVFILE0" + b"\x00" * 20)
    stereo = bytearray(encode_wav(8000, s))
    stereo[22] = 2  # channels field
    with pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(stereo))


def test_training_pipeline_eval_sample_stage(spark, sf_dir):
    """New stage 9: the eval draw is deterministic, val-only, and
    ~n_samples sized."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "training_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "training_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stages = mod.run(spark, sf_dir)
    samp = stages["eval_sample"].toPandas()
    val_ids = {
        r["doc_id"]
        for r in stages["decontaminated"].filter("split = 'val'").collect()
    }
    assert set(samp.doc_id) <= val_ids
    assert 1 <= len(samp) <= 22


def test_ensemble_clustering_subsumes_each_modality(spark, sf_dir):
    """Every injected near-copy must share its original's ensemble
    canonical id (any single modality suffices to merge them), and
    ensemble clusters must be coarser-or-equal than MinHash-only
    clusters (adding edges can only merge components, never split)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        dedup_cluster_canonical,
        dedup_cluster_ensemble,
    )

    ens = {
        r.doc_id: r.canonical_id
        for r in dedup_cluster_ensemble(spark, sf_dir).collect()
    }
    for did, canon in ens.items():
        if did >= 200000:
            assert canon == ens[did - 200000], (did, canon)
    mh = {
        r.doc_id: r.canonical_id
        for r in dedup_cluster_canonical(spark, sf_dir).collect()
    }
    # coarser-or-equal: same MinHash canonical -> same ensemble canonical
    from collections import defaultdict

    groups = defaultdict(list)
    for did, c in mh.items():
        groups[c].append(did)
    for members in groups.values():
        assert len({ens[m] for m in members}) == 1


def test_bpe_learn_merges_hand_corpus(spark):
    """BPE training on a hand-computable corpus (Sennrich-style):
    words abab (freq 2) + ab (freq 1). Step 1: pair (a,b) has
    frequency-weighted count 2*2 + 1 = 5 (beats (b,a) at 2); step 2:
    (ab, ab) at 2; step 3 has no pairs left and must refuse loudly."""
    import pytest

    from bottledwater_pg_spark.operators.llm_queries import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(1, "abab abab ab")], "doc_id long, text string"
    )
    got = [
        (r["step"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_learn_merges(spark, "", steps=2, docs=docs)
        .orderBy("step").collect()
    ]
    assert got == [(1, "a", "b", 5), (2, "ab", "ab", 2)]
    with pytest.raises(RuntimeError, match="exhausted"):
        bpe_learn_merges(spark, "", steps=3, docs=docs)


def test_lm_surprise_ranks_rare_bigrams_highest(spark):
    """The LM filter's contract: a document of corpus-frequent bigrams
    scores LESS surprising than a document whose bigrams are unique in
    the corpus — the CCNet keep/drop direction."""
    from bottledwater_pg_spark.operators.llm_queries import (
        lm_surprise_outliers,
    )

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zq xv qn kr wt pl"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = lm_surprise_outliers(spark, "", docs=docs).collect()
    assert out[0]["doc_id"] == 100  # the junk doc tops the list
    junk = out[0]["mean_surprise_q"]
    common = [r["mean_surprise_q"] for r in out if r["doc_id"] != 100]
    assert all(junk > c for c in common)
    # deterministic: a second run returns the identical ranking
    again = lm_surprise_outliers(spark, "", docs=docs).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]


def test_exact_substring_spans_hand_corpus(spark):
    """Span semantics pinned on a constructed corpus: overlapping
    duplicated k-gram starts merge into ONE maximal span; a gap > k
    tokens splits spans; a doc duplicated only WITHIN itself reports
    nothing (cross-document means min(doc)!=max(doc)); unique docs are
    absent from the output."""
    from bottledwater_pg_spark.operators.llm_queries import (
        exact_substring_spans,
    )

    w = lambda *xs: " ".join(xs)  # noqa: E731
    shared = w(*[f"s{i}" for i in range(10)])     # 10-token shared run
    shared2 = w(*[f"z{i}" for i in range(8)])     # exactly k tokens
    docs = spark.createDataFrame(
        [
            # doc 1: shared run at the start, then 20 unique tokens,
            # then the second shared run -> TWO spans (gap 20 > k)
            (1, shared + " " + w(*[f"u{i}" for i in range(20)]) + " "
             + shared2),
            # doc 2: the first shared run embedded mid-doc -> ONE span
            (2, w("a", "b", "c") + " " + shared + " " + w("d", "e")),
            # doc 3: the second shared run verbatim -> ONE span
            (3, shared2),
            # doc 4: internal repetition only -> NOT in the output
            (4, w(*(["r"] * 30))),
            # doc 5: all unique -> NOT in the output
            (5, w(*[f"q{i}" for i in range(30)])),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in exact_substring_spans(spark, "", docs=docs).collect()
    }
    assert set(out) == {1, 2, 3}
    # doc 1: 10 dup tokens (positions 1..3 of the k-grams merge) plus
    # the 8-token tail run
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 10 + 8
    assert out[1]["n_tokens"] == 38
    assert out[1]["dup_frac_bp"] == (18 * 10000) // 38
    # doc 2: one 10-token span even though three 8-gram starts overlap
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 10
    # doc 3: the whole 8-token doc is one span
    assert out[3]["n_spans"] == 1 and out[3]["dup_tokens"] == 8
    assert out[3]["dup_frac_bp"] == 10000


def test_exact_substring_spans_hashed_matches_textual(spark, sf_dir):
    """Parity pin for the production hashed-gram variant: on the full
    documents corpus the 60-bit gram hash must reproduce the textual
    twin's spans row-for-row (no collision at this scale — and any
    future collision would surface here as a diff, which is exactly
    the audit the docstring promises)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        exact_substring_spans,
        exact_substring_spans_hashed,
    )

    textual = exact_substring_spans(spark, sf_dir)
    hashed = exact_substring_spans_hashed(spark, sf_dir)
    assert textual.exceptAll(hashed).count() == 0
    assert hashed.exceptAll(textual).count() == 0


def test_dsir_importance_weights_hand_corpus(spark):
    """DSIR pin: docs made of target-distribution tokens outscore
    docs of off-target tokens; weights are integers and the per-doc
    weight equals occurrences x the bucket's quantized score."""
    from bottledwater_pg_spark.operators.llm_queries import (
        dsir_importance_weights,
    )

    tgt_text = " ".join(["alpha"] * 12)
    off_text = " ".join(["omega"] * 12)
    docs = spark.createDataFrame(
        [
            (1, "en", tgt_text),       # the target distribution itself
            (2, "de", tgt_text),       # raw doc matching the target
            (3, "de", off_text),       # raw doc far from the target
            (4, "de", "alpha " * 5 + "omega " * 5),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_importance_weights(spark, "", docs=docs).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    # target-matching docs outrank the off-target doc
    assert rows[2]["logw_q"] > rows[4]["logw_q"] > rows[3]["logw_q"]
    assert rows[1]["logw_q"] == rows[2]["logw_q"]  # identical text
    # integer weights, linear in occurrences: every 'alpha' token sits
    # in one bucket, so doc 2's weight is 12x the per-token score
    assert rows[2]["logw_q"] % 12 == 0
    assert rows[2]["n_tokens"] == 12


def test_bpe_encode_stats_hand_corpus(spark):
    """Train-then-apply parity: words fully merged by training encode
    to ONE token; unseen structure stays at character granularity; the
    fertility ratios are integer basis points."""
    from bottledwater_pg_spark.operators.llm_queries import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame(
        [(1, "s1", ("ab " * 6).strip()), (2, "s2", "xy xy qz")],
        "doc_id long, source string, text string",
    )
    rows = {
        r["source"]: r
        for r in bpe_encode_stats(spark, "", steps=2, docs=docs).collect()
    }
    # step 1 merges (a,b) [freq 6]; step 2 merges (x,y) [freq 2] —
    # so every s1 word is one 'ab' token, every s2 word one token of
    # 'xy' except 'qz' which stays... 'qz' appears once; after 2 steps
    # only 'ab' and 'xy' merged, so 'qz' is still 2 symbols
    assert rows["s1"]["n_words"] == 6
    assert rows["s1"]["n_bpe_tokens"] == 6          # 'ab' -> 1 symbol
    assert rows["s1"]["tokens_per_word_bp"] == 10000
    assert rows["s1"]["chars_per_token_bp"] == 20000  # 2 chars/token
    assert rows["s2"]["n_words"] == 3
    assert rows["s2"]["n_bpe_tokens"] == 2 + 2      # xy,xy=1 each; qz=2
    assert rows["s2"]["tokens_per_word_bp"] == (4 * 10000) // 3


def test_kmeans_lloyd_hand_corpus_converges_and_drops_empty(spark):
    """Lloyd's pin on a constructed corpus: two well-separated blobs
    with k=2 lowest-id seeds (one seed per blob) converge in one
    round to the exact blob partition and exact integer centroid
    means; running MORE rounds changes nothing (fixpoint); a seed
    that captures no members simply drops out of the update."""
    from bottledwater_pg_spark.operators.similarity import kmeans_lloyd

    # blob A around (1, 0), blob B around (0, 1); ids interleaved so
    # the 2 lowest-id seeds (0, 1) land one in each blob
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (2, [0.9, 0.1]), (3, [0.1, 0.9]),
        (4, [1.1, -0.1]), (5, [-0.1, 1.1]),
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for iters in (1, 3):
        assign, cents = kmeans_lloyd(docs, k=2, iters=iters)
        got = {r["sid"]: r["cid"] for r in assign.collect()}
        assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
        cv = {r["cid"]: r["cv"] for r in cents.collect()}
        # exact integer means of the quantized members (0.9 -> 900000,
        # 0.1 -> 100000, -0.1 -> -100000, 1.1 -> 1100000 under the
        # FLOOR(x * 1e6) quantizer on this platform's doubles)
        assert cv[0] == [(1_000_000 + 900_000 + 1_100_000) // 3,
                         (0 + 100_000 - 100_000) // 3]
        assert cv[1] == [(0 + 100_000 - 100_000) // 3,
                         (1_000_000 + 900_000 + 1_100_000) // 3]

    # k=3: seed 2 (inside blob A, farther than seed 0 for every A
    # member except itself) keeps only itself; all clusters remain
    # non-empty here, so instead make an empty one: a seed identical
    # to another loses every tie to the lower cid and drops out
    dup_seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    assign3, cents3 = kmeans_lloyd(dup_seed, k=2, iters=2)
    got3 = {r["sid"]: r["cid"] for r in assign3.collect()}
    assert got3 == {0: 0, 1: 0, 2: 0}  # cid=1 ties lose to cid=0
    assert {r["cid"] for r in cents3.collect()} == {0}  # empty 1 dropped


def test_ivf_trained_separates_clusters_lowest_id_sample_cannot(spark):
    """The point of training on a CLUSTERED corpus: both lowest-id
    vectors sit in blob A, so the untrained sample's two cells are
    both A-directions and nearly the whole corpus lands in one cell —
    a mega-cell (probes degenerate toward brute force). Lloyd's
    rounds from those same seeds separate the blobs: each trained
    cell is one blob, and a blob-B query at n_probe=1 finds only true
    blob-B neighbors while scanning only its own blob's cell."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.functions.vectors import norm_pre
    from bottledwater_pg_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        kmeans_lloyd,
        topk_ivf_trained,
    )

    # blob A along dim0 (ids 0-7), blob B along dim1 (ids 8-15);
    # the k=2 lowest-id sample takes ids 0 and 1 — both in A
    rows = [(i, [1.0, 0.01 * i, 0.0]) for i in range(8)] + [
        (8 + i, [0.01 * i, 1.0, 0.0]) for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    n = len(rows)

    def cell_sizes(cent):
        return [
            r["count"]
            for r in ivf_assign(docs, cent).groupBy("cent_id")
            .count().collect()
        ]

    # untrained: both cells point down blob A -> mega-cell
    assert max(cell_sizes(ivf_centroids(docs, 2))) >= (3 * n) // 4

    # trained from the SAME seeds: one cell per blob
    _, cents = kmeans_lloyd(docs, k=2, iters=3)
    cent_t = cents.select(
        F.col("cid").alias("cent_id"),
        F.col("cv").alias("cent_q"),
        norm_pre("cv").alias("cent_n"),
    )
    assert sorted(cell_sizes(cent_t)) == [8, 8]

    # a blob-B query at n_probe=1 finds only true blob-B neighbors
    queries = docs.filter(F.col("vec_id") == 8)
    got = topk_ivf_trained(docs, queries, k=3, n_list=2, iters=3,
                           n_probe=1).collect()
    assert len(got) == 3
    assert {r.neighbor_id for r in got} <= set(range(9, 16))


def test_kmeans_semdedup_prunes_every_injected_copy(spark, sf_dir):
    """The trained-cluster SemDeDup must prune EVERY injected +100000
    exact copy: an identical vector has identical distances, so the
    tie-break assigns it to its original's cluster, where cosine 1.0
    >= threshold prunes it. Totals reconcile with membership."""
    from bottledwater_pg_spark.operators.llm_queries import (
        NEAR_COPY_MOD,
        embeddings_with_dups,
        kmeans_semdedup_stats,
    )

    out = kmeans_semdedup_stats(spark, sf_dir).toPandas()
    corpus = embeddings_with_dups(spark, sf_dir)
    n_total = corpus.count()
    n_copies = corpus.filter(F.col("vec_id") >= 100000).count()
    assert out.n_members.sum() == n_total
    assert out.n_pruned.sum() >= n_copies
    # every injected copy is pruned: check SET INCLUSION directly on
    # the pruned-id set over the same kmeans assignment (a sum bound
    # could be satisfied by unrelated sub-100000 prunes compensating
    # for a surviving copy)
    from bottledwater_pg_spark.functions.vectors import norm_pre
    from bottledwater_pg_spark.operators import similarity
    from bottledwater_pg_spark.operators.llm_queries import (
        COSINE_THRESHOLD,
        KMEANS_ITERS,
        KMEANS_K,
    )

    assign, _ = similarity.kmeans_lloyd(
        corpus, k=KMEANS_K, iters=KMEANS_ITERS
    )
    assigned = assign.select(
        "sid", F.col("cid").alias("cent_id"), "qvec"
    ).withColumn("qnorm", norm_pre("qvec"))
    pruned_ids = {
        r.pruned_id
        for r in similarity.semdedup_pairs_pruned(assigned, COSINE_THRESHOLD)
        .select("pruned_id").collect()
    }
    copy_ids = {
        r.vec_id for r in corpus.filter(F.col("vec_id") >= 100000)
        .select("vec_id").collect()
    }
    assert copy_ids <= pruned_ids
    assert out.pruned_id_sum.sum() == sum(pruned_ids)


def test_gopher_rules_fire_exactly_on_hand_docs(spark):
    """Each Gopher rule pinned on a constructed doc that fails it and
    ONLY it (the pass doc clears all four; the TTR doc shows a second
    co-occurring failure is counted in its own column too)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        gopher_quality_flags,
    )

    # doc0 passes: 62 tokens, mean len 6.9, 2 stopwords, all distinct
    doc_pass = " ".join(["the", "and"] + [f"word{i:03d}" for i in range(60)])
    # doc1 fails wordcount ONLY: 4 tokens (mean len 5, 2 stopwords,
    # ttr 1.0)
    fail_wc = "the and word001 word002"
    # doc2 fails mean-word-length ONLY: 62 tokens of which 60 are
    # DISTINCT 2-char words (ttr 1.0; chars 126 < 3*62)
    two_chars = [chr(97 + i // 26) + chr(97 + i % 26) for i in range(60)]
    fail_wl = " ".join(["the", "and"] + two_chars)
    # doc3 fails stopwords ONLY: 60 distinct 7-char words, 0 stopwords
    fail_sw = " ".join(f"word{i:03d}" for i in range(60))
    # doc4 fails type-token ratio ONLY: 62 tokens, 3 types
    # (mean len 8.8, 2 stopwords)
    fail_ttr = " ".join(["the", "and"] + ["samething"] * 60)
    docs = spark.createDataFrame(
        [
            (0, "s", doc_pass),
            (1, "s", fail_wc),
            (2, "s", fail_wl),
            (3, "s", fail_sw),
            (4, "s", fail_ttr),
        ],
        "doc_id long, source string, text string",
    )
    out = gopher_quality_flags(spark, "ignored", corpus=docs).collect()[0]
    assert out.n_docs == 5
    assert out.n_pass == 1
    assert out.n_fail_wordcount == 1
    assert out.n_fail_wordlen == 1
    assert out.n_fail_stopwords == 1
    assert out.n_fail_ttr == 1


def test_source_quota_keeps_lowest_fingerprint_docs(spark, sf_dir):
    """The quota cap keeps exactly the SOURCE_QUOTA_CAP docs with the
    lowest (fingerprint, doc_id) per source — recomputing the
    selection independently reproduces kept_id_sum."""
    from bottledwater_pg_spark.functions.text import fingerprint
    from bottledwater_pg_spark.operators.llm_queries import (
        SOURCE_QUOTA_CAP,
        source_quota_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", fingerprint("text").alias("fp")
    ).toPandas()
    want = (
        docs.sort_values(["source", "fp", "doc_id"])
        .groupby("source")
        .head(SOURCE_QUOTA_CAP)
        .groupby("source")
        .doc_id.sum()
        .to_dict()
    )
    got = {
        r.source: r.kept_id_sum
        for r in source_quota_sample(spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_lsh_matches_duplicate_index_copies(spark):
    """Jaccard is over shingle SETS: an index carrying the same
    (doc_id, text) row twice — a streaming index after fresh-epoch
    re-delivery, or a mid-compaction base + unfolded-slice overlap —
    must score exactly as the deduplicated index does. Pre-fix,
    count(*) doubled sz_m AND inter, inflating jaccard (an exact dup
    scored 2.0; a 0.6-overlap boundary pair crossed a 0.7 threshold
    and got spuriously rejected)."""
    txt_a = "a b c d e f g h"   # 8 distinct unigrams
    txt_b = "a b c d e f x y"   # 6 shared -> true J = 6/10 = 0.6
    txt_c = "p q r s t u v w"
    idx = spark.createDataFrame(
        [(10, txt_b), (10, txt_b), (20, txt_c), (20, txt_c)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, txt_a), (2, txt_c)], "doc_id long, text string"
    )
    m = dedup.incremental_lsh_matches(
        idx, new, num_hashes=8, bands=8, threshold=0.7, n=1
    ).toPandas()
    # exact dup still matches, at its true jaccard (1.0, not 2.0)
    c_rows = m[(m.new_id == 2) & (m.match_id == 20)]
    assert len(c_rows) == 1 and c_rows.jaccard.iloc[0] == 1.0
    # boundary pair stays below threshold despite the duplicate copy
    assert len(m[(m.new_id == 1) & (m.match_id == 10)]) == 0
    # deduplicated index scores identically
    m2 = dedup.incremental_lsh_matches(
        idx.distinct(), new, num_hashes=8, bands=8, threshold=0.7, n=1
    ).toPandas()
    assert sorted(map(tuple, m.values.tolist())) == sorted(
        map(tuple, m2.values.tolist())
    )


def test_gopher_repetition_flags_injected_twins_fail_all_rules(
    spark, sf_dir
):
    """The injected repetitive twins (first two tokens x30) must fail
    the top-2-gram, top-3-gram AND dup-5-gram bounds; every original
    word-soup doc must pass all three — the certificate covers both
    sides of each threshold."""
    from bottledwater_pg_spark.operators.llm_queries import (
        docs_with_repetition,
        gopher_repetition_ngram_flags,
    )

    out = gopher_repetition_ngram_flags(spark, sf_dir).toPandas()
    corpus = docs_with_repetition(spark, sf_dir)
    n_inj_per_source = (
        corpus.filter(F.col("doc_id") >= 300000)
        .groupBy("source").count().toPandas()
        .set_index("source")["count"]
    )
    for _, r in out.iterrows():
        inj = int(n_inj_per_source.get(r.source, 0))
        assert r.n_fail_top2gram == inj
        assert r.n_fail_top3gram == inj
        assert r.n_fail_dup5gram == inj
        assert r.n_pass == r.n_docs - inj
    assert out.n_fail_dup5gram.sum() > 0  # the gate actually bit


def test_ccnet_buckets_partition_scored_docs_by_surprise(spark, sf_dir):
    """CCNet terciles: per source the three buckets partition exactly
    the scored docs with sizes differing by at most one
    (front-loaded), and the bucket boundaries are ordered — head's
    docs are never more surprising than tail's."""
    from bottledwater_pg_spark.operators.llm_queries import (
        _lm_surprise_per_doc,
        ccnet_perplexity_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = ccnet_perplexity_buckets(spark, sf_dir).toPandas()
    scored = (
        docs.select("doc_id", "source")
        .join(_lm_surprise_per_doc(docs.select("doc_id", "text")),
              "doc_id")
        .toPandas()
    )
    per_source = scored.groupby("source").size()
    for src, grp in out.groupby("source"):
        assert sorted(grp.bucket) == [1, 2, 3]
        assert grp.n_docs.sum() == per_source[src]
        assert grp.n_docs.max() - grp.n_docs.min() <= 1
        assert list(grp.sort_values("bucket").bucket_name) == [
            "head", "middle", "tail"
        ]
    # ordered boundaries on one source, checked row-level
    src = scored.source.iloc[0]
    sub = scored[scored.source == src].sort_values(
        ["mean_surprise_q", "doc_id"]
    )
    n = len(sub)
    sizes = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
    head_max = sub.mean_surprise_q.iloc[sizes[0] - 1]
    tail_min = sub.mean_surprise_q.iloc[sizes[0] + sizes[1]]
    assert head_max <= tail_min


def test_sq_encode_grid_semantics(spark):
    """SQ8 grid on a hand-computable fixture: per-dim [qmin,qmax]
    from exact int aggregation; codes floor((x-qmin)*255/span); the
    255x reconstruction stays on the grid (recon = qmin*255 +
    code*span); grid ENDPOINTS reconstruct exactly; a constant
    dimension (span 0) reconstructs to the constant itself."""
    from bottledwater_pg_spark.operators.similarity import (
        sq_encode,
        sq_stats,
    )

    # dim0 spans [0.0, 1.0] -> q in [0, 1000000]; dim1 constant 0.5
    docs = spark.createDataFrame(
        [(0, [0.0, 0.5]), (1, [1.0, 0.5]), (2, [0.4, 0.5])],
        "vec_id long, embedding array<double>",
    )
    stats = sq_stats(docs)
    row = stats.collect()[0]
    assert row["qmin_arr"] == [0, 500000]
    assert row["qmax_arr"] == [1000000, 500000]

    rec = {r["sid"]: r["recon"] for r in sq_encode(docs, stats).collect()}
    # endpoints: code 0 and 255 reconstruct the endpoints exactly
    assert rec[0] == [0, 500000 * 255]
    assert rec[1] == [1000000 * 255, 500000 * 255]
    # interior: code = (400000*255) // 1000000 = 102;
    # recon = 0*255 + 102 * 1000000
    assert rec[2] == [102 * 1000000, 500000 * 255]


def test_sq_topk_exact_duplicate_is_rank_one(spark):
    """Two identical vectors land in the same grid cell, so SQ-ADC
    scores the duplicate at cosine ~1 and ranks it first for its
    twin's query — the compression never splits exact duplicates."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.similarity import topk_sq

    rows = [(0, [1.0, 0.0, 0.2]), (1, [1.0, 0.0, 0.2]),
            (2, [0.0, 1.0, 0.4]), (3, [0.3, 0.7, 0.1]),
            (4, [0.9, 0.1, 0.3])]
    docs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = topk_sq(docs, docs.filter(F.col("vec_id") == 0), k=2)
    top = sorted(got.collect(), key=lambda r: r.rank)
    assert top[0].neighbor_id == 1
    assert top[0].cos > 0.9999


def test_sq_recall_certificate_clears_floor(spark, sf_dir):
    """The driver-facing certificate must report recall_ok=1 on the
    real fixture (measured 97-99% across SFs vs the 85% floor)."""
    from bottledwater_pg_spark.operators.llm_queries import (
        sq_ann_recall_vs_exact,
    )

    row = sq_ann_recall_vs_exact(spark, sf_dir).collect()[0]
    assert row["recall_ok"] == 1
    assert row["n_queries"] == 20


def test_containment_catches_what_jaccard_misses(spark):
    """The asymmetric case: doc 0 pasted wholesale into a 3x-larger
    doc 1. Containment(0 -> 1) = 1.0 >= 0.8, but Jaccard ~ 1/3, so
    jaccard_pairs at the family threshold returns NOTHING — the pair
    only the containment operator can see. Direction is pinned:
    a_id is the smaller (contained) side."""
    from bottledwater_pg_spark.operators.dedup import (
        containment_prefix_pairs,
        jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    pad = ("k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 "
           "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10")
    docs = spark.createDataFrame(
        [(0, quote), (1, quote + " " + pad), (2, "unrelated words here")],
        "doc_id long, text string",
    )
    got = containment_prefix_pairs(docs, 8000).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.a_id, r.b_id) == (0, 1)
    assert r.containment == 1.0
    assert r.sz_a < r.sz_b
    # the Jaccard family is blind to this pair at its own threshold
    assert jaccard_pairs(docs, 0.8).count() == 0


def test_containment_finds_every_injected_quote_expansion(spark, sf_dir):
    """Every injected quote-expansion (orig contained in orig+next)
    must surface at containment 1.0 — the original is a contiguous
    token prefix of the container, so ALL its shingles re-occur."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.llm_queries import (
        CONTAIN_MOD,
        containment_near_dup,
        docs_with_contained_dups,
    )
    from bottledwater_pg_spark.session import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    expected = {
        (i, i + 400000)
        for i in range(0, n_docs - 1, CONTAIN_MOD)
    }
    got = containment_near_dup(spark, sf_dir)
    found = {
        (r.a_id, r.b_id): r.containment
        for r in got.filter(F.col("b_id") >= 400000).collect()
    }
    for pair in expected:
        assert pair in found, f"missing injected pair {pair}"
        assert found[pair] == 1.0


def test_c4_line_filter_rules_each_fire(spark, sf_dir):
    """Every C4 rule must fire somewhere on the fixture AND every
    rule must also pass somewhere: marker docs dropped (lorem/brace
    injected as real tokens, detected by substring search), some docs
    dropped for too few kept lines, most docs kept; kept lines strictly
    between zero and all lines (the md5 punctuation split is ~50/50);
    kept chars positive; per-source doc counts reconcile."""
    from bottledwater_pg_spark.operators.llm_queries import (
        c4_line_filter_stats,
    )

    rows = c4_line_filter_stats(spark, sf_dir).collect()
    tot = {c: sum(r[c] for r in rows) for c in
           ("n_docs", "n_dropped_marker", "n_dropped_few_lines",
            "n_docs_kept", "n_lines", "n_lines_kept", "n_chars_kept")}
    assert tot["n_dropped_marker"] > 0
    assert tot["n_docs_kept"] > 0
    assert (tot["n_dropped_marker"] + tot["n_dropped_few_lines"]
            + tot["n_docs_kept"]) == tot["n_docs"]
    assert 0 < tot["n_lines_kept"] < tot["n_lines"]
    assert tot["n_chars_kept"] > 0


def test_c4_line_filter_hand_semantics(spark, monkeypatch, tmp_path):
    """Hand fixture through the real query path: a 16-token doc
    (doc_id=1, no markers) chunks into exactly two 8-word lines;
    whichever lines draw terminal punctuation (md5-determined) are
    kept iff they have >= 5 words; a doc on the lorem residue
    (doc_id=0) is dropped by the marker rule no matter its lines."""
    import hashlib

    from bottledwater_pg_spark.operators.llm_queries import (
        C4_LINE_TOKENS,
        c4_line_filter_stats,
    )

    words = [f"w{i}" for i in range(16)]
    df = spark.createDataFrame(
        [(0, "s0", " ".join(words)), (1, "s1", " ".join(words))],
        "doc_id long, source string, text string",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = {r.source: r for r in
           c4_line_filter_stats(spark, sf).collect()}
    # doc 0: lorem-injected -> marker drop (the '{' residue also
    # matches doc_id 0; either way it is a marker drop)
    assert got["s0"].n_dropped_marker == 1
    assert got["s0"].n_docs_kept == 0
    assert got["s0"].n_lines_kept == 0 and got["s0"].n_chars_kept == 0
    # doc 1: two exact 8-word lines; replicate the md5 draw
    lines = [" ".join(words[:C4_LINE_TOKENS]),
             " ".join(words[C4_LINE_TOKENS:])]
    kept = [ln + "." for ln in lines
            if hashlib.md5(ln.encode()).hexdigest()[0] < "8"]
    assert got["s1"].n_lines == 2
    expect_kept_doc = 0  # < C4_MIN_KEPT_LINES (3) kept lines always
    assert got["s1"].n_docs_kept == expect_kept_doc
    assert got["s1"].n_dropped_few_lines == 1
    # kept-line accounting zeroes out for dropped docs
    assert got["s1"].n_lines_kept == 0


def test_mrl_funnel_exact_on_frontloaded_embeddings(spark):
    """The funnel's design case: embeddings whose information lives in
    the prefix dims (MRL-trained shape). With all signal in the first
    2 coordinates, a prefix-2 shortlist already contains the true
    neighbors and the full-dim re-rank returns exactly brute force."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.similarity import (
        topk_bruteforce,
        topk_mrl,
    )

    # signal in dims 0-1; dims 2-3 constant (zero tail information)
    rows = [(i, [1.0 - 0.01 * i, 0.01 * i, 0.5, 0.5])
            for i in range(30)]
    docs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    qs = docs.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.neighbor_id, r.rank)
             for r in topk_bruteforce(docs, qs, k=5).collect()}
    funnel = {(r.query_id, r.neighbor_id, r.rank)
              for r in topk_mrl(docs, qs, k=5, prefix_dim=2,
                                refine=10).collect()}
    assert funnel == exact


def test_mrl_recall_certificate_clears_floor(spark, sf_dir):
    from bottledwater_pg_spark.operators.llm_queries import (
        mrl_ann_recall_vs_exact,
    )

    row = mrl_ann_recall_vs_exact(spark, sf_dir).collect()[0]
    assert row["recall_ok"] == 1


def test_perceptron_separates_injected_junk_perfectly(spark, sf_dir):
    """The balanced batch perceptron must reach PERFECT separation of
    the injected repetitive twins from the originals (measured 0
    misclassified at every SF — the converged w is a fixed point),
    with the weights pointing the interpretable way: type-token ratio
    votes FOR quality, top-token share votes AGAINST."""
    from bottledwater_pg_spark.operators.llm_queries import (
        perceptron_quality_weights,
    )

    rows = perceptron_quality_weights(spark, sf_dir).collect()
    assert rows[0].accuracy_bp == 10000
    assert rows[0].n_misclassified == 0
    w = {r.feature: r.weight for r in rows}
    assert w[1] > 0   # ttr_bp: diverse vocabulary -> quality
    assert w[2] < 0   # toptok_bp: one dominant token -> junk


def test_perceptron_update_is_class_balanced(spark):
    """On a 6:1-imbalanced hand corpus the classic sum-update would
    chase the majority; the balanced update must separate both
    classes inside the fixed rounds: positives are diverse 6-token
    docs, the single negative is one token repeated 6x."""
    from bottledwater_pg_spark.operators.llm_queries import (
        _PDOT,
        _perceptron_features,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{k}" for k in range(6)))
         for i in range(6)]
        + [(300001, "junk junk junk junk junk junk")],
        "doc_id long, text string",
    )
    feats = _perceptron_features(docs)
    got = {r.doc_id: (r.y, r.x) for r in feats.collect()}
    assert got[300001][0] == -1 and got[0][0] == 1
    # distinct=1 of 6 tokens -> ttr 1666bp, toptok 10000bp
    assert got[300001][1][1] == 1666 and got[300001][1][2] == 10000
    assert got[0][1][1] == 10000 and got[0][1][2] == 1666


def test_perceptron_labels_are_replica_offset_safe(spark):
    """ADVICE r11 (medium): under scale-fixture replication (doc_id +
    k * KEY_OFFSET) the label rule must still mark each replica's
    originals +1 and its injected twins -1 — the old bare
    ``doc_id >= 300000`` labeled every replica>=1 doc negative, so
    the ladder's trained-model row timed a mislabeled workload whose
    misclassified set never converges."""
    from bottledwater_pg_spark.operators.llm_queries import (
        _perceptron_features,
    )
    from bottledwater_pg_spark.scale_fixtures import KEY_OFFSET

    docs = spark.createDataFrame(
        [(100, "a b c"), (300100, "x x x"),
         (KEY_OFFSET + 100, "r1a r1b r1c"),
         (KEY_OFFSET + 300100, "r1x r1x r1x"),
         (2 * KEY_OFFSET + 100, "r2a r2b r2c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.y for r in _perceptron_features(docs).collect()}
    assert got == {
        100: 1, 300100: -1,
        KEY_OFFSET + 100: 1, KEY_OFFSET + 300100: -1,
        2 * KEY_OFFSET + 100: 1,
    }


def test_containment_df_cap_parity_with_filtered_universe(spark):
    """df_cap parity: containment_prefix_pairs(df_cap=K) must equal
    BRUTE-FORCE containment computed over the shingle universe with
    df>K shingles removed (the declared stopwording semantics) — and
    on a boilerplate-skewed corpus the cap must (a) drop the
    pure-footer pages entirely and (b) leave organic pairs exactly
    intact."""
    import duckdb

    from bottledwater_pg_spark.functions.text import sql_word_shingles

    footer = (
        "this page is licensed under the apache license version two "
        "point zero see the license file for details"
    )
    words = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "one two three four five six seven eight nine ten",
    ]
    rows = []
    for i in range(30):
        base = words[i % 3]
        text = f"{base} doc{i} marker{i} tail{i} end{i}"
        if i % 3 == 0:  # a third of organic docs carry the footer
            text += " " + footer
        rows.append((i, text))
    # one organic containment pair: doc 100 quoted inside doc 101
    rows.append((100, "unique quoted passage with rare tokens here"))
    rows.append((
        101,
        "unique quoted passage with rare tokens here plus a much "
        "longer continuation that keeps jaccard low while containment "
        "stays one",
    ))
    for j in range(5):  # pure-boilerplate pages
        rows.append((200 + j, footer))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.a_id, r.b_id, r.inter, r.sz_a, r.sz_b)
        for r in dedup.containment_prefix_pairs(
            sdf, 8000, df_cap=10
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "corpus",
        spark.createDataFrame(rows, "doc_id long, text string").toPandas(),
    )
    sh_expr = sql_word_shingles("text", 3)
    want = {
        (r[0], r[1], r[2], r[3], r[4])
        for r in con.execute(f"""
            WITH sh0 AS (
              SELECT doc_id AS sid, unnest({sh_expr}) AS shingle
              FROM corpus
            ),
            keep AS (
              SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 10
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
            sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
            inter AS (
              SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.sid <> b.sid
              GROUP BY a.sid, b.sid
            )
            SELECT a_id, b_id, CAST(inter AS BIGINT),
                   CAST(sa.sz AS BIGINT), CAST(sb.sz AS BIGINT)
            FROM inter
            JOIN sizes sa ON sa.sid = a_id
            JOIN sizes sb ON sb.sid = b_id
            WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND a_id < b_id))
              AND inter * 10000 >= sa.sz * 8000
        """).fetchall()
    }
    assert got == want
    # the footer's shingles are hot (df = 10 carriers + 5 pure > 10):
    # pure-footer pages have no surviving shingles -> absent from any
    # pair; the organic quoted pair survives exactly
    ids_in_pairs = {i for p in got for i in (p[0], p[1])}
    assert not ids_in_pairs & {200, 201, 202, 203, 204}
    assert (100, 101) in {(p[0], p[1]) for p in got}
    # and UNCAPPED, the pure-footer pages explode into m x (p*N + m)
    # true pairs — the semantic blow-up the cap exists to stop
    uncapped = dedup.containment_prefix_pairs(sdf, 8000).toPandas()
    boiler_pairs = uncapped[
        uncapped.a_id.isin(range(200, 205))
    ]
    assert len(boiler_pairs) >= 5 * 4 / 2 + 5 * 10 - 5  # >= C(5,2)+5x10-overlap


def test_minhash_max_bucket_star_cap(spark, sf_dir):
    """Hot-bucket escape hatch (``max_bucket``): an identical
    boilerplate cohort makes every band bucket hot; the capped run
    emits the verified spanning star (m-1 pairs) instead of the
    C(m,2) clique, is a SUBSET of the uncapped pairs, leaves normal
    buckets untouched, and preserves the pair graph's connected
    components. A cap no bucket reaches must be a no-op."""
    from bottledwater_pg_spark.operators.llm_queries import (
        BOILER_BASE,
        docs_with_boiler_cohort,
    )

    corpus = docs_with_boiler_cohort(spark, sf_dir).cache()
    try:
        kw = dict(num_hashes=32, bands=16, threshold=0.8)
        unc = dedup.minhash_lsh_pairs(corpus, **kw).toPandas()
        cap = dedup.minhash_lsh_pairs(corpus, max_bucket=16, **kw).toPandas()
        uset = {(a, b) for a, b in zip(unc.a_id, unc.b_id)}
        cset = {(a, b) for a, b in zip(cap.a_id, cap.b_id)}
        assert cset <= uset
        in_cohort = lambda i: i >= BOILER_BASE  # noqa: E731
        u_cohort = {p for p in uset if in_cohort(p[0]) and in_cohort(p[1])}
        c_cohort = {p for p in cset if in_cohort(p[0]) and in_cohort(p[1])}
        m = 60
        assert len(u_cohort) == m * (m - 1) // 2  # the clique
        assert c_cohort == {
            (BOILER_BASE, BOILER_BASE + i) for i in range(1, m)
        }  # the spanning star
        # normal buckets untouched: pairs outside the cohort identical
        assert {p for p in uset if p not in u_cohort} == {
            p for p in cset if p not in c_cohort
        }

        # connected components unchanged (the dedup contract)
        def comps(pairs):
            parent = {}

            def find(x):
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                parent[find(a)] = find(b)
            out = {}
            for x in list(parent):
                out.setdefault(find(x), set()).add(x)
            return {frozenset(v) for v in out.values()}

        assert comps(uset) == comps(cset)

        # a cap nothing reaches is a no-op
        huge = dedup.minhash_lsh_pairs(
            corpus, max_bucket=10**6, **kw
        ).toPandas()
        assert {(a, b) for a, b in zip(huge.a_id, huge.b_id)} == uset
    finally:
        corpus.unpersist()


def test_incremental_probe_bucket_cap(spark, sf_dir):
    """Probe-side hot-bucket cap (incremental_lsh_matches
    probe_bucket_cap): a standing boilerplate cohort in the index
    candidates every colliding batch doc against all m members; with
    the cap, only the cap lowest-sid members are exposed. The match
    set is a subset, restricted per bucket to earliest members, and
    the EXISTS-a-match verdict per new doc — the rejection semantics
    streaming dedup consumes — is identical on the cohort fixture."""
    from bottledwater_pg_spark.operators.llm_queries import (
        BOILER_BASE,
        BOILER_FOOTER,
        docs_with_near_dups,
    )

    docs = docs_with_near_dups(spark, sf_dir)
    cohort = spark.range(40).select(
        (F.col("id") + BOILER_BASE).alias("doc_id"),
        F.lit(BOILER_FOOTER).alias("text"),
    )
    index = docs.unionByName(cohort).cache()
    # batch: fresh boilerplate pages + near-copies of real docs
    batch = (
        spark.range(5)
        .select(
            (F.col("id") + BOILER_BASE + 1000).alias("doc_id"),
            F.lit(BOILER_FOOTER).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz")).alias("text"),
            )
        )
        .cache()
    )
    try:
        kw = dict(num_hashes=32, bands=16, threshold=0.8)
        unc = dedup.incremental_lsh_matches(index, batch, **kw).toPandas()
        cap = dedup.incremental_lsh_matches(
            index, batch, probe_bucket_cap=4, **kw
        ).toPandas()
        uset = {(a, b) for a, b in zip(unc.new_id, unc.match_id)}
        cset = {(a, b) for a, b in zip(cap.new_id, cap.match_id)}
        assert cset <= uset
        # the cohort collision really was capped: each boilerplate
        # batch doc matched all 40 cohort members uncapped, only the
        # 4 earliest capped
        boiler_new = set(range(BOILER_BASE + 1000, BOILER_BASE + 1005))
        for nid in boiler_new:
            u = {m for a, m in uset if a == nid}
            c = {m for a, m in cset if a == nid}
            assert len(u) == 40
            assert c == {BOILER_BASE + i for i in range(4)}
        # rejection semantics unchanged: same set of new docs with
        # at least one match
        assert {a for a, _ in uset} == {a for a, _ in cset}
        # and a cap nothing reaches is a no-op
        huge = dedup.incremental_lsh_matches(
            index, batch, probe_bucket_cap=10**6, **kw
        ).toPandas()
        assert {(a, b) for a, b in zip(huge.new_id, huge.match_id)} == uset
    finally:
        index.unpersist()
        batch.unpersist()
