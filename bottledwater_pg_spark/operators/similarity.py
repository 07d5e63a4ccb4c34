"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline), SRP-LSH-bucketed approximate search, and an
IVF-flat (inverted-file) index — the two standard scale paths.

Scale design: brute force is a broadcast-join of the (small) query set
against the corpus — linear scans parallelize perfectly but cost
O(|Q| x |corpus|); the LSH variant probes only same-bucket candidates,
trading recall for a corpus-partition-pruned probe, which is the right
shape at 100 TB (the bucket id becomes a partition/bucketing key).
IVF partitions the corpus into cells around coarse centroids and scans
only the n_probe cells nearest each query — at cluster scale the cell
id is the physical partitioning key, so a probe touches n_probe/n_list
of the data. Vectors are quantized once and carry precomputed norms —
the per-pair work is a single interpreted zip_with dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.vectors import cosine_pre, norm_pre
from bottledwater_pg_spark.operators.dedup import banded_srp, quantized_vectors


def _q(df: DataFrame, role: str, id_col: str, vec_col: str) -> DataFrame:
    q = quantized_vectors(df, id_col, vec_col)
    return q.select(
        F.col("sid").alias(f"{role}_id"),
        F.col("qvec").alias(f"{role}_q"),
        F.col("qnorm").alias(f"{role}_n"),
    )


def topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    The query side is broadcast (it is small by construction); ranking
    is a per-query window with a deterministic (cos desc, neighbor id)
    order.
    """
    c = _q(corpus, "neighbor", id_col, vec_col)
    q = _q(queries, "query", id_col, vec_col)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_pre("query_q", "neighbor_q", "query_n", "neighbor_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ------------------------------------------------------------ IVF-flat


def ivf_centroids(corpus: DataFrame, n_list: int = 32,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Coarse-quantizer centroids: a deterministic sample of the corpus
    (the n_list lowest-id vectors). Random sampling is the standard
    cheap alternative to k-means training for IVF and keeps the whole
    index reproducible; swapping in trained centroids changes nothing
    downstream. Centroids are tiny — always broadcast."""
    q = quantized_vectors(corpus, id_col, vec_col)
    return (
        q.orderBy("sid")
        .limit(n_list)
        .select(
            F.col("sid").alias("cent_id"),
            F.col("qvec").alias("cent_q"),
            F.col("qnorm").alias("cent_n"),
        )
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    ties to the lowest cent_id): (sid, cent_id, qvec, qnorm).

    The nearest centroid of one vector depends on nothing but that
    vector and the (tiny, broadcast) centroid table, so the argmax is
    computed ROW-WISE over a one-row centroid ARRAY — a narrow map
    with NO shuffle at all. The former shape (crossJoin + per-sid
    max_by) shuffled the whole corpus, vectors and norms included, on
    sid just to regroup the k scores of each vector — the §8
    "shuffling payloads to make a row-local decision" anti-shape; at
    100 TB that exchange was the assignment's entire cost. Arithmetic
    per (vector, centroid) is the identical cosine expression, and
    ties break identically (max over (cos, -cent_id)), so the
    assignment is bit-for-bit the same. At cluster scale the output
    is written partitioned by cent_id, which is what makes probes
    partition-pruned."""
    q = quantized_vectors(corpus, id_col, vec_col)
    cent_arr = centroids.agg(
        F.collect_list(F.struct("cent_id", "cent_q", "cent_n")).alias(
            "cents"
        )
    )
    # max over (cos, -cent_id): highest cosine, ties to lowest id —
    # exactly the old max_by ordering; cent_id is distinct so the
    # struct order is total and collect_list's order cannot matter
    best = F.expr(
        "array_max(transform(cents, c -> struct("
        "CAST(aggregate(zip_with(qvec, c.cent_q, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, p) -> acc + p) AS DOUBLE) "
        "/ (qnorm * c.cent_n) AS cos, "
        "-c.cent_id AS neg, c.cent_id AS cent_id)))"
    )
    return (
        q.crossJoin(F.broadcast(cent_arr))
        .select("sid", best.getField("cent_id").alias("cent_id"),
                "qvec", "qnorm")
    )


def topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_list: int = 32, n_probe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via an IVF-flat index: each query scans only
    its n_probe nearest centroid cells; candidates are ranked by exact
    quantized cosine. Unlike LSH banding, each corpus vector lives in
    exactly ONE cell, so candidates need no distinct()."""
    cent = ivf_centroids(corpus, n_list, id_col, vec_col)
    return _topk_ivf_probe(cent, corpus, queries, k, n_probe,
                           id_col, vec_col)


def topk_ivf_trained(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     n_list: int = 32, iters: int = 2, n_probe: int = 8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF-flat top-k whose coarse quantizer is TRAINED: ``iters``
    exact-integer Lloyd's rounds (:func:`kmeans_lloyd`) refine the
    lowest-id seeds before the cell assignment, instead of using the
    raw sample as cells — the standard FAISS practice: on a clustered
    corpus trained centroids track density, preventing a mega-cell
    from swallowing the probe budget and putting more of each query's
    true neighborhood inside its n_probe nearest cells. (On a corpus
    with no cluster structure training is recall-neutral — see the
    llm_queries fixture note.) Everything downstream of training is
    :func:`topk_ivf` verbatim; determinism and the exact-int
    discipline come from kmeans_lloyd, so the ENTIRE pipeline —
    training rounds included — replays bit-identically in the SQL
    oracle. Empty clusters drop during training (fewer live cells
    simply means fewer candidate cells, never a correctness change)."""
    from bottledwater_pg_spark.functions.vectors import norm_pre

    _assign, cents = kmeans_lloyd(corpus, k=n_list, iters=iters,
                                  id_col=id_col, vec_col=vec_col)
    cent = cents.select(
        F.col("cid").alias("cent_id"),
        F.col("cv").alias("cent_q"),
        norm_pre("cv").alias("cent_n"),
    )
    return _topk_ivf_probe(cent, corpus, queries, k, n_probe,
                           id_col, vec_col)


def _topk_ivf_probe(cent: DataFrame, corpus: DataFrame,
                    queries: DataFrame, k: int, n_probe: int,
                    id_col: str, vec_col: str) -> DataFrame:
    """Shared IVF probe: assign the corpus to the given centroid
    table, pick each query's n_probe nearest cells, rank candidates
    by exact quantized cosine. ``cent`` is (cent_id, cent_q, cent_n)
    from either the lowest-id sample or Lloyd's training."""
    from bottledwater_pg_spark.session import persist_tracked

    # the centroid table feeds BOTH the assignment scan and the query
    # probe; the assignment feeds the probe join — persist them or
    # the corpus is quantized twice per action (the dedup twin,
    # hyperplane_lsh_near_dup, persists for the same reason)
    cent = persist_tracked(cent)
    assigned = persist_tracked(ivf_assign(corpus, cent, id_col, vec_col))
    qv = quantized_vectors(queries, id_col, vec_col)
    qscored = qv.crossJoin(F.broadcast(cent)).withColumn(
        "cos", cosine_pre("qvec", "cent_q", "qnorm", "cent_n")
    )
    wp = Window.partitionBy("sid").orderBy(F.desc("cos"), F.col("cent_id"))
    probe = (
        qscored.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select(
            F.col("sid").alias("query_id"),
            "cent_id",
            F.col("qvec").alias("query_q"),
            F.col("qnorm").alias("query_n"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probe), "cent_id")
        .filter(F.col("sid") != F.col("query_id"))
        .withColumn("cos", cosine_pre("query_q", "qvec", "query_n", "qnorm"))
        .select("query_id", F.col("sid").alias("neighbor_id"), "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def semdedup_prune(corpus: DataFrame, n_clusters: int = 8,
                   threshold: float = 0.99,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus around coarse
    centroids, then prune — WITHIN each cluster only — every vector
    that has a near-identical (cosine >= threshold) lower-id
    neighbor. Returns the pruned set ``(cent_id, pruned_id, kept_by,
    cos)`` where ``kept_by`` is the lowest-id surviving witness and
    ``cos`` that pair's similarity.

    Keep-rule determinism: the paper keeps one arbitrary member per
    epsilon-neighborhood; here the kept member is the LOWEST id, so
    the pruned set is a pure function of the corpus (a vector is
    pruned iff some lower-id same-cluster vector is within
    threshold) and cross-engine checkable. Note ``kept_by`` is the
    lowest-id WITHIN-THRESHOLD lower neighbor, which may itself be
    pruned (1~2 and 2~3 but 1!~3 prunes both 2 and 3, with 3's witness
    being the pruned 2): the KEPT set is exactly {ids not in the
    pruned set}; consumers needing a canonical representative per
    chain should run the pair list through connected components (the
    ensemble dedup query does precisely that).

    Scale design: this is the whole point of SemDeDup — the O(n²)
    all-pairs cosine becomes sum(c_i²) over cluster sizes. Clustering
    reuses the IVF primitives (:func:`ivf_centroids` broadcast +
    :func:`ivf_assign` one-shuffle max_by). The pair join is an
    equi-join on cent_id, so each cluster's pairs are produced by the
    tasks holding that cluster's partition; at 10^9+ vectors you run
    ~100k centroids (the paper's setting), keeping every cluster a
    few thousand rows — cluster size, not corpus size, bounds the
    quadratic term. Vectors are quantized once and carry norms: one
    interpreted zip_with per surviving pair.
    """
    from bottledwater_pg_spark.session import persist_tracked

    cent = ivf_centroids(corpus, n_clusters, id_col, vec_col)
    # the assignment feeds BOTH sides of the within-cluster pair join:
    # persist it, or the quantize + argmin map runs twice (the old
    # shuffle-based ivf_assign got this reuse for free via
    # ReusedExchange; the shuffle-free fold has no exchange to reuse)
    assigned = persist_tracked(ivf_assign(corpus, cent, id_col, vec_col))
    return semdedup_pairs_pruned(assigned, threshold)


def semdedup_pairs_pruned(assigned: DataFrame,
                          threshold: float = 0.99) -> DataFrame:
    """The prune step of :func:`semdedup_prune` over an ALREADY
    clustered corpus ``(sid, cent_id, qvec, qnorm)`` — callers that
    also need membership stats cluster once (persist) and reuse."""
    a = assigned.select(
        "cent_id", F.col("sid").alias("a_id"),
        F.col("qvec").alias("qa"), F.col("qnorm").alias("na"),
    )
    b = assigned.select(
        "cent_id", F.col("sid").alias("b_id"),
        F.col("qvec").alias("qb"), F.col("qnorm").alias("nb"),
    )
    pairs = (
        a.join(b, "cent_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine_pre("qa", "qb", "na", "nb"))
        .filter(F.col("cos") >= threshold)
    )
    return pairs.groupBy("cent_id", F.col("b_id").alias("pruned_id")).agg(
        F.min("a_id").alias("kept_by"),
        F.min_by("cos", "a_id").alias("cos"),
    )


def topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
             num_bits: int = 32, bands: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             variant: str = "xxhash") -> DataFrame:
    """Approximate top-k: SRP-LSH banding restricts each query's probe
    to corpus vectors sharing at least one signature band; candidates
    are deduped as id pairs, then ranked by exact quantized cosine.

    Defaults are 8 bands x 4 bits: more OR-chances per pair than the
    old 4x4 (recall@5 on the fixture corpus 71-73% vs 44-47%) at a
    moderately larger candidate set — band count trades probe cost
    for recall, band WIDTH trades both against bucket size.

    ``variant='md5'`` derives the hyperplanes from md5 parity with
    exact integer projections (dedup.hyperplane_signature_md5) — the
    identical candidate set is recomputable in DuckDB, making the
    whole top-k value-hash oracle-able; xxhash64 stays the JVM-fast
    production default."""
    from bottledwater_pg_spark.session import persist_tracked

    # md5 variant: probe the vector dimension ONCE and share it with
    # both banding calls (each would otherwise run its own 1-value
    # probe job)
    dim = (
        corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
        if variant == "md5"
        else None
    )
    # corpus-side banding and the quantized verify table are each read
    # by one join but share the corpus scan — persist the banding (the
    # expensive num_bits-projection aggregation) once
    cb = persist_tracked(
        banded_srp(
            corpus, num_bits, bands, id_col, vec_col, variant, dim=dim
        ).select(F.col("sid").alias("neighbor_id"), "band", "bval")
    )
    qb = banded_srp(
        queries, num_bits, bands, id_col, vec_col, variant, dim=dim
    ).select(F.col("sid").alias("query_id"), "band", "bval")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bval"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(_q(queries, "query", id_col, vec_col)), "query_id")
        .join(_q(corpus, "neighbor", id_col, vec_col), "neighbor_id")
        .withColumn("cos", cosine_pre("query_q", "neighbor_q", "query_n", "neighbor_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ------------------------------------------------------ PQ (ADC scan)


def _subvector_expr(n_sub: int, out_name: str) -> str:
    """The ONE subvector-split expression shared by codebook build and
    corpus/query encoding — these must stay bit-identical for PQ codes
    to mean anything (an edit changing e.g. tail-dimension handling
    must hit both sides at once)."""
    return (
        f"transform(sequence(0, {n_sub - 1}), m -> struct("
        f"m AS m, slice(qvec, m * (size(qvec) div {n_sub}) + 1, "
        f"size(qvec) div {n_sub}) AS {out_name}))"
    )


def pq_codebooks(corpus: DataFrame, n_sub: int = 8, k_sub: int = 16,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``n_sub`` subvectors; per subspace the codebook is the subvectors
    of the ``k_sub`` lowest-id corpus vectors (the same deterministic
    sample discipline as :func:`ivf_centroids` — swapping in k-means-
    trained codebooks changes nothing downstream). Returns
    ``(m, code, cb_q)`` — ``n_sub * k_sub`` rows total, always
    broadcast."""
    q = quantized_vectors(corpus, id_col, vec_col)
    base = (
        q.orderBy("sid")
        .limit(k_sub)
        .select(
            "qvec",
            (F.row_number().over(Window.orderBy("sid")) - 1).alias("code"),
        )
    )
    return base.select(
        "code",
        F.explode(F.expr(_subvector_expr(n_sub, "cb_q"))).alias("s"),
    ).select(F.col("s.m").alias("m"), "code", F.col("s.cb_q").alias("cb_q"))


def _subvectors(df: DataFrame, n_sub: int, id_col: str,
                vec_col: str) -> DataFrame:
    """(sid, m, sub_q): the quantized subvectors of every vector."""
    q = quantized_vectors(df, id_col, vec_col)
    return q.select(
        "sid",
        F.explode(F.expr(_subvector_expr(n_sub, "sub_q"))).alias("s"),
    ).select("sid", F.col("s.m").alias("m"), F.col("s.sub_q").alias("sub_q"))


_L2Q = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, p) -> acc + p)"
)


def pq_encode(corpus: DataFrame, codebooks: DataFrame, n_sub: int = 8,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every corpus vector as ``n_sub`` codebook indices:
    per subspace the code minimizing exact int64 squared L2 distance
    (ties to the lowest code). One broadcast join against the tiny
    codebook table, one map-side-combining min_by — the index is
    ``n_sub`` small ints per vector, the 8-32x compression that lets
    a 100 TB corpus's index sit in cluster memory."""
    # NOT rewritten to the row-wise array fold ivf_assign uses: this
    # shuffle is already payload-free — the broadcast join computes d
    # map-side and the min_by partial aggregation collapses to one
    # (sid, m, code, d) row per group before the exchange, so no
    # vector ever crosses it; the fold form traded that small
    # exchange for interpreted per-codeword struct folding and
    # measured 39% SLOWER (same-session A/B, sf0.1).
    sv = _subvectors(corpus, n_sub, id_col, vec_col)
    scored = sv.join(F.broadcast(codebooks), "m").withColumn(
        "d", F.expr(_L2Q.format(a="sub_q", b="cb_q"))
    )
    return scored.groupBy("sid", "m").agg(
        F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code")
    )


def topk_pq(corpus: DataFrame, queries: DataFrame, k: int = 5,
            n_sub: int = 8, k_sub: int = 16,
            refine: int | None = None,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via PQ asymmetric distance computation (ADC):
    per query, precompute the ``n_sub x k_sub`` table of exact int64
    squared distances from its subvectors to every codebook entry;
    a candidate's distance is then the SUM of ``n_sub`` table lookups
    over its codes — no candidate's full vector is ever touched.
    Ranking ascends ADC distance (ties to the lowest neighbor_id);
    for unit-norm embeddings L2 ordering equals cosine ordering, so
    the brute-force cosine twin certifies recall directly.

    ``refine``: the production IVFADC-R shape (Jégou et al. 2011 §V) —
    take the ``refine`` best ADC candidates per query, re-rank them by
    EXACT quantized cosine, return the top k of those (schema then
    matches the other ANN twins: (query_id, neighbor_id, rank, cos)).
    Re-ranking touches refine * |Q| full vectors — negligible next to
    the scan — and lifts recall from ADC-limited to shortlist-limited.

    Scale: the distance table is |Q| * n_sub * k_sub rows (data-size
    independent — broadcast); the scan is one broadcast join of the
    (sid, m, code) index against it plus a partial-agg sum, O(N *
    n_sub) rows and NO vector arithmetic per candidate. Composes with
    :func:`ivf_assign` at warehouse scale (IVF-PQ: probe cells first,
    ADC within them); kept un-pruned here so the recall certificate
    measures PQ alone."""
    from bottledwater_pg_spark.session import persist_tracked

    cb = persist_tracked(
        pq_codebooks(corpus, n_sub, k_sub, id_col, vec_col)
    )
    enc = pq_encode(corpus, cb, n_sub, id_col, vec_col)
    dtab = (
        _subvectors(queries, n_sub, id_col, vec_col)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("sid").alias("query_id"),
            "m",
            "code",
            F.expr(_L2Q.format(a="sub_q", b="cb_q")).alias("d"),
        )
    )
    scored = (
        enc.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("sid") != F.col("query_id"))
        .groupBy("query_id", F.col("sid").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adc_dist_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        "adc_dist_q", "neighbor_id"
    )
    shortlisted = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (refine if refine is not None else k))
        .select("query_id", "neighbor_id", "rank", "adc_dist_q")
    )
    if refine is None:
        return shortlisted
    qq = _q(queries, "query", id_col, vec_col)
    nn = _q(corpus, "n", id_col, vec_col)
    rescored = (
        shortlisted.select("query_id", "neighbor_id")
        .join(F.broadcast(qq), "query_id")
        .join(nn.withColumnRenamed("n_id", "neighbor_id"), "neighbor_id")
        .withColumn("cos", cosine_pre("query_q", "n_q", "query_n", "n_n"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def topk_ivfpq(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_list: int = 32, n_probe: int = 8,
               n_sub: int = 16, k_sub: int = 32, refine: int = 50,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ (the full Jégou et al. 2011 IVFADC-R system): coarse
    quantizer prunes the scan to ``n_probe`` cells per query, PQ codes
    give O(n_sub) table lookups per surviving candidate, the ADC
    shortlist re-ranks by exact quantized cosine. This is THE
    billion-scale ANN shape: at warehouse scale the corpus is
    partitioned by ``cent_id`` (probes are partition-pruned reads) and
    each partition stores only the ``n_sub`` small codes per vector —
    full vectors are fetched for the refine set alone.

    Deterministic end to end (lowest-id samples, integer distances,
    pinned ties), so the whole three-stage index replays in SQL."""
    cent = ivf_centroids(corpus, n_list, id_col, vec_col)
    return _topk_ivfpq_probe(cent, corpus, queries, k, n_probe,
                             n_sub, k_sub, refine, id_col, vec_col)


def topk_ivfpq_trained(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       n_list: int = 32, iters: int = 2, n_probe: int = 8,
                       n_sub: int = 16, k_sub: int = 32, refine: int = 50,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ whose coarse quantizer is TRAINED (``iters`` exact
    Lloyd's rounds from the lowest-id seeds) — the actual FAISS IVFADC
    recipe, which trains the coarse quantizer before encoding; the
    sampled-cell form :func:`topk_ivfpq` is the cheap ablation.
    Everything after training (PQ codebooks, encode, ADC in probed
    cells, refine) is shared verbatim, and kmeans_lloyd's exact-int
    discipline keeps the WHOLE composed index SQL-replayable."""
    from bottledwater_pg_spark.functions.vectors import norm_pre

    _assign, cents = kmeans_lloyd(corpus, k=n_list, iters=iters,
                                  id_col=id_col, vec_col=vec_col)
    cent = cents.select(
        F.col("cid").alias("cent_id"),
        F.col("cv").alias("cent_q"),
        norm_pre("cv").alias("cent_n"),
    )
    return _topk_ivfpq_probe(cent, corpus, queries, k, n_probe,
                             n_sub, k_sub, refine, id_col, vec_col)


def _topk_ivfpq_probe(cent: DataFrame, corpus: DataFrame,
                      queries: DataFrame, k: int, n_probe: int,
                      n_sub: int, k_sub: int, refine: int,
                      id_col: str, vec_col: str) -> DataFrame:
    """Shared IVF-PQ machinery downstream of the coarse quantizer
    (sampled or trained): cosine cell assignment, PQ codebook/encode,
    per-query distance tables, ADC within probed cells, shortlist,
    exact re-rank."""
    from bottledwater_pg_spark.session import persist_tracked

    cent = persist_tracked(cent)
    assigned = persist_tracked(ivf_assign(corpus, cent, id_col, vec_col))
    cb = persist_tracked(pq_codebooks(corpus, n_sub, k_sub, id_col, vec_col))
    enc = pq_encode(corpus, cb, n_sub, id_col, vec_col).join(
        assigned.select("sid", "cent_id"), "sid"
    )
    qv = quantized_vectors(queries, id_col, vec_col)
    qscored = qv.crossJoin(F.broadcast(cent)).withColumn(
        "cos", cosine_pre("qvec", "cent_q", "qnorm", "cent_n")
    )
    wp = Window.partitionBy("sid").orderBy(F.desc("cos"), F.col("cent_id"))
    probe = (
        qscored.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select(F.col("sid").alias("query_id"), "cent_id")
    )
    dtab = (
        _subvectors(queries, n_sub, id_col, vec_col)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("sid").alias("query_id"), "m", "code",
            F.expr(_L2Q.format(a="sub_q", b="cb_q")).alias("d"),
        )
    )
    adc = (
        enc.join(F.broadcast(probe), "cent_id")
        .filter(F.col("sid") != F.col("query_id"))
        .join(F.broadcast(dtab), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("sid").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adc_dist_q"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        "adc_dist_q", "neighbor_id"
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= refine)
        .select("query_id", "neighbor_id")
    )
    qq = _q(queries, "query", id_col, vec_col)
    rescored = (
        shortlist.join(F.broadcast(qq), "query_id")
        .join(
            assigned.select(
                F.col("sid").alias("neighbor_id"),
                F.col("qvec").alias("n_q"),
                F.col("qnorm").alias("n_n"),
            ),
            "neighbor_id",
        )
        .withColumn("cos", cosine_pre("query_q", "n_q", "query_n", "n_n"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def kmeans_lloyd(corpus: DataFrame, k: int = 8, iters: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding"):
    """Distributed Lloyd's k-means over an embedding corpus, run to a
    FIXED iteration count in exact integer arithmetic — the clustering
    primitive behind SemDeDup's per-cluster prune (Abbas et al. 2023
    run k-means first), IVF index training, and topic-balance curation
    of pretraining mixtures. Returns ``(assignment, centroids)``:
    the final assignment ``(sid, cid, d2, qvec)`` (``d2`` = exact
    int64 squared euclidean distance to the assigned centroid of the
    LAST assignment round) and the post-update centroids
    ``(cid, cv)``.

    Determinism, cross-engine: seeds are the k lowest-id vectors (the
    :func:`ivf_centroids` convention); distances are exact int64 sums
    of squared quantized differences; ties go to the lowest cid; the
    M-step mean is integer division (``div`` truncates toward zero in
    BOTH Spark and DuckDB — probed, including negatives), so every
    round's centroids are bit-identical in both engines and the whole
    loop unrolls into SQL CTEs the oracle replays exactly. Empty
    clusters simply drop out of the update (both engines' GROUP BY).

    Scale: each round is (a) one broadcast of the k x dim centroid
    table against the corpus — a narrow map, no shuffle of the
    vectors; (b) one max_by-style per-vector argmin (map-side
    combining agg on sid); (c) one (cid, dim)-keyed partial+final
    aggregation whose output is k x dim rows regardless of corpus
    size. The per-round ``localCheckpoint`` truncates the iterative
    lineage (k rows — milliseconds) so the plan stays flat across
    rounds, the k-core lesson applied to the E/M loop.
    """
    from bottledwater_pg_spark.operators.dedup import quantized_vectors
    from bottledwater_pg_spark.session import persist_tracked

    q = persist_tracked(
        quantized_vectors(corpus, id_col, vec_col).select("sid", "qvec")
    )
    cents = (
        q.orderBy("sid").limit(k)
        .select(F.col("sid").alias("cid"), F.col("qvec").alias("cv"))
    )
    # E-step argmin as a ROW-WISE fold over a one-row centroid array:
    # a vector's nearest centroid depends on nothing but the vector
    # and the k (broadcast) centroids, so the former crossJoin +
    # per-sid min_by — which shuffled the whole corpus, vectors
    # included, on sid EVERY round — becomes a narrow map with no
    # shuffle (the ivf_assign rewrite, applied per round). min over
    # (d2, cid) keeps the exact tie order; cid is distinct, so the
    # collect_list order cannot matter. The two-step select keeps the
    # array_min evaluated once (CollapseProject does not inline
    # non-cheap expressions referenced twice).
    best = F.expr(
        "array_min(transform(cs, c -> struct("
        "aggregate(zip_with(qvec, c.cv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, p) -> acc + p) AS d2, c.cid AS cid)))"
    )
    assign = None
    for _ in range(iters):
        cents_arr = cents.agg(
            F.collect_list(F.struct("cid", "cv")).alias("cs")
        )
        assign = (
            q.crossJoin(F.broadcast(cents_arr))
            .select("sid", "qvec", best.alias("b"))
            .select(
                "sid",
                F.col("b.cid").alias("cid"),
                F.col("b.d2").alias("d2"),
                "qvec",
            )
        )
        sums = (
            assign.select("sid", "cid", F.posexplode("qvec").alias("dim", "qc"))
            .groupBy("cid", "dim")
            .agg(F.expr("sum(qc) div count(*)").cast("long").alias("qc"))
        )
        cents = (
            sums.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, qc))), "
                    "s -> s.qc)"
                ).alias("cv")
            )
            # LAZY checkpoint: the next round's broadcast (or the
            # caller's probe) materializes it inside its own job —
            # truncation is immediate either way (the logical plan is
            # already the checkpoint RDD), and the per-round eager
            # materialization job disappears
            .localCheckpoint(eager=False)
        )
    return assign, cents


# --------------------------------- SQ8 scalar quantization (ADC scan)


def sq_stats(corpus: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``[qmin, qmax]`` grid over the integer-quantized
    corpus, folded into ONE row of two dim-length arrays (ordered by
    dimension) — the train step of 8-bit scalar quantization, the
    simplest vector-compression scheme in the FAISS family
    (``SQ8``/``ScalarQuantizer``): unlike PQ there is no codebook,
    just a uniform 256-level grid per dimension.

    Scale: posexplode + (dim)-keyed agg is map-side combining — the
    shuffle carries dims x partitions rows regardless of corpus size,
    and the folded stats row is trivially broadcast."""
    return _sq_stats_q(quantized_vectors(corpus, id_col, vec_col))


def _sq_stats_q(q: DataFrame) -> DataFrame:
    """:func:`sq_stats` over an ALREADY-quantized ``(sid, qvec)``
    frame — lets :func:`topk_sq` quantize the corpus once and feed
    both the train and encode steps (the interpreted higher-order
    ``transform`` is the scan's dominant cost; see module note)."""
    stats = (
        q.select(F.posexplode("qvec").alias("d", "v"))
        .groupBy("d")
        .agg(F.min("v").alias("qmin"), F.max("v").alias("qmax"))
    )
    return stats.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, qmin))), "
            "s -> s.qmin)"
        ).alias("qmin_arr"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, qmax))), "
            "s -> s.qmax)"
        ).alias("qmax_arr"),
    )


# Encode-then-reconstruct, fused into one indexed transform: the 8-bit
# code is floor((x - qmin_d) * 255 / span_d) (0..255 — integer DIV of
# non-negative operands floors identically in Spark and DuckDB), and
# the reconstruction is kept at 255x scale (qmin_d * 255 + code *
# span_d) so it STAYS exact int64 — no rational arithmetic crosses an
# engine boundary. Constant dimensions (span 0) reconstruct to the
# constant itself.
#: int64-headroom cap on raw embedding magnitude for the SQ8 family:
#: sqrt(2^63 / 64) / (255 * QUANT_SCALE) ~= 1.49. Elements beyond this
#: overflow the 255x-scale recon norm (Spark wraps with ANSI off,
#: DuckDB promotes — the engines would DIVERGE, not just lose
#: precision). Documented, not asserted: a data-dependent assert would
#: cost a full corpus pass on the scan-dominated path.
SQ_MAX_ABS = 1.49

_SQ_RECON = (
    "transform(qvec, (x, i) -> CASE "
    "WHEN qmax_arr[i] = qmin_arr[i] THEN qmin_arr[i] * 255 "
    "ELSE qmin_arr[i] * 255 + ((x - qmin_arr[i]) * 255) "
    "DIV (qmax_arr[i] - qmin_arr[i]) * (qmax_arr[i] - qmin_arr[i]) "
    "END)"
)


def sq_encode(corpus: DataFrame, stats: DataFrame,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """``(sid, recon, rnorm)``: every corpus vector snapped to its
    8-bit grid cell and reconstructed at 255x scale. In a deployed
    index only the uint8 codes are stored (8x memory reduction vs
    float32 — what lets a 100 TB corpus's vectors live in cluster
    RAM); reconstruction happens on the fly during the scan. Here the
    two steps are fused into one narrow map — no shuffle, no UDF.

    Headroom bound (int64, ANSI off — Spark would WRAP silently):
    recon elements sit at 255x the 1e-6 quantization scale, so the
    squared-sum norm over ``dim`` dims needs
    ``dim * (255 * QUANT_SCALE * max|x|)^2 < 2^63`` — for the 64-dim
    embeddings that caps raw elements at ``max|x| <~ 1.49``
    (:data:`SQ_MAX_ABS`). Fine for unit-ish embeddings (elements
    <= 1); callers with larger-magnitude inputs must rescale first,
    mirroring the QUANT_SCALE note in functions/vectors.py:30."""
    return _sq_encode_q(
        quantized_vectors(corpus, id_col, vec_col), stats
    )


def _sq_encode_q(q: DataFrame, stats: DataFrame) -> DataFrame:
    """:func:`sq_encode` over an ALREADY-quantized frame (see
    :func:`_sq_stats_q`)."""
    return (
        q.crossJoin(F.broadcast(stats))
        .withColumn("recon", F.expr(_SQ_RECON))
        .select(
            "sid",
            "recon",
            norm_pre("recon").alias("rnorm"),
        )
    )


def topk_sq(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via 8-bit scalar quantization + asymmetric
    distance: the corpus is compressed to per-dimension 8-bit codes,
    QUERIES stay full precision, and each candidate is scored by the
    exact int64 dot of query x reconstruction (the SQ-ADC scan). SQ
    is pure compression — no pruning — so the scan shape matches
    :func:`topk_bruteforce` (broadcast query side, full corpus scan)
    at 1/8 the vector bytes; compose with :func:`ivf_assign` when the
    scan itself must shrink. The 255x reconstruction scale cancels in
    the cosine. Deterministic end to end (grid from exact int min/max,
    floor-div codes, pinned ties) — fully SQL-replayable. Inputs must
    satisfy the :data:`SQ_MAX_ABS` magnitude bound (see
    :func:`sq_encode`). The corpus is quantized ONCE and shared by
    the train and encode steps — the interpreted ``transform`` pass
    is the scan's dominant per-row cost, and the persist makes the
    reuse real at execution time (lazy plans would otherwise re-run
    the transform in both the stats pass and the ADC scan)."""
    from bottledwater_pg_spark.session import persist_tracked

    q_corpus = persist_tracked(
        quantized_vectors(corpus, id_col, vec_col)
    )
    stats = _sq_stats_q(q_corpus)
    c = _sq_encode_q(q_corpus, stats).select(
        F.col("sid").alias("neighbor_id"),
        F.col("recon").alias("n_q"),
        F.col("rnorm").alias("n_n"),
    )
    q = _q(queries, "query", id_col, vec_col)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_pre("query_q", "n_q", "query_n", "n_n"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ------------------- Matryoshka prefix-dim funnel (Kusupati et al.)


def mrl_encode(corpus: DataFrame, prefix_dim: int = 16,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """The MRL index-build step: ``(sid, t_q, t_n)`` — each corpus
    vector's quantized first-``prefix_dim`` slice and its precomputed
    norm. Persist THIS frame (its own parquet column, like
    :func:`sq_encode`'s codes) and hand it to :func:`topk_mrl` as
    ``index_prefix``: the shortlist scan then reads a stored column
    ``dim/prefix_dim``x narrower than the vectors — the bytes
    reduction is in the scan's ReadSchema, not just the compute.
    Truncation commutes with per-element quantization, so slicing the
    quantized vector IS the quantized truncation."""
    return quantized_vectors(corpus, id_col, vec_col).select(
        F.col("sid").alias("neighbor_id"),
        F.slice("qvec", 1, prefix_dim).alias("t_q"),
    ).withColumn("t_n", norm_pre("t_q"))


def topk_mrl(corpus: DataFrame, queries: DataFrame, k: int = 5,
             prefix_dim: int = 16, refine: int = 50,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             index_prefix: DataFrame | None = None) -> DataFrame:
    """Adaptive retrieval over Matryoshka-style prefix dimensions
    (Kusupati et al. 2022, "Matryoshka Representation Learning" §4.3):
    shortlist candidates by cosine over only the FIRST ``prefix_dim``
    coordinates, then re-rank the ``refine`` survivors per query with
    full-dimension exact cosine — the funnel MRL embeddings are
    trained for, and the right first rung at 100 TB: with
    ``index_prefix`` (a stored :func:`mrl_encode` table, the deployed
    shape) the shortlist scan READS a prefix-slice column an order of
    magnitude narrower than the vectors — a dim/prefix_dim bytes
    reduction visible in the scan's ReadSchema (plan-pinned in
    tests/test_plans.py) — and only refine * |Q| full vectors are
    ever touched. Without it (ad-hoc use) the prefix is sliced from
    the full vectors on the fly: same result, compute-only saving.
    (On embeddings NOT trained front-loaded — like this uniform
    fixture — the prefix is an unbiased random projection, so the
    funnel still works, just with a flatter recall/dim curve; the
    certificate floor is set for that honest worst case.)
    Deterministic, pinned ties, fully SQL-replayable."""
    t = (
        index_prefix
        if index_prefix is not None
        else mrl_encode(corpus, prefix_dim, id_col, vec_col)
    )
    qt = quantized_vectors(queries, id_col, vec_col).select(
        F.col("sid").alias("query_id"),
        F.slice("qvec", 1, prefix_dim).alias("tq_q"),
    ).withColumn("tq_n", norm_pre("tq_q"))
    scored = (
        t.crossJoin(F.broadcast(qt))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("tcos", cosine_pre("tq_q", "t_q", "tq_n", "t_n"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("tcos"), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= refine)
        .select("query_id", "neighbor_id")
    )
    qq = _q(queries, "query", id_col, vec_col)
    nn = _q(corpus, "n", id_col, vec_col)
    rescored = (
        shortlist.join(F.broadcast(qq), "query_id")
        .join(nn.withColumnRenamed("n_id", "neighbor_id"), "neighbor_id")
        .withColumn("cos", cosine_pre("query_q", "n_q", "query_n", "n_n"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
