"""Deduplication operators for large-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup.

Scale design. Exact dedup is a single hash aggregation. The brute
Jaccard join is quadratic in documents sharing a shingle — correct and
fine as the *oracle baseline*, but the 100 TB path is MinHash+LSH:
signatures are one aggregation over exploded shingles, banding turns
near-dup search into an equi-join on (band, signature) buckets, and
only bucket-mates are verified exactly. SimHash gives the complementary
bit-sketch with banded Hamming blocking. All sketch math uses Spark's
built-in ``xxhash64``/bit functions — JVM codegen, no Python.

References: the reference system has no dedup (it is a CDC pipe);
these implement the north-star consumer-side surface (SURVEY §2.2).
MinHash-LSH follows the standard construction from Broder (1997) /
Leskovec-Rajaraman-Ullman ch.3; SimHash follows Charikar (2002).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.text import fingerprint, word_shingles
from bottledwater_pg_spark.session import persist_tracked
from bottledwater_pg_spark.functions.vectors import (
    cosine_pre,
    norm_pre,
    quantized_vec,
)

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup on normalized-text fingerprint: one hash aggregation
    (map-side partial agg; single shuffle on the fingerprint)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ------------------------------------------------------- n-gram Jaccard


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """One row per (doc, distinct shingle). Tokenizes into a bound
    column first — see word_shingles_from_tokens for why inlining the
    split into the shingle lambda is O(tokens^2)."""
    from bottledwater_pg_spark.functions.text import (
        tokens,
        word_shingles_from_tokens,
    )

    return df.select(
        F.col(id_col).alias("sid"), tokens(text_col).alias("toks")
    ).select(
        "sid",
        F.explode(word_shingles_from_tokens("toks", n)).alias("shingle"),
    )


def jaccard_pairs(df: DataFrame, threshold: float, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (exact, no sketching).

    Quadratic in per-shingle document frequency — this is the oracle
    baseline; use :func:`minhash_lsh_pairs` at scale.
    """
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.sid") < F.col("b.sid"))
        .groupBy(F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"sid": "a_id", "sz": "sz_a"}), "a_id")
        .join(sizes.withColumnsRenamed({"sid": "b_id", "sz": "sz_b"}), "b_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, EXACT, via prefix
    filtering (the AllPairs/PPJoin family — Bayardo et al. WWW'07,
    Xiao et al. ICDE'08): order every document's shingles by global
    document frequency (rarest first), keep only the first
    ``sz - ceil(t*sz) + 1`` as the blocking prefix — two sets with
    Jaccard >= t MUST share a prefix element — then verify candidates
    with an exact array_intersect. Unlike MinHash-LSH this is
    deterministic-exact with NO false-negative probability, at the
    cost of the df-ranking shuffle; the equi-join touches only rare
    shingles, so skew is structurally avoided (the most frequent
    shingles never enter the join). The length filter
    (``t*|x| <= |y| <= |x|/t``) prunes cross-size candidates first.

    Prefix lengths are computed in exact DECIMAL arithmetic
    (``ceil(sz * 0.8)`` as a double can round UP on exact multiples,
    silently shortening the prefix and dropping true pairs).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # the exploded shingle table feeds the df-ranking, the prefix
    # blocking join AND the verify arrays — persist it once instead of
    # re-tokenizing the corpus four times (the cluster-scale analog is
    # a checkpointed intermediate dataset)
    sh = persist_tracked(
        shingle_table(df, id_col, text_col, n), StorageLevel.MEMORY_AND_DISK
    )  # distinct per doc
    sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    w = Window.partitionBy("sid").orderBy("dfreq", "shingle")
    # prefix feeds BOTH sides of the candidate self-join below —
    # persisted, or the df-ranking join + window run twice
    prefix = persist_tracked(
        sh.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "sid")
        .filter(F.col("rn") <= F.expr(f"sz - ceil(sz * {threshold}) + 1")),
        StorageLevel.MEMORY_AND_DISK,
    )
    a = prefix.select(
        F.col("sid").alias("a_id"), "shingle", F.col("sz").alias("psz_a")
    )
    b = prefix.select(
        F.col("sid").alias("b_id"), "shingle", F.col("sz").alias("psz_b")
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.expr(f"psz_b >= psz_a * {threshold}"))
        .filter(F.expr(f"psz_a >= psz_b * {threshold}"))
        .select("a_id", "b_id")
        .distinct()
    )
    # arrays feeds both verify sides — persist, or the collect_set
    # aggregation over the full shingle table runs twice
    arrays = persist_tracked(
        sh.groupBy("sid").agg(
            F.collect_set("shingle").alias("shs"), F.count("*").alias("sz")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    va = arrays.select(
        F.col("sid").alias("a_id"),
        F.col("shs").alias("sh_a"),
        F.col("sz").alias("sz_a"),
    )
    vb = arrays.select(
        F.col("sid").alias("b_id"),
        F.col("shs").alias("sh_b"),
        F.col("sz").alias("sz_b"),
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# -------------------------------------------------------- MinHash + LSH

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the hash family
    h_i(x) = (a_i * x + b_i) mod p over x in [0, p)."""
    rng = random.Random(20240807)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """MinHash signature from an exploded shingle table: ONE
    aggregation computing all ``num_hashes`` minima at once (map-side
    combine keeps the shuffle at |docs| x num_hashes)."""
    params = _minhash_params(num_hashes)
    hashed = sh.withColumn(
        # base shingle hash folded into [0, p)
        "hx",
        F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_PRIME)),
    )
    # one parsed SQL string per hash instead of ~5 chained Column
    # calls — same expression tree/plan, ~5x fewer py4j round-trips
    # of driver plan-construction (int32 coefficient literals exactly
    # as F.lit(a) produced: a, b < 2^31; the multiply promotes to
    # long before pmod either way)
    mins = [
        F.expr(
            f"min(pmod({a} * hx + {b}, {MINHASH_PRIME})) AS mh{i}"
        )
        for i, (a, b) in enumerate(params)
    ]
    return hashed.groupBy("sid").agg(*mins)


def minhash_signatures(df: DataFrame, num_hashes: int = 32,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3) -> DataFrame:
    """Per-doc MinHash signature (see _signatures_from_shingles)."""
    return _signatures_from_shingles(
        shingle_table(df, id_col, text_col, n), num_hashes
    )


def _minhash_band_array(num_hashes: int, bands: int) -> "F.Column":
    """The per-doc array of (band, bsig) structs as ONE parsed SQL
    expression — tree-identical to the nested
    ``F.array(F.struct(F.lit(bi), F.concat_ws('_', mh...)))`` build
    (same plan, same results) at ~1/6 the py4j round-trips of driver
    plan construction."""
    rows = num_hashes // bands
    parts = []
    for bi in range(bands):
        cols = ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        parts.append(
            f"struct({bi} AS band, concat_ws('_', {cols}) AS bsig)"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def _bit_band_array(sig_col: str, bands: int, width: int) -> "F.Column":
    """(band, bval) struct array over a bit-sliced integer signature,
    as one parsed expression — see :func:`_minhash_band_array`.
    ``shiftright(x, n)`` spelled as the function: the ``>>`` operator
    does not parse inside a function argument list, and it resolves
    to the same ShiftRight node anyway."""
    parts = [
        f"struct({bi} AS band, "
        f"(shiftright({sig_col}, {bi * width}) & {(1 << width) - 1})"
        f" AS bval)"
        for bi in range(bands)
    ]
    return F.expr("array(" + ", ".join(parts) + ")")


def banded_minhash_from_shingles(sh: DataFrame, num_hashes: int = 32,
                                 bands: int = 16) -> DataFrame:
    """(sid, band, bsig): the MinHash signature split into LSH bands,
    from a shingle table — the STORED form of a standing text index.
    A pure function of the text, so it is computed ONCE at indexing
    time and persisted (StreamingDedupIndex writes these per epoch,
    mirroring the vector index's ``sig`` slices); a probe then
    broadcasts the new batch's bands against the stored table and
    never re-shingles the corpus."""
    assert num_hashes % bands == 0
    sig = _signatures_from_shingles(sh, num_hashes)
    band_structs = _minhash_band_array(num_hashes, bands)
    return sig.select("sid", F.explode(band_structs).alias("bs")).select(
        "sid",
        F.col("bs.band").alias("band"),
        F.col("bs.bsig").alias("bsig"),
    )


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.6, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      shingles: DataFrame | None = None,
                      max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH + exact Jaccard verify.

    rows-per-band = num_hashes/bands; candidate pairs are an equi-join
    on (band, band-signature) — no quadratic all-pairs pass. Candidates
    are then verified with exact Jaccard (computed only for candidates,
    via a semi-join on the shingle table).

    ``shingles``: an ALREADY-persisted ``(sid, shingle)`` table to use
    instead of deriving one from ``df`` — ensemble callers that feed
    several modalities from one tokenization pass share it (the
    identical expression, so results are unchanged).

    ``max_bucket``: hot-bucket escape hatch for boilerplate cohorts.
    A band bucket shared by m docs yields C(m,2) candidate pairs, and
    when the cohort is mutually near-identical (the input family that
    MAKES buckets hot — license pages, captchas, templated stubs)
    those pairs are TRUE output: the blow-up is semantic, exactly the
    containment df_cap situation (scripts/lsh_skew.py measures it).
    With ``max_bucket=c``, buckets with more than c members emit only
    the SPANNING STAR (min-sid representative x each other member):
    m-1 candidates instead of C(m,2). Every candidate is still
    exact-Jaccard verified, so precision is unchanged; within-bucket
    pair recall drops from all-pairs to a spanning set — which
    preserves the CONNECTED COMPONENTS of the pair graph whenever the
    hot bucket is a mutual-similarity cohort (the downstream
    dedup-clustering contract; hash-certified on the boilerplate
    fixture by the ``lsh_hot_bucket_capped_clusters`` oracle). Normal
    buckets are untouched.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # the exploded shingle table feeds the signature aggregation AND
    # both sides of the verify join — persist it once instead of
    # re-tokenizing the corpus three times (at cluster scale this is a
    # cached/checkpointed intermediate dataset)
    from pyspark import StorageLevel

    sh_cached = shingles if shingles is not None else persist_tracked(
        shingle_table(df, id_col, text_col, n), StorageLevel.MEMORY_AND_DISK
    )
    sig = _signatures_from_shingles(sh_cached, num_hashes)
    band_structs = _minhash_band_array(num_hashes, bands)
    # banded feeds BOTH sides of the candidate self-join: persist it,
    # or the num_hashes-column signature aggregation runs twice (the
    # table is one row per doc per band — tiny next to the shingles)
    banded = persist_tracked(
        sig.select("sid", F.explode(band_structs).alias("bs")).select(
            "sid", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig")
        )
    )
    if max_bucket is None:
        candidates = (
            banded.alias("a")
            .join(banded.alias("b"), ["band", "bsig"])
            .filter(F.col("a.sid") < F.col("b.sid"))
            .select(F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id"))
            .distinct()
        )
    else:
        from pyspark.sql import Window

        # one shuffle on (band, bsig) serves both window functions
        w = Window.partitionBy("band", "bsig")
        counted = banded.withColumn("_n", F.count("*").over(w)).withColumn(
            "_rep", F.min("sid").over(w)
        )
        normal = counted.filter(F.col("_n") <= max_bucket).select(
            "band", "bsig", "sid"
        )
        cand_normal = (
            normal.alias("a")
            .join(normal.alias("b"), ["band", "bsig"])
            .filter(F.col("a.sid") < F.col("b.sid"))
            .select(
                F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id")
            )
        )
        # hot buckets: spanning star, m-1 candidates instead of C(m,2)
        cand_hot = (
            counted.filter(
                (F.col("_n") > max_bucket) & (F.col("sid") != F.col("_rep"))
            )
            .select(F.col("_rep").alias("a_id"), F.col("sid").alias("b_id"))
        )
        candidates = cand_normal.unionByName(cand_hot).distinct()
    # exact verify on candidates only, reusing the cached shingles
    sh = sh_cached
    # the per-doc size table joins BOTH the a_id and b_id sides below
    # — persist it once (r15) instead of re-aggregating the shingle
    # cache per side (doc-count sized, tiny next to the shingles)
    sizes = persist_tracked(
        sh.groupBy("sid").agg(F.count("*").alias("sz"))
    )
    inter = (
        candidates.join(sh.alias("a"), F.col("a.sid") == F.col("a_id"))
        .join(
            sh.alias("b"),
            (F.col("b.sid") == F.col("b_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"sid": "a_id", "sz": "sz_a"}), "a_id")
        .join(sizes.withColumnsRenamed({"sid": "b_id", "sz": "sz_b"}), "b_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# --------------------------------------------------------------- SimHash

SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS, hash_col: "F.Column | None" = None,
            token_arrays: DataFrame | None = None):
    """Charikar SimHash over token counts: for each bit, sum +count when
    the token hash has the bit set else -count; bit = sign. One
    aggregation; all bit math in built-in functions.

    ``hash_col`` chooses the token hash (default xxhash64 — JVM-fast;
    pass the md5-prefix form for a DuckDB-reproducible signature) and
    ``bits`` the signature width (<= 60 so 1<<bit stays in a signed
    long for either hash). ``token_arrays``: a pre-tokenized
    ``(sid, toks)`` table (functions.text.tokens — the identical
    split expression) to explode instead of re-splitting ``df`` —
    lets ensemble callers share one tokenization scan across
    modalities without changing the result.
    """
    toks = (
        token_arrays.select("sid", F.explode("toks").alias("tok"))
        if token_arrays is not None
        else df.select(
            F.col(id_col).alias("sid"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
    )
    counted = toks.groupBy("sid", "tok").agg(F.count("*").alias("cnt"))
    hashed = counted.withColumn(
        "h", hash_col if hash_col is not None else F.xxhash64("tok")
    )
    # each aggregate is ONE parsed SQL string instead of ~6 chained
    # Column calls: the expression tree (and therefore the plan and
    # the result) is identical, but driver-side construction drops
    # from ~200 py4j round-trips to ``bits`` parse calls — plan-build
    # latency is driver wall-time at any cluster size
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN cnt "
            f"ELSE -cnt END) AS b{i}"
        )
        for i in range(bits)
    ]
    agg = hashed.groupBy("sid").agg(*bit_sums)
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        )
    )
    return agg.select("sid", sim.cast("long").alias("simhash"))


def md5_token_hash(tok_col: str = "tok") -> "F.Column":
    """60-bit token hash both engines compute identically: first 15
    hex chars of md5, parsed base-16 (Spark ``conv`` == DuckDB
    ``('0x'||substr(md5(t),1,15))::BIGINT``, verified bit-equal)."""
    return F.conv(
        F.substring(F.md5(F.encode(F.col(tok_col), "UTF-8")), 1, 15), 16, 10
    ).cast("long")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 6,
                       id_col: str = "doc_id", text_col: str = "text",
                       bands: int = 4, bits: int = SIMHASH_BITS,
                       hash_col: "F.Column | None" = None,
                       token_arrays: DataFrame | None = None) -> DataFrame:
    """Near-dup candidates by banded SimHash blocking (pairs agreeing on
    at least one band), verified by exact Hamming distance."""
    width = bits // bands
    sig = simhash(df, id_col, text_col, bits=bits, hash_col=hash_col,
                  token_arrays=token_arrays)
    band_structs = _bit_band_array("simhash", bands, width)
    # persisted for the same both-sides reason as the MinHash banded
    # table: without it the tf + bit-sum aggregation chain runs twice
    banded = persist_tracked(
        sig.select("sid", "simhash", F.explode(band_structs).alias("bs")).select(
            "sid", "simhash", F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval")
        )
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bval"])
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("a_id"),
            F.col("b.sid").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------- embedding-cosine dedup


def quantized_vectors(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(sid, qvec, qnorm): each vector quantized ONCE with its norm
    precomputed — higher-order functions are interpreted row-at-a-time,
    so pair-heavy operators must not re-quantize per pair."""
    return df.select(
        F.col(id_col).alias("sid"),
        quantized_vec(vec_col).alias("qvec"),
    ).withColumn("qnorm", norm_pre("qvec"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.99,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """All-pairs embedding cosine >= threshold (exact baseline; use
    :func:`hyperplane_lsh_near_dup` at scale)."""
    q = quantized_vectors(df, id_col, vec_col)
    a = q.select(F.col("sid").alias("a_id"), F.col("qvec").alias("qa"),
                 F.col("qnorm").alias("na"))
    b = q.select(F.col("sid").alias("b_id"), F.col("qvec").alias("qb"),
                 F.col("qnorm").alias("nb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine_pre("qa", "qb", "na", "nb"))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def hyperplane_signature(df: DataFrame, num_bits: int = 16,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """Sign-random-projection (SRP) bit signature. The hyperplanes are
    pseudo-random ±1 vectors derived per (bit, dim) from xxhash64 —
    deterministic, shipped as an expression, no driver-side matrix.

    Computed via posexplode + one hash aggregation (codegen'd, partial
    agg map-side) rather than per-row higher-order lambdas, which are
    interpreted and ~num_bits x slower."""
    elems = df.select(
        F.col(id_col).alias("sid"),
        F.posexplode(F.col(vec_col)).alias("j", "x"),
    ).withColumn("xd", F.col("x").cast("double"))
    # one parsed SQL string per bit instead of ~7 chained Column calls
    # (same expression tree/plan/result — the batching discipline of
    # _minhash_band_array; 1.0D = double literal, matching F.when's)
    projs = [
        F.expr(
            f"sum(xd * (CASE WHEN pmod(xxhash64({i}, j), 2) = 0 "
            f"THEN 1.0D ELSE -1.0D END)) AS p{i}"
        )
        for i in range(num_bits)
    ]
    agg = elems.groupBy("sid").agg(*projs)
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN p{i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(num_bits)
        )
    )
    return agg.select("sid", sig.cast("long").alias("srp"))


def srp_signs_md5(spark, dim: int, num_bits: int) -> DataFrame:
    """The ±1 hyperplane matrix as a tiny broadcastable table
    ``(j, s0..s{num_bits-1})``: sign(i, j) = +1 iff the 60-bit
    md5-prefix integer of ``"{i}_{j}"`` is even. md5 over the same
    UTF-8 string yields the same hex in Spark and DuckDB (the
    ``md5_token_hash`` trick), so BOTH engines derive the identical
    matrix from nothing but (dim, num_bits) — dim*num_bits md5 calls
    total, never per data row."""
    # the whole num_bits-column matrix as ONE selectExpr call — the
    # nested-Column build was ~12 py4j round-trips per bit of pure
    # driver plan-construction latency (same tree, same values)
    cols = [
        f"CAST(CASE WHEN CAST(conv(substring(md5(encode("
        f"concat_ws('_', {i}, j), 'UTF-8')), 1, 15), 16, 10) AS BIGINT)"
        f" % 2 = 0 THEN 1 ELSE -1 END AS BIGINT) AS s{i}"
        for i in range(num_bits)
    ]
    return spark.range(dim).selectExpr("CAST(id AS INT) AS j", *cols)


def hyperplane_signature_md5(df: DataFrame, num_bits: int = 32,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int | None = None) -> DataFrame:
    """SRP signature a SQL oracle can recompute bit-for-bit: the sign
    matrix comes from md5 parity (:func:`srp_signs_md5`) instead of
    xxhash64, and each projection is an EXACT int64 sum of
    integer-quantized elements times ±1 — no float summation, so no
    order sensitivity; identical inputs give the identical signature
    in every engine. :func:`hyperplane_signature` (xxhash64, raw
    doubles) stays the JVM-fast production path; this variant exists
    so SRP-LSH ANN results are value-hash oracle-able (the reference
    certifies values, not engine internals —
    /root/reference/spec/bin/generate_type_specs.rb:30-45).

    Same plan shape as the twin: posexplode + one broadcast join
    against the num_bits-column sign table + one partial-aggregated
    sum per bit. The ``dim`` probe is a 1-value bounded collect."""
    from bottledwater_pg_spark.functions.vectors import quantize

    spark = df.sparkSession
    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    signs = srp_signs_md5(spark, dim, num_bits)
    elems = df.select(
        F.col(id_col).alias("sid"),
        F.posexplode(F.col(vec_col)).alias("j", "x"),
    ).withColumn("q", F.expr(quantize("x")))
    joined = elems.join(F.broadcast(signs), "j")
    projs = [
        F.expr(f"sum(q * s{i}) AS p{i}") for i in range(num_bits)
    ]
    agg = joined.groupBy("sid").agg(*projs)
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN p{i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(num_bits)
        )
    )
    return agg.select("sid", sig.cast("long").alias("srp"))


def banded_srp(df: DataFrame, num_bits: int, bands: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               variant: str = "xxhash",
               dim: int | None = None) -> DataFrame:
    """(sid, band, bval) — the SRP signature split into LSH bands.
    ``variant='md5'`` uses the oracle-reproducible signature; ``dim``
    skips its 1-value dimension-probe job when the caller knows it."""
    width = num_bits // bands
    sig = (
        hyperplane_signature_md5(df, num_bits, id_col, vec_col, dim=dim)
        if variant == "md5"
        else hyperplane_signature(df, num_bits, id_col, vec_col)
    )
    band_structs = _bit_band_array("srp", bands, width)
    return sig.select("sid", F.explode(band_structs).alias("bs")).select(
        "sid", F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval")
    )


def hyperplane_lsh_near_dup(df: DataFrame, threshold: float = 0.99,
                            num_bits: int = 24, bands: int = 4,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Scale path for embedding near-dup: SRP-LSH banding blocks
    candidates (high-cosine vectors agree on most sign bits), then the
    exact quantized cosine verifies.

    Candidates are deduped as ID PAIRS before any vector data is
    attached — shuffling and hashing 64-float arrays through the
    distinct would dominate at scale."""
    from pyspark import StorageLevel

    # the SRP signature projection (num_bits dot products per vector)
    # feeds both sides of the band self-join; the quantized vectors
    # feed both sides of the verify — persist each once instead of
    # recomputing per join side
    banded = persist_tracked(
        banded_srp(df, num_bits, bands, id_col, vec_col),
        StorageLevel.MEMORY_AND_DISK,
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bval"])
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id"))
        .distinct()
    )
    q = persist_tracked(
        quantized_vectors(df, id_col, vec_col), StorageLevel.MEMORY_AND_DISK
    )
    return (
        cand.join(
            q.select(F.col("sid").alias("a_id"), F.col("qvec").alias("qa"),
                     F.col("qnorm").alias("na")),
            "a_id",
        )
        .join(
            q.select(F.col("sid").alias("b_id"), F.col("qvec").alias("qb"),
                     F.col("qnorm").alias("nb")),
            "b_id",
        )
        .withColumn("cos", cosine_pre("qa", "qb", "na", "nb"))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def incremental_lsh_matches(index_df: DataFrame | None, new_df: DataFrame,
                            num_hashes: int = 32, bands: int = 16,
                            threshold: float = 0.8,
                            id_col: str = "doc_id", text_col: str = "text",
                            n: int = 3,
                            index_banded: DataFrame | None = None,
                            index_shingles: DataFrame | None = None,
                            probe_bucket_cap: int | None = None,
                            ) -> DataFrame:
    """Incremental (new-batch-vs-index) near-dup matching — the daily
    ingest shape: a SMALL new batch is checked against the STANDING
    corpus index instead of re-running all-pairs dedup over the whole
    corpus. Returns ``(new_id, match_id, jaccard)`` for every index
    document within ``threshold`` of a new document.

    Both sides use the same deterministic MinHash band signatures, so
    a new doc collides with an index doc exactly as it would have in
    the symmetric join. Candidates verify with exact Jaccard over the
    two shingle tables (candidate pairs only).

    Scale design: at 100 TB the index's banded signatures and shingle
    table are STORED (built once, appended per batch — what
    StreamingDedupIndex persists per epoch slice); pass them as
    ``index_banded`` / ``index_shingles`` and this probe does NO
    per-call work over the corpus: one broadcast of the new batch's
    bands (small by definition) against the stored band table,
    exact-Jaccard verify over candidate docs' stored shingles only
    (semi-join-pruned). Without them (ad-hoc batch use) both are
    derived from ``index_df`` on the fly — an O(corpus) recompute per
    call, fine for one-shot matching, wrong for a standing stream.
    Cost scales with the batch, not the corpus — the property that
    makes continuous dedup feasible.

    ``probe_bucket_cap``: the probe-side hot-bucket escape hatch (the
    ``minhash_lsh_pairs(max_bucket=)`` analog). A boilerplate cohort
    of m identical docs in the STANDING index shares every band
    signature; a batch doc colliding with that bucket candidates
    against all m members and the verify reads all m stored shingle
    sets — O(m x batch) per band, growing with every cohort page ever
    indexed. With the cap, each colliding (band, bsig) bucket exposes
    only its ``cap`` LOWEST-sid index members (the earliest-seen
    witnesses — ranked only over buckets the batch actually touches,
    so the ranking shuffle is batch-sized, not corpus-sized). Every
    surviving candidate is still exact-Jaccard verified, so precision
    is unchanged; the match SET is a subset of the uncapped one, and
    an exists-a-match consumer (rejection-style dedup) is unaffected
    whenever hot buckets are mutual-similarity cohorts — the input
    family that makes buckets hot — because the earliest member
    verifies iff any member does (identical shingle sets). Parity
    pinned on the cohort fixture in tests/test_llm_ops.py.
    """
    assert num_hashes % bands == 0
    if index_df is None and (index_banded is None or index_shingles is None):
        raise ValueError(
            "incremental_lsh_matches: index_df is required unless BOTH "
            "index_banded and index_shingles are provided (got banded=%s, "
            "shingles=%s) — a lone precomputed side cannot stand in for "
            "the index" % (index_banded is not None,
                           index_shingles is not None)
        )
    sh_idx = (
        index_shingles
        if index_shingles is not None
        else persist_tracked(shingle_table(index_df, id_col, text_col, n))
    )
    sh_new = persist_tracked(shingle_table(new_df, id_col, text_col, n))
    b_idx = (
        index_banded
        if index_banded is not None
        else banded_minhash_from_shingles(sh_idx, num_hashes, bands)
    )
    b_new = persist_tracked(
        banded_minhash_from_shingles(sh_new, num_hashes, bands)
        .select(F.col("sid").alias("new_id"), "band", "bsig")
    )
    idx_side = b_idx.select(F.col("sid").alias("match_id"), "band", "bsig")
    if probe_bucket_cap is not None:
        from pyspark.sql import Window

        # prune to buckets the batch touches FIRST (broadcast
        # semi-join — no corpus shuffle), then rank the survivors:
        # the ranked set is exactly the collision set, batch-sized
        idx_side = (
            idx_side.join(
                F.broadcast(b_new.select("band", "bsig").distinct()),
                ["band", "bsig"],
                "left_semi",
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("band", "bsig").orderBy("match_id")
                ),
            )
            .filter(F.col("_rn") <= probe_bucket_cap)
            .drop("_rn")
        )
    candidates = (
        idx_side.join(F.broadcast(b_new), ["band", "bsig"])
        .select("new_id", "match_id")
        .distinct()
    )
    # candidates feeds BOTH the size prune and the intersection join —
    # persist the (small) pair set so the band join runs once
    candidates = persist_tracked(candidates)
    # Jaccard is over shingle SETS — count DISTINCT shingles, not rows.
    # shingle_table is distinct within one input row, but an index
    # carrying the same (doc_id, text) twice (a streaming index after
    # fresh-epoch re-delivery, or a base snapshot mid-compaction crash
    # window) would double sz_m AND inter under count(*), inflating
    # jaccard past its true value (2I/(N+2M-2I) > I/(N+M-I)) and
    # flipping boundary non-matches into rejections. count_distinct
    # equals count(*) for unique inputs and is the set definition.
    # index-side sizes ONLY for candidate docs: every doc that can
    # reach the result appears in `candidates`, so aggregating the
    # whole index's shingle sizes (an O(corpus) pass per probe) buys
    # nothing — the semi-join prunes the size agg to the batch's
    # collision set. Inner joins below guarantee no candidate is lost.
    sz_idx = (
        sh_idx.join(
            candidates.select(F.col("match_id").alias("sid")).distinct(),
            "sid",
            "left_semi",
        )
        .groupBy("sid")
        .agg(F.count_distinct("shingle").alias("sz_m"))
    )
    sz_new = sh_new.groupBy("sid").agg(
        F.count_distinct("shingle").alias("sz_n")
    )
    inter = (
        candidates.join(sh_new.alias("a"), F.col("a.sid") == F.col("new_id"))
        .join(
            sh_idx.alias("b"),
            (F.col("b.sid") == F.col("match_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("new_id", "match_id")
        .agg(F.count_distinct("a.shingle").alias("inter"))
    )
    return (
        inter.join(sz_new.withColumnsRenamed({"sid": "new_id"}), "new_id")
        .join(sz_idx.withColumnsRenamed({"sid": "match_id"}), "match_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_n") + F.col("sz_m") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "match_id", "jaccard")
    )


def incremental_cosine_matches(index_df: DataFrame | None,
                               new_df: DataFrame,
                               threshold: float = 0.99,
                               num_bits: int = 24, bands: int = 4,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               index_banded: DataFrame | None = None,
                               index_quant: DataFrame | None = None,
                               ) -> DataFrame:
    """Incremental (new-batch-vs-index) EMBEDDING near-dup matching —
    the vector twin of :func:`incremental_lsh_matches`: a small new
    batch of vectors is checked against the standing corpus index via
    the same SRP band signatures :func:`hyperplane_lsh_near_dup` uses
    for the symmetric self-join, then exact quantized cosine verifies.
    Returns ``(new_id, match_id, cos)`` for every index vector within
    ``threshold`` of a new vector.

    Because a vector's SRP signature is a pure function of the vector
    (fixed hyperplanes), a new vector collides with an index vector
    exactly as it would have in the symmetric join — which is what
    makes a batched stream's candidate set EQUAL the batch self-join's
    regardless of how arrival slices the corpus.

    Scale: the index side accepts PRECOMPUTED signatures and quantized
    vectors (``index_banded`` / ``index_quant`` — what a standing
    index stores, bucketed by (band, bval)); when given, the probe
    does NO per-call work over the corpus: it broadcasts the new
    batch's bands against the stored signatures and fetches stored
    quantized vectors only for candidate ids. Cost scales with the
    batch, not the corpus. Without them (ad-hoc batch use) both are
    derived from ``index_df`` on the fly — an O(corpus) recompute per
    call, fine for one-shot matching, wrong for a standing stream
    (StreamingVectorDedupIndex stores both per epoch slice)."""
    from pyspark import StorageLevel

    if index_df is None and (index_banded is None or index_quant is None):
        raise ValueError(
            "incremental_cosine_matches: index_df is required unless BOTH "
            "index_banded and index_quant are provided (got banded=%s, "
            "quant=%s) — a lone precomputed side cannot stand in for the "
            "index" % (index_banded is not None, index_quant is not None)
        )

    b_idx = (
        index_banded
        if index_banded is not None
        else banded_srp(index_df, num_bits, bands, id_col, vec_col)
    )
    b_new = banded_srp(new_df, num_bits, bands, id_col, vec_col)
    cand = (
        b_idx.select(F.col("sid").alias("match_id"), "band", "bval")
        .join(
            F.broadcast(
                b_new.select(F.col("sid").alias("new_id"), "band", "bval")
            ),
            ["band", "bval"],
        )
        .select("new_id", "match_id")
        .distinct()
    )
    q_idx = (
        index_quant
        if index_quant is not None
        else persist_tracked(
            quantized_vectors(index_df, id_col, vec_col),
            StorageLevel.MEMORY_AND_DISK,
        )
    )
    q_new = quantized_vectors(new_df, id_col, vec_col)
    return (
        cand.join(
            q_idx.select(F.col("sid").alias("match_id"),
                         F.col("qvec").alias("qa"),
                         F.col("qnorm").alias("na")),
            "match_id",
        )
        .join(
            F.broadcast(
                q_new.select(F.col("sid").alias("new_id"),
                             F.col("qvec").alias("qb"),
                             F.col("qnorm").alias("nb"))
            ),
            "new_id",
        )
        .withColumn("cos", cosine_pre("qa", "qb", "na", "nb"))
        .filter(F.col("cos") >= threshold)
        .select("new_id", "match_id", "cos")
    )


def containment_prefix_pairs(df: DataFrame, threshold_bp: int = 8000,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             n: int = 3,
                             df_cap: int | None = None) -> DataFrame:
    """EXACT shingle-containment pairs: ``C(A,B) = |A ∩ B| / |A|``
    with A the smaller set — the asymmetric near-dup measure (Broder
    1997's containment, the quote-expansion case: a short document
    pasted wholesale into a longer one has high containment but LOW
    Jaccard, inter/union shrinking with the container's size, so the
    whole Jaccard family above is structurally blind to it).

    Blocking is the containment adaptation of prefix filtering
    (Bayardo et al. WWW'07): C(A,B) >= t forces >= ceil(t*|A|) shared
    shingles, so A's rarest ``|A| - ceil(t*|A|) + 1`` shingles MUST
    hit B — only the CONTAINED side is prefix-pruned, and it joins
    the full shingle table (no length filter applies: the container
    may be arbitrarily larger, which is exactly the case Jaccard's
    ``t*|x| <= |y|`` filter would discard). Prefix shingles are by
    construction the globally rarest, so the equi-join's per-key
    fan-out is bounded by those shingles' document frequency — the
    frequent keys never enter the join, the same skew-avoidance
    argument as :func:`prefix_filter_jaccard_pairs`.

    The threshold is integer basis points compared by
    cross-multiplication (``inter * 10000 >= sz_a * threshold_bp``) —
    no float threshold crosses the engine boundary. Each unordered
    pair is emitted once, smaller set as ``a_id`` (ties on size break
    to the lower id). Exact — no false-negative probability.

    Verify shape (r12): candidates are orientation-filtered FIRST
    (join the |docs|-row size table, keep only the smaller-as-a_id
    version — the blocking theorem guarantees that version exists for
    every true pair, so the drop loses nothing and halves the verify
    input), then intersections count via a (sid, shingle) equi-join —
    the :func:`incremental_lsh_matches` verify shape. The previous
    form collected every doc's shingle SET into an array column and
    ran per-pair ``array_intersect``: O(sz_a + sz_b) interpreted work
    per candidate and whole-document arrays through the join shuffle.
    Single-session A/B at sf0.1: join-verify min 2.588 s vs array
    form 2.85 s (~9% on min, ~15% on median) — and the structural
    win is that no document-sized array ever crosses a shuffle, the
    term that grows with document size at warehouse scale (SCALE.md
    r12)."""
    from pyspark import StorageLevel

    # df_cap (r13, the hot-shingle escape hatch): the fan-out bound
    # above has an adversarial hole — a BOILERPLATE shingle (license
    # footer, site header) present in p% of the corpus never enters a
    # normal doc's rarest-k prefix, but a doc consisting MOSTLY of
    # boilerplate (empty license pages — every crawl has them) has no
    # rare shingles to prefer, so its prefix IS hot and it candidates
    # against every footer-carrying doc: O(hot_docs x p x N) pairs.
    # Worse, those pairs are TRUE output (a pure-footer page really is
    # contained in every doc carrying the footer), so no blocking fix
    # can help — the SEMANTIC is wrong at scale. df_cap applies the
    # standard stopwording remedy (the CCNet/C4 practice of stripping
    # boilerplate before dedup, Wenzek 2020 / Raffel 2020): shingles
    # with document frequency > df_cap are removed from the shingle
    # UNIVERSE — prefix, join, sizes, and intersections all see the
    # filtered universe, so the result is EXACTLY containment over
    # df<=cap shingles (parity-tested against brute force on that
    # universe; docs left with zero shingles drop out). Declared
    # semantics, not an approximation knob. SCALE.md r13 has the
    # candidate/wall-vs-p ladder with and without the cap.
    sh = persist_tracked(
        shingle_table(df, id_col, text_col, n), StorageLevel.MEMORY_AND_DISK
    )
    dfreq = None
    if df_cap is not None:
        # persist BOTH the surviving-df table (reused by the prefix
        # ranking and the universe filter) and the capped shingle
        # table itself: the capped table feeds five downstream plans
        # (prefix, candidate probe side, sizes, both verify sides) —
        # unpersisted, each one re-runs the df aggregation + filter
        # join, which made the capped query measurably SLOWER than the
        # uncapped one on the same corpus
        dfreq = persist_tracked(
            sh.groupBy("shingle")
            .agg(F.count("*").alias("dfreq"))
            .filter(F.col("dfreq") <= df_cap),
            StorageLevel.MEMORY_AND_DISK,
        )
        sh = persist_tracked(
            sh.join(dfreq.select("shingle"), "shingle").select(
                "sid", "shingle"
            ),
            StorageLevel.MEMORY_AND_DISK,
        )
    t = threshold_bp
    # ONE per-doc size table, persisted, feeds the prefix-length
    # filter AND both sides of the orientation join below (r15): each
    # consumer otherwise re-ran the same groupBy(sid) aggregation over
    # the whole shingle cache — three corpus passes for a doc-count
    # sized table (plan before/after: plans/r15/containment_*).
    szs = persist_tracked(
        sh.groupBy("sid").agg(F.count("*").cast("long").alias("sz"))
    )
    prefix = containment_prefix(sh, t, dfreq=dfreq, sizes=szs)
    cand = (
        prefix.select(F.col("sid").alias("a_id"), "shingle")
        .join(sh.select(F.col("sid").alias("b_id"), "shingle"), "shingle")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # Orientation keeps only the smaller-as-a_id version of each pair,
    # then carries ONLY the pair ids into the intersection join (r15):
    # sz_a/sz_b used to ride through the (pairs x A-shingles) blow-up
    # and sit in the aggregation key — re-attaching them from the
    # persisted szs AFTER the count touches pair-count rows instead.
    oriented = (
        cand.join(
            szs.select(F.col("sid").alias("a_id"), F.col("sz").alias("sz_a")),
            "a_id",
        )
        .join(
            szs.select(F.col("sid").alias("b_id"), F.col("sz").alias("sz_b")),
            "b_id",
        )
        .filter(
            (F.col("sz_a") < F.col("sz_b"))
            | ((F.col("sz_a") == F.col("sz_b"))
               & (F.col("a_id") < F.col("b_id")))
        )
        .select("a_id", "b_id")
    )
    # count("*") == count_distinct(shingle) here: shingle_table is
    # array_distinct per doc (and the df_cap filter joins a UNIQUE
    # shingle list), so the sa/sb equi-join yields each shared shingle
    # exactly once per pair — the same uniqueness `szs`'s count("*")
    # already relies on. count_distinct planned a second, DISTINCT
    # aggregation keyed by (pair, shingle string) — at x10 that
    # shuffled the whole intersection blow-up; count("*") collapses it
    # map-side to one row per pair before the exchange
    # (plans/r15/containment_*; x10 numbers in OPTIMIZATION_r15.md).
    inter = (
        oriented.join(sh.alias("sa"), F.col("sa.sid") == F.col("a_id"))
        .join(
            sh.alias("sb"),
            (F.col("sb.sid") == F.col("b_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            szs.select(F.col("sid").alias("a_id"), F.col("sz").alias("sz_a")),
            "a_id",
        )
        .join(
            szs.select(F.col("sid").alias("b_id"), F.col("sz").alias("sz_b")),
            "b_id",
        )
        .filter(F.col("inter") * 10000 >= F.col("sz_a") * t)
        .select(
            "a_id", "b_id", "inter", "sz_a", "sz_b",
            (F.col("inter").cast("double") / F.col("sz_a"))
            .alias("containment"),
        )
    )


def containment_prefix(sh: DataFrame, threshold_bp: int = 8000,
                       dfreq: DataFrame | None = None,
                       sizes: DataFrame | None = None) -> DataFrame:
    """The prefix-blocking rows for containment matching: per doc, its
    ``sz - ceil(t*sz) + 1`` RAREST shingles (df-ranked within the
    given shingle table, ties by shingle text). Pigeonhole exactness:
    any B with C(A,B) >= t misses at most ``sz_a - ceil(t*sz_a)``
    of A's shingles, so EVERY choice of that-plus-one distinct
    shingles of A intersects B — rarity ordering is purely a fan-out
    heuristic (the rarest keys bound the equi-join's per-key fan-out
    by document frequency), never a correctness input. That is what
    lets a STORED prefix (df-ranked against the corpus as of indexing
    time) stay exact as the corpus grows — the property
    StreamingContainmentIndex's per-epoch ``pfx`` slices rely on.

    ``dfreq`` lets a caller that already computed the document
    frequencies (the df_cap path) pass them in instead of paying the
    aggregation twice. ``sizes`` likewise accepts an already-computed
    (sid, sz) per-doc size table (r15: containment_prefix_pairs
    persists ONE size table and shares it here and with both sides of
    its orientation join — the same aggregation over the shingle
    cache otherwise ran three times per query)."""
    from pyspark.sql import Window

    if sizes is None:
        sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    if dfreq is None:
        # df-rank via a window count instead of a separate aggregation
        # joined back (r15): both forms shuffle the shingle table by
        # shingle exactly once (the window's sort vs the SMJ's), but
        # the agg+join form ALSO re-scanned the table to build the
        # dfreq branch — one whole corpus pass dropped. Row-identical
        # (exceptAll both ways = 0 at sf0.1 and x10); x10 min 10.0 ->
        # 8.9 s on the containment pipeline, sf0.1 flat.
        ranked = sh.withColumn(
            "dfreq", F.count("*").over(Window.partitionBy("shingle"))
        )
    else:
        # a caller that already computed (and persisted) the document
        # frequencies — the df_cap path — joins them instead
        ranked = sh.join(dfreq, "shingle")
    w = Window.partitionBy("sid").orderBy("dfreq", "shingle")
    return (
        ranked
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "sid")
        .filter(
            F.col("rn")
            <= F.expr(f"sz - ceil(sz * {threshold_bp} / 10000.0) + 1")
        )
        .select("sid", "shingle")
    )


def incremental_containment_matches(
    index_df: DataFrame | None, new_df: DataFrame,
    threshold_bp: int = 8000,
    id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    index_shingles: DataFrame | None = None,
    index_prefix: DataFrame | None = None,
) -> DataFrame:
    """Incremental (new-batch-vs-index) CONTAINMENT matching — the
    quote-expansion twin of :func:`incremental_lsh_matches`: a small
    new batch is checked against the standing corpus for pairs whose
    smaller-side shingle containment ``|A ∩ B| / |A|`` (Broder 1997)
    meets ``threshold_bp``. Returns ``(new_id, match_id,
    containment)``. Both directions are probed — the new doc may be
    the quoted original (contained in a stored container) or the
    container of a stored original — because ingest order does not
    fix which side is smaller.

    Blocking is prefix filtering in each direction independently
    (:func:`containment_prefix`): direction 1 joins the BATCH's
    prefixes (broadcast — batch-sized by definition) against the
    stored shingle table; direction 2 joins the STORED prefixes
    against the broadcast batch shingles. Exactness of a stored,
    index-time-ranked prefix is the pigeonhole argument in
    :func:`containment_prefix` — no false negatives either way.

    Scale: pass ``index_shingles`` / ``index_prefix`` (what
    StreamingContainmentIndex persists per epoch slice) and the probe
    does no per-call shingling of the corpus; the verify stage prunes
    the index-side size aggregation to candidate docs (semi-join),
    and exact intersections run over candidate pairs only — per-batch
    cost is O(batch + collisions), never O(corpus) compute. Without
    them (ad-hoc use) both are derived from ``index_df`` on the fly.
    The integer basis-point threshold is compared by
    cross-multiplication — no float crosses an engine boundary."""
    if index_df is None and (index_shingles is None or index_prefix is None):
        raise ValueError(
            "incremental_containment_matches: index_df is required "
            "unless BOTH index_shingles and index_prefix are provided "
            "(got shingles=%s, prefix=%s) — a lone precomputed side "
            "cannot stand in for the index"
            % (index_shingles is not None, index_prefix is not None)
        )
    sh_idx = (
        index_shingles
        if index_shingles is not None
        else persist_tracked(shingle_table(index_df, id_col, text_col, n))
    )
    sh_new = persist_tracked(shingle_table(new_df, id_col, text_col, n))
    pfx_new = containment_prefix(sh_new, threshold_bp)
    pfx_idx = (
        index_prefix
        if index_prefix is not None
        else containment_prefix(sh_idx, threshold_bp)
    )
    c1 = sh_idx.select(F.col("sid").alias("match_id"), "shingle").join(
        F.broadcast(pfx_new.select(F.col("sid").alias("new_id"), "shingle")),
        "shingle",
    )
    c2 = pfx_idx.select(F.col("sid").alias("match_id"), "shingle").join(
        F.broadcast(sh_new.select(F.col("sid").alias("new_id"), "shingle")),
        "shingle",
    )
    candidates = persist_tracked(
        c1.select("new_id", "match_id")
        .unionByName(c2.select("new_id", "match_id"))
        .filter(F.col("new_id") != F.col("match_id"))
        .distinct()
    )
    # index-side sizes candidate-pruned (the incremental_lsh_matches
    # discipline); count DISTINCT shingles — a streaming index slice
    # set can hold duplicate rows across tiers/epochs
    sz_idx = (
        sh_idx.join(
            candidates.select(F.col("match_id").alias("sid")).distinct(),
            "sid",
            "left_semi",
        )
        .groupBy("sid")
        .agg(F.count_distinct("shingle").alias("sz_m"))
    )
    sz_new = sh_new.groupBy("sid").agg(
        F.count_distinct("shingle").alias("sz_n")
    )
    inter = (
        candidates.join(sh_new.alias("a"), F.col("a.sid") == F.col("new_id"))
        .join(
            sh_idx.alias("b"),
            (F.col("b.sid") == F.col("match_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("new_id", "match_id")
        .agg(F.count_distinct("a.shingle").alias("inter"))
    )
    return (
        inter.join(sz_new.withColumnsRenamed({"sid": "new_id"}), "new_id")
        .join(sz_idx.withColumnsRenamed({"sid": "match_id"}), "match_id")
        .filter(
            F.col("inter") * 10000
            >= F.least("sz_n", "sz_m") * F.lit(threshold_bp)
        )
        .select(
            "new_id",
            "match_id",
            (
                F.col("inter").cast("double")
                / F.least("sz_n", "sz_m")
            ).alias("containment"),
        )
    )
