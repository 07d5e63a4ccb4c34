"""LLM-training-data pipeline queries exposed through the driver
contract: dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis, and multimodal plumbing.

Duplicate-injection: the synthetic documents/embeddings tables contain
no duplicates, so each dedup query unions the base table with a
deterministic modified copy (exact copy, near copy with appended
tokens, copied vectors) — both the Spark plan and the SQL oracle build
the same corpus, so the found pairs are checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.text import (
    char_total_of_tokens,
    fingerprint,
    predicted_lang,
    sql_char_total_of_tokens,
    sql_fingerprint,
    sql_predicted_lang,
    sql_stopword_count,
    sql_word_shingles,
    stopword_count,
    token_count,
    tokens,
    word_shingles,
)
from bottledwater_pg_spark.operators import dedup, multimodal, similarity
from bottledwater_pg_spark.session import (
    load_table,
    parallel_scan,
    persist_tracked,
)

EXACT_COPY_MOD = 3
NEAR_COPY_MOD = 10
NEAR_SUFFIX = " xqz1 xqz2 xqz3"
JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.99


# ------------------------------------------------------ corpus builders


def docs_with_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % EXACT_COPY_MOD == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


DOCS_EXACT_CTE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text
  FROM documents WHERE doc_id % {EXACT_COPY_MOD} = 0
)
"""


def docs_with_near_dups(
    spark: SparkSession, sf_dir: str, parallel: bool = False
) -> DataFrame:
    # ``parallel``: under-split read repartition (session.load_table) —
    # opted in by callers whose per-row kernel dominates (winnowing)
    docs = load_table(
        spark, sf_dir, "documents", parallel=parallel
    ).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % NEAR_COPY_MOD == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return docs.unionByName(copies)


DOCS_NEAR_CTE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || '{NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
)
"""


def embeddings_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % NEAR_COPY_MOD == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(copies)


EMB_CTE = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % {NEAR_COPY_MOD} = 0
)
"""

# shared SQL fragment: exact Jaccard pairs over the near-dup corpus
_SHINGLES = sql_word_shingles("text", 3)
JACCARD_PAIRS_SQL = f"""
, sh AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
  GROUP BY a.sid, b.sid
)
SELECT a_id, b_id,
       CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.sid = a_id
JOIN sizes sb ON sb.sid = b_id
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------- queries


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(docs_with_exact_dups(spark, sf_dir))


DEDUP_EXACT_SQL = (
    DOCS_EXACT_CTE
    + f"""
SELECT {sql_fingerprint("text")} AS fp,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY 1
"""
)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(
        docs_with_near_dups(spark, sf_dir), JACCARD_THRESHOLD
    )


DEDUP_JACCARD_SQL = DOCS_NEAR_CTE + JACCARD_PAIRS_SQL


def lsh_minhash_near_dup(spark: SparkSession, sf_dir: str,
                         corpus: DataFrame | None = None,
                         shingles: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH near-dup (the scale path). 16 bands x 2 rows gives
    candidate-recall ~1-8e-8 at J=0.8, and candidates are verified with
    exact Jaccard — so on this corpus it provably returns the same
    pairs as the brute-force oracle."""
    return dedup.minhash_lsh_pairs(
        corpus if corpus is not None else docs_with_near_dups(spark, sf_dir),
        num_hashes=32,
        bands=16,
        threshold=JACCARD_THRESHOLD,
        shingles=shingles,
    )


def prefix_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (AllPairs/PPJoin) —
    the deterministic scale path next to probabilistic MinHash-LSH:
    same brute-force oracle, zero false-negative probability, join
    restricted to each doc's rarest shingles."""
    return dedup.prefix_filter_jaccard_pairs(
        docs_with_near_dups(spark, sf_dir), JACCARD_THRESHOLD
    )


def lsh_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup at the operator's default geometry
    (32-bit signature, 4x8-bit bands, Hamming <= 6) with the
    md5-prefix token hash — DuckDB recomputes the identical
    signatures, so this is FULLY hash-oracled (it was the r1-r6
    rows-only cell). ``simhash_xxhash_near_dup`` below is the same
    algorithm under xxhash64 — the JVM-fast production path, kept
    rows-only with its accuracy certified by
    ``simhash_injected_recall``."""
    pairs = dedup.simhash_near_pairs(
        docs_with_near_dups(spark, sf_dir),
        hash_col=dedup.md5_token_hash("tok"),
    )
    return pairs.withColumn("hamming", F.col("hamming").cast("long"))


def simhash_xxhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup, xxhash64 signature — the JVM-fast
    production hash (one 64-bit hash per token vs md5's full digest).
    No SQL oracle: DuckDB does not implement xxhash64 — driver does
    the rows-only check; recall of the known injected pairs is
    hash-certified by ``simhash_injected_recall``."""
    return dedup.simhash_near_pairs(docs_with_near_dups(spark, sf_dir))


SIMHASH_MD5_BITS = 60
SIMHASH_MD5_BANDS = 4
SIMHASH_MD5_MAXHAM = 10


def simhash_md5_near_dup(spark: SparkSession, sf_dir: str,
                         corpus: DataFrame | None = None,
                         token_arrays: DataFrame | None = None) -> DataFrame:
    """Charikar SimHash near-dup with a FULL SQL oracle: the 60-bit
    signature derives from an md5-prefix token hash both engines
    compute bit-identically (dedup.py ``md5_token_hash``), so the
    whole pipeline — tf-weighted bit sums, sign signature, 4x15-bit
    banded blocking, exact Hamming verify via bit_count(xor) — is
    hash-certified against DuckDB, upgrading SimHash from the
    rows-only check its xxhash64 twin gets.

    Scale: identical plan to the xxhash64 variant — one tf
    aggregation, one 60-column bit-sum aggregation, band equi-join;
    md5 costs more per token than xxhash64, which is exactly why the
    production twin keeps xxhash64.
    """
    pairs = dedup.simhash_near_pairs(
        corpus if corpus is not None else docs_with_near_dups(spark, sf_dir),
        max_hamming=SIMHASH_MD5_MAXHAM,
        bands=SIMHASH_MD5_BANDS,
        bits=SIMHASH_MD5_BITS,
        hash_col=dedup.md5_token_hash("tok"),
        token_arrays=token_arrays,
    )
    return pairs.withColumn("hamming", F.col("hamming").cast("long"))


def _simhash_md5_sql(bits: int = SIMHASH_MD5_BITS,
                     bands: int = SIMHASH_MD5_BANDS,
                     max_hamming: int = SIMHASH_MD5_MAXHAM) -> str:
    """SQL twin of ``dedup.simhash_near_pairs`` with the md5 token
    hash, parameterized so one generator serves both the 60-bit
    variant (``simhash_md5_near_dup``) and the operator-default 32-bit
    geometry (``lsh_simhash_near_dup``)."""
    width = bits // bands
    bsums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{i}"
        for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i in range(bits)
    )
    return DOCS_NEAR_CTE.rstrip().rstrip(")") + f"""
), tok AS (
  SELECT doc_id AS sid, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM corpus
), tf AS (
  SELECT sid, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), hashed AS (
  SELECT sid, cnt, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tf
), sums AS (
  SELECT sid,
    {bsums}
  FROM hashed GROUP BY sid
), sig AS (
  SELECT sid, CAST({sig} AS BIGINT) AS simhash FROM sums
), banded AS (
  SELECT sid, simhash, i.band,
         CASE i.band {" ".join(f"WHEN {bi} THEN ((simhash >> {bi * width}) & {(1 << width) - 1})" for bi in range(bands))} END AS bval
  FROM sig, LATERAL (SELECT unnest(generate_series(0, {bands - 1})) AS band) i
)
SELECT DISTINCT a.sid AS a_id, b.sid AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM banded a JOIN banded b ON a.band = b.band AND a.bval = b.bval
WHERE a.sid < b.sid
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_dup_pairs(
        embeddings_with_dups(spark, sf_dir), COSINE_THRESHOLD
    )


from bottledwater_pg_spark.functions.vectors import sql_cosine  # noqa: E402

EMB_COS_SQL = (
    EMB_CTE
    + f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {sql_cosine("a.embedding", "b.embedding")} AS cos
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE {sql_cosine("a.embedding", "b.embedding")} >= {COSINE_THRESHOLD}
"""
)


def lsh_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH blocked embedding near-dup. Identical vectors share all
    signature bands, so at threshold 0.99 (only injected exact copies
    qualify) recall is exactly 1 and the brute-force oracle applies."""
    return dedup.hyperplane_lsh_near_dup(
        embeddings_with_dups(spark, sf_dir), COSINE_THRESHOLD
    )


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_bruteforce(emb, queries, k=5)


ANN_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine("q.embedding", "c.embedding")} AS cos
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
"""


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via SRP-LSH candidate probing, md5-derived
    hyperplanes + exact integer projections
    (dedup.hyperplane_signature_md5): DuckDB recomputes the identical
    signatures, hence the identical candidate set and the identical
    ranked result — FULLY hash-oracled, though still approximate vs
    brute force by design. ``lsh_ann_topk_xxhash`` is the JVM-fast
    production twin (rows-only; recall certified by
    ``lsh_ann_recall_vs_exact``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_lsh(emb, queries, k=5, variant="md5")


def ann_topk_lsh_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH top-k with xxhash64 hyperplanes and float projections —
    the JVM-fast production path (no md5 per (bit, dim), raw-double
    sums). No SQL oracle (DuckDB lacks xxhash64; float-sum order
    sensitivity) -> rows-only; recall vs brute force is hash-certified
    by ``lsh_ann_recall_vs_exact``."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_lsh(emb, queries, k=5)


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via an IVF-flat index (32 cells, 8 probed).
    The coarse quantizer is the deterministic lowest-id sample over
    integer-quantized vectors and every assignment/probe/rank step is
    exact-int dot products with pinned tie-breaks, so DuckDB replays
    the ENTIRE index build + probe — fully hash-oracled (this was the
    r1-r6 rows-only cell); still approximate vs brute force by design
    (recall certified by ``ivf_ann_recall_vs_exact``)."""
    # under-split-read opt-in: the shuffle-free assignment fold leaves
    # everything on the scan partitioning, so the single-row-group
    # fixture file must be spread up front (no-op on multi-split inputs)
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_ivf(emb, queries, k=5, n_list=32, n_probe=8)


IVF_TRAINED_ITERS = 2


def ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-k with a TRAINED coarse quantizer: the 32 cells
    come from IVF_TRAINED_ITERS exact-integer Lloyd's rounds
    (similarity.kmeans_lloyd — the r9 clustering primitive) instead
    of the raw lowest-id sample ``ivf_ann_topk`` uses. On a REAL
    embedding corpus training tracks cluster density, so the same
    n_probe budget captures more of each query's true neighborhood —
    the standard FAISS practice. Fixture honesty note: the synthetic
    embeddings are uniform unit vectors (measured norm²=1.0, trained
    vs sampled cell-size stddev 4.1 vs 4.2 — NO cluster structure to
    learn), so on THIS corpus trained recall (89-96% across SFs)
    sits beside untrained (94-95%) rather than above it; the
    certificate floor is still pinned above the untrained floor.
    Every stage (training rounds, cosine assignment, probe, rank) is
    exact-int/pinned-ties, so DuckDB replays the WHOLE pipeline —
    training included — fully hash-oracled."""
    # under-split-read opt-in: the shuffle-free assignment fold leaves
    # everything on the scan partitioning, so the single-row-group
    # fixture file must be spread up front (no-op on multi-split inputs)
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_ivf_trained(
        emb, queries, k=5, n_list=32, iters=IVF_TRAINED_ITERS, n_probe=8
    )


# DuckDB twins of the quantized-vector primitives (vectors.py
# quantized_vec / dot_pre / norm_pre) over the embeddings table
_QN_CTE = """
qv AS (
  SELECT vec_id AS sid,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qvec
  FROM embeddings
),
qn AS (
  SELECT sid, qvec,
         sqrt(CAST(CAST(list_sum(list_transform(qvec, v -> v * v)) AS BIGINT) AS DOUBLE)) AS n
  FROM qv
)"""

_DOT_AB = (
    "CAST(list_sum(list_transform(list_zip(a.qvec, b.qvec), "
    "p -> p[1] * p[2])) AS BIGINT)"
)

_SCORE_RANK_TAIL = f"""
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         CAST({_DOT_AB} AS DOUBLE) / (a.n * b.n) AS cos
  FROM cand
  JOIN qn a ON a.sid = cand.query_id
  JOIN qn b ON b.sid = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
"""


def _lsh_ann_md5_sql(num_bits: int = 32, bands: int = 8, dim: int = 64) -> str:
    """Full replay of the md5-SRP top-k: sign matrix from md5 parity,
    exact int64 projections, 4-bit banding, candidate equi-join, exact
    quantized cosine, (cos DESC, neighbor_id) rank — every step the
    bit-for-bit twin of similarity.topk_lsh(variant='md5')."""
    width = num_bits // bands
    return f"""
WITH signs AS (
  SELECT i, j,
         CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range({num_bits})) AS i), (SELECT unnest(range({dim})) AS j)
),
{_QN_CTE},
elems AS (
  SELECT sid, unnest(range(len(qvec))) AS j, unnest(qvec) AS q FROM qn
),
proj AS (
  SELECT sid, i, SUM(q * s) AS p FROM elems JOIN signs USING (j) GROUP BY sid, i
),
sig AS (
  SELECT sid, CAST(SUM(CASE WHEN p > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS srp
  FROM proj GROUP BY sid
),
banded AS (
  SELECT sid, band, (srp >> (band * {width})) & {(1 << width) - 1} AS bval
  FROM sig, (SELECT unnest(range({bands})) AS band)
),
cand AS (
  SELECT DISTINCT q.sid AS query_id, c.sid AS neighbor_id
  FROM banded c JOIN banded q ON c.band = q.band AND c.bval = q.bval
  WHERE q.sid < 20 AND c.sid <> q.sid
),
{_SCORE_RANK_TAIL}"""


def _ivf_probe_ctes(n_probe: int) -> str:
    """The IVF cell-assignment + query-probe CTE block shared by all
    four IVF-family oracles (untrained/trained x flat/PQ); expects
    ``qn`` (sid, qvec, n) and ``cent`` (cent_id, cent_q, cent_n) in
    scope. Assignment ties to the lowest cent_id — the Spark side's
    max_by(cent_id, struct(cos, -cent_id))."""
    dot_qc = (
        "CAST(list_sum(list_transform(list_zip(qn.qvec, cent.cent_q), "
        "p -> p[1] * p[2])) AS BIGINT)"
    )
    return f"""ascore AS (
  SELECT qn.sid, cent.cent_id,
         CAST({dot_qc} AS DOUBLE) / (qn.n * cent.cent_n) AS cos
  FROM qn CROSS JOIN cent
),
assigned AS (
  SELECT sid, cent_id FROM (
    SELECT sid, cent_id,
           ROW_NUMBER() OVER (PARTITION BY sid ORDER BY cos DESC, cent_id) AS rn
    FROM ascore
  ) WHERE rn = 1
),
probe AS (
  SELECT sid AS query_id, cent_id FROM (
    SELECT sid, cent_id,
           ROW_NUMBER() OVER (PARTITION BY sid ORDER BY cos DESC, cent_id) AS rn
    FROM ascore WHERE sid < 20
  ) WHERE rn <= {n_probe}
)"""


# the trained variants' qn/cent head over the unrolled Lloyd's chain
_TRAINED_NRM = (
    "sqrt(CAST(CAST(list_sum(list_transform({v}, x -> x * x)) "
    "AS BIGINT) AS DOUBLE))"
)


def _trained_cent_ctes(iters: int) -> str:
    return f"""qn AS MATERIALIZED (
  SELECT sid, qvec, {_TRAINED_NRM.format(v="qvec")} AS n FROM qv
),
cent AS (
  SELECT cid AS cent_id, cv AS cent_q, {_TRAINED_NRM.format(v="cv")} AS cent_n
  FROM c{iters}
)"""


def _ivf_ann_sql(n_list: int = 32, n_probe: int = 8) -> str:
    """Full replay of the IVF-flat index: lowest-id centroid sample,
    nearest-centroid assignment, n_probe nearest cells per query,
    exact cosine rank within probed cells (shared probe block:
    :func:`_ivf_probe_ctes`)."""
    return f"""
WITH {_QN_CTE},
cent AS (
  SELECT sid AS cent_id, qvec AS cent_q, n AS cent_n
  FROM qn ORDER BY sid LIMIT {n_list}
),
{_ivf_probe_ctes(n_probe)},
cand AS (
  SELECT p.query_id, a.sid AS neighbor_id
  FROM probe p JOIN assigned a USING (cent_id)
  WHERE a.sid <> p.query_id
),
{_SCORE_RANK_TAIL}"""


def _ivf_trained_sql(n_list: int = 32, n_probe: int = 8) -> str:
    """Full replay of the trained-IVF pipeline: the unrolled Lloyd's
    chain (_kmeans_sql with k=n_list — bit-identical centroids per
    round) feeding the shared probe block (:func:`_ivf_probe_ctes`).
    The kmeans chain defines ``qv``; norms are derived from it so the
    corpus is quantized once."""
    iters = IVF_TRAINED_ITERS
    return (
        _kmeans_sql(k=n_list, iters=iters, src="embeddings")
        + f""",
{_trained_cent_ctes(iters)},
{_ivf_probe_ctes(n_probe)},
cand AS (
  SELECT p.query_id, a.sid AS neighbor_id
  FROM probe p JOIN assigned a USING (cent_id)
  WHERE a.sid <> p.query_id
),
{_SCORE_RANK_TAIL}"""
    )


# ------------- sketch-accuracy certification (driver-hashable)
#
# The sketch operators above (xxhash64 SimHash, SRP-LSH ANN, IVF ANN)
# and hll_distinct_users_by_type are approximate or engine-hash-based,
# so their raw outputs have no DuckDB oracle. These companions certify
# the PROPERTY instead (the reference's generated-type-corpus idea,
# spec/bin/generate_type_specs.rb:30-45: pin what must hold, not the
# engine-specific bits): each emits the exact twin's integer counts
# (cross-engine computable -> genuinely oracle-checked) plus an
# integer indicator that the approximate operator's accuracy clears a
# pinned floor. The pipeline is seed-free and deterministic, so the
# indicator is a fixed function of the corpus; floors sit well under
# the measured values (LSH recall 71-73%, IVF 94-100%, SimHash
# injected-pair recall 96-98% across sf0.001/0.01/0.1).

LSH_ANN_RECALL_FLOOR_BP = 5500
IVF_ANN_RECALL_FLOOR_BP = 7500
IVF_TRAINED_RECALL_FLOOR_BP = 8000
SIMHASH_INJECT_FLOOR_BP = 9000


def _recall_vs_exact(exact: DataFrame, approx: DataFrame,
                     floor_bp: int) -> DataFrame:
    """One-row recall certificate: the exact twin's pair counts plus
    ``recall_ok`` = [overlap/n_exact >= floor_bp/10000]. One broadcast
    left join of two k*|Q|-row results — cost is the two ANN runs."""
    hit = approx.select("query_id", "neighbor_id").withColumn(
        "hit", F.lit(1)
    )
    joined = exact.select("query_id", "neighbor_id").join(
        F.broadcast(hit), ["query_id", "neighbor_id"], "left"
    )
    return joined.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact_pairs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("_ov"),
    ).select(
        F.col("n_queries").cast("long").alias("n_queries"),
        F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
        F.lit(floor_bp).cast("long").alias("recall_floor_bp"),
        (F.col("_ov") * 10000 >= F.col("n_exact_pairs") * floor_bp)
        .cast("long")
        .alias("recall_ok"),
    )


def lsh_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``lsh_ann_topk_xxhash``
    (the JVM-fast twin whose raw output has no SQL oracle): its top-k
    joined against the brute-force twin, recall floored at 55%
    (measured 71-73% across sf0.001/0.01/0.1 at the 8x4-bit banding).
    The md5 variant needs no certificate — its output is itself
    hash-oracled."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        ann_topk_lsh_xxhash(spark, sf_dir),
        LSH_ANN_RECALL_FLOOR_BP,
    )


def ivf_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``ivf_ann_topk``:
    recall vs brute force floored at 75% (measured 94-100%)."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        ann_topk_ivf(spark, sf_dir),
        IVF_ANN_RECALL_FLOOR_BP,
    )


def ivf_trained_recall_vs_exact(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``ivf_trained_topk``:
    recall vs brute force floored at 80% (measured 89-96% across
    sf0.001/0.01/0.1) — above the untrained IVF floor (75%). See the
    topk docstring for the uniform-fixture honesty note: the raised
    floor certifies the trained pipeline's own recall, not
    superiority on this structureless corpus."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        ivf_trained_topk(spark, sf_dir),
        IVF_TRAINED_RECALL_FLOOR_BP,
    )


def _ann_recall_sql(floor_bp: int) -> str:
    return f"""
SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST({floor_bp} AS BIGINT) AS recall_floor_bp,
       CAST(1 AS BIGINT) AS recall_ok
FROM ({ANN_SQL}) exact_twin
"""


def simhash_injected_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable certificate for ``simhash_xxhash_near_dup``
    (the JVM-fast twin whose raw output has no SQL oracle): the
    corpus injects one near-copy per ``doc_id % NEAR_COPY_MOD == 0``
    (suffix append), so the true near-dup pair set is known in SQL;
    the xxhash64 SimHash must recover >= 90% of those injected pairs
    (measured 96-98%). The md5 variants need no certificate — their
    outputs are themselves hash-oracled."""
    docs = load_table(spark, sf_dir, "documents")
    inj = docs.filter(F.col("doc_id") % NEAR_COPY_MOD == 0).select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + 200000).alias("b_id"),
    )
    hit = (
        simhash_xxhash_near_dup(spark, sf_dir)
        .select("a_id", "b_id")
        .withColumn("hit", F.lit(1))
    )
    joined = inj.join(hit, ["a_id", "b_id"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_injected"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("_f"),
    ).select(
        F.col("n_injected").cast("long").alias("n_injected"),
        F.lit(SIMHASH_INJECT_FLOOR_BP)
        .cast("long")
        .alias("recall_floor_bp"),
        (F.col("_f") * 10000 >= F.col("n_injected") * SIMHASH_INJECT_FLOOR_BP)
        .cast("long")
        .alias("recall_ok"),
    )


SIMHASH_INJECTED_RECALL_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_injected,
       CAST({SIMHASH_INJECT_FLOOR_BP} AS BIGINT) AS recall_floor_bp,
       CAST(1 AS BIGINT) AS recall_ok
FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
"""


def text_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token/stopword kernels are the whole query and sit pre-exchange
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    ntok = token_count("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        ntok.alias("n_tokens"),
        stopword_count("text").alias("n_stopwords"),
        (stopword_count("text").cast("double") / ntok).alias("stopword_ratio"),
        (char_total_of_tokens("text").cast("double") / ntok).alias("avg_token_len"),
        fingerprint("text").alias("fp"),
    )


TEXT_STATS_SQL = f"""
SELECT doc_id,
  length(text) AS n_chars,
  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
  {sql_stopword_count("text")} AS n_stopwords,
  CAST({sql_stopword_count("text")} AS DOUBLE)
    / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
  CAST({sql_char_total_of_tokens("text")} AS DOUBLE)
    / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len,
  {sql_fingerprint("text")} AS fp
FROM documents
"""


def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring rolled up per source: docs with enough tokens and
    a sane stopword ratio count as 'quality'."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = token_count("text")
    ratio = stopword_count("text").cast("double") / ntok
    is_quality = (ntok >= 20) & (ratio >= 0.05) & (ratio <= 0.6)
    return (
        docs.select("source", ntok.alias("ntok"),
                    is_quality.cast("long").alias("q"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("q").alias("n_quality"),
            (F.sum("q").cast("double") / F.count("*")).alias("quality_share"),
            (F.sum("ntok").cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


TEXT_QUALITY_SQL = f"""
WITH scored AS (
  SELECT source,
         len(string_split_regex(trim(text), '\\s+')) AS ntok,
         CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 20
               AND CAST({sql_stopword_count("text")} AS DOUBLE)
                   / len(string_split_regex(trim(text), '\\s+')) >= 0.05
               AND CAST({sql_stopword_count("text")} AS DOUBLE)
                   / len(string_split_regex(trim(text), '\\s+')) <= 0.6
              THEN 1 ELSE 0 END AS q
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(q) AS BIGINT) AS n_quality,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) AS quality_share,
       CAST(SUM(ntok) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM scored GROUP BY source
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", predicted_lang("text").alias("lang_pred"))


TEXT_LANGID_SQL = f"""
SELECT doc_id, {sql_predicted_lang("text")} AS lang_pred FROM documents
"""


# BPE-ish pre-tokenizer: letter runs, digit runs, single
# non-alphanumeric marks — the GPT-2-style split restricted to regex
# syntax that behaves identically in Java (Spark) and RE2 (DuckDB):
# character classes + quantifiers + alternation only, no lookarounds.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer next to the
    whitespace count — the SURVEY §2 north-star token-counting
    surface. Emits per-source totals plus the bytes-per-token ratio
    (the number a training-data pipeline budgets corpus size with).
    Whole computation is JVM-side regexp_count/length — no Python in
    the hot path; one partial-agg shuffle on source.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.regexp_count("text", F.lit(BPE_ISH_PATTERN))
    n_ws = F.size(F.split(F.trim("text"), r"\s+"))
    return (
        docs.select("source", F.length("text").alias("nch"), n_bpe.alias("nb"), n_ws.alias("nw"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").alias("bpe_tokens"),
            F.sum("nw").alias("ws_tokens"),
            (
                F.sum("nch").cast("double") / F.sum("nb").cast("double")
            ).alias("chars_per_bpe_token"),
        )
    )


BPE_STATS_SQL = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')))
            AS BIGINT) AS bpe_tokens,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
            AS BIGINT) AS ws_tokens,
       CAST(SUM(length(text)) AS DOUBLE)
         / CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS DOUBLE)
         AS chars_per_bpe_token
FROM documents
GROUP BY source
"""


def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every character 8-gram, keep the minimum hash of each window
    of 4 consecutive k-grams, emit the distinct (doc_id, fingerprint)
    set. The standard plagiarism/near-dup fingerprint guaranteeing any
    shared substring of length >= k + w - 1 yields a shared
    fingerprint. Fully narrow per-doc compute: the per-doc repeats
    (consecutive windows sharing a minimum) are removed by
    array_distinct BEFORE the explode, so (doc_id, fp) is distinct by
    construction and the operator has NO shuffle at all —
    embarrassingly parallel at 100 TB.

    The reference ships no text analysis (README.md:30-32 delegates
    consumer-side processing); this is north-star LLM-pipeline
    surface.
    """
    from bottledwater_pg_spark.functions.text import kgram_hashes, winnow_mins

    # the per-char md5 k-gram kernel is the whole query (zero shuffle)
    docs = load_table(
        spark, sf_dir, "documents", parallel=True
    ).select("doc_id", "text")
    return docs.withColumn("_g", kgram_hashes("text", 8)).select(
        "doc_id",
        F.explode(F.array_distinct(winnow_mins("_g", 4))).alias("fp"),
    )


WINNOW_DF_CAP = 50  # fingerprint document-frequency cap for the join


def winnow_near_dup_pairs(spark: SparkSession, sf_dir: str,
                         corpus: DataFrame | None = None) -> DataFrame:
    """Near-dup candidate pairs by winnowing-fingerprint overlap: two
    docs are candidates when their shared DISCRIMINATIVE fingerprints
    (document frequency <= ``WINNOW_DF_CAP``) cover at least half of
    the smaller doc's discriminative set (integer comparison
    ``shared*2 >= least(na, nb)`` — no float ratio, parity-safe). A third dedup modality alongside MinHash
    (set Jaccard) and SimHash (Hamming): winnowing overlap detects
    LOCAL shared passages, not just global similarity.

    Scale: equi-join on the fingerprint key + pair-count aggregation —
    the MinHash-LSH shape. Join cost is sum(df²) over fingerprints,
    so ubiquitous fps (boilerplate phrases) dominate it quadratically
    while carrying no dedup signal; fps with document frequency >
    ``WINNOW_DF_CAP`` are excluded from the JOIN (denominators keep
    the full sets) — the standard stop-shingle discipline, measured
    ~7x on this corpus at sf0.1 and structurally necessary at 100 TB.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from bottledwater_pg_spark.functions.text import kgram_hashes, winnow_mins

    if corpus is None:
        # opt in to the read repartition: the md5 k-gram + winnowing
        # kernel before the first exchange dominates this operator
        # (measured 0.56x with it, full-bench A/B)
        corpus = docs_with_near_dups(spark, sf_dir, parallel=True)
    # dedupe INSIDE the row: winnowing emits the same minimum for many
    # consecutive windows, so array_distinct before the explode removes
    # per-doc repeats narrowly — (doc, fp) is then globally distinct by
    # construction and the full-table distinct shuffle disappears
    fps = corpus.withColumn("_g", kgram_hashes("text", 8)).select(
        "doc_id",
        F.explode(F.array_distinct(winnow_mins("_g", 4))).alias("fp"),
    )
    # document frequency as a window count over fp: ONE shuffle of the
    # fingerprint table (vs groupBy(fp) + join-back = two), and the
    # output is already partitioned by fp for the self-join below
    rare = (
        fps.withColumn("_df", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("_df") <= WINNOW_DF_CAP)
        .drop("_df")
    )
    rare = persist_tracked(rare, StorageLevel.MEMORY_AND_DISK)  # reused by sizes + both join sides
    sizes = rare.groupBy("doc_id").agg(F.count("*").alias("nfp"))
    a = rare.select(F.col("doc_id").alias("a_id"), "fp")
    b = rare.select(F.col("doc_id").alias("b_id"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("nfp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("nfp").alias("nb"))
    return (
        shared.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(F.col("shared") * 2 >= F.least("na", "nb"))
        .select("a_id", "b_id", "shared")
    )


def _winnow_pairs_sql() -> str:
    from bottledwater_pg_spark.functions.text import (
        sql_kgram_hashes,
        sql_winnow_mins,
    )

    return f"""{DOCS_NEAR_CTE.rstrip()},
g AS (
  SELECT doc_id, {sql_kgram_hashes('text', 8)} AS grams FROM corpus
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, unnest({sql_winnow_mins('grams', 4)}) AS fp FROM g
  )
),
rare AS (
  SELECT doc_id, fp FROM fps
  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {WINNOW_DF_CAP})
),
sizes AS (SELECT doc_id, COUNT(*) AS nfp FROM rare GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, shared
FROM shared
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE shared * 2 >= least(sa.nfp, sb.nfp)
"""


WINNOW_PAIRS_SQL = _winnow_pairs_sql()


def _winnow_sql() -> str:
    from bottledwater_pg_spark.functions.text import (
        sql_kgram_hashes,
        sql_winnow_mins,
    )

    return f"""
WITH g AS (
  SELECT doc_id, {sql_kgram_hashes('text', 8)} AS grams FROM documents
),
w AS (
  SELECT doc_id, unnest({sql_winnow_mins('grams', 4)}) AS fp FROM g
)
SELECT DISTINCT doc_id, fp FROM w
"""


WINNOW_SQL = _winnow_sql()


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_metadata(multimodal.with_binary_payload(docs))


MULTIMODAL_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 1024 AS width,
       (octet_length(encode(text)) * 7) % 768 AS height,
       md5(text) AS content_hash
FROM documents
"""


def multimodal_ppm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (no codec stubs): per doc a binary
    P6 PPM image is synthesized whose dimensions and pixel bytes are
    pure functions of doc_id (operators/multimodal.py
    ``synth_ppm_payloads``), then genuinely decoded — header parse,
    numpy pixel-buffer reshape, exact int64 per-channel sums
    (``ppm_channel_stats``). The oracle predicts every decoded value
    arithmetically: byte i of image doc_id is (doc_id%251 + i) % 256
    and channel(i) = i % 3, so the channel sums are a lateral
    generate_series aggregation. Proves the Arrow plumbing AND an
    actual raster decode, not a deterministic fake.
    """
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.ppm_channel_stats(multimodal.synth_ppm_payloads(docs))


MULTIMODAL_PPM_SQL = """
WITH p AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         doc_id % 251 AS base
  FROM documents
)
SELECT doc_id, w AS width, h AS height,
  CAST(SUM(CASE WHEN i % 3 = 0 THEN (base + i) % 256 END) AS BIGINT) AS sum_r,
  CAST(SUM(CASE WHEN i % 3 = 1 THEN (base + i) % 256 END) AS BIGINT) AS sum_g,
  CAST(SUM(CASE WHEN i % 3 = 2 THEN (base + i) % 256 END) AS BIGINT) AS sum_b
FROM p, LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS i) t
GROUP BY doc_id, w, h
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.frame_sample(multimodal.with_binary_payload(docs))


# documents are pure ASCII, so byte offsets == char offsets and
# md5(blob slice) == md5(text substring)
FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(frame_offset AS BIGINT) AS frame_offset,
       md5(substring(text, CAST(frame_offset AS INT) + 1, 64)) AS chunk_hash
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
        greatest(octet_length(encode(text)) - 1, 0), 64)) AS frame_offset)
"""


def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: MinHash-LSH pairs -> connected components
    (operators/graph.py min-label propagation) -> one canonical doc id
    (the component minimum) per document; docs with no duplicate are
    their own canonical. This is the standard final stage of corpus
    dedup — pairs alone can't drive "keep one copy" when duplicates
    chain (a~b, b~c).

    Oracle: DuckDB WITH RECURSIVE transitive closure over the same
    exact-Jaccard pair set (LSH pair recall is exactly 1.0 on this
    corpus, proven by the lsh_minhash_near_dup oracle match).
    """
    from pyspark import StorageLevel

    from bottledwater_pg_spark.operators.graph import connected_components

    corpus = docs_with_near_dups(spark, sf_dir)
    # the pair set seeds BOTH the node universe and the initial edge
    # frontier inside CC — persist it so the LSH pipeline (shingle,
    # signature, band join, verify) runs once, not per consumer
    pairs = persist_tracked(
        lsh_minhash_near_dup(spark, sf_dir).select("a_id", "b_id"),
        StorageLevel.MEMORY_AND_DISK,
    )
    comp = connected_components(pairs, "a_id", "b_id")
    return (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("canonical_id"),
        )
    )


def dedup_cluster_canonical_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as ``dedup_cluster_canonical`` but via
    the alternating large-star/small-star algorithm
    (operators/graph.py ``connected_components_star``) — O(log^2 n)
    rounds on adversarial long-chain graphs where min-label
    propagation needs diameter rounds. Verified against the identical
    WITH RECURSIVE transitive-closure oracle.
    """
    from pyspark import StorageLevel

    from bottledwater_pg_spark.operators.graph import connected_components_star

    corpus = docs_with_near_dups(spark, sf_dir)
    # same persisted pair set as dedup_cluster_canonical — identical
    # plan, so the second cluster query reuses the cached result
    pairs = persist_tracked(
        lsh_minhash_near_dup(spark, sf_dir).select("a_id", "b_id"),
        StorageLevel.MEMORY_AND_DISK,
    )
    comp = connected_components_star(pairs, "a_id", "b_id")
    return (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("canonical_id"),
        )
    )


CLUSTER_SQL = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || '{NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
),
sh AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
  GROUP BY a.sid, b.sid
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.sid = a_id
  JOIN sizes sb ON sb.sid = b_id
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT a_id AS a, b_id AS b FROM pairs
  UNION
  SELECT b_id AS a, a_id AS b FROM pairs
),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM corpus
  UNION
  SELECT e.a AS id, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY id
"""


# ----------------------------------------------- hot-bucket capped LSH

#: identical "license footer" page text — the input family that makes
#: LSH band buckets hot at crawl scale (one bucket per band holds the
#: whole cohort, so uncapped candidates grow C(m,2) — semantic, not a
#: blocking bug; measured in scripts/lsh_skew.py / SCALE.md r14)
BOILER_FOOTER = (
    "this page is licensed under the apache license version two "
    "point zero see the license file for details"
)
BOILER_M = 60
BOILER_BASE = 900000
LSH_MAX_BUCKET = 16


def docs_with_boiler_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup corpus plus ``BOILER_M`` IDENTICAL pure-footer
    pages — a deterministic adversarial cohort whose every band bucket
    exceeds ``LSH_MAX_BUCKET``."""
    boiler = spark.range(BOILER_M).select(
        (F.col("id") + BOILER_BASE).alias("doc_id"),
        F.lit(BOILER_FOOTER).alias("text"),
    )
    return docs_with_near_dups(spark, sf_dir).unionByName(boiler)


def lsh_hot_bucket_capped_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup clusters from HOT-BUCKET-CAPPED MinHash-LSH pairs on the
    boilerplate-cohort fixture: buckets over ``LSH_MAX_BUCKET`` emit
    only the spanning star (see ``dedup.minhash_lsh_pairs``
    ``max_bucket``), so the cohort contributes O(m) candidates instead
    of C(m,2) — yet the CONNECTED COMPONENTS equal the brute-force
    all-pairs clustering, because a mutually-near-identical cohort is
    a clique and a verified star spans it. That component equality is
    exactly what this oracle certifies (DuckDB: exact-Jaccard pairs +
    WITH RECURSIVE closure over the same fixture).
    """
    from pyspark import StorageLevel

    from bottledwater_pg_spark.operators.graph import connected_components

    corpus = persist_tracked(
        docs_with_boiler_cohort(spark, sf_dir), StorageLevel.MEMORY_AND_DISK
    )
    pairs = persist_tracked(
        dedup.minhash_lsh_pairs(
            corpus,
            num_hashes=32,
            bands=16,
            threshold=JACCARD_THRESHOLD,
            max_bucket=LSH_MAX_BUCKET,
        ).select("a_id", "b_id"),
        StorageLevel.MEMORY_AND_DISK,
    )
    comp = connected_components(pairs, "a_id", "b_id")
    return (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("canonical_id"),
        )
    )


BOILER_CLUSTER_SQL = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || '{NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
  UNION ALL
  SELECT {BOILER_BASE} + i AS doc_id, '{BOILER_FOOTER}' AS text
  FROM range({BOILER_M}) t(i)
),
sh AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
  GROUP BY a.sid, b.sid
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.sid = a_id
  JOIN sizes sb ON sb.sid = b_id
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT a_id AS a, b_id AS b FROM pairs
  UNION
  SELECT b_id AS a, a_id AS b FROM pairs
),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM corpus
  UNION
  SELECT e.a AS id, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_cluster_canonical": dedup_cluster_canonical,
    "dedup_cluster_canonical_star": dedup_cluster_canonical_star,
    "lsh_hot_bucket_capped_clusters": lsh_hot_bucket_capped_clusters,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "lsh_minhash_near_dup": lsh_minhash_near_dup,
    "prefix_jaccard_near_dup": prefix_jaccard_near_dup,
    "lsh_simhash_near_dup": lsh_simhash_near_dup,
    "simhash_md5_near_dup": simhash_md5_near_dup,
    "simhash_xxhash_near_dup": simhash_xxhash_near_dup,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "lsh_embedding_near_dup": lsh_embedding_near_dup,
    "ann_topk_cosine": ann_topk_cosine,
    "lsh_ann_topk": ann_topk_lsh,
    "lsh_ann_topk_xxhash": ann_topk_lsh_xxhash,
    "ivf_ann_topk": ann_topk_ivf,
    "lsh_ann_recall_vs_exact": lsh_ann_recall_vs_exact,
    "ivf_ann_recall_vs_exact": ivf_ann_recall_vs_exact,
    "simhash_injected_recall": simhash_injected_recall,
    "text_stats_per_doc": text_stats_per_doc,
    "text_quality_by_source": text_quality_by_source,
    "text_langid": text_langid,
    "text_bpe_token_stats": text_bpe_token_stats,
    "doc_fingerprint_winnow": doc_fingerprint_winnow,
    "winnow_near_dup_pairs": winnow_near_dup_pairs,
    "multimodal_decode_meta": multimodal_decode_meta,
    "multimodal_ppm_stats": multimodal_ppm_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_cluster_canonical": CLUSTER_SQL,
    "dedup_cluster_canonical_star": CLUSTER_SQL,
    "lsh_hot_bucket_capped_clusters": BOILER_CLUSTER_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "lsh_minhash_near_dup": DEDUP_JACCARD_SQL,
    "prefix_jaccard_near_dup": DEDUP_JACCARD_SQL,
    "dedup_embedding_cosine": EMB_COS_SQL,
    "simhash_md5_near_dup": _simhash_md5_sql(),
    "lsh_simhash_near_dup": _simhash_md5_sql(
        bits=dedup.SIMHASH_BITS, bands=4, max_hamming=6
    ),
    "lsh_embedding_near_dup": EMB_COS_SQL,
    "ann_topk_cosine": ANN_SQL,
    "lsh_ann_topk": _lsh_ann_md5_sql(),
    "ivf_ann_topk": _ivf_ann_sql(),
    "lsh_ann_recall_vs_exact": _ann_recall_sql(LSH_ANN_RECALL_FLOOR_BP),
    "ivf_ann_recall_vs_exact": _ann_recall_sql(IVF_ANN_RECALL_FLOOR_BP),
    "simhash_injected_recall": SIMHASH_INJECTED_RECALL_SQL,
    "text_stats_per_doc": TEXT_STATS_SQL,
    "text_quality_by_source": TEXT_QUALITY_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_bpe_token_stats": BPE_STATS_SQL,
    "doc_fingerprint_winnow": WINNOW_SQL,
    "winnow_near_dup_pairs": WINNOW_PAIRS_SQL,
    "multimodal_decode_meta": MULTIMODAL_META_SQL,
    "multimodal_ppm_stats": MULTIMODAL_PPM_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    # lsh_ann_topk_xxhash, simhash_xxhash_near_dup: rows-only — the
    # deliberately xxhash64-based JVM-fast twins (DuckDB cannot
    # recompute the hash); their accuracy is hash-certified by
    # lsh_ann_recall_vs_exact / simhash_injected_recall, and the
    # md5-signature variants (lsh_ann_topk, lsh_simhash_near_dup,
    # simhash_md5_near_dup) are fully oracled.
}


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines: fixed-size character
    windows with overlap (stride < size). All JVM-side via
    sequence+explode — one input row fans out to its chunks with no
    Python in the path."""
    size, stride = 200, 150
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "chunk_start",
            F.explode(
                F.expr(
                    f"sequence(0, greatest(length(text) - 1, 0), {stride})"
                )
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.expr(f"substring(text, chunk_start + 1, {size})").alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


TEXT_CHUNKS_SQL = """
SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
       substring(text, CAST(chunk_start AS INT) + 1, 200) AS chunk,
       CAST(length(substring(text, CAST(chunk_start AS INT) + 1, 200)) AS BIGINT)
         AS chunk_len
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
        greatest(length(text) - 1, 0), 150)) AS chunk_start)
"""

QUERIES["text_chunks"] = text_chunks
ORACLES["text_chunks"] = TEXT_CHUNKS_SQL


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-200 tokens by document frequency (tokens
    deduped per doc first — DF, not term count), deterministic
    tie-break on the token itself. Scale: explode -> distinct(doc,tok)
    -> groupBy(tok) is two shuffles with partial aggregation; top-k
    ranks only the (small) aggregated vocabulary."""
    from bottledwater_pg_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).distinct()
    return (
        tok.groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "tok")
        .limit(200)
    )


VOCAB_SQL = """
SELECT tok, COUNT(*) AS doc_freq FROM (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
)
GROUP BY tok
ORDER BY doc_freq DESC, tok
LIMIT 200
"""


def cross_set_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: which 'evaluation' docs (the
    deterministic 1-in-9 sample) appear verbatim in the 'training'
    corpus (everything else), matched on the normalized-text
    fingerprint. At scale this is a broadcast semi-join of the small
    eval set's fingerprints against the training corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # eval set: doc_id % 9 == 0, re-keyed; train set keeps originals and
    # ALSO re-includes a copy of every 3rd eval doc as contamination
    eval_set = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 500000).alias("eval_id"), "text"
    )
    contam = docs.filter(F.col("doc_id") % 27 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 9 != 0).unionByName(contam)
    ev = eval_set.select("eval_id", fingerprint("text").alias("fp"))
    tr = train.select("doc_id", fingerprint("text").alias("fp"))
    return (
        tr.join(F.broadcast(ev), "fp")
        .groupBy("eval_id")
        .agg(
            F.count("*").alias("n_train_copies"),
            F.min("doc_id").alias("first_train_doc"),
        )
    )


CONTAM_SQL = f"""
WITH eval_set AS (
  SELECT doc_id + 500000 AS eval_id, {sql_fingerprint("text")} AS fp
  FROM documents WHERE doc_id % 9 = 0
), train AS (
  SELECT doc_id, {sql_fingerprint("text")} AS fp
  FROM documents WHERE doc_id % 9 <> 0
  UNION ALL
  SELECT doc_id + 600000, {sql_fingerprint("text")}
  FROM documents WHERE doc_id % 27 = 0
)
SELECT eval_id, COUNT(*) AS n_train_copies, MIN(doc_id) AS first_train_doc
FROM train JOIN eval_set USING (fp)
GROUP BY eval_id
"""

NGRAM_CONTAM_N = 8  # word n-gram length (the 13-gram idea, doc-sized)

# --------------- deterministic Bloom-filter contamination screen
#
# At 100 TB you cannot join every training gram against the eval set;
# the standard screen broadcasts a Bloom filter of the eval grams and
# joins only the flagged survivors. Spark's builtin bloom_filter_agg
# is not registered in the SQL function registry (runtime-filter
# internal), so this is a NATIVE DataFrame Bloom filter: k md5-derived
# hash positions per gram, a bit_or-aggregated 63-bit-word bitmap
# (63, not 64 — DuckDB raises on 1<<63), probe = one broadcast join of
# the ~1k-word bitmap. Everything is a pure deterministic function of
# the corpus and md5, so the ENTIRE filter — bitmap, false positives
# included — is bit-identically computable in DuckDB: the operator is
# hash-oracled outright, no accuracy-certificate indirection needed.
# No-false-negative is structural (a contained gram sets all its own
# bits); the FP rows the screen lets through are part of the pinned
# output.

BLOOM_M_BITS = 1 << 16
BLOOM_K = 4
# Versioned name of the (hash family, m, k) triple. Any persisted
# bitmap records this tag in its meta and MUST be rebuilt when it
# changes — probing a bitmap built under a different family silently
# returns false negatives for essentially every contained gram.
BLOOM_HASH_FAMILY = f"km-md5-60bit/m={BLOOM_M_BITS}/k={BLOOM_K}"
# h1, h2 are 60-bit; h1 + (k-1)*h2 must stay inside int64 or the
# K-M position wraps silently in Spark (pmod hides the sign) while
# DuckDB diverges. k=8 gives max ~2^63-ish; keep a hard bound.
assert BLOOM_K <= 8, "BLOOM_K > 8 overflows int64 in h1 + i*h2"
# dense bitmap length in 63-bit words; positions are < m, so a probe's
# 1-based element_at index (pos DIV 63 + 1) never exceeds this under
# ANSI
BLOOM_N_WORDS = BLOOM_M_BITS // 63 + 1


def _bloom_dense_row(bitmap: DataFrame) -> DataFrame:
    """Densify the sparse ``(word_idx, word)`` Bloom bitmap into ONE
    row carrying the full ``array<bigint>`` (missing words are 0) —
    built entirely in Spark (a single-row aggregation; no driver
    collect, so the streaming screen can keep its no-collect
    property). Broadcast-nested-loop-joining this row onto the probe
    side lets the k probes evaluate as one ``forall`` over the
    position array: no k-way position explode, no per-position
    broadcast hash-probe, and k x fewer rows into the flagged-gram
    aggregation (the r14 microbench win, see
    :func:`bloom_contamination_screen`)."""
    return (
        bitmap.groupBy()
        .agg(
            F.map_from_arrays(
                F.collect_list("word_idx"), F.collect_list("word")
            ).alias("bm_map")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {BLOOM_N_WORDS - 1}), "
                "i -> coalesce(element_at(bm_map, i), CAST(0 AS BIGINT)))"
            ).alias("bm")
        )
    )


def _bloom_flagged_grams(grams: DataFrame, bitmap: DataFrame) -> DataFrame:
    """Filter ``grams`` (``doc_id``, ``gram``, + any other columns) to
    the rows whose k Bloom positions are ALL set: one md5 per gram,
    the k Kirsch-Mitzenmacher positions as a bound array column, and a
    single ``forall`` probe of the one-row dense bitmap."""
    return (
        grams.select(
            *grams.columns,
            F.md5(F.encode(F.col("gram"), "UTF-8")).alias("_h"),
        )
        .select(
            *grams.columns,
            F.array(*_bloom_positions("gram", md5_col="_h")).alias("_ps"),
        )
        .join(F.broadcast(_bloom_dense_row(bitmap)))
        .filter(F.expr(
            "forall(_ps, p -> (shiftright(element_at(bm, "
            "CAST(p DIV 63 AS INT) + 1), CAST(p % 63 AS INT)) & 1) = 1)"
        ))
        .select(*grams.columns)
    )


def _bloom_positions(gram_col: str,
                     md5_col: str | None = None) -> "list[F.Column]":
    """The gram's k bit positions by Kirsch-Mitzenmacher double
    hashing ("Less Hashing, Same Performance", 2006): ONE md5 of the
    gram yields two independent 60-bit halves h1/h2 (hex chars 1-15
    and 16-30 of the 32-char digest), and position i is
    (h1 + i*h2) mod m — the false-positive rate matches k independent
    hashes asymptotically while the probe computes k-1 fewer md5s per
    gram (md5 is the screen's dominant CPU at every scale). Both
    halves are cross-engine-stable (the md5_token_hash trick), so
    DuckDB replays the family exactly. The family is part of the
    Bloom state contract: a PERSISTED bitmap (the streaming screen's
    on-disk state) must be rebuilt if the family ever changes — the
    streaming screen enforces this by recording ``BLOOM_HASH_FAMILY``
    in its meta.json and rebuilding on mismatch. The int64 bound on
    h1 + i*h2 caps BLOOM_K at 8 (asserted next to the constants).

    Pass ``md5_col`` (a projected ``F.md5`` column name) when probing
    many positions per row: referencing the SAME projected column
    shares the one digest explicitly instead of trusting codegen
    subexpression elimination to merge k copies of the md5 subtree."""
    md5 = (
        F.col(md5_col)
        if md5_col is not None
        else F.md5(F.encode(F.col(gram_col), "UTF-8"))
    )
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(BLOOM_M_BITS))
        for i in range(BLOOM_K)
    ]


def bloom_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screened decontamination: build the eval-gram Bloom
    bitmap (one small aggregation), flag every training gram whose k
    positions are all set (one broadcast join of the bitmap), and per
    flagged doc report the screen count next to the exact semi-join
    count. ``n_flagged >= n_exact`` always (no false negatives); docs
    where ``n_exact = 0`` are the deterministic false positives the
    downstream exact verify would discard.

    Scale: the bitmap is m/63 words (~8 KB at m=2^16) regardless of
    corpus size — bounded metadata that rides the probe as a ONE-ROW
    dense array (broadcast nested-loop of a single row), probed by a
    single ``forall`` over each gram's k-position array; the probe
    side never shuffles, and the only aggregations touching the
    training corpus are the per-doc distinct-flagged count and the
    exact verify semi-join — the entire point of the screen at 100 TB.
    Probe-form history: r9 tried an ~8 KB array LITERAL per row
    (element_at + variable shift, no join) and the r10 microbench
    (scripts/bloom_probe_bench.py, sf0.1, 5 alternating passes)
    measured it 1.7x SLOWER than the k-position-explode broadcast
    word_idx join (3.15 s vs 1.83 s), which shipped r10-r13. The r14
    microbench (scripts/bloom_probe_bench_r14.py, same protocol,
    identical output on all variants) then measured the single-pass
    forall probe at 0.95 s median vs 1.83 s for the explode+join form
    — no k-way row blowup, no per-position hash-probe, k x fewer rows
    into the flagged-gram aggregation — and an Arrow/pandas-UDF
    numpy-bitmap probe (guide §4.4 A/B) at 0.79 s; the extra ~17% was
    rejected because it crosses the JVM<->Python boundary in an
    otherwise pure-JVM path (breaks WholeStageCodegen, adds a Python
    worker fleet at scale). The forall form is also what the
    streaming screen probes with (its SPARSE bitmap state on disk is
    unchanged — densified after load) and needs no driver collect at
    all."""
    from bottledwater_pg_spark.session import persist_tracked

    # word-shingle explode (+ md5 probes in the Bloom variant) is the
    # dominant pre-exchange work — opt in to the read repartition
    docs = load_table(
        spark, sf_dir, "documents", parallel=True
    ).select("doc_id", "text")
    eval_set = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 500000).alias("eval_id"), "text"
    )
    contam = docs.filter(F.col("doc_id") % 27 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 9 != 0).unionByName(contam)

    ev_grams = (
        eval_set.select(
            F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram")
        )
        .distinct()
    )
    ev_pos = ev_grams.withColumn(
        "_h", F.md5(F.encode(F.col("gram"), "UTF-8"))
    ).select(
        F.explode(F.array(*_bloom_positions("gram", md5_col="_h"))).alias("pos")
    )
    bitmap = ev_pos.groupBy(
        (F.col("pos") / 63).cast("int").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
        ).alias("word")
    )

    tr_g = persist_tracked(
        train.select(
            "doc_id",
            F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram"),
        )
    )
    # one md5 per gram (K-M), its k positions as a bound array, ONE
    # forall probe of the one-row dense bitmap; a gram repeated within
    # a doc counts once (count_distinct)
    n_flagged = (
        _bloom_flagged_grams(tr_g, bitmap)
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_flagged"))
    )
    exact = (
        tr_g.join(ev_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact"))
    )
    return n_flagged.join(exact, "doc_id", "left").select(
        "doc_id",
        F.col("n_flagged").cast("long").alias("n_flagged"),
        F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
        (F.col("n_flagged") >= F.coalesce(F.col("n_exact"), F.lit(0)))
        .cast("long")
        .alias("no_false_negatives"),
    )


def _bloom_sql() -> str:
    grams = sql_word_shingles("text", NGRAM_CONTAM_N)

    h1 = "(('0x' || substr(_h, 1, 15))::BIGINT)"
    h2 = "(('0x' || substr(_h, 16, 15))::BIGINT)"

    def pos(i: int) -> str:
        return f"(({h1} + {i} * {h2}) % {BLOOM_M_BITS})"

    pos_list = ", ".join(pos(i) for i in range(BLOOM_K))
    return f"""
WITH eval_set AS (
  SELECT doc_id + 500000 AS eval_id, text FROM documents WHERE doc_id % 9 = 0
), train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 0
  UNION ALL
  SELECT doc_id + 600000 AS doc_id, text FROM documents WHERE doc_id % 27 = 0
), ev_grams AS (
  SELECT gram, md5(gram) AS _h FROM (
    SELECT DISTINCT unnest({grams}) AS gram FROM eval_set
  )
), ev_pos AS (
  SELECT unnest([{pos_list}]) AS pos FROM ev_grams
), bitmap AS (
  SELECT CAST(pos // 63 AS INT) AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
  FROM ev_pos GROUP BY 1
), tr_g AS (
  SELECT doc_id, unnest({grams}) AS gram FROM train
), probes AS (
  SELECT doc_id, gram, unnest([{pos_list}]) AS pos
  FROM (SELECT doc_id, gram, md5(gram) AS _h FROM tr_g)
), hit AS (
  SELECT p.doc_id, p.gram,
         CASE WHEN ((COALESCE(b.word, 0) >> CAST(p.pos % 63 AS INT)) & 1) = 1
              THEN 1 ELSE 0 END AS bit_set
  FROM probes p LEFT JOIN bitmap b ON CAST(p.pos // 63 AS INT) = b.word_idx
), flagged AS (
  SELECT doc_id, gram FROM hit GROUP BY doc_id, gram HAVING MIN(bit_set) = 1
), nf AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
  FROM flagged GROUP BY doc_id
), ex AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM tr_g WHERE gram IN (SELECT gram FROM ev_grams) GROUP BY doc_id
)
SELECT nf.doc_id, nf.n_flagged,
       CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact,
       CAST(CASE WHEN nf.n_flagged >= COALESCE(ex.n_exact, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS no_false_negatives
FROM nf LEFT JOIN ex ON nf.doc_id = ex.doc_id
"""

NGRAM_CONTAM_DF_CAP = 50  # drop grams in > 50 train docs (boilerplate)


def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram overlap decontamination — the standard eval-set
    contamination test for LLM training corpora (verbatim-fingerprint
    matching misses partial inclusions; overlap on long word n-grams
    catches a benchmark question embedded inside a larger page). Same
    eval/train construction as ``cross_set_contamination``; reports,
    per eval doc, how many of its distinct word 8-grams occur in the
    training corpus and how many distinct train docs share one.

    Scale path: explode to (doc, gram) pairs — grams are DISTINCT per
    doc (array_distinct), so the per-gram count IS document frequency;
    a df-cap drops boilerplate grams before the join, which is also
    the skew guard (a viral phrase would otherwise hot-key the
    shuffle). The join keys on the gram; eval-side grams are a tiny
    fraction, so AQE broadcasts them. At warehouse scale hash the
    grams (xxhash64) first so the shuffle moves 8 bytes, not strings
    — kept textual here because the DuckDB oracle must compute the
    identical join.
    """
    # word-shingle explode (+ md5 probes in the Bloom variant) is the
    # dominant pre-exchange work — opt in to the read repartition
    docs = load_table(
        spark, sf_dir, "documents", parallel=True
    ).select("doc_id", "text")
    eval_set = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 500000).alias("eval_id"), "text"
    )
    contam = docs.filter(F.col("doc_id") % 27 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 9 != 0).unionByName(contam)
    ev_g = eval_set.select(
        "eval_id",
        F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram"),
    )
    tr_g = train.select(
        "doc_id",
        F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram"),
    )
    # document frequency as a window count over the gram: the train
    # explode runs ONCE and shuffles once (groupBy(gram) + join-back
    # would explode it twice), and the output is already partitioned
    # by gram for the eval join
    from pyspark.sql import Window

    hits = (
        tr_g.withColumn(
            "_df", F.count("*").over(Window.partitionBy("gram"))
        )
        .filter(F.col("_df") <= NGRAM_CONTAM_DF_CAP)
        .join(ev_g, "gram")
    )
    return hits.groupBy("eval_id").agg(
        F.count_distinct("gram").alias("n_shared_grams"),
        F.count_distinct("doc_id").alias("n_train_docs"),
    )


NGRAM_CONTAM_SQL = f"""
WITH eval_set AS (
  SELECT doc_id + 500000 AS eval_id, text FROM documents WHERE doc_id % 9 = 0
), train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 0
  UNION ALL
  SELECT doc_id + 600000, text FROM documents WHERE doc_id % 27 = 0
), ev_g AS (
  SELECT eval_id, unnest({sql_word_shingles("text", NGRAM_CONTAM_N)}) AS gram
  FROM eval_set
), tr_g AS (
  SELECT doc_id, unnest({sql_word_shingles("text", NGRAM_CONTAM_N)}) AS gram
  FROM train
), rare AS (
  SELECT gram FROM tr_g GROUP BY gram
  HAVING COUNT(*) <= {NGRAM_CONTAM_DF_CAP}
)
SELECT eval_id, COUNT(DISTINCT gram) AS n_shared_grams,
       COUNT(DISTINCT doc_id) AS n_train_docs
FROM tr_g JOIN rare USING (gram) JOIN ev_g USING (gram)
GROUP BY eval_id
"""

QUERIES["vocab_top_terms"] = vocab_top_terms
ORACLES["vocab_top_terms"] = VOCAB_SQL
QUERIES["cross_set_contamination"] = cross_set_contamination
ORACLES["cross_set_contamination"] = CONTAM_SQL
QUERIES["ngram_contamination"] = ngram_contamination
QUERIES["bloom_contamination_screen"] = bloom_contamination_screen
ORACLES["bloom_contamination_screen"] = _bloom_sql()
ORACLES["ngram_contamination"] = NGRAM_CONTAM_SQL


# ------------------------------------------ sampling / splitting / packing


def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (operators/
    sampling.py): every doc's assignment derives from md5(salt|doc_id)
    — reproducible on any cluster size, re-saltable without touching
    data. Returned as per-(source, split) counts."""
    from bottledwater_pg_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


from bottledwater_pg_spark.operators.sampling import sql_hash_split  # noqa: E402

SPLIT_SQL = f"""
SELECT source, {sql_hash_split("doc_id")} AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source, {sql_hash_split("doc_id")}
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-25-per-source deterministic sample: rank by content
    hash within each stratum, keep the first 25. Exact (not binomial
    like sampleBy) and bit-for-bit reproducible."""
    from bottledwater_pg_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return stratified_sample(docs, "source", "doc_id", 25)


SAMPLE_SQL = """
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(concat_ws('|', 'v1', CAST(doc_id AS VARCHAR))), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 25
"""


def sequence_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/sampling.py):
    docs concatenated per source in doc_id order, cut every 16384
    chars; per (source, bin): docs starting there and their sizes.
    The exclusive-running-sum formulation is the scalable packing
    rule — one shuffle, linear within stratum."""
    from bottledwater_pg_spark.operators.sampling import sequence_pack

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    packed = sequence_pack(docs, "source", "doc_id", "n_chars", 16384)
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_in_bin"),
        F.min("doc_id").alias("first_doc"),
    )


PACK_SQL = """
SELECT source, CAST(floor(pack_offset / 16384) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars_in_bin,
       MIN(doc_id) AS first_doc
FROM (
  SELECT doc_id, source, n_chars,
         CAST(COALESCE(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS pack_offset
  FROM documents
)
GROUP BY source, floor(pack_offset / 16384)
"""

def negative_pairs_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling (operators/
    sampling.py ``negative_sample_pairs``): 3 hash-ring partners per
    document — reproducible bit-for-bit across re-runs and cluster
    sizes, unlike rand()-based draws."""
    from bottledwater_pg_spark.operators.sampling import negative_sample_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return negative_sample_pairs(docs, "doc_id", k=3)


def _negative_pairs_sql() -> str:
    from bottledwater_pg_spark.operators.sampling import (
        sql_negative_sample_pairs,
    )

    return sql_negative_sample_pairs("documents", "doc_id", k=3)


QUERIES["negative_pairs_per_doc"] = negative_pairs_per_doc
ORACLES["negative_pairs_per_doc"] = _negative_pairs_sql()

QUERIES["corpus_split_counts"] = corpus_split_counts
ORACLES["corpus_split_counts"] = SPLIT_SQL
QUERIES["stratified_sample_docs"] = stratified_sample_docs
ORACLES["stratified_sample_docs"] = SAMPLE_SQL
QUERIES["sequence_pack_stats"] = sequence_pack_stats
ORACLES["sequence_pack_stats"] = PACK_SQL


# ------------------------------------------------- PII redaction


# Java regex (Spark) and RE2 (DuckDB) agree on this restricted syntax:
# character classes, quantifiers, alternation — no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: detect + redact emails and
    phone-shaped strings (regexp_count / regexp_replace — JVM-side,
    codegen, no Python in the hot path), reported as per-source
    counts and redacted-length totals.

    The synthetic docs carry no PII, so a deterministic injection adds
    an email to every 4th doc and a phone to every 6th — both the
    Spark plan and the oracle build the same corpus (the dedup-corpus
    pattern).

    Scale: narrow map + one small groupBy — regex cost is linear in
    corpus bytes and embarrassingly parallel.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    with_pii = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 6 == 0, F.lit(" call 555-0199")).otherwise(
                F.lit("")
            ),
        ),
    )
    red = (
        with_pii.withColumn(
            "n_emails", F.regexp_count("text", F.lit(EMAIL_RE)).cast("long")
        )
        .withColumn(
            "n_phones", F.regexp_count("text", F.lit(PHONE_RE)).cast("long")
        )
        .withColumn(
            "redacted",
            F.regexp_replace(
                F.regexp_replace("text", EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
        )
    )
    return red.groupBy("source").agg(
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.count(F.when(F.col("n_emails") + F.col("n_phones") > 0, 1)).alias(
            "docs_with_pii"
        ),
        F.sum(F.length("redacted")).alias("redacted_chars"),
    )


PII_SQL = f"""
WITH with_pii AS (
  SELECT doc_id, source,
         text
           || CASE WHEN doc_id % 4 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 6 = 0 THEN ' call 555-0199' ELSE '' END AS text
  FROM documents
), red AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM with_pii
)
SELECT source, CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       COUNT(CASE WHEN n_emails + n_phones > 0 THEN 1 END) AS docs_with_pii,
       CAST(SUM(len(redacted)) AS BIGINT) AS redacted_chars
FROM red
GROUP BY source
"""

QUERIES["pii_redaction_stats"] = pii_redaction_stats
ORACLES["pii_redaction_stats"] = PII_SQL


# ------------------------------------------------- k-means centroid step


def embedding_centroid_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact k-means iteration over the embedding corpus: assign
    every vector to its nearest of 8 seed centroids (max integer-
    quantized dot product, centroid-id tie-break), then recompute each
    centroid component as the member mean — the E/M primitive behind
    IVF index training and embedding clustering.

    Determinism: assignment uses exact int64 dots; the mean is an exact
    integer sum divided once in double — bit-identical across engines
    and aggregation orders.

    Scale: centroids broadcast (k x dim is tiny); assignment is a
    narrow map over the corpus; the M-step is one shuffle keyed by
    (centroid, dim) with partial aggregation. This is exactly how
    k-means/IVF training distributes at 10^9 vectors.
    """
    from bottledwater_pg_spark.functions.vectors import dot_pre, quantized_vec

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select("vec_id", quantized_vec("embedding").alias("qv"))
    cents = q.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "dot", dot_pre("qv", "cv")
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            "cid", F.struct(F.col("dot"), (-F.col("cid")).alias("neg"))
        ).alias("cid"),
        F.first("qv").alias("qv"),
    )
    members = assign.select(
        "cid", F.posexplode("qv").alias("dim", "qc")
    ).select("cid", F.col("dim").cast("long").alias("dim"), "qc")
    return members.groupBy("cid", "dim").agg(
        (
            F.sum("qc").cast("double") / (F.count("*") * F.lit(1_000_000.0))
        ).alias("component")
    )


from bottledwater_pg_spark.functions.vectors import quantize, sql_dot_q  # noqa: E402

CENTROID_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> {quantize('x')}) AS qv
  FROM embeddings
),
c AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
dots AS (
  SELECT q.vec_id, c.cid,
         CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
                                      p -> p[1] * p[2])) AS BIGINT) AS dot
  FROM q CROSS JOIN c
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, cid) AS rn
    FROM dots
  ) WHERE rn = 1
),
members AS (
  SELECT a.cid, CAST(g.i - 1 AS BIGINT) AS dim, q.qv[g.i] AS qc
  FROM assign a
  JOIN q USING (vec_id),
  LATERAL (SELECT unnest(generate_series(1, len(q.qv))) AS i) g
)
SELECT cid, dim,
       CAST(SUM(qc) AS DOUBLE) / (COUNT(*) * 1000000.0) AS component
FROM members
GROUP BY cid, dim
"""

QUERIES["embedding_centroid_step"] = embedding_centroid_step
ORACLES["embedding_centroid_step"] = CENTROID_SQL


# ------------------------------------------ repetition quality signals


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per
    source, how many documents are dominated by repeated tokens. Per
    doc the token multiset reduces to (total, distinct, top-token
    count); a doc is "repetitive" when its most frequent token covers
    >= 20% of it (integer comparison ``top*5 >= total`` — parity-safe,
    no float threshold). The duplicate-token share aggregates the
    integer counts and divides ONCE at the end, so the double is
    bit-deterministic.

    Scale: explode -> two-level aggregation, both with map-side
    partial combine; the shuffle carries (doc, token) counts, never
    raw text. No Python in the path.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    per_tok = tok.groupBy("doc_id", "source", "tok").agg(
        F.count("*").alias("c")
    )
    per_doc = per_tok.groupBy("doc_id", "source").agg(
        F.sum("c").alias("ntok"),
        F.count("*").alias("ndistinct"),
        F.max("c").alias("top_tok"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("top_tok") * 5 >= F.col("ntok"), 1).otherwise(0)
        ).alias("n_repetitive"),
        F.sum("ntok").alias("total_tokens"),
        F.sum(F.col("ntok") - F.col("ndistinct")).alias("dup_tokens"),
        (
            F.sum(F.col("ntok") - F.col("ndistinct")).cast("double")
            / F.sum("ntok").cast("double")
        ).alias("dup_share"),
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
), per_tok AS (
  SELECT doc_id, source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS ntok,
         COUNT(*) AS ndistinct, CAST(MAX(c) AS BIGINT) AS top_tok
  FROM per_tok GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN top_tok * 5 >= ntok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       CAST(SUM(ntok - ndistinct) AS BIGINT) AS dup_tokens,
       CAST(SUM(ntok - ndistinct) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE)
         AS dup_share
FROM per_doc GROUP BY source
"""

QUERIES["doc_repetition_stats"] = doc_repetition_stats
ORACLES["doc_repetition_stats"] = REPETITION_SQL


# --------------------------------------- sub-document (passage) dedup


PASSAGE_CHARS = 100  # non-overlapping passage size


def passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style sub-document dedup: documents are cut
    into fixed non-overlapping passages, each passage is content-
    hashed, and a passage instance SURVIVES iff it is the corpus-wide
    first occurrence of its hash (minimum (doc_id, start) — a total
    order, so "first" is well-defined and deterministic). Reported
    per source as kept/dropped counts — the paragraph-granularity
    dedup that catches boilerplate shared across distinct documents,
    which whole-document dedup cannot.

    Scale: explode -> min_by per hash (one shuffle keyed on the
    passage hash) -> broadcast-size join back? No: the winners table
    is |distinct passages| — same order as the corpus — so the
    survivor check is an equi-JOIN on the hash, shuffle-co-partitioned
    with the instance table. Text never shuffles; only (hash, ids).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    inst = (
        docs.withColumn(
            "start",
            F.explode(
                F.expr(
                    f"sequence(0, greatest(length(text) - 1, 0), {PASSAGE_CHARS})"
                )
            ),
        )
        .select(
            "doc_id",
            "source",
            "start",
            F.md5(
                F.expr(f"substring(text, start + 1, {PASSAGE_CHARS})")
            ).alias("h"),
        )
    )
    winners = inst.groupBy("h").agg(
        F.min(
            F.struct(F.col("doc_id").alias("w_doc"), F.col("start").alias("w_start"))
        ).alias("w")
    )
    return (
        inst.join(winners, "h")
        .withColumn(
            "kept",
            ((F.col("doc_id") == F.col("w.w_doc")) & (F.col("start") == F.col("w.w_start"))).cast("int"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum("kept").alias("n_kept"),
            (F.count("*") - F.sum("kept")).alias("n_dropped"),
        )
    )


PASSAGE_SQL = f"""
WITH inst AS (
  SELECT doc_id, source, start,
         md5(substring(text, CAST(start AS INT) + 1, {PASSAGE_CHARS})) AS h
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
          greatest(length(text) - 1, 0), {PASSAGE_CHARS})) AS start)
), winners AS (
  SELECT h, MIN(ROW(doc_id, start)) AS w FROM inst GROUP BY h
)
SELECT source, COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN ROW(doc_id, start) = w THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN ROW(doc_id, start) = w THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
FROM inst JOIN winners USING (h)
GROUP BY source
"""

QUERIES["passage_dedup_stats"] = passage_dedup_stats
ORACLES["passage_dedup_stats"] = PASSAGE_SQL


# --------------------------------------- deterministic global shuffle


def corpus_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order (operators/sampling.py
    ``global_shuffle_index``): dense position per document, ordered by
    salted content hash — computed WITHOUT a global sort (256
    hash-range buckets, driver-side prefix sum of bucket counts,
    partition-local ranking). The oracle is the single ROW_NUMBER the
    two-phase plan must reproduce bit-exactly."""
    from bottledwater_pg_spark.operators.sampling import global_shuffle_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle_index(docs, "doc_id").select("doc_id", "pos")


from bottledwater_pg_spark.operators.sampling import (  # noqa: E402
    sql_global_shuffle_positions,
)

SHUFFLE_POS_SQL = f"""
SELECT doc_id, {sql_global_shuffle_positions("doc_id")} AS pos
FROM documents
"""

QUERIES["corpus_shuffle_positions"] = corpus_shuffle_positions
ORACLES["corpus_shuffle_positions"] = SHUFFLE_POS_SQL


# ------------------------------------------------ data-mixture sampling


MIX_BUDGET_CHARS = 30000  # per-source character budget


def budget_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture construction (operators/sampling.py
    ``budget_mix``): per source, keep documents in salted-hash order
    until ~30k chars are taken; report the kept doc/char counts. The
    exclusive-prefix-sum cut keeps selection deterministic and lets
    exactly one doc straddle each source's boundary."""
    from bottledwater_pg_spark.operators.sampling import budget_mix

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = budget_mix(docs, "source", "doc_id", "n_chars", MIX_BUDGET_CHARS)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("doc_id").alias("min_doc"),
    )


from bottledwater_pg_spark.operators.sampling import (  # noqa: E402
    sql_budget_mix_cte,
)

BUDGET_MIX_SQL = (
    sql_budget_mix_cte("source", "doc_id", "n_chars", MIX_BUDGET_CHARS)
    + """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       MIN(doc_id) AS min_doc
FROM kept GROUP BY source
"""
)

QUERIES["budget_mix_counts"] = budget_mix_counts
ORACLES["budget_mix_counts"] = BUDGET_MIX_SQL


# ------------------------------------------- search-index consumer use


INDEX_MIN_DF = 100  # keep postings for terms seen in >= 100 docs
POSTINGS_HEAD = 20  # first-k doc ids carried per posting row


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the first consumer use the reference
    names for its stream ("build search indexes", README.md:30-32).
    Per term: document frequency, total term frequency, and the head
    of the doc-id-sorted posting list (CSV, deterministic order).

    Scale: explode -> (term, doc) tf aggregation -> per-term rollup,
    map-side combine on both.  The posting-list head is computed as a
    TWO-PHASE bounded top-k so no aggregation buffer (and no single
    task) ever holds a hot term's full posting list: phase 1 groups by
    (term, input partition) and keeps only the first-POSTINGS_HEAD doc
    ids of each partition's slice — buffers bounded by the partition,
    not the corpus; phase 2 merges the <=P bounded arrays per term
    (buffer <= P * POSTINGS_HEAD).  df / total_tf ride the ordinary
    scalar aggregation.  The full posting list at warehouse scale
    would instead be written bucketed by term; this query materializes
    the index STATS.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
        .filter(F.col("df") >= INDEX_MIN_DF)
    )
    partial = (
        tf.groupBy("term", F.spark_partition_id().alias("_pid"))
        .agg(
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_HEAD
            ).alias("_head")
        )
        .groupBy("term")
        .agg(
            F.array_join(
                F.slice(
                    F.sort_array(F.flatten(F.collect_list("_head"))),
                    1,
                    POSTINGS_HEAD,
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return stats.join(partial, "term")


INVERTED_INDEX_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string(
         list_slice(list(doc_id ORDER BY doc_id), 1, {POSTINGS_HEAD}), ','
       ) AS postings_head
FROM tf GROUP BY term
HAVING COUNT(*) >= {INDEX_MIN_DF}
"""

QUERIES["inverted_index_postings"] = inverted_index_postings
ORACLES["inverted_index_postings"] = INVERTED_INDEX_SQL


BM25_TERMS = ("spark", "window", "merge")  # fixed query, summed in order
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped ranked retrieval for a fixed 3-term query — the
    scoring half of the search-index consumer use. One deliberate
    deviation from textbook BM25: the idf factor is the RATIONAL form
    ``(N - df + 0.5) / (df + 0.5)`` without the log. The log is a
    per-term monotone transform whose libm rounding differs across
    engines (JVM StrictMath vs DuckDB's libc), which would poison the
    bit-exact oracle; dropping it keeps every arithmetic step IEEE-
    deterministic (+ * / on doubles in a fixed, parenthesized order).

    Determinism discipline: per-term scores land in fixed COLUMNS
    (conditional max-aggregation), and the final score adds the three
    columns in program order — never a SUM over rows, whose float
    addition order the engine chooses. Top-k ties break on doc_id.

    Scale: tf explode + two map-side-combined aggregations; N / avgdl
    are one tiny broadcast scalar row; the ranking sorts only scored
    docs (those containing a query term).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tok = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*BM25_TERMS)
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "term_score",
            (
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (
                (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * (F.col("dl") / F.col("avgdl")))
                )
            ),
        )
    )
    per_term_cols = [
        F.max(F.when(F.col("term") == t, F.col("term_score"))).alias(f"s{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    pivoted = scored.groupBy("doc_id").agg(*per_term_cols)
    score = (
        F.coalesce(F.col("s0"), F.lit(0.0))
        + F.coalesce(F.col("s1"), F.lit(0.0))
        + F.coalesce(F.col("s2"), F.lit(0.0))
    )
    from pyspark.sql import Window

    # Top-k FIRST via orderBy().limit() — TakeOrderedAndProject does a
    # parallel per-partition partial top-k with no Exchange
    # SinglePartition over the matched-doc set (a common query term at
    # corpus scale matches millions of docs; the old global
    # row_number() window single-partitioned all of them). The rank
    # window then runs over <= BM25_TOPK rows — a bounded scalar-sized
    # exchange, the same class as a 1-row aggregate.
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        pivoted.withColumn("score", score)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def _bm25_sql() -> str:
    term_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    score_cols = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(BM25_TERMS)))
    per_term = ", ".join(
        f"MAX(CASE WHEN term = '{t}' THEN term_score END) AS s{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
), tok AS (
  SELECT doc_id, unnest(toks) AS term FROM toks
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({term_list}) GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  -- every literal cast to DOUBLE: DuckDB types bare numeric literals
  -- as DECIMAL, whose intermediate rounding drifts a ulp from the
  -- Spark double pipeline
  SELECT tf.doc_id, tf.term,
         ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
           * ((tf * (CAST({BM25_K1} AS DOUBLE) + 1))
              / (tf + CAST({BM25_K1} AS DOUBLE)
                 * (1 - CAST({BM25_B} AS DOUBLE)
                    + CAST({BM25_B} AS DOUBLE) * (dl / avgdl)))) AS term_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
), pivoted AS (
  SELECT doc_id, {per_term} FROM scored GROUP BY doc_id
), final AS (
  SELECT doc_id, {score_cols} AS score FROM pivoted
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM final
QUALIFY rank <= {BM25_TOPK}
"""


QUERIES["bm25_topk_docs"] = bm25_topk_docs
ORACLES["bm25_topk_docs"] = _bm25_sql()


# ------------------------------------------------- SemDeDup (semantic)


def semdedup_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup over the duplicate-injected embedding
    corpus (similarity.semdedup_prune): cluster around the 8 lowest-id
    centroids, prune within-cluster cosine>=0.99 higher-id twins; per
    cluster report membership, prune count, and the exact integer sum
    of pruned ids (a content-addressed checksum of WHICH vectors were
    pruned, not just how many).

    Clustering runs ONCE (persisted) and feeds both the membership
    stats and the prune pairs. Scale notes on the operator itself —
    the quadratic term is bounded by cluster size by construction.
    """
    # under-split-read opt-in: the shuffle-free assignment fold leaves
    # everything on the scan partitioning, so the single-row-group
    # fixture file must be spread up front (no-op on multi-split inputs)
    corpus = parallel_scan(embeddings_with_dups(spark, sf_dir))
    cent = similarity.ivf_centroids(corpus, 8)
    assigned = persist_tracked(similarity.ivf_assign(corpus, cent))
    pruned = similarity.semdedup_pairs_pruned(assigned, COSINE_THRESHOLD)
    members = assigned.groupBy(F.col("cent_id").alias("cid")).agg(
        F.count("*").alias("n_members")
    )
    pstats = pruned.groupBy(F.col("cent_id").alias("cid")).agg(
        F.count("*").alias("n_pruned"),
        F.sum("pruned_id").alias("pruned_id_sum"),
    )
    return members.join(pstats, "cid", "left").select(
        "cid",
        "n_members",
        F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
        F.coalesce("pruned_id_sum", F.lit(0))
        .cast("long")
        .alias("pruned_id_sum"),
    )


def _semdedup_sql() -> str:
    dot_ab = (
        "CAST(list_sum(list_transform(list_zip(a.qv, b.qv), "
        "p -> p[1] * p[2])) AS BIGINT)"
    )
    dot_qc = (
        "CAST(list_sum(list_transform(list_zip(qn.qv, c.cv), "
        "p -> p[1] * p[2])) AS BIGINT)"
    )
    return (
        EMB_CTE
        + f"""
, q AS (
  SELECT vec_id, list_transform(embedding, x -> {quantize('x')}) AS qv
  FROM corpus
), qn AS (
  SELECT vec_id, qv,
         sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))
           AS nrm
  FROM q
), c AS (
  SELECT vec_id AS cid, qv AS cv, nrm AS cn
  FROM qn ORDER BY vec_id LIMIT 8
), assign AS (
  SELECT vec_id, cid, qv, nrm FROM (
    SELECT qn.vec_id, c.cid, qn.qv, qn.nrm,
           ROW_NUMBER() OVER (
             PARTITION BY qn.vec_id
             ORDER BY CAST({dot_qc} AS DOUBLE) / (qn.nrm * c.cn) DESC,
                      c.cid) AS rn
    FROM qn CROSS JOIN c
  ) WHERE rn = 1
), pruned AS (
  SELECT a.cid, b.vec_id AS pruned_id
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE CAST({dot_ab} AS DOUBLE) / (a.nrm * b.nrm)
        >= CAST({COSINE_THRESHOLD} AS DOUBLE)
  GROUP BY 1, 2
), members AS (
  SELECT cid, COUNT(*) AS n_members FROM assign GROUP BY cid
), pstats AS (
  SELECT cid, COUNT(*) AS n_pruned,
         CAST(SUM(pruned_id) AS BIGINT) AS pruned_id_sum
  FROM pruned GROUP BY cid
)
SELECT members.cid, n_members,
       COALESCE(n_pruned, 0) AS n_pruned,
       COALESCE(pruned_id_sum, 0) AS pruned_id_sum
FROM members LEFT JOIN pstats USING (cid)
"""
    )


QUERIES["semdedup_prune_stats"] = semdedup_prune_stats
ORACLES["semdedup_prune_stats"] = _semdedup_sql()


# ------------------------------------- weighted (token-budget) sampling


def weighted_sample_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (operators/sampling.py
    ``weighted_systematic_sample``): ~50 documents drawn with
    probability proportional to length (n_chars) by systematic
    resampling on the exact integer weight axis — the "sample K docs
    weighted by tokens" primitive for corpus audits and eval-set
    construction. Two-phase bucketed prefix sum (no global window);
    the oracle is the single-window formulation it must reproduce
    bit-exactly, kept set and prefix sums both."""
    from bottledwater_pg_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_systematic_sample(docs, "doc_id", "n_chars", 50).select(
        "doc_id", "n_chars", "cum_before", "sample_pos"
    )


from bottledwater_pg_spark.operators.sampling import (  # noqa: E402
    sql_weighted_systematic_cte,
)

WEIGHTED_SAMPLE_SQL = (
    sql_weighted_systematic_cte("doc_id", "n_chars", 50)
    + """
SELECT doc_id, n_chars, cum_before, CAST(sample_pos AS BIGINT) AS sample_pos
FROM kept
"""
)

QUERIES["weighted_sample_chars"] = weighted_sample_chars
ORACLES["weighted_sample_chars"] = WEIGHTED_SAMPLE_SQL


# -------------------------------------- incremental (ingest-time) dedup


def incremental_dedup_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (operators/dedup.py incremental_lsh_matches):
    a new ingest batch (the near-copy docs) probes the standing corpus
    index via shared MinHash band signatures, exact-Jaccard-verifying
    candidates only. 16 bands x 2 rows: candidate miss probability
    ~1e-8 at J=0.8, so the result provably equals the brute-force
    cross-corpus oracle on this corpus. Cost scales with the batch,
    not the corpus."""
    index = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    newb = index.filter(F.col("doc_id") % NEAR_COPY_MOD == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return dedup.incremental_lsh_matches(
        index, newb, num_hashes=32, bands=16, threshold=JACCARD_THRESHOLD
    )


INCR_DEDUP_SQL = f"""
WITH newb AS (
  SELECT doc_id + 200000 AS doc_id, text || '{NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
),
sha AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM newb
),
shb AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM documents
),
sza AS (SELECT sid, COUNT(*) AS sz FROM sha GROUP BY sid),
szb AS (SELECT sid, COUNT(*) AS sz FROM shb GROUP BY sid),
inter AS (
  SELECT a.sid AS new_id, b.sid AS match_id, COUNT(*) AS inter
  FROM sha a JOIN shb b ON a.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT new_id, match_id,
       CAST(inter AS DOUBLE) / (sza.sz + szb.sz - inter) AS jaccard
FROM inter
JOIN sza ON sza.sid = new_id
JOIN szb ON szb.sid = match_id
WHERE CAST(inter AS DOUBLE) / (sza.sz + szb.sz - inter)
      >= {JACCARD_THRESHOLD}
"""

QUERIES["incremental_dedup_matches"] = incremental_dedup_matches
ORACLES["incremental_dedup_matches"] = INCR_DEDUP_SQL


def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (the WAV twin of
    multimodal_ppm_stats): per doc a genuine RIFF/WAVE PCM16 payload
    is synthesized from pure integer functions of doc_id
    (operators/multimodal.py synth_wav_payloads), then actually
    decoded — RIFF chunk walk, fmt validation, int16 buffer — and
    reduced to exact int64 waveform stats. The oracle recomputes every
    sample arithmetically. Proves the audio-modality plumbing with a
    real container parse, not a stub."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.wav_stats(multimodal.synth_wav_payloads(docs))


MULTIMODAL_WAV_SQL = """
WITH p AS (
  SELECT doc_id, 64 + doc_id % 57 AS n, doc_id % 1000 AS b
  FROM documents
), s AS (
  SELECT doc_id, n, (b * 7 + i * 13) % 4096 - 2048 AS v
  FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) t
)
SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate, n AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_amp,
       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM s
GROUP BY doc_id, n
"""

QUERIES["multimodal_wav_stats"] = multimodal_wav_stats
ORACLES["multimodal_wav_stats"] = MULTIMODAL_WAV_SQL


# ------------------------------------ tokenizer training: pair counts


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge step — corpus-wide adjacent-token-pair
    frequency counting — as a distributed primitive: tokenize once,
    emit every adjacent pair (NOT distinct: merge choice is by corpus
    frequency), count, return the top 20 pairs with a deterministic
    (count desc, pair asc) tie-break. This is the heart of tokenizer
    training at scale: one partial+final counted shuffle per merge
    round, the corpus never leaves the executors, and only the
    (vocab² -bounded, in practice tiny) pair table moves.

    The pair emit is a JVM array transform over a PRE-PROJECTED token
    array (re-tokenizing inside the lambda would be O(tokens²) per
    doc — the same trap functions/text.py:53 documents).
    """
    from bottledwater_pg_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("toks")
    )
    pairs = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(0, size(toks) - 2), "
                "i -> concat(toks[i], ' ', toks[i + 1])) END"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


BPE_PAIRS_SQL = """
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
), pairs AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
)
SELECT pair, COUNT(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""

QUERIES["bpe_pair_counts"] = bpe_pair_counts
ORACLES["bpe_pair_counts"] = BPE_PAIRS_SQL


# ----------------------------------- robust length-outlier filtering


def length_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust quality filtering: flag documents whose length deviates
    more than 2 MAD-sigmas from their SOURCE's median length — the
    outlier rule real cleaning pipelines use because mean/stddev are
    themselves dragged by the outliers being hunted. Exact arithmetic
    end-to-end: per-source median and MAD via rank extraction over
    integer n_chars (window per source — source cardinality is the
    parallelism unit here, matching how per-domain stats shard at
    scale), deviation compare in integers scaled by the 1.4826
    sigma-consistency constant expressed as the exact rational
    14826/10000 (no float multiply: |v - med| * 10000 > 2 * 14826 *
    mad compares int64s).

    Returns flagged docs with their source, length, and the source
    median/MAD so the decision is auditable. (On this synthetic
    corpus the lengths are near-uniform, so larger scale factors can
    legitimately flag zero docs — the 2-sigma rule, not the fixture,
    is the contract.)"""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("source"))
    )
    med = (
        r.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("source")
        # 2x the median in integer units — avoids a fractional median
        # for even groups: compare 2*|v - med| as |2v - 2med|
        .agg((F.min("n_chars") + F.max("n_chars")).alias("med2"))
    )
    dev = docs.join(F.broadcast(med), "source").select(
        "source",
        "doc_id",
        "n_chars",
        F.abs(F.lit(2) * F.col("n_chars") - F.col("med2")).alias("dev2"),
    )
    w2 = Window.partitionBy("source").orderBy("dev2", "doc_id")
    r2 = dev.withColumn("rn", F.row_number().over(w2)).withColumn(
        "n", F.count("*").over(Window.partitionBy("source"))
    )
    mad = (
        r2.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("source")
        .agg((F.min("dev2") + F.max("dev2")).alias("mad4"))  # 4x the MAD
    )
    return (
        dev.join(F.broadcast(mad), "source")
        # |v-med| > 2 * 1.4826 * MAD with every term integral
        # (dev2 = 2|v-med|, mad4 = 4*MAD):
        #   (dev2/2)*10^4 > 2 * 14826 * (mad4/4)
        #   <=> dev2 * 20000 > 29652 * mad4
        .filter(
            F.col("dev2") * F.lit(20000) > F.lit(29652) * F.col("mad4")
        )
        .select("source", "doc_id", "n_chars", "dev2", "mad4")
    )


LENGTH_OUTLIER_SQL = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
med AS (
  SELECT source, MIN(n_chars) + MAX(n_chars) AS med2
  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY source
),
dev AS (
  SELECT d.source, d.doc_id, d.n_chars,
         ABS(2 * d.n_chars - med.med2) AS dev2
  FROM documents d JOIN med USING (source)
),
r2 AS (
  SELECT source, doc_id, n_chars, dev2,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY dev2, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM dev
),
mad AS (
  SELECT source, MIN(dev2) + MAX(dev2) AS mad4
  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY source
)
SELECT dev.source, dev.doc_id, dev.n_chars, dev.dev2, mad.mad4
FROM dev JOIN mad USING (source)
WHERE dev.dev2 * 20000 > 29652 * mad.mad4
"""

QUERIES["length_outlier_docs"] = length_outlier_docs
ORACLES["length_outlier_docs"] = LENGTH_OUTLIER_SQL


# --------------------------------------------- text canonicalization


def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization before hashing/dedup — the normalize step every
    pipeline runs so near-identical texts collide: lowercase, strip
    punctuation to spaces, collapse whitespace runs, trim. All
    ASCII-class regexes (identical semantics in Java regex and RE2, so
    the md5 of the normalized text is cross-engine checkable — the
    md5 IS the dedup key this stage exists to stabilize). Narrow
    projection, no shuffle; composes in front of every dedup operator.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9\\s]", " "),
            "\\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS raw_len,
       CAST(length(norm) AS INTEGER) AS norm_len,
       md5(norm) AS norm_md5
FROM n
"""

QUERIES["text_normalize_stats"] = text_normalize_stats
ORACLES["text_normalize_stats"] = TEXT_NORMALIZE_SQL


# ------------------------------------------------ ensemble dedup capstone


def dedup_cluster_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup clustering — the production shape: no single
    sketch catches every duplicate class, so the pair sets of THREE
    modalities (MinHash/Jaccard set overlap, SimHash Hamming
    proximity, winnowing shared-passage overlap) are unioned into one
    edge set and clustered with the adversarial-diameter star CC.
    Returns every doc with its cluster's canonical (minimum) id —
    docs caught by ANY modality collapse together.

    Scale: each pair generator is its own audited sub-linear plan
    (banded equi-joins, df-capped fingerprints); the union is a
    distinct over pair keys; clustering is the O(log² n)-round star
    variant. The edge set, not the corpus, drives CC cost.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel

    from bottledwater_pg_spark.functions.text import (
        tokens,
        word_shingles_from_tokens,
    )
    from bottledwater_pg_spark.operators.graph import (
        connected_components_star,
    )

    # ONE persisted corpus feeds all three modalities and the final
    # doc join — without it each constituent re-runs the scan + union
    corpus = persist_tracked(docs_with_near_dups(spark, sf_dir))
    # ONE tokenization pass feeds BOTH the MinHash shingle table and
    # the SimHash tf counts (the identical split expression, so the
    # pair sets are unchanged); winnowing fingerprints char k-grams
    # of the raw text, so it genuinely shares only the corpus scan
    toks = persist_tracked(
        corpus.select(F.col("doc_id").alias("sid"), tokens("text").alias("toks")),
        StorageLevel.MEMORY_AND_DISK,
    )
    shingles = persist_tracked(
        toks.select(
            "sid",
            F.explode(word_shingles_from_tokens("toks", 3)).alias("shingle"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    p1 = lsh_minhash_near_dup(
        spark, sf_dir, corpus, shingles=shingles
    ).select("a_id", "b_id")
    p2 = simhash_md5_near_dup(
        spark, sf_dir, corpus, token_arrays=toks
    ).select("a_id", "b_id")
    p3 = winnow_near_dup_pairs(spark, sf_dir, corpus).select("a_id", "b_id")
    # materialize the three pair sets CONCURRENTLY (independent Spark
    # jobs; each persists its own result) — wall cost becomes roughly
    # max(modality) instead of sum, the same independence the
    # per-table materializer exploits; the shared corpus/token/shingle
    # caches are computed once by whichever job gets there first
    parts = [persist_tracked(p) for p in (p1, p2, p3)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        for fut in [pool.submit(p.count) for p in parts]:
            fut.result()
    # persist the unioned pair set: star CC materializes its input
    # TWICE up front (node universe + oriented edges) — with the
    # parts cached the union re-reads memory, not the pipelines
    edges = persist_tracked(
        parts[0].unionByName(parts[1]).unionByName(parts[2]).distinct()
    )
    comp = connected_components_star(edges, "a_id", "b_id")
    docs = corpus.select("doc_id")
    return docs.join(
        comp, docs.doc_id == comp.id, "left"
    ).select(
        "doc_id", F.coalesce("comp", "doc_id").alias("canonical_id")
    )


def _ensemble_sql() -> str:
    return f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || '{NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % {NEAR_COPY_MOD} = 0
),
-- MATERIALIZED: without it DuckDB re-evaluates the three pair
-- pipelines on every recursion step of `reach` (measured 110 s -> 7 s)
allpairs AS MATERIALIZED (
  SELECT a_id, b_id FROM ({DEDUP_JACCARD_SQL})
  UNION
  SELECT a_id, b_id FROM ({_simhash_md5_sql()})
  UNION
  SELECT a_id, b_id FROM ({WINNOW_PAIRS_SQL})
),
edges AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM allpairs
  UNION
  SELECT b_id AS a, a_id AS b FROM allpairs
),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM corpus
  UNION
  SELECT e.a AS id, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY id
"""


QUERIES["dedup_cluster_ensemble"] = dedup_cluster_ensemble
ORACLES["dedup_cluster_ensemble"] = _ensemble_sql()


# --------------------------------- threshold sensitivity + curation


def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sensitivity audit: how many near-dup pairs fire in
    each Jaccard band ([0.6,0.7) ... [0.9,1.0]) over the injected
    corpus — the calibration table a pipeline owner reads before
    committing to a dedup threshold (one band per row, exact decimal
    band edges via integer flooring of 10x the similarity). ONE pair
    pipeline run at the loosest threshold feeds every band; bands are
    a projection, not re-runs.

    Banding is 32 bands x 1 row: the oracle is the EXHAUSTIVE Jaccard
    scan, so candidate recall at the 0.6 floor must be effectively 1
    (single-hash bands: miss prob 0.4^32 ~ 2e-13/pair, vs ~8e-4 for
    16x2 — enough to drop a borderline pair as fixtures grow). Wider
    banding only inflates the candidate set; the exact-Jaccard verify
    step keeps emitted values identical."""
    pairs = dedup.minhash_lsh_pairs(
        docs_with_near_dups(spark, sf_dir),
        num_hashes=32,
        bands=32,
        threshold=0.6,
    )
    return (
        pairs.withColumn(
            "band_lo",
            (F.floor(F.col("jaccard") * 10).cast("long") / 10.0),
        )
        .withColumn(
            "band_lo",
            F.when(F.col("band_lo") >= 1.0, 0.9).otherwise(F.col("band_lo")),
        )
        .groupBy("band_lo")
        .agg(F.count("*").alias("n_pairs"))
    )


THRESH_SQL = (
    DOCS_NEAR_CTE
    + f"""
, sh AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
  GROUP BY a.sid, b.sid
),
scored AS (
  SELECT CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.sid = a_id
  JOIN sizes sb ON sb.sid = b_id
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6
),
banded AS (
  SELECT CASE WHEN floor(jaccard * 10) >= 10 THEN 0.9
              ELSE CAST(floor(jaccard * 10) AS BIGINT) / 10.0 END AS band_lo
  FROM scored
)
SELECT band_lo, COUNT(*) AS n_pairs FROM banded GROUP BY band_lo
"""
)

QUERIES["dedup_threshold_sensitivity"] = dedup_threshold_sensitivity
ORACLES["dedup_threshold_sensitivity"] = THRESH_SQL


def top_quality_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation: the 5 highest-quality docs per source by a composite
    integer score (length + alpha-token share in basis points — both
    exact ints, no float compare), extracted with the BOUNDED
    two-phase top-k (per-partition slice then merge — no source's
    full doc list ever sits in one aggregation buffer). The
    per-source shortlist every mixture builder starts from."""
    from bottledwater_pg_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", tokens("text").alias("toks")
    )
    alpha_bp = F.expr(
        "CASE WHEN size(toks) = 0 THEN 0 ELSE "
        "(size(filter(toks, t -> t rlike '^[a-z]+$')) * 10000) div size(toks)"
        " END"
    )
    scored = docs.select(
        "doc_id", "source",
        (F.col("n_chars") + alpha_bp).cast("long").alias("score"),
    )
    arr = F.slice(
        F.sort_array(
            F.collect_list(F.struct(F.col("score"), -F.col("doc_id"))),
            asc=False,
        ), 1, 5,
    )
    return (
        scored.groupBy("source", F.spark_partition_id().alias("_pid"))
        .agg(arr.alias("_part"))
        .groupBy("source")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("_part")), asc=False),
                1, 5,
            ).alias("_arr")
        )
        .select(
            "source",
            F.explode("_arr").alias("s"),
        )
        .select(
            "source",
            (-F.col("s.col2")).cast("long").alias("doc_id"),
            F.col("s.score").alias("score"),
        )
    )


TOPQ_SQL = """
WITH toks AS (
  SELECT doc_id, source, n_chars,
         string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         CAST(n_chars + CASE WHEN len(t) = 0 THEN 0 ELSE
           (len(list_filter(t, x -> regexp_full_match(x, '[a-z]+'))) * 10000)
             // len(t) END AS BIGINT) AS score
  FROM toks
),
ranked AS (
  SELECT source, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id) AS rn
  FROM scored
)
SELECT source, doc_id, score FROM ranked WHERE rn <= 5
"""

QUERIES["top_quality_docs_per_source"] = top_quality_docs_per_source
ORACLES["top_quality_docs_per_source"] = TOPQ_SQL


# ----------------------- mixture temperature weights + corpus diversity


def alpha_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture allocation — the alpha=0.5
    sampling rule LLM pretraining mixtures use (upweight small/rare
    sources relative to their raw token share; the Pile and LLaMA data
    recipes both apply w_s ∝ n_s^alpha): per source, total whitespace
    tokens, then weight_bp/alloc_per_m computed from floor(sqrt(n))
    in PURE INTEGER arithmetic (IEEE sqrt is correctly rounded, so
    floor(sqrt) is bit-deterministic across engines — no float ratios
    in the output).

    Scale: one hash aggregation over documents (map-side partial sum
    of per-doc token counts), then a 1-row total broadcast back — the
    per-source table is O(#sources), never wide.
    """
    from bottledwater_pg_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("ntok")
    )
    per_src = (
        docs.groupBy("source")
        .agg(F.sum("ntok").cast("long").alias("n_tokens"))
        .withColumn(
            "wgt",
            F.expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"),
        )
    )
    total = per_src.agg(F.sum("wgt").cast("long").alias("wsum"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.expr("wgt * 10000 div wsum").alias("weight_bp"),
            F.expr("wgt * 1000000 div wsum").alias("alloc_per_m"),
        )
    )


ALPHA_MIX_SQL = """
WITH per AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wgt
  FROM per
), t AS (SELECT CAST(SUM(wgt) AS BIGINT) AS wsum FROM w)
SELECT source, n_tokens,
       CAST(wgt * 10000 // wsum AS BIGINT) AS weight_bp,
       CAST(wgt * 1000000 // wsum AS BIGINT) AS alloc_per_m
FROM w, t
"""

QUERIES["alpha_mixture_weights"] = alpha_mixture_weights
ORACLES["alpha_mixture_weights"] = ALPHA_MIX_SQL


def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity audit: per source, distinct 3-gram vocabulary
    vs total 3-gram instances (per-doc distinct, same shingle
    definition as the dedup family) in basis points — the
    cross-document repetition signal curation pipelines read before
    sampling (a boilerplate-heavy or near-dup-heavy source scores
    low). Pure integer output.

    Scale: explode-then-aggregate; COUNT(DISTINCT) expands to Spark's
    two-level partial aggregation keyed on (source, shingle), so no
    single source's vocabulary ever sits in one buffer.
    """
    from bottledwater_pg_spark.functions.text import (
        tokens,
        word_shingles_from_tokens,
    )

    sh = (
        load_table(spark, sf_dir, "documents")
        .select("source", tokens("text").alias("toks"))
        .select(
            "source",
            F.explode(word_shingles_from_tokens("toks", 3)).alias("shingle"),
        )
    )
    return (
        sh.groupBy("source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.countDistinct("shingle").alias("n_distinct"),
        )
        .select(
            "source",
            "n_shingles",
            "n_distinct",
            F.expr("n_distinct * 10000 div n_shingles").alias("diversity_bp"),
        )
    )


NGRAM_DIVERSITY_SQL = f"""
WITH sh AS (
  SELECT source, unnest({_SHINGLES}) AS shingle FROM documents
)
SELECT source, COUNT(*) AS n_shingles,
       COUNT(DISTINCT shingle) AS n_distinct,
       CAST(COUNT(DISTINCT shingle) * 10000 // COUNT(*) AS BIGINT)
         AS diversity_bp
FROM sh GROUP BY source
"""

QUERIES["ngram_diversity_by_source"] = ngram_diversity_by_source
ORACLES["ngram_diversity_by_source"] = NGRAM_DIVERSITY_SQL


# -------------------------------------- LM-based quality filtering


def _bigram_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, toks): the LM kernel's tokenizer — lowercase,
    whitespace split, alphabetic tokens only. Shared by the batch
    scorers and the streaming LM screen so the token stream can never
    drift between them."""
    return docs.select(
        "doc_id", F.expr("filter(split(trim(lower(text)), '\\\\s+'), "
                         "t -> t rlike '^[a-z]+$')").alias("toks"),
    )


def _bigram_pairs(toks: DataFrame) -> DataFrame:
    """(doc_id, prev, cur) adjacent-pair stream from the token table."""
    return toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] AS prev, toks[i + 1] AS cur))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.prev").alias("prev"),
             F.col("p.cur").alias("cur"))


def _lm_surprise_per_doc(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, surprise_total_q, mean_surprise_q): the
    add-one-smoothed bigram surprise score of every doc with at least
    one scored bigram — the shared scoring kernel of
    :func:`lm_surprise_outliers` (top-20 ranking) and
    :func:`ccnet_perplexity_buckets` (per-source tercile split).
    Integer-quantized inverse probabilities; see the outlier query's
    docstring for the determinism argument."""
    toks = _bigram_tokens(docs)
    bi = persist_tracked(_bigram_pairs(toks))
    model = persist_tracked(
        bi.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    )
    ctx = model.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab = toks.select(F.explode("toks").alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    scored = (
        bi.join(model, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "surprise_q",
            F.expr("((c1 + v) * 10000) div (c2 + 1)").cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("surprise_q").alias("surprise_total_q"),
        )
        .withColumn(
            "mean_surprise_q",
            F.expr("surprise_total_q div n_bigrams").cast("long"),
        )
    )


def lm_surprise_outliers(spark: SparkSession, sf_dir: str,
                         docs: DataFrame | None = None) -> DataFrame:
    """CCNet-style language-model quality filter (Wenzek et al. 2020
    train a KenLM on clean text and drop high-perplexity documents;
    the reference delegates all such consumer-side scoring,
    README.md:30-32): a bigram model with add-one smoothing is
    trained ON the corpus itself, every document is scored, and the
    20 most surprising documents (boilerplate, repetition, junk) are
    returned with their scores.

    Cross-engine determinism: instead of summing float log
    probabilities (Math.log is not correctly-rounded, so Spark and
    DuckDB can differ in the last ulp and summation order is
    non-associative), each token's smoothed INVERSE probability
    (c1 + V) / (c2 + 1) is quantized to an exact integer
    ``(c1 + V) * 10000 div (c2 + 1)`` and summed in int64 — the
    per-doc mean inverse probability (the arithmetic-mean bound on
    perplexity, which is its geometric mean). Monotone in the same
    direction as perplexity, bit-identical everywhere. A production
    pipeline swaps in float logs with one line; the plan is
    unchanged.

    Scale: the model is the distinct-bigram table (vocabulary-sized,
    not corpus-sized) built in one partially-aggregated pass; scoring
    is one shuffle of doc bigrams against it keyed (prev, cur);
    context counts ride the same table (broadcast when small, AQE
    otherwise); V is a 1-row scalar broadcast. Top-20 via
    TakeOrderedAndProject over per-doc aggregates.
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    return (
        _lm_surprise_per_doc(docs.select("doc_id", "text"))
        .orderBy(F.desc("mean_surprise_q"), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("surprise_total_q").cast("long").alias("surprise_total_q"),
            "mean_surprise_q",
        )
    )


LM_SURPRISE_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> regexp_matches(t, '^[a-z]+$')) AS toks
  FROM documents
),
bi AS (
  SELECT doc_id, p[1] AS prev, p[2] AS cur
  FROM (
    SELECT doc_id,
           unnest(list_zip(toks[1:-2], toks[2:-1])) AS p
    FROM toks WHERE len(toks) >= 2
  )
),
model AS (
  SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY prev, cur
),
ctx AS (
  SELECT prev, SUM(c2) AS c1 FROM model GROUP BY prev
),
vocab AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest(toks) AS t FROM toks)
),
scored AS (
  SELECT bi.doc_id,
         ((ctx.c1 + vocab.v) * 10000) // (model.c2 + 1) AS surprise_q
  FROM bi
  JOIN model USING (prev, cur)
  JOIN ctx USING (prev)
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         SUM(surprise_q) AS surprise_total_q
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(surprise_total_q AS BIGINT) AS surprise_total_q,
       CAST(surprise_total_q // n_bigrams AS BIGINT) AS mean_surprise_q
FROM per_doc
ORDER BY mean_surprise_q DESC, doc_id
LIMIT 20
"""

QUERIES["lm_surprise_outliers"] = lm_surprise_outliers
ORACLES["lm_surprise_outliers"] = LM_SURPRISE_SQL


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str,
                             docs: DataFrame | None = None) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3: score
    every doc with a clean-text LM, cut each language/source into
    perplexity terciles, and train preferentially on the head — the
    standard mixture knob between hard filtering and no filtering).
    Per (source, bucket): doc count, char mass, and exact integer
    checksums of the scores and ids, so the oracle pins the ENTIRE
    assignment, not just the sizes.

    Scoring is the shared :func:`_lm_surprise_per_doc` kernel
    (integer-quantized bigram surprise — monotone in perplexity,
    bit-identical cross-engine); the tercile is ntile(3) per source
    ordered by (mean_surprise_q, doc_id) — a total order, so the
    split is deterministic and both engines' NTILE (front-loaded
    remainder) agree row-for-row. Docs with no scored bigram (no two
    consecutive alphabetic tokens) have no perplexity and are
    excluded, as in CCNet's LM scoring.

    Scale: scoring is the LM kernel's shape (model table join, no
    corpus collect); the tercile is ONE window per source — the same
    partitioned-rank discipline as source_quota_sample, same skew
    caveat (a mega-source serializes its own rank, salt + re-rank is
    the escape)."""
    from pyspark.sql import Window

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    scored = _lm_surprise_per_doc(docs.select("doc_id", "text"))
    w = Window.partitionBy("source").orderBy("mean_surprise_q", "doc_id")
    b = (
        docs.select("doc_id", "source", "n_chars")
        .join(scored, "doc_id")
        .withColumn("bucket", F.ntile(3).over(w))
        .withColumn(
            "bucket_name",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("bucket"),
            ),
        )
    )
    return (
        b.groupBy("source", "bucket", "bucket_name")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum("mean_surprise_q").alias("surprise_q_sum"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .orderBy("source", "bucket")
    )


CCNET_BUCKETS_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> regexp_matches(t, '^[a-z]+$')) AS toks
  FROM documents
),
bi AS (
  SELECT doc_id, p[1] AS prev, p[2] AS cur
  FROM (
    SELECT doc_id,
           unnest(list_zip(toks[1:-2], toks[2:-1])) AS p
    FROM toks WHERE len(toks) >= 2
  )
),
model AS (
  SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY prev, cur
),
ctx AS (
  SELECT prev, SUM(c2) AS c1 FROM model GROUP BY prev
),
vocab AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest(toks) AS t FROM toks)
),
scored AS (
  SELECT bi.doc_id,
         ((ctx.c1 + vocab.v) * 10000) // (model.c2 + 1) AS surprise_q
  FROM bi
  JOIN model USING (prev, cur)
  JOIN ctx USING (prev)
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, SUM(surprise_q) // COUNT(*) AS mean_surprise_q
  FROM scored GROUP BY doc_id
),
bucketed AS (
  SELECT d.source, d.n_chars, d.doc_id, p.mean_surprise_q,
         NTILE(3) OVER (PARTITION BY d.source
                        ORDER BY p.mean_surprise_q, d.doc_id) AS bucket
  FROM documents d JOIN per_doc p USING (doc_id)
)
SELECT source,
       CAST(bucket AS INT) AS bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket_name,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(mean_surprise_q) AS BIGINT) AS surprise_q_sum,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM bucketed GROUP BY source, bucket ORDER BY source, bucket
"""

QUERIES["ccnet_perplexity_buckets"] = ccnet_perplexity_buckets
ORACLES["ccnet_perplexity_buckets"] = CCNET_BUCKETS_SQL


# ------------------------------------------- BPE merge learning

BPE_MERGE_STEPS = 8

# one tokenization expression shared by the trainer and its SQL twin:
# lowercase, whitespace-split, alphabetic words only (the standard
# BPE pre-tokenization discipline keeps the symbol alphabet clean)
_BPE_WORDS = (
    "filter(split(trim(lower(text)), '\\\\s+'), t -> t rlike '^[a-z]+$')"
)
_BPE_WORDS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
    "t -> regexp_matches(t, '^[a-z]+$'))"
)


def _bpe_pairs(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): frequency-weighted adjacent symbol pairs of a
    space-joined symbol-string vocabulary ``(ws, freq)``.

    The split is projected into a bound ``arr`` column first (the SQL
    twin's ``p{k}`` CTE does the same) so the symbol string is split
    ONCE per row, not once per pair index — inlining the split inside
    the transform lambda is the O(tokens²)-per-row pattern
    functions/text.py word_shingles_from_tokens documents as a
    measured 3x regression."""
    return (
        vocab.select(
            "freq", F.split(F.trim(F.col("ws")), " +").alias("arr")
        )
        .select(
            "freq",
            F.expr(
                "CASE WHEN size(arr) < 2 THEN array() "
                "ELSE transform(sequence(0, size(arr) - 2), "
                "i -> struct(arr[i] AS a, arr[i + 1] AS b)) END"
            ).alias("ps"),
        )
        .select("freq", F.explode("ps").alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn_merges(spark: SparkSession, sf_dir: str,
                     steps: int = BPE_MERGE_STEPS,
                     docs: DataFrame | None = None) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016, arXiv:1508.07909)
    — the merge-learning loop itself, not just pair statistics: start
    from the character alphabet over the word-frequency vocabulary,
    then ``steps`` times (a) count frequency-weighted adjacent symbol
    pairs, (b) take the most frequent pair (ties: lexicographic on
    (left, right)), (c) merge every left-to-right occurrence. Returns
    the learned merge table ``(step, merge_left, merge_right,
    pair_count)`` — the artifact a tokenizer ships.

    Iteration runs on the VOCABULARY (distinct words + frequencies),
    never the corpus — the classic BPE trick; one corpus pass builds
    it. Per step: one partially-aggregated pair count over the vocab
    plus a ONE-ROW argmax collect (the same bounded driver transfer
    as CC's convergence count); the merge applies as three chained
    ``replace`` passes over the space-joined symbol string — pass 1
    takes every other occurrence of a boundary-sharing chain, pass 2
    the rest, pass 3 is idempotent margin — which both engines
    execute bit-identically (scan left, continue after each
    replacement), making the WHOLE training loop hash-oracle-able.
    """
    merges, _ = _bpe_train(spark, sf_dir, steps, docs)
    return spark.createDataFrame(
        merges,
        "step long, merge_left string, merge_right string, pair_count long",
    )


def _bpe_train(spark: SparkSession, sf_dir: str, steps: int,
               docs: DataFrame | None):
    """The training loop shared by :func:`bpe_learn_merges` (returns
    the merge table) and :func:`bpe_encode_stats` (returns the final
    word->symbol-string vocabulary the merges induce)."""
    from bottledwater_pg_spark.session import persist_tracked

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select("text")
    words = docs.select(
        F.explode(F.expr(_BPE_WORDS)).alias("w")
    ).groupBy("w").agg(F.count("*").alias("freq"))
    vocab = persist_tracked(
        words.select(
            F.concat(
                F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")
            ).alias("ws"),
            "freq",
        )
    )
    merges = []
    for step in range(1, steps + 1):
        top = (
            _bpe_pairs(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            raise RuntimeError(
                f"BPE vocabulary exhausted at step {step}: no adjacent "
                "symbol pairs remain"
            )
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((step, a, b, cnt))
        # symbols are concatenations of [a-z] characters (the
        # pre-tokenization filter guarantees it), so inlining them
        # into the expression string needs no escaping
        vocab = persist_tracked(
            vocab.select(
                F.expr(
                    "replace(replace(replace(ws, "
                    f"' {a} {b} ', ' {a}{b} '), "
                    f"' {a} {b} ', ' {a}{b} '), "
                    f"' {a} {b} ', ' {a}{b} ')"
                ).alias("ws"),
                "freq",
            )
        )
    return merges, vocab


def _bpe_cte_prefix(steps: int) -> str:
    """The shared CTE chain (word vocab -> v{steps}) both BPE SQL
    twins start from: per step a pair-count aggregation, a LIMIT-1
    argmax, and the same three replace passes applied via a 1-row
    cross join."""
    parts = [f"""
WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest({_BPE_WORDS_SQL}) AS w FROM documents
  ) GROUP BY w
),
v0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS ws, freq
  FROM words
)"""]
    for k in range(1, steps + 1):
        prev = f"v{k - 1}"
        parts.append(f""",
p{k} AS (
  SELECT p[1] AS a, p[2] AS b, SUM(freq) AS cnt FROM (
    SELECT unnest(list_zip(arr[1:-2], arr[2:-1])) AS p, freq FROM (
      SELECT string_split_regex(trim(ws), ' +') AS arr, freq FROM {prev}
    )
  ) GROUP BY 1, 2
),
b{k} AS (
  SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
),
v{k} AS (
  SELECT replace(replace(replace({prev}.ws,
           ' ' || b{k}.a || ' ' || b{k}.b || ' ',
           ' ' || b{k}.a || b{k}.b || ' '),
           ' ' || b{k}.a || ' ' || b{k}.b || ' ',
           ' ' || b{k}.a || b{k}.b || ' '),
           ' ' || b{k}.a || ' ' || b{k}.b || ' ',
           ' ' || b{k}.a || b{k}.b || ' ') AS ws, freq
  FROM {prev}, b{k}
)""")
    return "".join(parts)


def _bpe_merges_sql(steps: int = BPE_MERGE_STEPS) -> str:
    """SQL twin of :func:`bpe_learn_merges`: the identical loop
    unrolled over the shared CTE chain."""
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, a AS merge_left, "
        f"b AS merge_right, CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, steps + 1)
    )
    return _bpe_cte_prefix(steps) + "\n" + sel + "\nORDER BY step"


QUERIES["bpe_learn_merges"] = bpe_learn_merges
ORACLES["bpe_learn_merges"] = _bpe_merges_sql()


def bpe_encode_stats(spark: SparkSession, sf_dir: str,
                     steps: int = BPE_MERGE_STEPS,
                     docs: DataFrame | None = None) -> DataFrame:
    """BPE tokenizer APPLICATION — the other half of the tokenizer
    lifecycle: train the merge table (:func:`_bpe_train`), then encode
    the corpus with it and report per-source fertility (the
    tokens-per-word and chars-per-token ratios pretraining pipelines
    budget by; Sennrich et al. 2016 §3). The trained vocabulary maps
    each word to its final symbol string, and because symbols are the
    word's characters in order, ``replace(trim(ws), ' ', '')``
    reconstructs the word losslessly — so encoding the corpus is ONE
    equi-join of the word stream against the vocab, never a re-run of
    the merge loop per document.

    Scale: the vocabulary is distinct words (orders of magnitude
    smaller than the corpus, the same table the trainer iterates); the
    corpus side is one explode + join on the word, then a per-source
    integer aggregation. All outputs are integers (basis points), so
    the whole train-then-apply pipeline stays hash-oracle-able.
    """
    _, vocab = _bpe_train(spark, sf_dir, steps, docs)
    enc = vocab.select(
        F.regexp_replace(F.trim("ws"), " ", "").alias("w"),
        F.size(F.split(F.trim("ws"), " +")).cast("long").alias("n_sym"),
    )
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docw = docs.select(
        "source", F.explode(F.expr(_BPE_WORDS)).alias("w")
    )
    return (
        docw.join(enc, "w")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .select(
            "source", "n_words", "n_bpe_tokens", "n_chars",
            F.expr(
                "n_bpe_tokens * 10000 div n_words"
            ).alias("tokens_per_word_bp"),
            F.expr(
                "n_chars * 10000 div n_bpe_tokens"
            ).alias("chars_per_token_bp"),
        )
    )


def _bpe_encode_sql(steps: int = BPE_MERGE_STEPS) -> str:
    """SQL twin of :func:`bpe_encode_stats`: the shared training CTE
    chain, then the same reconstruct-the-word join and per-source
    integer aggregation."""
    return _bpe_cte_prefix(steps) + f""",
enc AS (
  SELECT replace(trim(ws), ' ', '') AS w,
         CAST(len(string_split_regex(trim(ws), ' +')) AS BIGINT) AS n_sym
  FROM v{steps}
),
docw AS (
  SELECT source, unnest({_BPE_WORDS_SQL}) AS w FROM documents
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
         CAST(SUM(len(w)) AS BIGINT) AS n_chars
  FROM docw JOIN enc USING (w)
  GROUP BY source
)
SELECT source, n_words, n_bpe_tokens, n_chars,
       CAST(n_bpe_tokens * 10000 // n_words AS BIGINT)
         AS tokens_per_word_bp,
       CAST(n_chars * 10000 // n_bpe_tokens AS BIGINT)
         AS chars_per_token_bp
FROM agg
"""


QUERIES["bpe_encode_stats"] = bpe_encode_stats
ORACLES["bpe_encode_stats"] = _bpe_encode_sql()


# --------------------------------------- exact-substring duplicate spans

EXACT_SUBSTR_K = 8  # minimum duplicated run, in tokens


def exact_substring_spans(spark: SparkSession, sf_dir: str,
                          docs: DataFrame | None = None,
                          k: int = EXACT_SUBSTR_K,
                          hashed: bool = False) -> DataFrame:
    """Exact-substring deduplication audit (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language
    Models Better"): per document, the MAXIMAL token spans that occur
    verbatim in at least one OTHER document — the memorization-driving
    duplication MinHash-style whole-doc dedup misses (a boilerplate
    footer pasted into thousands of otherwise-unique pages). The paper
    builds a corpus suffix array; the distributed re-expression is
    positional k-token grams: a token position is covered iff some
    k-gram through it is cross-document duplicated, and runs of
    duplicated gram starts merge into maximal spans (gap > k breaks a
    span because the k-long intervals stop overlapping). Returns, per
    affected doc: span count, duplicated-token total, and duplicated
    fraction in basis points — all integers, hash-exact cross-engine.

    Scale path: the gram table is one row per token position (the same
    O(corpus tokens) a suffix array costs); cross-doc duplication is
    `min(doc_id) != max(doc_id)` over a window partitioned by gram —
    ONE shuffle on the gram, no groupBy+join-back double explode and
    no per-gram doc list materialized (the min/max pair is O(1) state
    per gram, so a boilerplate gram hot-keys nothing). The span merge
    re-shuffles only the surviving duplicated positions by doc.

    ``hashed=True`` is the warehouse-scale variant the textual form's
    shuffle budget asks for: the gram goes through the 60-bit
    md5-prefix (the winnowing/``md5_token_hash`` trick) INSIDE the
    explode lambda, so the dominant gram shuffle moves 8-byte longs
    instead of ~50-char token strings. md5-derived means DuckDB still
    replays it bit-exactly — the variant keeps a full hash oracle; the
    textual twin remains the exactness reference (a 60-bit collision
    could mark a non-duplicated position, birthday-bounded at ~2^30
    grams — parity on this corpus is pytest-pinned).
    """
    from pyspark.sql import Window

    if docs is None:
        # tokenize + per-position gram build (md5 in the hashed form)
        # dominates the pre-shuffle stage — opt in to the read
        # repartition
        docs = load_table(spark, sf_dir, "documents", parallel=True)
    docs = docs.select("doc_id", "text")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    _gram = f"concat_ws(' ', slice(toks, i, {k}))"
    if hashed:
        _gram = (
            f"CAST(conv(substring(md5(cast({_gram} as binary)), 1, 15), "
            f"16, 10) AS BIGINT)"
        )
    _gt = "bigint" if hashed else "string"
    g = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) < {k} THEN "
                f"CAST(array() AS array<struct<pos:int,gram:{_gt}>>) "
                f"ELSE transform(sequence(1, size(toks) - {k} + 1), "
                f"i -> struct(i AS pos, {_gram} AS gram)) END"
            )
        ).alias("pg"),
    ).select(
        "doc_id", "n_tokens",
        F.col("pg.pos").cast("long").alias("pos"),
        F.col("pg.gram").alias("gram"),
    )
    wg = Window.partitionBy("gram")
    dup = (
        g.withColumn("_mn", F.min("doc_id").over(wg))
        .withColumn("_mx", F.max("doc_id").over(wg))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "n_tokens", "pos")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    # two duplicated k-gram starts p < q cover a contiguous token run
    # iff q - p <= k ([p, p+k-1] and [q, q+k-1] overlap or touch);
    # islands of such starts are the maximal duplicated spans
    isl = dup.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(wd) <= k, F.lit(0))
        .otherwise(F.lit(1)),
    ).withColumn(
        "island",
        F.sum("_new").over(
            wd.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = isl.groupBy("doc_id", "n_tokens", "island").agg(
        (F.max("pos") + F.lit(k) - F.min("pos")).alias("covered")
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum("covered").cast("long").alias("dup_tokens"),
        )
        .select(
            "doc_id", "n_tokens", "n_spans", "dup_tokens",
            F.expr("dup_tokens * 10000 div n_tokens").alias("dup_frac_bp"),
        )
    )


EXACT_SUBSTR_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(i AS BIGINT) AS pos,
         array_to_string(toks[i : i + {EXACT_SUBSTR_K - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {EXACT_SUBSTR_K - 1}, 0) + 1))
       AS r(i)
), dup AS (
  SELECT doc_id, n_tokens, pos FROM (
    SELECT doc_id, n_tokens, pos,
           min(doc_id) OVER (PARTITION BY gram) AS mn,
           max(doc_id) OVER (PARTITION BY gram) AS mx
    FROM g
  ) WHERE mn <> mx
), isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, n_tokens, pos,
           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                          ORDER BY pos)
                     <= {EXACT_SUBSTR_K}
                THEN 0 ELSE 1 END AS nw
    FROM dup
  )
), spans AS (
  SELECT doc_id, n_tokens, island,
         max(pos) + {EXACT_SUBSTR_K} - min(pos) AS covered
  FROM isl GROUP BY doc_id, n_tokens, island
)
SELECT doc_id, n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(covered) AS BIGINT) AS dup_tokens,
       CAST(SUM(covered) * 10000 // n_tokens AS BIGINT) AS dup_frac_bp
FROM spans GROUP BY doc_id, n_tokens
"""

QUERIES["exact_substring_spans"] = exact_substring_spans
ORACLES["exact_substring_spans"] = EXACT_SUBSTR_SQL


def exact_substring_spans_hashed(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The warehouse-scale production form of
    :func:`exact_substring_spans`: identical algorithm, gram shuffle
    carries the 60-bit md5-prefix long instead of the token string
    (see the base docstring). Fully hash-oracled — the hash is
    md5-derived, so DuckDB replays the identical window; textual
    parity on this corpus is pytest-pinned (test_llm_ops)."""
    return exact_substring_spans(spark, sf_dir, hashed=True)


EXACT_SUBSTR_HASHED_SQL = EXACT_SUBSTR_SQL.replace(
    f"array_to_string(toks[i : i + {EXACT_SUBSTR_K - 1}], ' ') AS gram",
    f"('0x' || substr(md5(array_to_string("
    f"toks[i : i + {EXACT_SUBSTR_K - 1}], ' ')), 1, 15))::BIGINT AS gram",
)
assert EXACT_SUBSTR_HASHED_SQL != EXACT_SUBSTR_SQL

QUERIES["exact_substring_spans_hashed"] = exact_substring_spans_hashed
ORACLES["exact_substring_spans_hashed"] = EXACT_SUBSTR_HASHED_SQL


# ------------------------------------ DSIR importance weights (data
# selection via hashed-n-gram importance resampling)

DSIR_BUCKETS = 64
DSIR_TOPK = 20
DSIR_LOG_SCALE = 1_000_000


def dsir_importance_weights(spark: SparkSession, sf_dir: str,
                            docs: DataFrame | None = None) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much it
    resembles a TARGET distribution, estimated over hashed unigram
    buckets — the lightweight bag-of-hashed-ngrams proxy DSIR shows
    selects pretraining data nearly as well as a trained classifier.
    Target here: the corpus's English documents (the stand-in for the
    paper's Wikipedia+books formal-text target); raw: every document.
    Per bucket ``b``: add-1-smoothed probabilities ``p_t[b]`` /
    ``p_r[b]``; per document: log importance weight = sum over token
    occurrences of ``log(p_t[b]/p_r[b])``. Returns the TOPK docs by
    weight — the resampling front-runners.

    Determinism: the per-bucket log-ratio is ONE double log of a ratio
    of exact integers, quantized to int (floor x 1e6) in the 64-row
    bucket table; per-doc weights are then pure INTEGER sums of
    (occurrences x quantized score) — associative, so Spark's partial
    aggregation order cannot perturb them (the same quantize-then-sum
    discipline as the LM quality filter).

    Scale: one pass builds per-(doc, bucket) occurrence counts; the
    bucket score table is B rows (independent of corpus size) and
    broadcasts; no shuffle ever carries a token string — only bucket
    ids and counts. This is the whole DSIR pipeline shape: O(tokens)
    map, O(docs x B) aggregate, O(B) model.
    """
    from bottledwater_pg_spark.operators.dedup import md5_token_hash
    from bottledwater_pg_spark.session import persist_tracked

    B = DSIR_BUCKETS
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "lang", "text")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    ).select(
        "doc_id", "lang", (md5_token_hash("tok") % B).alias("b")
    )
    # per-(doc, bucket) occurrence counts: feeds the raw model, the
    # target model, and the per-doc scorer — one persisted pass
    db = persist_tracked(
        tok.groupBy("doc_id", "lang", "b").agg(
            F.count("*").cast("long").alias("occ")
        )
    )
    raw = db.groupBy("b").agg(F.sum("occ").cast("long").alias("cnt_r"))
    tgt = (
        db.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("occ").cast("long").alias("cnt_t"))
    )
    model = (
        raw.join(tgt, "b", "left")
        .na.fill({"cnt_t": 0})
        .crossJoin(
            F.broadcast(
                raw.agg(F.sum("cnt_r").cast("long").alias("tot_r"))
            )
        )
        .crossJoin(
            F.broadcast(
                # a corpus with NO target docs must degrade to the
                # uniform add-1 model, not NULL out every weight —
                # sum over zero rows is NULL, coalesce like the SQL
                # twin's COALESCE(SUM(cnt_t), 0)
                tgt.agg(
                    F.coalesce(F.sum("cnt_t"), F.lit(0))
                    .cast("long")
                    .alias("tot_t")
                )
            )
        )
        .select(
            "b",
            # floor(log(((cnt_t+1)*(tot_r+B)) / ((cnt_r+1)*(tot_t+B)))
            #       * 1e6) — each FACTOR casts to DOUBLE before the
            # multiply (an int64 product (cnt+1)*(tot+B) wraps around
            # ~1e19 on very large corpora, and a wrapped-negative
            # ratio would NULL the ln; factors themselves stay exact
            # doubles up to 2^53 tokens), then ONE double log
            F.expr(
                f"CAST(floor(ln("
                f"(CAST(cnt_t + 1 AS DOUBLE) * CAST(tot_r + {B} AS DOUBLE)) / "
                f"(CAST(cnt_r + 1 AS DOUBLE) * CAST(tot_t + {B} AS DOUBLE))"
                f") * {DSIR_LOG_SCALE}) AS BIGINT)"
            ).alias("score_q"),
        )
    )
    return (
        db.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_tokens"),
            F.sum(F.col("occ") * F.col("score_q"))
            .cast("long")
            .alias("logw_q"),
        )
        .orderBy(F.desc("logw_q"), "doc_id")
        .limit(DSIR_TOPK)
    )


DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(t.tok), 1, 15))::BIGINT % {DSIR_BUCKETS} AS b
  FROM documents,
       unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
), db AS (
  SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS occ
  FROM tok GROUP BY doc_id, lang, b
), raw AS (
  SELECT b, CAST(SUM(occ) AS BIGINT) AS cnt_r FROM db GROUP BY b
), tgt AS (
  SELECT b, CAST(SUM(occ) AS BIGINT) AS cnt_t
  FROM db WHERE lang = 'en' GROUP BY b
), model AS (
  SELECT raw.b,
         CAST(floor(ln(
           (CAST(COALESCE(cnt_t, 0) + 1 AS DOUBLE) *
            CAST((SELECT SUM(cnt_r) FROM raw) + {DSIR_BUCKETS}
                 AS DOUBLE)) /
           (CAST(cnt_r + 1 AS DOUBLE) *
            CAST((SELECT COALESCE(SUM(cnt_t), 0) FROM tgt)
                 + {DSIR_BUCKETS} AS DOUBLE))
         ) * {DSIR_LOG_SCALE}) AS BIGINT) AS score_q
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b
)
SELECT doc_id,
       CAST(SUM(occ) AS BIGINT) AS n_tokens,
       CAST(SUM(occ * score_q) AS BIGINT) AS logw_q
FROM db JOIN model ON db.b = model.b
GROUP BY doc_id
ORDER BY logw_q DESC, doc_id
LIMIT {DSIR_TOPK}
"""

QUERIES["dsir_importance_weights"] = dsir_importance_weights
ORACLES["dsir_importance_weights"] = DSIR_SQL


# ------------------------------------------ PQ-ADC ANN (Jégou et al.)

PQ_N_SUB = 16
PQ_K_SUB = 32
PQ_REFINE = 100
PQ_ANN_RECALL_FLOOR_BP = 7000


def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via product quantization + asymmetric
    distance with exact re-rank (similarity.topk_pq, the IVFADC-R
    shape): deterministic lowest-id codebook sample, exact int64
    subspace distances, ADC shortlist of PQ_REFINE candidates, exact
    quantized-cosine re-rank — every step pinned, so DuckDB replays
    the ENTIRE codebook build + encode + ADC scan + re-rank and the
    output is fully hash-oracled, like the IVF and md5-SRP twins.
    Approximate vs brute force by design (recall certified by
    ``pq_ann_recall_vs_exact``: floor 70%, measured 89-94%)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_pq(
        emb, queries, k=5, n_sub=PQ_N_SUB, k_sub=PQ_K_SUB,
        refine=PQ_REFINE,
    )


def pq_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``pq_ann_topk``:
    recall vs brute force floored at 70% (measured 94% at sf0.01,
    89% at sf0.1 with the 16x32 codebooks + refine-100 re-rank)."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        pq_ann_topk(spark, sf_dir),
        PQ_ANN_RECALL_FLOOR_BP,
    )


def _pq_cte_block(n_sub: int, k_sub: int, dim: int) -> str:
    """The PQ codebook/encode/distance-table CTE chain (base, cb, sv,
    enc, dtab) shared by :func:`_pq_ann_sql` and
    :func:`_ivfpq_ann_sql` — the two oracles MUST replay the identical
    codebook build and encoding (same discipline as
    :func:`_bpe_cte_prefix` for the BPE twins); expects a ``qn`` CTE
    in scope."""
    sub = dim // n_sub
    l2 = ("CAST(list_sum(list_transform(list_zip({a}, {b}), "
          "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)")
    return f"""base AS (
  SELECT qvec, ROW_NUMBER() OVER (ORDER BY sid) - 1 AS code
  FROM qn ORDER BY sid LIMIT {k_sub}
),
cb AS (
  SELECT m, code, qvec[m * {sub} + 1 : (m + 1) * {sub}] AS cb_q
  FROM base, (SELECT unnest(range({n_sub})) AS m)
),
sv AS (
  SELECT sid, m, qvec[m * {sub} + 1 : (m + 1) * {sub}] AS sub_q
  FROM qn, (SELECT unnest(range({n_sub})) AS m)
),
enc AS (
  SELECT sid, m, code FROM (
    SELECT sv.sid, sv.m, cb.code,
           ROW_NUMBER() OVER (
             PARTITION BY sv.sid, sv.m
             ORDER BY {l2.format(a="sv.sub_q", b="cb.cb_q")}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.m = cb.m
  ) WHERE rn = 1
),
dtab AS (
  SELECT sv.sid AS query_id, sv.m, cb.code,
         {l2.format(a="sv.sub_q", b="cb.cb_q")} AS d
  FROM sv JOIN cb ON sv.m = cb.m
  WHERE sv.sid < 20
)"""


def _pq_ann_sql(n_sub: int = PQ_N_SUB, k_sub: int = PQ_K_SUB,
                refine: int = PQ_REFINE, dim: int = 64) -> str:
    """Full replay of the PQ index: the shared codebook/encode/dtab
    CTE block, ADC over the whole corpus, (dist ASC, neighbor_id)
    shortlist of ``refine``, then the shared exact-cosine re-rank
    tail."""
    return f"""
WITH {_QN_CTE},
{_pq_cte_block(n_sub, k_sub, dim)},
adc AS (
  SELECT dtab.query_id, enc.sid AS neighbor_id,
         CAST(SUM(dtab.d) AS BIGINT) AS adc_dist_q
  FROM enc JOIN dtab ON enc.m = dtab.m AND enc.code = dtab.code
  WHERE enc.sid <> dtab.query_id
  GROUP BY dtab.query_id, enc.sid
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_dist_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {refine}
),
{_SCORE_RANK_TAIL}"""


QUERIES["pq_ann_topk"] = pq_ann_topk
ORACLES["pq_ann_topk"] = _pq_ann_sql()
QUERIES["pq_ann_recall_vs_exact"] = pq_ann_recall_vs_exact
ORACLES["pq_ann_recall_vs_exact"] = _ann_recall_sql(
    PQ_ANN_RECALL_FLOOR_BP
)


# --------------------------------------------- IVF-PQ (composed index)

IVFPQ_RECALL_FLOOR_BP = 6500


def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ system (similarity.topk_ivfpq): coarse cells
    prune the scan, PQ codes make the in-cell scan table lookups, the
    ADC shortlist re-ranks exactly — all three stages deterministic,
    so DuckDB replays the COMPOSED index end to end and the output is
    fully hash-oracled. Recall certified by
    ``ivfpq_ann_recall_vs_exact`` (floor 65%, measured 87-94%)."""
    # under-split-read opt-in: the shuffle-free assignment fold leaves
    # everything on the scan partitioning, so the single-row-group
    # fixture file must be spread up front (no-op on multi-split inputs)
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_ivfpq(emb, queries, k=5)


def ivfpq_ann_recall_vs_exact(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``ivfpq_ann_topk``:
    recall vs brute force floored at 65% (measured 94/92/87% at
    sf0.001/0.01/0.1 — the cell pruning costs a few points vs pure
    PQ's refine-100 because a true neighbor outside the probed cells
    can never be shortlisted)."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        ivfpq_ann_topk(spark, sf_dir),
        IVFPQ_RECALL_FLOOR_BP,
    )


def _ivfpq_ann_sql(n_list: int = 32, n_probe: int = 8,
                   n_sub: int = 16, k_sub: int = 32, refine: int = 50,
                   dim: int = 64) -> str:
    """Full replay of the composed IVF-PQ index: the shared IVF
    probe block (:func:`_ivf_probe_ctes`), the SHARED PQ
    codebook/encode/distance-table block (:func:`_pq_cte_block`),
    ADC restricted to probed cells, shortlist, exact-cosine
    re-rank."""
    return f"""
WITH {_QN_CTE},
cent AS (
  SELECT sid AS cent_id, qvec AS cent_q, n AS cent_n
  FROM qn ORDER BY sid LIMIT {n_list}
),
{_ivf_probe_ctes(n_probe)},
{_pq_cte_block(n_sub, k_sub, dim)},
adc AS (
  SELECT d.query_id, e.sid AS neighbor_id,
         CAST(SUM(d.d) AS BIGINT) AS adc_dist_q
  FROM enc e
  JOIN assigned a ON e.sid = a.sid
  JOIN probe p ON p.cent_id = a.cent_id
  JOIN dtab d ON d.query_id = p.query_id
             AND d.m = e.m AND d.code = e.code
  WHERE e.sid <> p.query_id
  GROUP BY d.query_id, e.sid
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_dist_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {refine}
),
{_SCORE_RANK_TAIL}"""


QUERIES["ivfpq_ann_topk"] = ivfpq_ann_topk
ORACLES["ivfpq_ann_topk"] = _ivfpq_ann_sql()
QUERIES["ivfpq_ann_recall_vs_exact"] = ivfpq_ann_recall_vs_exact
ORACLES["ivfpq_ann_recall_vs_exact"] = _ann_recall_sql(
    IVFPQ_RECALL_FLOOR_BP
)


IVFPQ_TRAINED_RECALL_FLOOR_BP = 7000


def ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with a TRAINED coarse quantizer (the actual FAISS
    IVFADC recipe — train the coarse cells before encoding):
    IVF_TRAINED_ITERS exact Lloyd's rounds feed the shared PQ/ADC/
    refine machinery of ``ivfpq_ann_topk``. DuckDB replays training +
    the composed three-stage index end to end — fully hash-oracled.
    Same fixture honesty note as ``ivf_trained_topk``: the uniform
    unit-vector corpus has no cluster structure for training to
    exploit, so the certificate floor pins the trained system's own
    recall (above the untrained 65% floor), not fixture superiority."""
    # under-split-read opt-in: the shuffle-free assignment fold leaves
    # everything on the scan partitioning, so the single-row-group
    # fixture file must be spread up front (no-op on multi-split inputs)
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_ivfpq_trained(
        emb, queries, k=5, iters=IVF_TRAINED_ITERS
    )


def ivfpq_trained_recall_vs_exact(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``ivfpq_trained_topk``:
    recall vs brute force floored at 70% (above the untrained 65%;
    measured 91/87/85% at sf0.001/0.01/0.1)."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        ivfpq_trained_topk(spark, sf_dir),
        IVFPQ_TRAINED_RECALL_FLOOR_BP,
    )


def _ivfpq_trained_sql(n_list: int = 32, n_probe: int = 8,
                       n_sub: int = 16, k_sub: int = 32,
                       refine: int = 50, dim: int = 64) -> str:
    """_ivfpq_ann_sql with the sampled `cent` CTE replaced by the
    unrolled Lloyd's chain (qn derived from the chain's qv so the
    corpus quantizes once); the probe and PQ blocks are the shared
    :func:`_ivf_probe_ctes` / :func:`_pq_cte_block`."""
    iters = IVF_TRAINED_ITERS
    return (
        _kmeans_sql(k=n_list, iters=iters, src="embeddings")
        + f""",
{_trained_cent_ctes(iters)},
{_ivf_probe_ctes(n_probe)},
{_pq_cte_block(n_sub, k_sub, dim)},
adc AS (
  SELECT d.query_id, e.sid AS neighbor_id,
         CAST(SUM(d.d) AS BIGINT) AS adc_dist_q
  FROM enc e
  JOIN assigned a ON e.sid = a.sid
  JOIN probe p ON p.cent_id = a.cent_id
  JOIN dtab d ON d.query_id = p.query_id
             AND d.m = e.m AND d.code = e.code
  WHERE e.sid <> p.query_id
  GROUP BY d.query_id, e.sid
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_dist_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {refine}
),
{_SCORE_RANK_TAIL}"""
    )


# (registration lives at the end of the file — the oracle string is
# built at import time from _kmeans_sql, defined further down)


# ------------------------------------------ PMI collocations

PMI_MIN_PAIR_COUNT = 5
PMI_TOPK = 20


def token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information (Church &
    Hanks 1990) over adjacent token bigrams — the corpus statistic
    collocation extraction, tokenizer-vocabulary curation, and
    compositionality probes start from. PMI = log(P(a,b) / (P(a)P(b)))
    is MONOTONE in the rational c(a,b)*N / (c(a)*c(b)), so ranking by
    the integer-quantized RATIO (x10000, floor-div) needs no
    cross-engine log at all — pure int64 arithmetic, hash-exact. A
    minimum pair count screens out the degenerate PMI-loves-rare-pairs
    tail (the standard discipline).

    Scale: one explode pass builds bigram counts (partial-agg), the
    unigram model joins back keyed on each side's token, N is a 1-row
    scalar broadcast. Nothing quadratic: only OBSERVED bigrams are
    scored.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(tokens("text").alias("arr"))
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(arr) < 2 THEN array() "
                    "ELSE transform(sequence(0, size(arr) - 2), "
                    "i -> struct(arr[i] AS a, arr[i + 1] AS b)) END"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_PAIR_COUNT)
    )
    uni = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n = uni.agg(F.sum("c").cast("long").alias("n_tokens"))
    return (
        big.join(uni.select(F.col("t").alias("a"),
                            F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("t").alias("b"),
                         F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a", "b", "c_ab",
            # the numerator c_ab * N * 10000 overflows int64 around
            # 1e9-token corpora with hot bigrams — compute the exact
            # integer ratio in DECIMAL(38,0) (Spark) / HUGEINT
            # (DuckDB twin), both exact wide-integer arithmetic, and
            # only the bounded QUOTIENT (<= 10000 * N / min_count^2)
            # narrows back to BIGINT
            F.expr(
                "CAST(CAST(c_ab AS DECIMAL(38,0)) * n_tokens * 10000 "
                "div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("pmi_ratio_q"),
        )
        .orderBy(F.desc("pmi_ratio_q"), "a", "b")
        .limit(PMI_TOPK)
    )


PMI_SQL = f"""
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS arr FROM documents
), big AS (
  SELECT p[1] AS a, p[2] AS b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM (
    SELECT unnest(list_zip(arr[1:-2], arr[2:-1])) AS p FROM toks
  ) GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_PAIR_COUNT}
), uni AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest(arr) AS t FROM toks
  ) GROUP BY t
), n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni)
SELECT big.a, big.b, c_ab,
       CAST(CAST(c_ab AS HUGEINT) * n_tokens * 10000
            // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT)
         AS pmi_ratio_q
FROM big JOIN uni ua ON ua.t = big.a
         JOIN uni ub ON ub.t = big.b, n
ORDER BY pmi_ratio_q DESC, big.a, big.b
LIMIT {PMI_TOPK}
"""

QUERIES["token_pmi_topk"] = token_pmi_topk
ORACLES["token_pmi_topk"] = PMI_SQL


# ------------------------------------ k-means topic clustering (the
# SemDeDup/IVF-training/topic-balance primitive, run to a fixed
# iteration count)

KMEANS_K = 8
KMEANS_ITERS = 4
EMB_DIM = 64  # fixture embedding dimensionality (TESTDATA.md)


def kmeans_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus
    (:func:`operators.similarity.kmeans_lloyd`, KMEANS_ITERS exact
    integer rounds from lowest-id seeds), reported as the per-cluster
    profile a topic-balance curation pass consumes: member count,
    mean squared distance to the assigned centroid (cluster
    tightness), and the updated centroid's L1 mass (certifies the
    centroid VALUES, not just the partition). Every quantity is exact
    int64, so the DuckDB oracle replays the entire four-round E/M
    loop bit-identically (unrolled CTEs, the k-core discipline).

    Scale: per round, centroids (k x dim) broadcast against the
    corpus (a narrow broadcast nested loop — the deliberate tiny-side
    BNLJ); the per-vector argmin is a map-side-combining aggregation
    (the k candidate rows per vector collapse before the exchange, so
    the shuffle carries ~|corpus| rows); the M-step is a (cid, dim)
    keyed partial+final agg whose output is k x dim rows at any
    corpus size. This is how MLlib's k-means distributes, minus the
    driver-side centroid state (ours stay in a k-row DataFrame).
    """
    from bottledwater_pg_spark.operators.similarity import kmeans_lloyd

    # the corpus is tiny relative to per-task scheduling cost here and
    # the E-step fold is a narrow map: spreading it 32 ways measured
    # ~1 s SLOWER (same-session A/B) — per-round stage overhead, not
    # compute, dominates k-means on this corpus. Left un-spread.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    assign, cents = kmeans_lloyd(
        emb, k=KMEANS_K, iters=KMEANS_ITERS
    )
    stats = assign.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_members"),
        F.expr("sum(d2) div count(*)").cast("long").alias("mean_dist_q"),
    )
    l1 = cents.select(
        "cid",
        F.expr(
            "aggregate(transform(cv, x -> abs(x)), CAST(0 AS BIGINT), "
            "(acc, x) -> acc + x)"
        ).alias("centroid_l1_q"),
    )
    return (
        stats.join(l1, "cid")
        .select(
            F.col("cid").cast("long").alias("cid"),
            "n_members", "mean_dist_q", "centroid_l1_q",
        )
        .orderBy("cid")
    )


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                dim: int = EMB_DIM, src: str = "embeddings",
                open_with: bool = True) -> str:
    """The identical E/M loop unrolled as chained MATERIALIZED CTEs
    (DuckDB would otherwise inline each round's reference to the
    previous one and re-expand the chain exponentially — the k-core
    lesson). Assignment ties and integer means match the Spark side
    exactly; `div`/`//` both truncate toward zero (probed, including
    negatives)."""
    d2 = (
        "CAST(list_sum(list_transform(list_zip(q.qvec, c.cv), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )
    head = "WITH " if open_with else ", "
    parts = [f"""
{head}qv AS MATERIALIZED (
  SELECT vec_id AS sid,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qvec
  FROM {src}
),
c0 AS MATERIALIZED (
  SELECT sid AS cid, qvec AS cv FROM qv ORDER BY sid LIMIT {k}
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i} AS MATERIALIZED (
  SELECT sid, qvec, cid, d2 FROM (
    SELECT sid, qvec, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d2, cid) AS rn
    FROM (
      SELECT q.sid, q.qvec, c.cid, {d2} AS d2
      FROM qv q CROSS JOIN c{i - 1} c
    )
  ) WHERE rn = 1
),
c{i} AS MATERIALIZED (
  SELECT cid, list(qc ORDER BY dim) AS cv FROM (
    SELECT cid, dim, CAST(SUM(qvec[dim]) // COUNT(*) AS BIGINT) AS qc
    FROM a{i}, range(1, {dim} + 1) t(dim)
    GROUP BY cid, dim
  ) GROUP BY cid
)""")
    return "".join(parts)


def _kmeans_profile_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                        dim: int = EMB_DIM) -> str:
    return _kmeans_sql(k, iters, dim) + f""",
l1 AS (
  SELECT cid, CAST(list_sum(list_transform(cv, x -> abs(x))) AS BIGINT)
              AS centroid_l1_q
  FROM c{iters}
)
SELECT CAST(a.cid AS BIGINT) AS cid,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(a.d2) // COUNT(*) AS BIGINT) AS mean_dist_q,
       l1.centroid_l1_q
FROM a{iters} a JOIN l1 ON l1.cid = a.cid
GROUP BY a.cid, l1.centroid_l1_q
ORDER BY cid"""


QUERIES["kmeans_topic_clusters"] = kmeans_topic_clusters
ORACLES["kmeans_topic_clusters"] = _kmeans_profile_sql()


def kmeans_semdedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup exactly as the paper runs it (Abbas et al. 2023 §3:
    k-means FIRST, then within-cluster cosine prune) — the trained
    companion to ``semdedup_prune_stats``, whose clusters are the
    cheap lowest-id-seed assignment. The duplicate-injected corpus is
    clustered by four exact integer Lloyd's rounds
    (:func:`operators.similarity.kmeans_lloyd`), then every vector
    with a same-cluster lower-id twin at cosine >= 0.99 is pruned
    (similarity.semdedup_pairs_pruned, the keep-lowest-id rule). Per
    cluster: membership, prune count, and the exact integer sum of
    pruned ids — a content-addressed checksum of WHICH vectors were
    pruned. The DuckDB oracle replays the whole pipeline: four
    unrolled E/M rounds, then the pair prune.

    Scale: clustering as in ``kmeans_topic_clusters``; the prune's
    quadratic term is bounded by cluster size (the SemDeDup point) —
    at 10^9+ vectors you raise k to ~100k and every stage keeps the
    same shape."""
    from bottledwater_pg_spark.functions.vectors import norm_pre
    from bottledwater_pg_spark.operators.similarity import kmeans_lloyd

    # corpus not spread (parallel_scan): the k-means rounds dominate
    # this query and spreading the tiny corpus costs more in
    # per-round stage scheduling than it buys (see
    # kmeans_topic_clusters). The persisted ASSIGNMENT is spread
    # though: the shuffle-free E-step leaves it on the scan's
    # partitioning, and the quadratic within-cluster pair join below
    # would otherwise read a single-partition cache (measured 1.31x
    # before this repartition; 0.9x after, same-session A/B)
    corpus = embeddings_with_dups(spark, sf_dir)
    assign, _cents = kmeans_lloyd(corpus, k=KMEANS_K, iters=KMEANS_ITERS)
    assigned = persist_tracked(
        parallel_scan(
            assign.select(
                "sid", F.col("cid").alias("cent_id"), "qvec"
            ).withColumn("qnorm", norm_pre("qvec"))
        )
    )
    pruned = similarity.semdedup_pairs_pruned(assigned, COSINE_THRESHOLD)
    members = assigned.groupBy(F.col("cent_id").alias("cid")).agg(
        F.count("*").alias("n_members")
    )
    pstats = pruned.groupBy(F.col("cent_id").alias("cid")).agg(
        F.count("*").alias("n_pruned"),
        F.sum("pruned_id").alias("pruned_id_sum"),
    )
    return (
        members.join(pstats, "cid", "left")
        .select(
            F.col("cid").cast("long").alias("cid"),
            F.col("n_members").cast("long").alias("n_members"),
            F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
            F.coalesce("pruned_id_sum", F.lit(0))
            .cast("long")
            .alias("pruned_id_sum"),
        )
        .orderBy("cid")
    )


def _kmeans_semdedup_sql(iters: int = KMEANS_ITERS) -> str:
    dot_ab = (
        "CAST(list_sum(list_transform(list_zip(a.qvec, b.qvec), "
        "p -> p[1] * p[2])) AS BIGINT)"
    )
    return (
        EMB_CTE
        + _kmeans_sql(src="corpus", open_with=False)
        + f""",
qn2 AS MATERIALIZED (
  SELECT sid, cid, qvec,
         sqrt(CAST(list_sum(list_transform(qvec, x -> x * x)) AS DOUBLE))
           AS nrm
  FROM a{iters}
),
pruned AS (
  SELECT a.cid AS cid, b.sid AS pruned_id
  FROM qn2 a JOIN qn2 b ON a.cid = b.cid AND a.sid < b.sid
  WHERE CAST({dot_ab} AS DOUBLE) / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
  GROUP BY a.cid, b.sid
),
members AS (SELECT cid, COUNT(*) AS n_members FROM a{iters} GROUP BY cid),
pstats AS (
  SELECT cid, COUNT(*) AS n_pruned, SUM(pruned_id) AS pruned_id_sum
  FROM pruned GROUP BY cid
)
SELECT CAST(m.cid AS BIGINT) AS cid,
       CAST(m.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(p.n_pruned, 0) AS BIGINT) AS n_pruned,
       CAST(COALESCE(p.pruned_id_sum, 0) AS BIGINT) AS pruned_id_sum
FROM members m LEFT JOIN pstats p ON p.cid = m.cid
ORDER BY cid"""
    )


QUERIES["kmeans_semdedup_stats"] = kmeans_semdedup_stats
ORACLES["kmeans_semdedup_stats"] = _kmeans_semdedup_sql()

# trained-IVF pair registered here (after _kmeans_sql exists — the
# oracle string is built at import time from the unrolled chain)
QUERIES["ivf_trained_topk"] = ivf_trained_topk
ORACLES["ivf_trained_topk"] = _ivf_trained_sql()
QUERIES["ivf_trained_recall_vs_exact"] = ivf_trained_recall_vs_exact
ORACLES["ivf_trained_recall_vs_exact"] = _ann_recall_sql(
    IVF_TRAINED_RECALL_FLOOR_BP
)
QUERIES["ivfpq_trained_topk"] = ivfpq_trained_topk
ORACLES["ivfpq_trained_topk"] = _ivfpq_trained_sql()
QUERIES["ivfpq_trained_recall_vs_exact"] = ivfpq_trained_recall_vs_exact
ORACLES["ivfpq_trained_recall_vs_exact"] = _ann_recall_sql(
    IVFPQ_TRAINED_RECALL_FLOOR_BP
)


# ------------------------------------------ Gopher rule filter + quota cap

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3   # mean word length in [3, 10]
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MIN_DISTINCT_STOPWORDS = 2
GOPHER_TTR_NUM = 3             # type-token ratio >= 3/10 required
GOPHER_TTR_DEN = 10


def with_gopher_flags(df: DataFrame, text_col: str = "text",
                      min_words: int = GOPHER_MIN_WORDS,
                      max_words: int = GOPHER_MAX_WORDS) -> DataFrame:
    """``df`` plus the four Gopher rule fail flags and the combined
    ``gopher_ok`` boolean — the SHARED rule kernel: the batch rollup
    (:func:`gopher_quality_flags`) aggregates these, and the streaming
    ingest gate (streaming/stream.gopher_gate) filters on them, so the
    two paths can never drift apart rule-by-rule. Stateless narrow
    expressions only (tokenize once into a bound attribute, then four
    array reads — no explode, no shuffle, no state), hence legal on a
    streaming DataFrame unchanged. The word-count bounds are
    parameters because deployments tune them (Rae et al. 2021 use
    50/100k for web pages); the other thresholds are the module
    constants."""
    from bottledwater_pg_spark.functions.text import STOPWORDS_EN

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    # tokenize ONCE in a prior projection; see gopher_quality_flags
    d = df.withColumn(
        "_t", F.expr(f"split(trim({text_col}), '\\\\s+')")
    ).withColumns(
        {
            "_n_tok": F.expr("size(_t)"),
            "_n_chr": F.expr(
                "aggregate(transform(_t, x -> length(x)), 0, "
                "(acc, x) -> acc + x)"
            ),
            "_n_stop": F.expr(
                f"size(array_intersect(array_distinct(_t), "
                f"array({stoplist})))"
            ),
            "_n_types": F.expr("size(array_distinct(_t))"),
        }
    )
    fail_wc = (F.col("_n_tok") < min_words) | (
        F.col("_n_tok") > max_words
    )
    fail_wl = (
        F.col("_n_chr") < GOPHER_MIN_MEAN_WORD_LEN * F.col("_n_tok")
    ) | (F.col("_n_chr") > GOPHER_MAX_MEAN_WORD_LEN * F.col("_n_tok"))
    fail_sw = F.col("_n_stop") < GOPHER_MIN_DISTINCT_STOPWORDS
    fail_ttr = (
        F.col("_n_types") * GOPHER_TTR_DEN
        < F.col("_n_tok") * GOPHER_TTR_NUM
    )
    return d.withColumns(
        {
            "f_wc": fail_wc,
            "f_wl": fail_wl,
            "f_sw": fail_sw,
            "f_ttr": fail_ttr,
            "gopher_ok": ~(fail_wc | fail_wl | fail_sw | fail_ttr),
        }
    ).drop("_t", "_n_tok", "_n_chr", "_n_stop", "_n_types")


def gopher_quality_flags(spark: SparkSession, sf_dir: str,
                         corpus: DataFrame | None = None) -> DataFrame:
    """Gopher rule-based quality filtering (Rae et al. 2021, table A1
    — the standard pretraining pre-filter) rolled up per source: how
    many docs fail each rule, and how many pass all of them. Rules
    re-expressed over the engine's parity-proven token primitives:

    - word count within [50, 100k] (the fixture's word-soup docs are
      all well under 100k — the max bound is computed, not pruned)
    - mean word length within [3, 10], tested by integer
      cross-multiplication (3*n_tok <= total_chars <= 10*n_tok) so no
      float threshold crosses an engine boundary
    - at least 2 DISTINCT stopwords from the engine's stoplist (the
      Gopher "stop word" rule; catches non-language token streams)
    - type-token ratio >= 0.3 (10*distinct >= 3*tokens) — the
      word-soup analog of Gopher's duplicate-word-fraction family
      (doc_repetition_stats covers positional repetition separately)

    Symbol/bullet/ellipsis line rules are omitted: the synthetic
    corpus has no newlines or symbols, so they would be
    constant-zero columns — the four live rules are the ones this
    fixture can falsify. Per-doc work is narrow array expressions
    (no explode, no shuffle until the per-source rollup — one
    partial-agg shuffle on source, the scale shape of every
    per-source stat here). The rule kernel itself lives in
    :func:`with_gopher_flags`, shared with the streaming ingest gate
    (streaming/stream.gopher_gate) so batch and streaming apply
    identical rules by construction."""
    docs = (
        corpus
        if corpus is not None
        else load_table(spark, sf_dir, "documents")
    )
    return (
        with_gopher_flags(docs.select("source", "text"))
        .select(
            "source",
            F.col("f_wc").cast("long").alias("f_wc"),
            F.col("f_wl").cast("long").alias("f_wl"),
            F.col("f_sw").cast("long").alias("f_sw"),
            F.col("f_ttr").cast("long").alias("f_ttr"),
            F.col("gopher_ok").cast("long").alias("ok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f_wc").alias("n_fail_wordcount"),
            F.sum("f_wl").alias("n_fail_wordlen"),
            F.sum("f_sw").alias("n_fail_stopwords"),
            F.sum("f_ttr").alias("n_fail_ttr"),
            F.sum("ok").alias("n_pass"),
        )
        .orderBy("source")
    )


def _gopher_sql() -> str:
    from bottledwater_pg_spark.functions.text import STOPWORDS_EN

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
WITH d AS (
  SELECT source,
         len({toks}) AS n_tok,
         list_sum(list_transform({toks}, x -> length(x))) AS n_chr,
         len(list_intersect(list_distinct({toks}), [{stoplist}])) AS n_stop,
         len(list_distinct({toks})) AS n_types
  FROM documents
), f AS (
  SELECT source,
         CAST(n_tok < {GOPHER_MIN_WORDS} OR n_tok > {GOPHER_MAX_WORDS}
              AS BIGINT) AS f_wc,
         CAST(n_chr < {GOPHER_MIN_MEAN_WORD_LEN} * n_tok
              OR n_chr > {GOPHER_MAX_MEAN_WORD_LEN} * n_tok
              AS BIGINT) AS f_wl,
         CAST(n_stop < {GOPHER_MIN_DISTINCT_STOPWORDS} AS BIGINT) AS f_sw,
         CAST(n_types * {GOPHER_TTR_DEN} < n_tok * {GOPHER_TTR_NUM}
              AS BIGINT) AS f_ttr
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_wc) AS BIGINT) AS n_fail_wordcount,
       CAST(SUM(f_wl) AS BIGINT) AS n_fail_wordlen,
       CAST(SUM(f_sw) AS BIGINT) AS n_fail_stopwords,
       CAST(SUM(f_ttr) AS BIGINT) AS n_fail_ttr,
       CAST(SUM(CASE WHEN f_wc + f_wl + f_sw + f_ttr = 0 THEN 1
                     ELSE 0 END) AS BIGINT) AS n_pass
FROM f GROUP BY source ORDER BY source
"""


SOURCE_QUOTA_CAP = 20  # bites at sf0.01 (25 docs/source) and above


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping (the RefinedWeb/C4 per-domain cap):
    keep at most SOURCE_QUOTA_CAP docs per source, selected by lowest
    content fingerprint — a deterministic stand-in for the uniform
    draw (md5 of normalized text is uniform over content and
    reproducible in both engines; ties broken by doc_id). Emits per
    source the kept/dropped counts and the exact integer sum of kept
    doc_ids — a content-addressed checksum of WHICH docs survived,
    same discipline as kmeans_semdedup_stats' pruned_id_sum.

    Scale: one rank-filter per source (window over the quota key) —
    the partition key is the source/domain, which is how per-domain
    caps shard at warehouse scale; a skewed mega-domain is one
    window partition, the known cost of exact per-key top-N (salt +
    re-rank if a single domain outgrows an executor)."""
    from pyspark.sql import Window

    from bottledwater_pg_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(fingerprint("text"), "doc_id")
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("rn") <= SOURCE_QUOTA_CAP).cast("long")
            ).alias("n_kept"),
            F.sum(
                (F.col("rn") > SOURCE_QUOTA_CAP).cast("long")
            ).alias("n_dropped"),
            F.sum(
                F.when(F.col("rn") <= SOURCE_QUOTA_CAP, F.col("doc_id"))
                .otherwise(F.lit(0))
            ).cast("long").alias("kept_id_sum"),
        )
        .orderBy("source")
    )


def _source_quota_sql() -> str:
    from bottledwater_pg_spark.functions.text import sql_fingerprint

    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {sql_fingerprint('text')}, doc_id)
           AS rn
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {SOURCE_QUOTA_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > {SOURCE_QUOTA_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rn <= {SOURCE_QUOTA_CAP} THEN doc_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY source ORDER BY source
"""


QUERIES["gopher_quality_flags"] = gopher_quality_flags
ORACLES["gopher_quality_flags"] = _gopher_sql()
QUERIES["source_quota_sample"] = source_quota_sample
ORACLES["source_quota_sample"] = _source_quota_sql()


# ---------------------- Gopher n-gram repetition rules (Rae A1 §2)

#: Rae et al. 2021 table A1 repetition thresholds (basis points of
#: character mass): a doc FAILS a rule when the fraction exceeds it.
GOPHER_TOP2_MAX_BP = 2000   # top 2-gram char fraction <= 0.20
GOPHER_TOP3_MAX_BP = 1800   # top 3-gram char fraction <= 0.18
GOPHER_DUP5_MAX_BP = 1500   # dup 5-gram char fraction <= 0.15


def docs_with_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus one synthetic HIGHLY-REPETITIVE twin per source:
    for every doc with ``doc_id % 25 == 0`` (one per source at the
    shipped fixtures) and at least two tokens, a twin at
    ``doc_id + 300000`` whose text is the doc's first two tokens
    repeated 30x — char mass concentrated in a single 2-gram, every
    5-gram duplicated, so the twin fails all three Gopher repetition
    bounds while the low-repetition originals fail none."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    rep = (
        docs.select(
            "doc_id", "source",
            F.expr("split(trim(text), '\\\\s+')").alias("toks"),
        )
        .filter((F.col("doc_id") % 25 == 0) & (F.expr("size(toks) >= 2")))
        .select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            "source",
            F.expr(
                "trim(repeat(concat_ws(' ', slice(toks, 1, 2)) || ' ', 30))"
            ).alias("text"),
        )
    )
    return docs.unionByName(rep)


def gopher_repetition_ngram_flags(spark: SparkSession, sf_dir: str,
                                  corpus: DataFrame | None = None,
                                  ) -> DataFrame:
    """Gopher's N-GRAM repetition rules (Rae et al. 2021 table A1 —
    the repetition family `gopher_quality_flags` deliberately leaves
    to this operator; `doc_repetition_stats` covers the TOKEN-level
    top/dup shares): per source, how many docs exceed each
    char-mass repetition bound, and how many pass all three —

    - top 2-gram / top 3-gram char fraction: the char mass of the
      heaviest n-gram (count x gram chars — the paper's
      most-frequent-n-gram rule with char-mass tie-breaking folded
      in, which keeps the statistic deterministic without a string
      tie-break) over the char mass of all n-gram instances,
      bounded at 20% / 18%;
    - duplicate 5-gram char fraction: char mass of instances whose
      gram occurs >= 2 times in the doc, bounded at 15%.

    All comparisons integer cross-multiplied in basis points (no
    float crosses engines); docs too short to form an n-gram pass
    that rule vacuously (0-mass numerator). The fixture's word-soup
    docs are all low-repetition (every rule passes — verified
    constant-zero at sf0.001/0.01), so the default corpus INJECTS one
    synthetic highly-repetitive twin per source (first two tokens
    repeated 30x, doc_id + 300000 — the injected-recall pattern): the
    twins must fail all three rules, the originals none, so the
    oracle certifies both sides of every threshold. Scale shape: one
    instance-level explode + (doc, gram) partial-agg per n — the
    winnowing/contamination gram-shuffle family — then one per-source
    rollup; nothing collects."""
    docs = (
        corpus
        if corpus is not None
        else docs_with_repetition(spark, sf_dir)
    )
    toks = docs.select(
        "doc_id", "source",
        F.expr("split(trim(text), '\\\\s+')").alias("toks"),
    )

    def gram_mass(n: int, top: bool) -> DataFrame:
        """(doc_id, num, tot): char mass of the heaviest gram (top)
        or of all duplicated grams (not top), over total instance
        mass, for n-grams of width n. Instance-level grams — NOT the
        distinct word_shingles — because repetition is the signal."""
        g = toks.filter(F.expr(f"size(toks) >= {n}")).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}), "
                    f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
                )
            ).alias("gram"),
        )
        per_gram = g.groupBy("doc_id", "gram").agg(
            (F.count("*") * F.length("gram")).alias("mass"),
            F.count("*").alias("cnt"),
        )
        num = (
            F.max("mass")
            if top
            else F.sum(F.when(F.col("cnt") >= 2, F.col("mass")).otherwise(0))
        )
        return per_gram.groupBy("doc_id").agg(
            num.alias("num"), F.sum("mass").alias("tot")
        )

    t2 = gram_mass(2, top=True)
    t3 = gram_mass(3, top=True)
    d5 = gram_mass(5, top=False)

    def fail(numc: str, totc: str, bp: int):
        return (
            F.coalesce(F.col(numc), F.lit(0)) * 10000
            > F.coalesce(F.col(totc), F.lit(0)) * bp
        )

    flagged = (
        toks.select("doc_id", "source")
        .join(t2.withColumnsRenamed({"num": "n2", "tot": "t2"}), "doc_id",
              "left")
        .join(t3.withColumnsRenamed({"num": "n3", "tot": "t3"}), "doc_id",
              "left")
        .join(d5.withColumnsRenamed({"num": "n5", "tot": "t5"}), "doc_id",
              "left")
        .select(
            "source",
            fail("n2", "t2", GOPHER_TOP2_MAX_BP).cast("long").alias("f2"),
            fail("n3", "t3", GOPHER_TOP3_MAX_BP).cast("long").alias("f3"),
            fail("n5", "t5", GOPHER_DUP5_MAX_BP).cast("long").alias("f5"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f2").alias("n_fail_top2gram"),
            F.sum("f3").alias("n_fail_top3gram"),
            F.sum("f5").alias("n_fail_dup5gram"),
            F.sum(
                (
                    (F.col("f2") + F.col("f3") + F.col("f5")) == 0
                ).cast("long")
            ).alias("n_pass"),
        )
        .orderBy("source")
    )


def _gopher_rep_gram_cte(n: int, name: str) -> str:
    return f"""{name}_g AS (
  SELECT doc_id,
         array_to_string(toks[i : i + {n - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS r(i)
), {name}_pg AS (
  SELECT doc_id, gram, COUNT(*) * length(gram) AS mass,
         COUNT(*) AS cnt
  FROM {name}_g GROUP BY doc_id, gram
)"""


def _gopher_rep_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
),
inj AS (
  SELECT doc_id + 300000 AS doc_id, source,
         trim(repeat(array_to_string(
           string_split_regex(trim(text), '\\s+')[1:2], ' ') || ' ',
           30)) AS text
  FROM documents
  WHERE doc_id % 25 = 0
    AND len(string_split_regex(trim(text), '\\s+')) >= 2
),
corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM inj
),
t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks
  FROM corpus
),
{_gopher_rep_gram_cte(2, "g2")},
g2d AS (
  SELECT doc_id, MAX(mass) AS num, SUM(mass) AS tot
  FROM g2_pg GROUP BY doc_id
),
{_gopher_rep_gram_cte(3, "g3")},
g3d AS (
  SELECT doc_id, MAX(mass) AS num, SUM(mass) AS tot
  FROM g3_pg GROUP BY doc_id
),
{_gopher_rep_gram_cte(5, "g5")},
g5d AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt >= 2 THEN mass ELSE 0 END) AS num,
         SUM(mass) AS tot
  FROM g5_pg GROUP BY doc_id
),
f AS (
  SELECT t.source,
         CAST(COALESCE(g2d.num, 0) * 10000
              > COALESCE(g2d.tot, 0) * {GOPHER_TOP2_MAX_BP}
              AS BIGINT) AS f2,
         CAST(COALESCE(g3d.num, 0) * 10000
              > COALESCE(g3d.tot, 0) * {GOPHER_TOP3_MAX_BP}
              AS BIGINT) AS f3,
         CAST(COALESCE(g5d.num, 0) * 10000
              > COALESCE(g5d.tot, 0) * {GOPHER_DUP5_MAX_BP}
              AS BIGINT) AS f5
  FROM t
  LEFT JOIN g2d USING (doc_id)
  LEFT JOIN g3d USING (doc_id)
  LEFT JOIN g5d USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f2) AS BIGINT) AS n_fail_top2gram,
       CAST(SUM(f3) AS BIGINT) AS n_fail_top3gram,
       CAST(SUM(f5) AS BIGINT) AS n_fail_dup5gram,
       CAST(SUM(CASE WHEN f2 + f3 + f5 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass
FROM f GROUP BY source ORDER BY source
"""


QUERIES["gopher_repetition_ngram_flags"] = gopher_repetition_ngram_flags
ORACLES["gopher_repetition_ngram_flags"] = _gopher_rep_sql()


# ------------------------- SQ8 scalar-quantization ANN (FAISS SQ8)

SQ_ANN_RECALL_FLOOR_BP = 8500


def sq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via 8-bit scalar quantization + asymmetric
    distance (similarity.topk_sq — the FAISS ``SQ8`` recipe):
    per-dimension [min, max] grids from exact int aggregation, 8-bit
    floor-div codes, 255x-scaled integer reconstruction, full ADC
    scan. SQ is the compression rung of the quantization ladder the
    repo now covers end to end (exact -> SRP-LSH -> IVF ->
    IVF-trained -> PQ -> IVF-PQ -> SQ8): 8x memory for ~zero recall
    loss, vs PQ's 32x for measurable loss. Every step is exact-int /
    pinned-tie, so DuckDB replays the ENTIRE train + encode + scan —
    fully hash-oracled (recall certified by
    ``sq_ann_recall_vs_exact``: floor 85%, measured 97-99% across
    sf0.001/0.01/0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.topk_sq(emb, queries, k=5)


def sq_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``sq_ann_topk``:
    recall vs brute force floored at 85% — the highest floor in the
    ANN family, because SQ8's per-element error is bounded by one
    grid step (span/255 ~ 0.8% of the value range) rather than a
    codebook's cell radius."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        sq_ann_topk(spark, sf_dir),
        SQ_ANN_RECALL_FLOOR_BP,
    )


def _sq_ann_sql() -> str:
    """Full replay of the SQ8 index: per-dim min/max grid (parallel
    unnest — DuckDB aligns equal-length unnests positionally), the
    same fused encode-reconstruct indexed lambda as
    similarity._SQ_RECON (DuckDB ``//`` and Spark ``DIV`` both
    truncate; operands are non-negative so both floor), then the
    shared exact-int ADC scan and (cos DESC, neighbor_id) rank."""
    return f"""
WITH {_QN_CTE},
dims AS (
  SELECT unnest(range(1, len(qvec) + 1)) AS d, unnest(qvec) AS v FROM qv
),
dimstats AS (
  SELECT d, min(v) AS qmin, max(v) AS qmax FROM dims GROUP BY d
),
stats AS (
  SELECT list(qmin ORDER BY d) AS qmin_arr,
         list(qmax ORDER BY d) AS qmax_arr
  FROM dimstats
),
rec AS (
  SELECT sid,
         list_transform(qvec, (x, i) -> CASE
           WHEN qmax_arr[i] = qmin_arr[i] THEN qmin_arr[i] * 255
           ELSE qmin_arr[i] * 255 + ((x - qmin_arr[i]) * 255)
                // (qmax_arr[i] - qmin_arr[i])
                * (qmax_arr[i] - qmin_arr[i])
           END) AS recon
  FROM qn, stats
),
recn AS (
  SELECT sid, recon,
         sqrt(CAST(CAST(list_sum(list_transform(recon, v -> v * v))
              AS BIGINT) AS DOUBLE)) AS rn
  FROM rec
),
scored AS (
  SELECT q.sid AS query_id, c.sid AS neighbor_id,
         CAST(CAST(list_sum(list_transform(list_zip(q.qvec, c.recon),
              p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         / (q.n * c.rn) AS cos
  FROM qn q, recn c
  WHERE q.sid < 20 AND c.sid <> q.sid
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
"""


QUERIES["sq_ann_topk"] = sq_ann_topk
ORACLES["sq_ann_topk"] = _sq_ann_sql()
QUERIES["sq_ann_recall_vs_exact"] = sq_ann_recall_vs_exact
ORACLES["sq_ann_recall_vs_exact"] = _ann_recall_sql(
    SQ_ANN_RECALL_FLOOR_BP
)


# -------------------- containment near-dup (Broder 1997, asymmetric)

CONTAIN_MOD = 20
CONTAIN_THRESHOLD_BP = 8000


def docs_with_contained_dups(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Corpus + one injected QUOTE-EXPANSION per ``doc_id %
    CONTAIN_MOD == 0``: the injected doc is the original's full text
    followed by the NEXT doc's full text (doc_ids are contiguous, so
    the inner join drops only the last doc). Every shingle of the
    original appears in the injected container (it is a contiguous
    token prefix), so containment(orig -> injected) = 1.0 while
    Jaccard ~ |orig| / (|orig| + |next|) — well under the 0.8 family
    threshold whenever the neighbor is comparably sized: the pair the
    Jaccard family is structurally blind to."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"),
                      F.col("text").alias("pad"))
    inj = (
        docs.filter(F.col("doc_id") % CONTAIN_MOD == 0)
        .join(nxt, "doc_id")
        .select(
            (F.col("doc_id") + 400000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("pad")).alias("text"),
        )
    )
    return docs.unionByName(inj)


DOCS_CONTAIN_CTE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + 400000 AS doc_id, d.text || ' ' || nx.text AS text
  FROM documents d
  JOIN documents nx ON nx.doc_id = d.doc_id + 1
  WHERE d.doc_id % {CONTAIN_MOD} = 0
)
"""


def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup by shingle containment >= 0.80
    (dedup.containment_prefix_pairs): catches short-doc-quoted-in-
    long-doc duplication that every Jaccard operator above misses by
    construction. Exact (prefix blocking has no false negatives), so
    the brute-force SQL twin returns the identical pair set —
    fully hash-oracled."""
    return dedup.containment_prefix_pairs(
        docs_with_contained_dups(spark, sf_dir), CONTAIN_THRESHOLD_BP
    )


CONTAINMENT_SQL = DOCS_CONTAIN_CTE + f"""
, sh AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid <> b.sid
  GROUP BY a.sid, b.sid
)
SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
       CAST(inter AS DOUBLE) / sa.sz AS containment
FROM inter
JOIN sizes sa ON sa.sid = a_id
JOIN sizes sb ON sb.sid = b_id
WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND a_id < b_id))
  AND inter * 10000 >= sa.sz * {CONTAIN_THRESHOLD_BP}
"""

QUERIES["containment_near_dup"] = containment_near_dup
ORACLES["containment_near_dup"] = CONTAINMENT_SQL


# Boilerplate skew cell (r13): a license footer in 20% of docs plus a
# cohort of near-empty pure-footer pages — the adversarial shape where
# uncapped containment output legitimately explodes as
# O(pages x footer-carriers) (every pure-footer page IS contained in
# every carrier; SCALE.md r13 skew ladder measures the m*p*N law).
CONTAIN_FOOTER = (
    "this page is licensed under the apache license version two "
    "point zero see the license file for details"
)
CONTAIN_FOOTER_MOD = 5  # footer on doc_id % 5 == 0 (p = 20%)
CONTAIN_BOILER_PAGES = 10  # near-empty pure-footer pages
CONTAIN_DF_CAP = 40  # organic shingle dfs stay far below this


def docs_with_boilerplate_skew(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """documents + the footer appended to every doc_id % 5 == 0 doc +
    CONTAIN_BOILER_PAGES identical pure-footer pages (ids 500000+)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    skewed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % CONTAIN_FOOTER_MOD == 0,
            F.concat(F.col("text"), F.lit(" " + CONTAIN_FOOTER)),
        ).otherwise(F.col("text")),
    )
    boiler = spark.range(CONTAIN_BOILER_PAGES).select(
        (F.col("id") + 500000).alias("doc_id"),
        F.lit(CONTAIN_FOOTER).alias("text"),
    )
    return skewed.unionByName(boiler)


def containment_near_dup_capped(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Containment near-dup under hot-shingle skew with the df_cap
    stopwording escape hatch: footer shingles (df ~ 0.2N + pages)
    exceed the cap and leave the shingle universe, so the pure-footer
    pages drop out and the output is exactly the organic containment
    pairs — EXACT over the df<=cap universe, hence fully hash-oracled
    (the twin applies the same df filter in SQL). Uncapped, the same
    corpus emits O(pages x 0.2N) true-but-useless boilerplate pairs —
    the semantic blow-up the SCALE.md r13 skew ladder measures."""
    return dedup.containment_prefix_pairs(
        docs_with_boilerplate_skew(spark, sf_dir), CONTAIN_THRESHOLD_BP,
        df_cap=CONTAIN_DF_CAP,
    )


CONTAINMENT_CAPPED_SQL = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CONTAIN_FOOTER_MOD} = 0
              THEN text || ' {CONTAIN_FOOTER}' ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT 500000 + i AS doc_id, '{CONTAIN_FOOTER}' AS text
  FROM range({CONTAIN_BOILER_PAGES}) AS t(i)
),
sh0 AS (
  SELECT doc_id AS sid, unnest({_SHINGLES}) AS shingle FROM corpus
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING COUNT(*) <= {CONTAIN_DF_CAP}
),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT sid, COUNT(*) AS sz FROM sh GROUP BY sid),
inter AS (
  SELECT a.sid AS a_id, b.sid AS b_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid <> b.sid
  GROUP BY a.sid, b.sid
)
SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
       CAST(inter AS DOUBLE) / sa.sz AS containment
FROM inter
JOIN sizes sa ON sa.sid = a_id
JOIN sizes sb ON sb.sid = b_id
WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND a_id < b_id))
  AND inter * 10000 >= sa.sz * {CONTAIN_THRESHOLD_BP}
"""

QUERIES["containment_near_dup_capped"] = containment_near_dup_capped
ORACLES["containment_near_dup_capped"] = CONTAINMENT_CAPPED_SQL


# ------------------- UniMax language budgets (Chung et al. 2023)

UNIMAX_EPOCH_CAP = 3
# budget = 2.5x the corpus's total tokens: small languages hit the
# 3-epoch cap, the largest can't be filled within its fair share and
# absorbs the slack — both sides of the waterfill exercised.
UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 5, 2


def unimax_language_budgets(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """UniMax per-language token allocations
    (sampling.unimax_allocations) over the documents table: languages
    are budgeted so none exceeds UNIMAX_EPOCH_CAP epochs and the
    capped languages' unused share water-fills into the large ones —
    the multilingual-mixture rule that replaces alpha-temperature
    sampling (``alpha_mixture_weights`` is the temperature twin).
    All-integer waterfill — fully hash-oracled. The total-token
    budget is derived from a 1-row aggregate collect (bounded
    metadata, same discipline as the BPE step loop)."""
    from bottledwater_pg_spark.functions.text import token_count
    from bottledwater_pg_spark.operators.sampling import (
        unimax_allocations,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", token_count("text").alias("ntok")
    )
    sizes = docs.groupBy("lang").agg(
        F.sum("ntok").cast("long").alias("n_tokens")
    )
    total = sizes.agg(F.sum("n_tokens")).collect()[0][0]
    budget = total * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    return unimax_allocations(
        sizes, budget, UNIMAX_EPOCH_CAP, "lang", "n_tokens"
    ).orderBy("lang")


def _unimax_sql() -> str:
    from bottledwater_pg_spark.operators.sampling import (
        sql_unimax_allocations,
    )

    budget = (f"(SELECT SUM(n_tokens) FROM sizes) "
              f"* {UNIMAX_BUDGET_NUM} // {UNIMAX_BUDGET_DEN}")
    return f"""
WITH sizes AS (
  SELECT lang,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
{sql_unimax_allocations(budget, UNIMAX_EPOCH_CAP)}
ORDER BY lang
"""


QUERIES["unimax_language_budgets"] = unimax_language_budgets
ORACLES["unimax_language_budgets"] = _unimax_sql()


# ---------------- C4 line-level filters (Raffel et al. 2020 §2.2)

C4_LINE_TOKENS = 8         # fixture: synthetic lines of 8 tokens
C4_MIN_LINE_WORDS = 5      # C4: keep lines with >= 5 words
C4_MIN_KEPT_LINES = 3      # C4: drop pages with < 3 kept sentences
C4_LOREM_MOD = 25          # fixture: inject 'lorem ipsum' per 25 docs
C4_BRACE_MOD = 30          # fixture: inject '{' per 30 docs

_C4_LINES = (
    "transform(sequence(0, cast(ceil(size(toks) / {w}.0) as int) - 1), "
    "i -> array_join(slice(toks, i * {w} + 1, {w}), ' '))"
).format(w=C4_LINE_TOKENS)

# deterministic ~50/50 terminal punctuation: '.' iff the line's md5
# leads with hex 0-7 — both engines compute the identical digest
_C4_PUNCT = (
    "transform({lines}, l -> CASE WHEN substring(md5(l), 1, 1) < '8' "
    "THEN concat(l, '.') ELSE l END)"
)


def docs_with_c4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 fixture: the corpus has no natural line structure (word
    streams, zero punctuation — probed), so structure is INJECTED
    deterministically: the two page-level drop markers are appended
    as real tokens on disjoint doc_id residues ('lorem ipsum' per
    %25, '{{' per %30 — detected downstream by substring search on
    the page text, exactly C4's rule, not by trusting the fixture),
    then tokens are chunked 8 per line and each line terminated with
    '.' iff its md5 leads 0-7 (~half). Every C4 rule therefore sees
    both passing and failing inputs, the Gopher-fixture discipline.
    Returns (doc_id, source, lines array<string>, has_brace,
    has_lorem)."""
    from bottledwater_pg_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("tokens_raw")
    ).select(
        "doc_id",
        "source",
        F.expr(
            "concat("
            f"  tokens_raw,"
            f"  CASE WHEN doc_id % {C4_LOREM_MOD} = 0"
            "        THEN array('lorem', 'ipsum') ELSE array() END,"
            f"  CASE WHEN doc_id % {C4_BRACE_MOD} = 0"
            "        THEN array('{') ELSE array() END)"
        ).alias("toks"),
    )
    lines = _C4_PUNCT.format(lines=_C4_LINES)
    has_brace, has_lorem = c4_marker_exprs("array_join(toks, ' ')")
    return docs.select(
        "doc_id",
        "source",
        F.expr(lines).alias("lines"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
    )


def c4_marker_exprs(page: str):
    """``(has_brace, has_lorem)`` page-level drop-marker columns over
    a page SQL expression — C4's verbatim-substring rule, so the
    match is case-SENSITIVE ('Lorem Ipsum' does not trip it), exactly
    like the DuckDB oracle's ``contains``. SHARED by the batch
    fixture (:func:`docs_with_c4_lines`) and the streaming
    ``c4_gate`` so the casing rule cannot drift between the twins
    (a lowercasing gate would drop pages the batch rule keeps)."""
    return (
        F.expr(f"contains({page}, '{{')"),
        F.expr(f"contains({page}, 'lorem ipsum')"),
    )


def c4_kept_lines_expr(lines_col: str = "lines") -> str:
    """The line-level C4 keep rule as a SQL array expression: lines
    ending in terminal punctuation with >= C4_MIN_LINE_WORDS words.
    SHARED between the batch stats query and the streaming
    ``c4_gate`` so the two rule sets cannot drift."""
    return (
        f"filter({lines_col}, l -> right(l, 1) IN ('.', '!', '?') "
        f"AND size(split(l, ' ')) >= {C4_MIN_LINE_WORDS})"
    )


def with_c4_verdicts(docs: DataFrame) -> DataFrame:
    """Adds the C4 page verdicts to a frame carrying (lines,
    has_brace, has_lorem): kept-line stats (narrow array expressions
    — no explode, no shuffle), then the three page outcomes
    (dropped_marker / dropped_few_lines / kept_doc). The shared rule
    kernel behind both the batch stats query and the streaming
    gate."""
    kept = c4_kept_lines_expr("lines")
    return docs.withColumns({
        "n_lines": F.size("lines").cast("long"),
        "c4_kept_lines": F.expr(kept),
    }).withColumns({
        "n_kept_lines": F.size("c4_kept_lines").cast("long"),
        "kept_chars": F.expr(
            "aggregate(c4_kept_lines, CAST(0 AS BIGINT), "
            "(acc, l) -> acc + length(l))"
        ),
        "dropped_marker":
            (F.col("has_brace") | F.col("has_lorem")).cast("long"),
    }).withColumn(
        "dropped_few_lines",
        ((F.col("dropped_marker") == 0)
         & (F.col("n_kept_lines") < C4_MIN_KEPT_LINES)).cast("long"),
    ).withColumn(
        "kept_doc",
        ((F.col("dropped_marker") == 0)
         & (F.col("dropped_few_lines") == 0)).cast("long"),
    )


def c4_line_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning stage (Raffel et al. 2020 §2.2) as one
    aggregation: keep lines ending in terminal punctuation with >=
    C4_MIN_LINE_WORDS words; drop pages containing '{' or 'lorem
    ipsum' or with < C4_MIN_KEPT_LINES kept lines; report per source
    the line- and page-level carnage plus chars surviving. Rule
    kernel shared with the streaming ``c4_gate``
    (:func:`with_c4_verdicts`), the Gopher-gate discipline.
    All-integer outputs."""
    per_doc = with_c4_verdicts(docs_with_c4_lines(spark, sf_dir))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dropped_marker").cast("long")
            .alias("n_dropped_marker"),
            F.sum("dropped_few_lines").cast("long")
            .alias("n_dropped_few_lines"),
            F.sum("kept_doc").cast("long").alias("n_docs_kept"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum(F.col("n_kept_lines") * F.col("kept_doc"))
            .cast("long").alias("n_lines_kept"),
            F.sum(F.col("kept_chars") * F.col("kept_doc"))
            .cast("long").alias("n_chars_kept"),
        )
        .orderBy("source")
    )


def _c4_sql() -> str:
    w = C4_LINE_TOKENS
    toks = (
        "list_concat(list_concat(string_split_regex(trim(text), '\\s+'), "
        f"CASE WHEN doc_id % {C4_LOREM_MOD} = 0 "
        "THEN ['lorem', 'ipsum'] ELSE [] END), "
        f"CASE WHEN doc_id % {C4_BRACE_MOD} = 0 "
        "THEN ['{'] ELSE [] END)"
    )
    lines = (
        f"list_transform(range(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT)), "
        f"i -> array_to_string((toks)[i * {w} + 1 : i * {w} + {w}], ' '))"
    )
    punct = (
        f"list_transform({lines}, l -> CASE WHEN substring(md5(l), 1, 1) "
        "< '8' THEN l || '.' ELSE l END)"
    )
    kept = (
        "list_filter(lines, l -> right(l, 1) IN ('.', '!', '?') "
        f"AND len(string_split(l, ' ')) >= {C4_MIN_LINE_WORDS})"
    )
    return f"""
WITH toked AS (
  SELECT doc_id, source, {toks} AS toks FROM documents
),
paged AS (
  SELECT doc_id, source, {punct} AS lines,
         contains(array_to_string(toks, ' '), '{{') AS has_brace,
         contains(array_to_string(toks, ' '), 'lorem ipsum') AS has_lorem
  FROM toked
),
per_doc AS (
  SELECT source,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len({kept}) AS BIGINT) AS n_kept_lines,
         CAST(COALESCE(list_sum(list_transform({kept},
              l -> length(l))), 0) AS BIGINT) AS kept_chars,
         CAST(has_brace OR has_lorem AS BIGINT) AS dropped_marker,
         CAST(NOT (has_brace OR has_lorem)
              AND len({kept}) < {C4_MIN_KEPT_LINES} AS BIGINT)
           AS dropped_few_lines
  FROM paged
),
flagged AS (
  SELECT *,
         CAST(dropped_marker = 0 AND dropped_few_lines = 0 AS BIGINT)
           AS kept_doc
  FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dropped_marker) AS BIGINT) AS n_dropped_marker,
       CAST(SUM(dropped_few_lines) AS BIGINT) AS n_dropped_few_lines,
       CAST(SUM(kept_doc) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(n_kept_lines * kept_doc) AS BIGINT) AS n_lines_kept,
       CAST(SUM(kept_chars * kept_doc) AS BIGINT) AS n_chars_kept
FROM flagged GROUP BY source ORDER BY source
"""


QUERIES["c4_line_filter_stats"] = c4_line_filter_stats
ORACLES["c4_line_filter_stats"] = _c4_sql()


# ------------- Matryoshka prefix-dim funnel (Kusupati et al. 2022)

MRL_PREFIX_DIM = 32
MRL_REFINE = 150
MRL_ANN_RECALL_FLOOR_BP = 7000


def mrl_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive retrieval over prefix dimensions (similarity.topk_mrl,
    the MRL funnel): the prefix slices are ENCODED ONCE
    (similarity.mrl_encode) and persisted as their own parquet table
    — the deployed index shape — so the shortlist scan physically
    reads a 32-of-64-dim stored column (2x narrower scan bytes,
    pinned in tests/test_plans.py), then the 150 survivors per query
    re-rank at full dimension. Truncation commutes with per-element
    quantization, so DuckDB replays the whole funnel — fully
    hash-oracled (recall certified by ``mrl_ann_recall_vs_exact``).
    Fixture honesty note: these embeddings are not MRL-trained, so
    the prefix is a random 32-dim projection — the wide refine and
    the 70% floor certify that worst case (measured 86-98% across
    SFs); front-loaded MRL embeddings only improve it, which is when
    the prefix can shrink to 8-16 dims."""
    import os
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    # index build step: store the prefix column, probe the STORED
    # table (the driver collects lazily, so the dir outlives us —
    # same discipline as cdc_merge_sink_customer's state dir)
    pfx_path = os.path.join(
        tempfile.mkdtemp(prefix="mrl_index_"), "prefix"
    )
    similarity.mrl_encode(
        emb, prefix_dim=MRL_PREFIX_DIM
    ).write.mode("overwrite").parquet(pfx_path)
    return similarity.topk_mrl(
        emb, queries, k=5, prefix_dim=MRL_PREFIX_DIM, refine=MRL_REFINE,
        index_prefix=spark.read.parquet(pfx_path),
    )


def mrl_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable accuracy certificate for ``mrl_ann_topk``:
    recall vs full-dim brute force, floored at 70% (measured 86-98%
    across sf0.001/0.01/0.1 at prefix 32 / refine 150)."""
    return _recall_vs_exact(
        ann_topk_cosine(spark, sf_dir),
        mrl_ann_topk(spark, sf_dir),
        MRL_ANN_RECALL_FLOOR_BP,
    )


def _mrl_ann_sql(prefix_dim: int = MRL_PREFIX_DIM,
                 refine: int = MRL_REFINE) -> str:
    """Full replay of the MRL funnel: slice the quantized vectors
    (truncation commutes with quantization), integer prefix-cosine
    shortlist of ``refine``, then the shared exact-cosine re-rank
    tail."""
    tdot = ("CAST(list_sum(list_transform(list_zip(q.tvec, c.tvec), "
            "p -> p[1] * p[2])) AS BIGINT)")
    tnorm = ("sqrt(CAST(CAST(list_sum(list_transform(qvec[1:{pd}], "
             "v -> v * v)) AS BIGINT) AS DOUBLE))").format(pd=prefix_dim)
    return f"""
WITH {_QN_CTE},
tn AS (
  SELECT sid, qvec[1:{prefix_dim}] AS tvec, {tnorm} AS tn
  FROM qv
),
tscored AS (
  SELECT q.sid AS query_id, c.sid AS neighbor_id,
         CAST({tdot} AS DOUBLE) / (q.tn * c.tn) AS tcos
  FROM tn q, tn c
  WHERE q.sid < 20 AND c.sid <> q.sid
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY tcos DESC, neighbor_id) AS rn
    FROM tscored
  ) WHERE rn <= {refine}
),
{_SCORE_RANK_TAIL}"""


QUERIES["mrl_ann_topk"] = mrl_ann_topk
ORACLES["mrl_ann_topk"] = _mrl_ann_sql()
QUERIES["mrl_ann_recall_vs_exact"] = mrl_ann_recall_vs_exact
ORACLES["mrl_ann_recall_vs_exact"] = _ann_recall_sql(
    MRL_ANN_RECALL_FLOOR_BP
)


# ----------- trained quality classifier (batch perceptron, integer)

PERCEPTRON_ROUNDS = 4
_PERCEPTRON_DIM = 5  # bias, ttr_bp, toptok_bp, meanlen_bp, wc_cap


def _perceptron_x(docs: DataFrame) -> DataFrame:
    """(doc_id, x): the classifier's integer feature vector alone —
    the scoring-side kernel (the streaming screen featurizes unlabeled
    crawl batches with exactly this)."""
    per_tok = (
        docs.select(
            "doc_id",
            F.explode(F.expr("split(trim(text), '\\\\s+')")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tok"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("maxcnt"),
    )
    return per_doc.select(
        "doc_id",
        F.expr(
            "array(CAST(10000 AS BIGINT), "
            "n_distinct * 10000 div n_tok, "
            "maxcnt * 10000 div n_tok, "
            "least(n_tok, CAST(10000 AS BIGINT)), "
            "least(maxcnt, CAST(10000 AS BIGINT)))"
        ).alias("x"),
    )


def _perceptron_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x): label +1 for corpus docs, -1 for the injected
    repetitive twins (doc_id % KEY_OFFSET >= 300000 in
    docs_with_repetition — the weak-label stand-in for the
    GPT-3/LLaMA practice of labeling a reference corpus positive and
    raw crawl negative). The label is taken MODULO the scale-fixture
    replica offset (scale_fixtures.KEY_OFFSET = 10M) so replicated
    ladder corpora label each replica's originals +1 and its twins -1
    — a bare ``doc_id >= 300000`` would mark every replica>=1 doc
    negative and the misclassified set would never converge (the
    ladder would time a mislabeled workload, not the classifier).
    Base ids are well under 10M at any shipped SF and the synthetic
    offsets top out at 600k (scale_fixtures.py:6-8), so at x1 the
    modulo is the identity and the DuckDB twin mirrors it. Also an
    all-integer bounded feature vector: [bias 10000, type-token ratio
    bp, top-token share bp, word count (capped 10000), top-token raw
    count (capped 10000)]. Mean token length was measured OUT: it is
    near-constant across classes here, and a large non-discriminative
    feature makes the balanced update oscillate (each round flips the
    full-corpus verdict). Bounds keep every |x_j| <= 10000 so the
    training dots stay far inside int64.
    One (doc, token) partial-agg shuffle, then a per-doc fold."""
    from bottledwater_pg_spark.scale_fixtures import KEY_OFFSET

    return _perceptron_x(docs).select(
        "doc_id",
        F.when(F.col("doc_id") % KEY_OFFSET >= 300000, F.lit(-1))
        .otherwise(F.lit(1)).cast("long").alias("y"),
        "x",
    )


_PDOT = ("aggregate(zip_with(w, x, (a, b) -> a * b), "
         "CAST(0 AS BIGINT), (acc, p) -> acc + p)")


def _perceptron_train(spark: SparkSession, feats: DataFrame,
                      rounds: int = PERCEPTRON_ROUNDS) -> DataFrame:
    """The class-balanced batch-perceptron training loop over a
    labeled (doc_id, y, x) frame; returns the 1-row final-weights
    frame. Shared by the batch query and the streaming screen's
    train-once step — the kmeans E/M loop shape with a 5-element
    state (broadcast weight row per round, narrow misclassify
    filter, 5-row partial-agg delta, per-round localCheckpoint)."""
    dim = _PERCEPTRON_DIM
    w = spark.range(1).select(
        F.expr(
            f"transform(sequence(1, {dim}), i -> CAST(0 AS BIGINT))"
        ).alias("w")
    )
    tmpl = spark.range(dim).select(F.col("id").cast("long").alias("j"))
    for _ in range(rounds):
        mis = (
            feats.crossJoin(F.broadcast(w))
            .filter(F.col("y") * F.expr(_PDOT) <= 0)
        )
        upd = (
            mis.select("y", F.posexplode("x").alias("j", "xv"))
            .groupBy("j")
            .agg(
                F.sum(F.when(F.col("y") == 1, F.col("xv"))
                      .otherwise(F.lit(0))).cast("long").alias("sp"),
                F.sum(F.when(F.col("y") == 1, 1)
                      .otherwise(F.lit(0))).cast("long").alias("np"),
                F.sum(F.when(F.col("y") == -1, F.col("xv"))
                      .otherwise(F.lit(0))).cast("long").alias("sn"),
                F.sum(F.when(F.col("y") == -1, 1)
                      .otherwise(F.lit(0))).cast("long").alias("nn"),
            )
            .select(
                "j",
                F.expr(
                    "sp div greatest(np, CAST(1 AS BIGINT)) "
                    "- sn div greatest(nn, CAST(1 AS BIGINT))"
                ).cast("long").alias("d"),
            )
        )
        delta = (
            tmpl.join(upd, "j", "left")
            .select("j",
                    F.coalesce("d", F.lit(0)).cast("long").alias("d"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(j, d))), "
                    "s -> s.d)"
                ).alias("delta")
            )
        )
        w = (
            w.crossJoin(F.broadcast(delta))
            .select(
                F.expr("zip_with(w, delta, (a, b) -> a + b)").alias("w")
            )
            # lazy: next round's broadcast materializes it in-job;
            # the plan is truncated immediately either way
            .localCheckpoint(eager=False)
        )
    return w


def perceptron_quality_weights(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """A quality CLASSIFIER trained in-engine — the fourth trained
    model family next to k-means, BPE, and the bigram LM: a batch
    perceptron (Rosenblatt 1958; the fixed-round batch variant) over
    integer text features, the fasttext-direction replacement for
    rule gates when weak labels exist. The corpus labels the injected
    repetitive twins (docs_with_repetition) negative and originals
    positive; PERCEPTRON_ROUNDS rounds of the CLASS-BALANCED batch
    update w += mean(x | misclassified positives) - mean(x |
    misclassified negatives) (integer div; margin <= 0 counts as
    misclassified) — the imbalance-robust variant: the classic
    sum-update stalls here because 500 positives drown the 20
    negative twins (measured: the twins stay misclassified for 8+
    rounds), while per-class means separate this fixture PERFECTLY
    (0 misclassified at sf0.001/0.01/0.1 — the converged w is a fixed
    point: an empty misclassified set yields a zero delta). No
    learning rate, no sigmoid, no float anywhere, so the ENTIRE
    training loop unrolls into SQL CTEs and replays bit-identically
    (the kmeans/BPE oracle discipline). Returns one row per feature: (feature, weight,
    n_train, n_misclassified, accuracy_bp) with the scalars repeated.

    Scale: features are one (doc, token) partial-agg shuffle computed
    ONCE and persisted; each round broadcasts the 5-long weight row,
    filters misclassified rows (narrow), and partial-aggs a 5-row
    delta; per-round localCheckpoint truncates the 1-row lineage —
    the kmeans E/M loop shape with a 5-element state."""
    from bottledwater_pg_spark.session import persist_tracked

    feats = persist_tracked(
        _perceptron_features(docs_with_repetition(spark, sf_dir))
    )
    w = _perceptron_train(spark, feats)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "y", (F.col("y") * F.expr(_PDOT) <= 0).cast("long").alias("mis")
    )
    summary = scored.agg(
        F.count("*").cast("long").alias("n_train"),
        F.sum("mis").cast("long").alias("n_misclassified"),
    ).withColumn(
        "accuracy_bp",
        F.expr("(n_train - n_misclassified) * 10000 div n_train"),
    )
    return (
        w.select(F.posexplode("w").alias("feature", "weight"))
        .select(F.col("feature").cast("long").alias("feature"), "weight")
        .crossJoin(F.broadcast(summary))
        .orderBy("feature")
    )


def _perceptron_sql(rounds: int = PERCEPTRON_ROUNDS,
                    dim: int = _PERCEPTRON_DIM) -> str:
    """Unrolled SQL replay of the whole training loop — feature
    build, ``rounds`` misclassify/update CTE pairs, final audit."""
    dot = ("CAST(list_sum(list_transform(list_zip(w, x), "
           "p -> p[1] * p[2])) AS BIGINT)")
    rep_inj = f"""
inj AS (
  SELECT doc_id + 300000 AS doc_id, source,
         trim(repeat(array_to_string(
           string_split_regex(trim(text), '\\s+')[1:2], ' ') || ' ',
           30)) AS text
  FROM documents
  WHERE doc_id % 25 = 0
    AND len(string_split_regex(trim(text), '\\s+')) >= 2
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM inj
)"""
    chain = [rep_inj + f""",
pt AS (
  SELECT doc_id, t.tok AS tok, COUNT(*) AS cnt
  FROM corpus, unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
  GROUP BY doc_id, t.tok
),
pd AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(cnt) AS BIGINT) AS maxcnt
  FROM pt GROUP BY doc_id
),
f AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 10000000 >= 300000
              THEN -1 ELSE 1 END AS BIGINT)
           AS y,
         [CAST(10000 AS BIGINT),
          n_distinct * 10000 // n_tok,
          maxcnt * 10000 // n_tok,
          least(n_tok, 10000),
          least(maxcnt, 10000)] AS x
  FROM pd
),
w0 AS (
  SELECT list_transform(range(1, {dim + 1}),
                        i -> CAST(0 AS BIGINT)) AS w
)"""]
    for r in range(1, rounds + 1):
        chain.append(f""",
m{r} AS (
  SELECT y, x FROM f, w{r - 1} WHERE y * {dot} <= 0
),
u{r} AS (
  SELECT j,
         CAST(sp // greatest(np, 1) - sn // greatest(nn, 1) AS BIGINT)
           AS d
  FROM (
    SELECT r.j AS j,
           CAST(SUM(CASE WHEN m.y = 1 THEN m.x[r.j] ELSE 0 END)
                AS BIGINT) AS sp,
           CAST(SUM(CASE WHEN m.y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS np,
           CAST(SUM(CASE WHEN m.y = -1 THEN m.x[r.j] ELSE 0 END)
                AS BIGINT) AS sn,
           CAST(SUM(CASE WHEN m.y = -1 THEN 1 ELSE 0 END)
                AS BIGINT) AS nn
    FROM m{r} m, range(1, {dim + 1}) r(j)
    GROUP BY r.j
  )
),
w{r} AS (
  SELECT list(wj + COALESCE(d, CAST(0 AS BIGINT)) ORDER BY j) AS w
  FROM (
    SELECT rr.j AS j, w[rr.j] AS wj, u.d AS d
    FROM range(1, {dim + 1}) rr(j)
    CROSS JOIN w{r - 1}
    LEFT JOIN u{r} u ON u.j = rr.j
  )
)""")
    chain.append(f""",
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN y * {dot} <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_misclassified
  FROM f, w{rounds}
)
SELECT CAST(r.j - 1 AS BIGINT) AS feature,
       w[r.j] AS weight,
       n_train, n_misclassified,
       CAST((n_train - n_misclassified) * 10000 // n_train AS BIGINT)
         AS accuracy_bp
FROM w{rounds}, range(1, {dim + 1}) r(j), audit
ORDER BY feature""")
    return "WITH " + "".join(chain)


QUERIES["perceptron_quality_weights"] = perceptron_quality_weights
ORACLES["perceptron_quality_weights"] = _perceptron_sql()
