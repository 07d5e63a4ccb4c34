"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and SRP-LSH-bucketed approximate search (the
scale path).

Scale design: brute force is a broadcast-join of the (small) query set
against the corpus — linear scans parallelize perfectly but cost
O(|Q| x |corpus|); the LSH variant probes only same-bucket candidates,
trading recall for a corpus-partition-pruned probe, which is the right
shape at 100 TB (the bucket id becomes a partition/bucketing key).
Vectors are quantized once and carry precomputed norms — the per-pair
work is a single interpreted zip_with dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.vectors import cosine_pre
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


def topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
             num_bits: int = 16, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: SRP-LSH banding restricts each query's probe
    to corpus vectors sharing at least one signature band; candidates
    are deduped as id pairs, then ranked by exact quantized cosine."""
    cb = banded_srp(corpus, num_bits, bands, id_col, vec_col).select(
        F.col("sid").alias("neighbor_id"), "band", "bval"
    )
    qb = banded_srp(queries, num_bits, bands, id_col, vec_col).select(
        F.col("sid").alias("query_id"), "band", "bval"
    )
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
