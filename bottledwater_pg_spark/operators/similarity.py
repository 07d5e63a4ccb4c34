"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and SRP-LSH-bucketed approximate search (the
scale path).

Scale design: brute force is a broadcast-join of the (small) query set
against the corpus — linear scans parallelize perfectly but cost
O(|Q| x |corpus|); the LSH variant probes only same-bucket candidates,
trading recall for a corpus-partition-pruned probe, which is the right
shape at 100 TB (the bucket id becomes a partition/bucketing key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.vectors import cosine
from bottledwater_pg_spark.operators.dedup import hyperplane_signature


def topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    The query side is broadcast (it is small by construction); ranking
    is a per-query window with a deterministic (cos desc, neighbor id)
    order.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine("qv", "cv"))
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
    to corpus vectors sharing at least one signature band (candidates),
    then ranks candidates by exact quantized cosine.
    """
    width = num_bits // bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = hyperplane_signature(df, num_bits, id_col, vec_col)
        bandarr = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.expr(f"(srp >> {bi * width}) & {(1 << width) - 1}").alias(
                        "bval"
                    ),
                )
                for bi in range(bands)
            ]
        )
        return sig.select("sid", "vec", F.explode(bandarr).alias("bs")).select(
            F.col("sid").alias(f"{role}_id"),
            F.col("vec").alias(f"{role}_vec"),
            F.col("bs.band").alias("band"),
            F.col("bs.bval").alias("bval"),
        )

    cand = (
        banded(corpus, "neighbor")
        .join(F.broadcast(banded(queries, "query")), ["band", "bval"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        cand.withColumn("cos", cosine("query_vec", "neighbor_vec"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
