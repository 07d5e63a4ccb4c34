"""r14 follow-up to bloom_probe_bench.py (the r10 experiment): the
round-2 menu asks whether a SINGLE-probe pass (no k-position explode,
no per-position broadcast hash-probe, no groupBy(doc, gram) rollup)
beats the incumbent join form of bloom_contamination_screen.

Variants, all agreement-checked against the incumbent:

join   — the shipped r10 winner: posexplode the k positions,
         broadcast-join the word_idx->word bitmap, groupBy(doc, gram)
         min(bit_set), then per-doc count.
forall — pure SQL single pass: densify the bitmap into ONE row
         carrying an array<bigint> (built in Spark, no driver
         collect), broadcast-nested-loop that row onto the grams, and
         evaluate all k probes with forall() over the position array;
         dedup via count_distinct(gram). k x fewer rows into the
         aggregation and no join per position row.
arrow  — guide §4.4 A/B: the same position array probed by a
         vectorized pandas UDF holding the bitmap as a numpy array
         (one shift+mask over an (n, k) matrix). Crosses the
         JVM<->Python boundary once per batch; measures whether the
         boundary tax beats the SQL expression tree.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bloom_probe_bench_r14.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bottledwater_pg_spark.functions.text import word_shingles
from bottledwater_pg_spark.operators.llm_queries import (
    BLOOM_K,
    BLOOM_M_BITS,
    NGRAM_CONTAM_N,
    _bloom_positions,
)
from bottledwater_pg_spark.session import get_spark, load_table, persist_tracked

N_WORDS = BLOOM_M_BITS // 63 + 1

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bloom-probe-bench-r14")

docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
eval_set = docs.filter(F.col("doc_id") % 9 == 0).select(
    (F.col("doc_id") + 500000).alias("eval_id"), "text"
)
contam = docs.filter(F.col("doc_id") % 27 == 0).select(
    (F.col("doc_id") + 600000).alias("doc_id"), "text"
)
train = docs.filter(F.col("doc_id") % 9 != 0).unionByName(contam)
ev_grams = eval_set.select(
    F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram")
).distinct()
ev_pos = ev_grams.withColumn(
    "_h", F.md5(F.encode(F.col("gram"), "UTF-8"))
).select(
    F.explode(F.array(*_bloom_positions("gram", md5_col="_h"))).alias("pos")
)
bitmap = persist_tracked(
    ev_pos.groupBy(
        (F.col("pos") / 63).cast("int").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
        ).alias("word")
    )
)
bitmap.count()

# dense single-row array form (Spark-side, no driver collect) for the
# forall variant; driver numpy copy for the arrow variant
dense_one = persist_tracked(
    bitmap.groupBy()
    .agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("word")
        ).alias("bm_map")
    )
    .select(
        F.expr(
            f"transform(sequence(0, {N_WORDS - 1}), "
            "i -> coalesce(element_at(bm_map, i), CAST(0 AS BIGINT)))"
        ).alias("bm")
    )
)
dense_one.count()

words_np = np.zeros(N_WORDS, dtype=np.int64)
for r in bitmap.collect():
    words_np[r["word_idx"]] = r["word"]

tr_g = persist_tracked(
    train.select(
        "doc_id",
        F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram"),
    )
)
tr_g.count()


def _with_pos_array(df):
    return df.select(
        "doc_id", "gram",
        F.md5(F.encode(F.col("gram"), "UTF-8")).alias("_h"),
    ).select(
        "doc_id", "gram",
        F.array(*_bloom_positions("gram", md5_col="_h")).alias("ps"),
    )


def probe_join():
    probes = tr_g.select(
        "doc_id", "gram",
        F.md5(F.encode(F.col("gram"), "UTF-8")).alias("_h"),
    ).select(
        "doc_id", "gram",
        F.explode(
            F.array(*_bloom_positions("gram", md5_col="_h"))
        ).alias("pos"),
    ).select(
        "doc_id", "gram",
        (F.col("pos") / 63).cast("int").alias("word_idx"),
        (F.col("pos") % 63).alias("bit"),
    )
    hit = probes.join(F.broadcast(bitmap), "word_idx", "left").select(
        "doc_id", "gram",
        F.expr(
            "CASE WHEN (shiftright(coalesce(word, CAST(0 AS BIGINT)), "
            "CAST(bit AS INT)) & 1) = 1 THEN 1 ELSE 0 END"
        ).alias("bit_set"),
    )
    return (
        hit.groupBy("doc_id", "gram").agg(F.min("bit_set").alias("all_set"))
        .filter(F.col("all_set") == 1)
        .groupBy("doc_id").agg(F.count("*").alias("n_flagged"))
    )


def probe_forall():
    # pos is always < m, so idx+1 <= N_WORDS: element_at stays in
    # bounds under ANSI
    return (
        _with_pos_array(tr_g)
        .join(F.broadcast(dense_one))
        .filter(F.expr(
            "forall(ps, p -> (shiftright(element_at(bm, "
            "CAST(p DIV 63 AS INT) + 1), CAST(p % 63 AS INT)) & 1) = 1)"
        ))
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_flagged"))
    )


@F.pandas_udf("boolean")
def _bloom_hit(ps: pd.Series) -> pd.Series:
    mat = np.stack(ps.to_numpy()).astype(np.int64, copy=False)
    bits = (words_np[mat // 63] >> (mat % 63)) & 1
    return pd.Series(bits.all(axis=1))


def probe_arrow():
    return (
        _with_pos_array(tr_g)
        .filter(_bloom_hit(F.col("ps")))
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_flagged"))
    )


variants = {"join": probe_join, "forall": probe_forall,
            "arrow": probe_arrow}

frames = {}
for name, fn in variants.items():
    frames[name] = (fn().toPandas().sort_values("doc_id")
                    .reset_index(drop=True))
for name in ("forall", "arrow"):
    pd.testing.assert_frame_equal(frames[name], frames["join"],
                                  check_dtype=False)
print(json.dumps({"agree": True, "flagged_docs": len(frames["join"])}),
      flush=True)

for name, fn in variants.items():  # warmup
    fn().write.mode("overwrite").format("noop").save()
samples = {n: [] for n in variants}
order = list(variants)
for i in range(5):
    for name in (order if i % 2 == 0 else list(reversed(order))):
        spark.sparkContext.setJobDescription(f"bloom-r14:{name}:{i}")
        t0 = time.perf_counter()
        variants[name]().write.mode("overwrite").format("noop").save()
        samples[name].append(round(time.perf_counter() - t0, 3))
for name in variants:
    print(json.dumps({"variant": name, "samples": samples[name],
                      "min": min(samples[name]),
                      "median": sorted(samples[name])[2]}), flush=True)
