"""One-off experiment for the r10 bloom bench watch: time three probe
forms of bloom_contamination_screen at sf0.1 and verify they agree.

1. column  — the r9 shape: F.lit(words) projected as a row column _bm
             carried through two selects (suspected 8 KB copy per row)
2. inline  — same literal bitmap but referenced INSIDE the filter
             expression only, never materialized as a row field
3. join    — the r8 shape: posexplode k positions, broadcast join the
             word_idx->word table, groupBy(doc,gram) min(bit_set)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.llm_queries import (
    BLOOM_K,
    BLOOM_M_BITS,
    NGRAM_CONTAM_N,
    _bloom_positions,
)
from bottledwater_pg_spark.functions.text import word_shingles
from bottledwater_pg_spark.session import get_spark, load_table, persist_tracked

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bloom-probe-bench")

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
bitmap = ev_pos.groupBy(
    (F.col("pos") / 63).cast("int").alias("word_idx")
).agg(
    F.bit_or(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
    ).alias("word")
)
n_words = BLOOM_M_BITS // 63 + 1
words = [0] * n_words
for r in bitmap.collect():
    words[r["word_idx"]] = r["word"]
bitmap_df = persist_tracked(bitmap)
bitmap_df.count()

tr_g = persist_tracked(
    train.select(
        "doc_id",
        F.explode(word_shingles("text", NGRAM_CONTAM_N)).alias("gram"),
    )
)
tr_g.count()


def probe_column():
    probes = tr_g.select(
        "doc_id", "gram",
        F.lit(words).alias("_bm"),
        F.md5(F.encode(F.col("gram"), "UTF-8")).alias("_h"),
    ).select(
        "doc_id", "gram", "_bm",
        *[p.alias(f"_p{i}")
          for i, p in enumerate(_bloom_positions("gram", md5_col="_h"))],
    )
    all_set = None
    for i in range(BLOOM_K):
        t = F.expr(
            f"(shiftright(element_at(_bm, CAST(_p{i} DIV 63 AS INT) + 1), "
            f"CAST(_p{i} % 63 AS INT)) & 1) = 1"
        )
        all_set = t if all_set is None else (all_set & t)
    return (probes.filter(all_set).groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("n_flagged")))


def probe_inline():
    probes = tr_g.select(
        "doc_id", "gram",
        F.md5(F.encode(F.col("gram"), "UTF-8")).alias("_h"),
    ).select(
        "doc_id", "gram",
        *[p.alias(f"_p{i}")
          for i, p in enumerate(_bloom_positions("gram", md5_col="_h"))],
    )
    bm = F.lit(words)
    all_set = None
    for i in range(BLOOM_K):
        t = (
            F.call_function(
                "shiftright",
                F.element_at(
                    bm, (F.col(f"_p{i}") / 63).cast("int") + 1
                ),
                (F.col(f"_p{i}") % 63).cast("int"),
            ).bitwiseAND(F.lit(1))
            == 1
        )
        all_set = t if all_set is None else (all_set & t)
    return (probes.filter(all_set).groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("n_flagged")))


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
    hit = probes.join(F.broadcast(bitmap_df), "word_idx", "left").select(
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


variants = {"column": probe_column, "inline": probe_inline,
            "join": probe_join}
# agreement check once
import pandas as pd
frames = {}
for name, fn in variants.items():
    frames[name] = (fn().toPandas().sort_values("doc_id")
                    .reset_index(drop=True))
for name in ("inline", "join"):
    pd.testing.assert_frame_equal(frames[name], frames["column"],
                                  check_dtype=False)
print(json.dumps({"agree": True, "flagged_docs": len(frames["column"])}))

for name, fn in variants.items():  # warmup
    fn().write.mode("overwrite").format("noop").save()
samples = {n: [] for n in variants}
order = list(variants)
for i in range(5):
    for name in (order if i % 2 == 0 else list(reversed(order))):
        t0 = time.perf_counter()
        variants[name]().write.mode("overwrite").format("noop").save()
        samples[name].append(round(time.perf_counter() - t0, 3))
for name in variants:
    print(json.dumps({"variant": name, "samples": samples[name],
                      "min": min(samples[name])}))
