"""Adversarial hot-shingle skew ladder for containment blocking.

The x100 containment ladder row (SCALE.md r12) measured candidates on
replica-uniform fixtures — the frictionless case where every shingle
stays replica-local. A real crawl has BOILERPLATE: a license footer in
p% of documents, plus a cohort of near-empty pages that are MOSTLY
footer. Rarity ordering keeps hot shingles out of normal docs'
prefixes, but the boilerplate-dominated cohort has no rare shingles to
prefer — their prefixes are hot, and each one candidates against every
footer-carrying doc: O(m x pN) pairs, and (worse) those pairs are TRUE
containment output, so the blow-up is semantic, not a blocking bug.

This script measures candidates + emitted pairs + wall as p grows,
uncapped vs ``df_cap`` (the stopwording escape hatch), and prints one
JSON line per cell for SCALE.md.

    python scripts/containment_skew.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FOOTER = (
    "this page is licensed under the apache license version two "
    "point zero see the license file for details"
)  # 18 tokens -> 16 overlapping 3-shingles, all hot together
M_BOILER = 100  # near-empty boilerplate pages (2% of sf0.1 corpus)
DF_CAP = 150


def skewed_corpus(spark, p: float):
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    if p > 0:
        k = int(round(1 / p))
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % k == 0,
                F.concat(F.col("text"), F.lit(" " + FOOTER)),
            ).otherwise(F.col("text")),
        )
    boiler = spark.range(M_BOILER).select(
        (F.col("id") + 900000).alias("doc_id"),
        F.lit(FOOTER).alias("text"),
    )
    return docs.unionByName(boiler)


def measure(spark, corpus, df_cap):
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.session import release_persisted

    t0 = time.time()
    pairs = dedup.containment_prefix_pairs(corpus, 8000, df_cap=df_cap)
    n_pairs = pairs.count()
    wall = time.time() - t0
    # candidate count of the same blocking join, separately
    sh = dedup.shingle_table(corpus)
    if df_cap is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("dfreq"))
            .filter(F.col("dfreq") <= df_cap)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle").select("sid", "shingle")
    pfx = dedup.containment_prefix(sh, 8000)
    cand = (
        pfx.select(F.col("sid").alias("a_id"), "shingle")
        .join(sh.select(F.col("sid").alias("b_id"), "shingle"), "shingle")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .count()
    )
    release_persisted()
    return {"pairs": n_pairs, "candidates": cand, "wall_sec": round(wall, 3)}


def main() -> int:
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("containment_skew")
    spark.range(1).count()
    out = []
    for p in (0.0, 0.02, 0.1, 0.4):
        corpus = skewed_corpus(spark, p).cache()
        n = corpus.count()
        for cap in (None, DF_CAP):
            rec = {"p": p, "n_docs": n, "df_cap": cap}
            rec.update(measure(spark, corpus, cap))
            out.append(rec)
            print(json.dumps(rec), flush=True)
        corpus.unpersist()
    print(json.dumps({"ladder": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
