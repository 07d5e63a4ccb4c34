"""Adversarial hot-bucket skew ladder for MinHash-LSH banding (and the
winnowing twin) — the r13 containment ladder's question asked of the
other blocking families.

An identical boilerplate cohort (license pages, captchas, templated
stubs) shares EVERY band signature: one bucket per band holds the
whole cohort, candidates grow C(m,2), and because the cohort is
mutually identical those pairs are TRUE near-dup output — the blow-up
is semantic, exactly like containment's footer case. ``max_bucket``
(dedup.minhash_lsh_pairs) is the escape hatch: hot buckets emit the
verified spanning star, m-1 pairs, preserving the connected
components the downstream dedup clustering consumes (hash-certified
by the lsh_hot_bucket_capped_clusters oracle).

Winnowing (winnow_near_dup_pairs) already carries the df-cap
discipline: cohort fingerprints exceed WINNOW_DF_CAP and leave the
JOIN, so the cohort emits no pairs at all (the documented stopword
recall trade) and the join cost stays flat.

Prints one JSON line per ladder cell for SCALE.md.

    python scripts/lsh_skew.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COHORTS = (100, 400, 1600)
MAX_BUCKET = 64

FOOTER = (
    "this page is licensed under the apache license version two "
    "point zero see the license file for details"
)


def cohort_corpus(spark, m: int):
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    boiler = spark.range(m).select(
        (F.col("id") + 900000).alias("doc_id"),
        F.lit(FOOTER).alias("text"),
    )
    return docs.unionByName(boiler)


def measure_lsh(spark, corpus, max_bucket):
    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.session import release_persisted

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        corpus, num_hashes=32, bands=16, threshold=0.8,
        max_bucket=max_bucket,
    )
    n = pairs.count()
    wall = time.time() - t0
    release_persisted()
    return n, round(wall, 3)


def measure_probe(spark, corpus, m, cap):
    """Incremental-probe cell: 20 fresh boilerplate pages probed
    against a standing index holding the m-page cohort — uncapped
    matches grow 20 x m; capped, 20 x cap."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.session import release_persisted

    batch = spark.range(20).select(
        (F.col("id") + 990000).alias("doc_id"), F.lit(FOOTER).alias("text")
    )
    out = []
    for c in (None, cap):
        t0 = time.time()
        n = dedup.incremental_lsh_matches(
            corpus, batch, num_hashes=32, bands=16, threshold=0.8,
            probe_bucket_cap=c,
        ).count()
        out.append((n, round(time.time() - t0, 3)))
        release_persisted()
    return out


def measure_winnow(spark, corpus):
    from bottledwater_pg_spark.operators.llm_queries import (
        winnow_near_dup_pairs,
    )
    from bottledwater_pg_spark.session import release_persisted

    t0 = time.time()
    n = winnow_near_dup_pairs(spark, SF_DIR, corpus=corpus).count()
    wall = time.time() - t0
    release_persisted()
    return n, round(wall, 3)


def main() -> int:
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("lsh_skew")
    spark.range(1).count()
    for m in COHORTS:
        corpus = cohort_corpus(spark, m).persist()
        corpus.count()
        n_unc, w_unc = measure_lsh(spark, corpus, None)
        n_cap, w_cap = measure_lsh(spark, corpus, MAX_BUCKET)
        n_win, w_win = measure_winnow(spark, corpus)
        (p_unc, pw_unc), (p_cap, pw_cap) = measure_probe(
            spark, corpus, m, MAX_BUCKET
        )
        clique = m * (m - 1) // 2
        print(json.dumps({
            "cohort_m": m,
            "uncapped_pairs": n_unc,
            "uncapped_sec": w_unc,
            "capped_pairs": n_cap,
            "capped_sec": w_cap,
            "cohort_clique_pairs": clique,
            "cohort_star_pairs": m - 1,
            "winnow_pairs": n_win,
            "winnow_sec": w_win,
            "probe_uncapped_matches": p_unc,
            "probe_uncapped_sec": pw_unc,
            "probe_capped_matches": p_cap,
            "probe_capped_sec": pw_cap,
        }), flush=True)
        corpus.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
