"""Interleaved same-session A/B of the containment verify shape at the
×10 cell: OLD = sz_a/sz_b through the intersection join + groupBy on
(pair, sizes) + count_distinct(shingle); NEW = ids-only join +
count(*) + re-attach sizes (the shipped r15 form). Both built from the
same module helpers against the same fixture; alternating passes after
warmups so JIT/page-cache warming cancels out.

Usage: python scripts/x10_containment_ab.py [factor] [warmups] [passes]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    warmups = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.dedup import (
        containment_prefix,
        shingle_table,
    )
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.session import (
        get_spark,
        load_table,
        persist_tracked,
        release_persisted,
    )

    spark = get_spark("x10-containment-ab")

    def build(docs, shape: str):
        t = 8000
        sh = persist_tracked(
            shingle_table(docs, "doc_id", "text", 3),
            StorageLevel.MEMORY_AND_DISK,
        )
        szs = persist_tracked(
            sh.groupBy("sid").agg(F.count("*").cast("long").alias("sz"))
        )
        prefix = containment_prefix(sh, t, sizes=szs)
        cand = (
            prefix.select(F.col("sid").alias("a_id"), "shingle")
            .join(sh.select(F.col("sid").alias("b_id"), "shingle"), "shingle")
            .filter(F.col("a_id") != F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
        oriented = (
            cand.join(szs.select(F.col("sid").alias("a_id"),
                                 F.col("sz").alias("sz_a")), "a_id")
            .join(szs.select(F.col("sid").alias("b_id"),
                             F.col("sz").alias("sz_b")), "b_id")
            .filter((F.col("sz_a") < F.col("sz_b"))
                    | ((F.col("sz_a") == F.col("sz_b"))
                       & (F.col("a_id") < F.col("b_id"))))
        )
        if shape == "old":
            return (
                oriented.join(sh.alias("sa"), F.col("sa.sid") == F.col("a_id"))
                .join(sh.alias("sb"),
                      (F.col("sb.sid") == F.col("b_id"))
                      & (F.col("sa.shingle") == F.col("sb.shingle")))
                .groupBy("a_id", "b_id", "sz_a", "sz_b")
                .agg(F.count_distinct("sa.shingle").alias("inter"))
                .filter(F.col("inter") * 10000 >= F.col("sz_a") * t)
                .select("a_id", "b_id", "inter", "sz_a", "sz_b",
                        (F.col("inter").cast("double") / F.col("sz_a"))
                        .alias("containment"))
            )
        inter = (
            oriented.select("a_id", "b_id")
            .join(sh.alias("sa"), F.col("sa.sid") == F.col("a_id"))
            .join(sh.alias("sb"),
                  (F.col("sb.sid") == F.col("b_id"))
                  & (F.col("sa.shingle") == F.col("sb.shingle")))
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.join(szs.select(F.col("sid").alias("a_id"),
                                  F.col("sz").alias("sz_a")), "a_id")
            .join(szs.select(F.col("sid").alias("b_id"),
                             F.col("sz").alias("sz_b")), "b_id")
            .filter(F.col("inter") * 10000 >= F.col("sz_a") * t)
            .select("a_id", "b_id", "inter", "sz_a", "sz_b",
                    (F.col("inter").cast("double") / F.col("sz_a"))
                    .alias("containment"))
        )

    def run(docs, shape: str) -> float:
        t0 = time.perf_counter()
        build(docs, shape).write.mode("overwrite").format("noop").save()
        release_persisted()
        return round(time.perf_counter() - t0, 3)

    base = tempfile.mkdtemp(prefix="x10_ab_")
    try:
        d = build_scaled_dir(spark, sf_dir, os.path.join(base, "x10"),
                             factor, tables=("documents",))
        docs = load_table(spark, d, "documents")
        for i in range(warmups):
            for shape in ("old", "new"):
                print(json.dumps({"warmup": i, "shape": shape,
                                  "sec": run(docs, shape)}), flush=True)
        samples = {"old": [], "new": []}
        for i in range(passes):
            order = ("old", "new") if i % 2 == 0 else ("new", "old")
            for shape in order:
                samples[shape].append(run(docs, shape))
        for shape in ("old", "new"):
            s = sorted(samples[shape])
            print(json.dumps({"shape": shape, "samples": samples[shape],
                              "min": s[0], "median": s[len(s) // 2]}),
                  flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
