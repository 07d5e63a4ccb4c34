"""Isolated ×10-cell probe: build the scaled fixture once, then time
the named queries (default: the X10_CELL list) with the bench's own
methodology (untimed warmup, min of N timed passes, second pass
reversed). Optionally phase-profiles containment_near_dup: times the
shingle build, prefix, candidate join, and verify join separately via
noop sinks so the ×10 cost attributes to a concrete subplan.

Usage:
    python scripts/x10_probe.py [--phases] [query ...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = int(os.environ.get("X10_PROBE_PASSES", "2"))


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    phases = "--phases" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bench import X10_CELL, X10_TABLES
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.session import get_spark

    names = args or list(X10_CELL)
    spark = get_spark("x10-probe")
    queries = entry.queries()

    base = tempfile.mkdtemp(prefix="x10_probe_")
    try:
        t0 = time.perf_counter()
        d = build_scaled_dir(
            spark, sf_dir, os.path.join(base, "x10"), 10, tables=X10_TABLES
        )
        print(json.dumps({"fixture_build_sec": round(time.perf_counter() - t0, 3)}))

        samples: dict[str, list[float]] = {n: [] for n in names}
        for name in names:  # warmup
            noop(queries[name](spark, d))
        for i in range(PASSES):
            order = names if i % 2 == 0 else list(reversed(names))
            for name in order:
                samples[name].append(noop(queries[name](spark, d)))
        for name in names:
            print(json.dumps({
                "query": name,
                "samples": samples[name],
                "min": min(samples[name]),
            }))

        if phases:
            from pyspark import StorageLevel
            from pyspark.sql import functions as F
            from bottledwater_pg_spark.operators.dedup import (
                containment_prefix, shingle_table,
            )
            from bottledwater_pg_spark.session import load_table

            docs = load_table(spark, d, "documents")
            for it in range(2):
                tag = "warm" if it else "cold"
                sh = shingle_table(docs, "doc_id", "text", 3).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                t_sh = noop(sh)
                szs = sh.groupBy("sid").agg(
                    F.count("*").cast("long").alias("sz")
                ).persist()
                t_szs = noop(szs)
                prefix = containment_prefix(sh, 8000, sizes=szs)
                t_prefix = noop(prefix)
                cand = (
                    prefix.select(F.col("sid").alias("a_id"), "shingle")
                    .join(sh.select(F.col("sid").alias("b_id"), "shingle"),
                          "shingle")
                    .filter(F.col("a_id") != F.col("b_id"))
                    .select("a_id", "b_id")
                    .distinct()
                ).persist(StorageLevel.MEMORY_AND_DISK)
                t_cand = noop(cand)
                n_cand = cand.count()
                oriented = (
                    cand.join(szs.select(F.col("sid").alias("a_id"),
                                         F.col("sz").alias("sz_a")), "a_id")
                    .join(szs.select(F.col("sid").alias("b_id"),
                                     F.col("sz").alias("sz_b")), "b_id")
                    .filter((F.col("sz_a") < F.col("sz_b"))
                            | ((F.col("sz_a") == F.col("sz_b"))
                               & (F.col("a_id") < F.col("b_id"))))
                )
                verify = (
                    oriented.join(sh.alias("sa"),
                                  F.col("sa.sid") == F.col("a_id"))
                    .join(sh.alias("sb"),
                          (F.col("sb.sid") == F.col("b_id"))
                          & (F.col("sa.shingle") == F.col("sb.shingle")))
                    .groupBy("a_id", "b_id", "sz_a", "sz_b")
                    .agg(F.count_distinct("sa.shingle").alias("inter"))
                    .filter(F.col("inter") * 10000 >= F.col("sz_a") * 8000)
                )
                t_verify = noop(verify)
                print(json.dumps({
                    "phase_profile": tag,
                    "shingle_sec": t_sh,
                    "szs_sec": t_szs,
                    "prefix_sec": t_prefix,
                    "cand_sec": t_cand,
                    "n_cand": n_cand,
                    "verify_sec": t_verify,
                }))
                for x in (cand, szs, sh):
                    x.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
