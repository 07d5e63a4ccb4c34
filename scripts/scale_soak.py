"""Synthetic sf1 scale soak: run the most expensive operators at x1
and x10 of sf0.1 (union-replicated, key-offset, token-prefixed —
scale_fixtures.py) and print per-op wall times + the scaling ratio.

A data-linear operator should show ratio ~<= 13 for 10x data (~1.3x
super-linearity budget: scheduling constants, bigger shuffles); a
ratio far above that names a scale problem. Results are recorded in
SCALE.md.

    python scripts/scale_soak.py 2>/dev/null
    SPARK_GRAFT_SCALE_FACTOR=4 python scripts/scale_soak.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))


def main() -> int:
    from bottledwater_pg_spark.session import get_spark, release_persisted
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.operators import llm_queries as L
    from bottledwater_pg_spark.operators import queries as Q
    from bottledwater_pg_spark.operators import cdc_queries as C
    from bottledwater_pg_spark.sources.catalog import export_snapshot

    spark = get_spark("scale_soak")
    spark.range(1).count()  # absorb JVM warmup outside the timings

    # the soaked ops: the bench's most expensive operators (winnowing
    # pairs, MinHash+star-CC clustering, Bloom decontamination,
    # integer PageRank), the CDC compaction, and a many-table
    # snapshot-export pass
    def many_table_export(spark, d):
        return export_snapshot(spark, d, "%", allow_unkeyed=True).groupBy(
            "relid"
        ).count()

    ops = [
        ("winnow_near_dup_pairs", L.winnow_near_dup_pairs),
        ("dedup_cluster_canonical_star", L.dedup_cluster_canonical_star),
        ("bloom_contamination_screen", L.bloom_contamination_screen),
        ("pagerank_copurchase", Q.pagerank_copurchase),
        ("lsh_minhash_near_dup", L.lsh_minhash_near_dup),
        ("cdc_materialize_customer", C.cdc_materialize_customer),
        ("many_table_export", many_table_export),
        # r8: O(corpus tokens) positional-gram span dedup (the gram
        # shuffle is the scale risk), the DSIR scorer (model stays
        # B rows however big the corpus gets), and the composed
        # IVF-PQ index (assignment + encode are the corpus-sized
        # stages; the probe is cell-pruned)
        ("exact_substring_spans", L.exact_substring_spans),
        ("dsir_importance_weights", L.dsir_importance_weights),
        ("ivfpq_ann_topk", L.ivfpq_ann_topk),
        # the budgeted-graph ops: wall time should be near
        # scale-INVARIANT — the edge budget caps the graph however
        # big the co-occurrence input grows; only the pair-count
        # aggregation scales with data
        ("supplier_triangle_counts", Q.supplier_triangle_counts),
        ("supplier_kcore", Q.supplier_kcore),
    ]

    base = tempfile.mkdtemp(prefix="scale_soak_")
    results: dict[str, dict] = {}
    try:
        dirs = {}
        for f in (1, FACTOR):
            t0 = time.perf_counter()
            dirs[f] = build_scaled_dir(
                spark, SF_DIR, os.path.join(base, f"x{f}"), f
            )
            print(
                json.dumps(
                    {"prep": f"x{f}", "sec": round(time.perf_counter() - t0, 2)}
                ),
                flush=True,
            )
        for name, fn in ops:
            rec = {}
            # one untimed x1 pass first: the timed x1 must not carry
            # the operator's cold-start (code-gen, file listing) that
            # the later x{FACTOR} run would then unfairly skip
            release_persisted()
            fn(spark, dirs[1]).count()
            for f in (1, FACTOR):
                release_persisted()
                t0 = time.perf_counter()
                n = fn(spark, dirs[f]).count()
                rec[f"x{f}_sec"] = round(time.perf_counter() - t0, 2)
                rec[f"x{f}_rows"] = n
            rec["ratio"] = round(rec[f"x{FACTOR}_sec"] / rec["x1_sec"], 2)
            rec["superlinearity"] = round(rec["ratio"] / FACTOR, 2)
            results[name] = rec
            print(json.dumps({name: rec}), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"scale_soak": results, "factor": FACTOR, "sf_dir": SF_DIR}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
