"""Dump explain('formatted') for the r14-touched queries into
plans/r14/<query>_<tag>.txt (tag = before|after).

    python scripts/dump_r14_plans.py after 2>/dev/null
    (cd <HEAD worktree> && python scripts/dump_r14_plans.py before \
        /root/repo/plans/r14 2>/dev/null)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TOUCHED = [
    # single-pass CDC generator
    "cdc_materialize_customer",
    "cdc_materialize_events_composite",
    "cdc_error_policy_ddl",
    "cdc_schema_evolution_customer",
    "cdc_add_primary_key_midstream",
    "cdc_incremental_agg_customer",
    # shared-subplan persists / explode single-pass rewrites
    "containment_near_dup_capped",
    "prefix_jaccard_near_dup",
    "supplier_triangle_counts",
    "supplier_kcore",
    "pagerank_copurchase",
    "dedup_cluster_canonical",
    "dedup_cluster_canonical_star",
    "lsh_hot_bucket_capped_clusters",
    # lazy-checkpoint loops
    "kmeans_topic_clusters",
    "perceptron_quality_weights",
    # read-repartition opt-ins
    "winnow_near_dup_pairs",
    "doc_fingerprint_winnow",
    "ngram_contamination",
    "bloom_contamination_screen",
    "exact_substring_spans_hashed",
    "text_stats_per_doc",
    "pg_interval_roundtrip",
    "pg_timetz_roundtrip",
    "pg_composite_enum_roundtrip",
    # session 2: shuffle-free ivf_assign / kmeans E-step + embeddings
    # read-repartition opt-ins
    "ivf_ann_topk",
    "ivf_trained_topk",
    "ivfpq_ann_topk",
    "ivfpq_trained_topk",
    "semdedup_prune_stats",
    "kmeans_semdedup_stats",
    "lsh_ann_topk",
    # session 2: F.expr-batched band construction (plan-identical by
    # design — the pair certifies that)
    "lsh_minhash_near_dup",
    "simhash_md5_near_dup",
    "lsh_embedding_near_dup",
    # session 2: single-pass fanout compaction
    "cdc_many_table_fanout_state",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r14",
        )
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from bottledwater_pg_spark.plans.inspect import formatted_plan
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("r14-plan-dump")
    queries = entry.queries()
    import re

    for name in TOUCHED:
        try:
            df = queries[name](spark, SF_DIR)
            plan = formatted_plan(df)
            plan = re.sub(
                r"\[(?:-?\d+,){20,}-?\d+\]", "[<int array literal elided>]",
                plan,
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} (sf_dir={SF_DIR})\n\n{plan}\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
