"""Dump explain('formatted') for the r15-touched queries into
plans/r15/<query>_<tag>.txt (tag = before|after).

    python scripts/dump_r15_plans.py before 2>/dev/null   # on the old tree
    python scripts/dump_r15_plans.py after 2>/dev/null    # on the new tree
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOUCHED = [
    # fixpoint-loop job batching (connected components / k-core)
    "lsh_hot_bucket_capped_clusters",
    "dedup_cluster_canonical",
    "dedup_cluster_canonical_star",
    "dedup_cluster_ensemble",
    "supplier_kcore",
    # merge-sink commit path
    "cdc_merge_sink_customer",
    # verdict ask #5/#8 re-measures and any shipped persists
    "containment_near_dup",
    "containment_near_dup_capped",
    "cdc_stream_table_join",
    "cdc_topic_routing_counts",
    # candidates examined for the round
    "winnow_near_dup_pairs",
    "pagerank_copurchase",
    "lsh_minhash_near_dup",
    "bpe_encode_stats",
    "mad_order_value_by_segment",
    "kmeans_semdedup_stats",
    "incremental_dedup_matches",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r15",
        )
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from bottledwater_pg_spark.plans.inspect import formatted_plan
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("r15-plan-dump")
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
