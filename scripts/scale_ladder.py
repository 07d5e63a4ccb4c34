"""x1 -> x10 -> x100 scaling ladder for the two cheapest soaked ops
(CDC compaction, exact-substring spans): build factor-scaled fixture
dirs for JUST the tables each op reads and record the two-point
scaling exponent alpha = log(t_100/t_10) / log(10) — alpha ~ 1.0 is
linear wall growth, < 1 sub-linear (parallelism headroom still being
consumed), > 1 names a super-linear scale problem the x10 soak is too
small to see. Results recorded in SCALE.md.

    python scripts/scale_ladder.py 2>/dev/null
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 10, 100)


def _containment_candidates(spark, d: str) -> int:
    """The containment prefix-block's candidate-pair count over the
    scaled corpus — the quantity the rarest-shingle-df fan-out bound
    claims to control; measured alongside wall time so the ladder can
    falsify the bound, not just the end-to-end number. Replica token
    prefixes keep shingles replica-local, so candidates should grow
    ~linearly with the factor (each replica contributes its own
    blocks), never quadratically."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators import dedup
    from bottledwater_pg_spark.operators.llm_queries import (
        CONTAIN_THRESHOLD_BP,
        docs_with_contained_dups,
    )

    sh = dedup.shingle_table(docs_with_contained_dups(spark, d))
    pfx = dedup.containment_prefix(sh, CONTAIN_THRESHOLD_BP)
    return (
        pfx.select(F.col("sid").alias("a_id"), "shingle")
        .join(sh.select(F.col("sid").alias("b_id"), "shingle"), "shingle")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .count()
    )


def main() -> int:
    from bottledwater_pg_spark.operators import cdc_queries as C
    from bottledwater_pg_spark.operators import llm_queries as L
    from bottledwater_pg_spark.operators import queries as R
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.session import get_spark, release_persisted

    spark = get_spark("scale_ladder")
    spark.range(1).count()

    ops = [
        ("cdc_materialize_customer", C.cdc_materialize_customer,
         ("customer",)),
        ("exact_substring_spans_hashed", L.exact_substring_spans_hashed,
         ("documents",)),
        # r10: the shuffle-dominated row the narrow-heavy pair lacks —
        # winnowing's df-capped fingerprint self-join + window count.
        # NOTE the replica token-prefixing does NOT shard these
        # fingerprints: char-8-grams inside long tokens survive the
        # prefix, so their dfs scale with the factor (measured max df
        # 3.7k -> 404k at x100) — which makes this the real df-shift
        # stress the x10 soak can't see; the WINNOW_DF_CAP exclusion
        # is what keeps the join bounded (SCALE.md r10 has the
        # capped-vs-uncapped join-work numbers).
        ("winnow_near_dup_pairs", L.winnow_near_dup_pairs,
         ("documents",)),
        # r11: the ITERATIVE row (checkpoint-per-round family) — the
        # ladder's other shapes are one-pass; this one re-joins a
        # persisted edge list 3 times with lineage control between
        # rounds. The co-purchase graph shards replica-locally
        # (orders/lineitem key offsets), so mass never flows across
        # replicas and alpha measures pure engine scaling.
        ("pagerank_copurchase", R.pagerank_copurchase,
         ("orders", "lineitem")),
        # r11 session 2: the ANN-SCAN row — sq_ann_topk is a broadcast
        # full scan whose per-row work is one interpreted zip_with dot
        # against each of the 20 fixed queries (replica offsets keep
        # vec_id < 20 in replica 0 only, so the query set does NOT
        # grow with the corpus). The ladder's other rows are
        # token/join/iterative shapes; this is the pure-compute
        # column-scan shape the quantization family's 100 TB story
        # rests on — alpha ~ 1.0 expected once the 32 cores saturate.
        ("sq_ann_topk", L.sq_ann_topk, ("embeddings",)),
        # r11 session 2: the TRAINED-MODEL row — perceptron training
        # is one (doc, token) feature shuffle + 4 broadcast-weight
        # rounds whose per-round work is a narrow filter + a 5-row
        # partial agg; the model state is 5 integers regardless of
        # corpus size, so alpha should track the feature shuffle.
        ("perceptron_quality_weights", L.perceptron_quality_weights,
         ("documents",)),
        # r12: the EXACT-JOIN row — containment_near_dup is the
        # family's expensive-by-design op (exact verify, no sketch);
        # its scale claim is that prefix blocking bounds the equi-join
        # fan-out by the rarest shingles' document frequency. The
        # ladder measures the CANDIDATE-PAIR count alongside wall time
        # (x{f}_cand) so that claim is falsifiable: replica-local
        # shingles should keep candidates ~linear in the factor.
        ("containment_near_dup", L.containment_near_dup,
         ("documents",)),
        # r12: the FUNNEL row — mrl_ann_topk with the STORED prefix
        # column (the r12 layout change: the shortlist scan reads the
        # persisted 32-dim slices, incl. the encode+write step). Like
        # sq_ann_topk the query set stays fixed at 20 (replica 0 only)
        # while the corpus scales, so alpha measures the narrow
        # shortlist scan + the bounded (refine x |Q|) re-rank.
        ("mrl_ann_topk", L.mrl_ann_topk, ("embeddings",)),
    ]
    only = set(sys.argv[1:])
    if only:
        ops = [o for o in ops if o[0] in only]
    base = tempfile.mkdtemp(prefix="scale_ladder_")
    out: dict[str, dict] = {}
    try:
        for name, fn, tables in ops:
            dirs = {}
            for f in FACTORS:
                t0 = time.perf_counter()
                dirs[f] = build_scaled_dir(
                    spark, SF_DIR, os.path.join(base, f"{name}_x{f}"),
                    f, tables=tables,
                )
                print(json.dumps({
                    "prep": f"{name} x{f}",
                    "sec": round(time.perf_counter() - t0, 2),
                }), flush=True)
            rec = {}
            fn(spark, dirs[1]).count()  # absorb cold start untimed
            for f in FACTORS:
                release_persisted()
                t0 = time.perf_counter()
                n = fn(spark, dirs[f]).count()
                rec[f"x{f}_sec"] = round(time.perf_counter() - t0, 2)
                rec[f"x{f}_rows"] = n
                if name == "containment_near_dup":
                    release_persisted()
                    rec[f"x{f}_cand"] = _containment_candidates(
                        spark, dirs[f]
                    )
            rec["alpha_10_100"] = round(
                math.log(rec["x100_sec"] / rec["x10_sec"]) / math.log(10), 3
            )
            out[name] = rec
            print(json.dumps({name: rec}), flush=True)
            # reclaim the x100 dir before the next op's build
            for f in FACTORS:
                shutil.rmtree(dirs[f], ignore_errors=True)
        # checkpoint-policy A/B for the iterative family: same x10
        # graph, 9 rounds, three lineage policies — rationed (the
        # production default: persist every round, localCheckpoint
        # every 8th), per-round checkpointing, and persist-only. The
        # share of wall the per-round policy costs over the rationed
        # one is the measured price of over-checkpointing; run at x10
        # with iters=9 (not x100/iters=3) because the ration never
        # fires in 3 rounds — the policy needs enough rounds to bite.
        if any(n == "pagerank_copurchase" for n, _, _ in ops):
            from bottledwater_pg_spark.operators.graph import (
                pagerank_integer,
            )
            from bottledwater_pg_spark.operators.queries import (
                copurchase_edges,
            )

            d10 = build_scaled_dir(
                spark, SF_DIR, os.path.join(base, "pr_ck_x10"), 10,
                tables=("orders", "lineitem"),
            )
            pagerank_integer(
                copurchase_edges(spark, d10), iters=2
            ).count()  # absorb cold start untimed
            rec = {}
            for label, ck in (
                ("rationed_every8", 8),
                ("per_round", 1),
                ("never", 10**9),
            ):
                release_persisted()
                t0 = time.perf_counter()
                pagerank_integer(
                    copurchase_edges(spark, d10), iters=9,
                    checkpoint_every=ck,
                ).count()
                rec[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            rec["per_round_overhead_share"] = round(
                (rec["per_round_sec"] - rec["rationed_every8_sec"])
                / rec["per_round_sec"],
                3,
            )
            out["pagerank_checkpoint_policy_x10_iters9"] = rec
            print(
                json.dumps(
                    {"pagerank_checkpoint_policy_x10_iters9": rec}
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"scale_ladder": out, "sf_dir": SF_DIR}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
