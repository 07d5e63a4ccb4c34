"""Generate PLANS.md: the formatted physical plan of every headline
query with a one-line summary of the scale-critical properties
(shuffle count, broadcast joins, pushed filters, partial aggregation).

Run from the repo root:  python scripts/dump_plans.py 2>/dev/null
Writes PLANS.md (committed so the plan shapes are reviewable without
running Spark).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> what the plan must show (rendered next to the dump)
HEADLINE = {
    "q1_pricing_summary": "filter pushed to scan; 7-column ReadSchema; partial agg; 1 shuffle",
    "q3_shipping_priority": "segment-filtered customer broadcasts; top-k sorts only the aggregated rows",
    "q5_local_supplier_volume": "all 4 dimensions broadcast; lineitem-orders is the only hash shuffle",
    "q9 (part_profit_by_nation)": "LIKE prunes part before broadcast; 3 broadcast dims; partial agg",
    "q11 (important_part_values)": "one scan+shuffle reused for HAVING and global total (broadcast back)",
    "cdc_materialize_customer": "latest-by-key as single-shuffle max_by agg (no window sort)",
    "interval_window_counts": "range join as bucket equi-join: NO BroadcastNestedLoopJoin / CartesianProduct",
    "asof_purchase_to_click": "as-of via union + carry-forward window: one shuffle on user_id",
    "skewed_agg_salted": "two-phase salted agg: hot key split across partitions",
    "lsh_minhash_near_dup": "band bucket join replaces O(n^2) pair enumeration",
    "dedup_cluster_canonical": "connected components: per-round hash join, lineage truncated",
    "ann_topk_cosine": "brute-force baseline: score agg + per-query top-k window",
    "windowed_event_counts": "tumbling window agg with partial aggregation",
    "fuzzy_supplier_pairs": "deletion-neighborhood blocking: hash join on variant key, no quadratic join",
    "sequence_pack_stats": "packing as exclusive running sum: one shuffle on stratum",
    "quantity_price_corr_exact": "six exact-decimal co-moment sums in ONE partial-agg pass",
    "cdc_incremental_agg_customer": "IVM: narrow explode of signed deltas + one tiny group shuffle",
    "cdc_incremental_agg_minmax": "IVM min/max: per-(group,value) signed support counts (two tiny shuffles: value support, then group fold) — exact extrema under deletes, no row state",
    "cdc_incremental_agg_minmax_hist": "quantized-histogram IVM: same two-tiny-shuffle shape with (group, bucket) keys — O(occupied buckets) state for continuous domains; COUNT/SUM exact, extrema as width-exact bucket-edge bounds",
    "cdc_snapshot_diff_customer": "snapshot diff: ONE full-outer join on key, image compare in projection",
    "orders_in_price_band": "theta join with tiny broadcast side: BNLJ is the right plan HERE",
    "winnow_near_dup_pairs": "winnowing overlap: narrow per-doc fingerprints, hash join on fp key, pair-count agg",
    "prefix_jaccard_near_dup": "prefix filter: join only rarest shingles; exact array_intersect verify on candidates",
    "median_order_value_by_segment": "exact median, two-phase bucketed rank: row_number windows partitioned by (segment, bucket) — parallelism not capped at the 5 segments",
    "inverted_index_postings": "posting heads via two-phase bounded top-k: per-partition slice then merge, no corpus-sized collect buffer",
    "cdc_schema_evolution_drop": "DROP COLUMN evolution: single-shuffle compaction, newest in-band schema decodes all survivors",
    "q22_idle_balance_by_nation": "scalar avg broadcasts (1 row); anti-join on custkey; code-group agg",
    "corpus_shuffle_positions": "global shuffle order with NO SinglePartition exchange: 256-bucket local ranks",
    "fraud_rolling_anomalies": "per-user 10-row frame: one shuffle on user_id, decimal-exact moments",
    "bm25_topk_docs": "tf explode + 2 partial aggs; N/avgdl broadcast as 1-row scalar; top-k via TakeOrderedAndProject BEFORE the rank window (no SinglePartition over matched docs)",
    "passage_dedup_stats": "passage hash shuffle + co-partitioned survivor join; text never shuffles",
    "ngram_contamination": "df-cap via window count: train grams explode once, one gram shuffle, eval side broadcast",
    "simhash_md5_near_dup": "60-bit signature in one 60-expression agg; banded equi-join; bit_count(xor) verify",
    "funnel_session_conversion": "one user_id shuffle serves lag + session numbering + per-session windows",
    "cdc_export_snapshot_counts": "multi-table snapshot export: union of narrow scans, zero shuffles before the count agg",
    "semdedup_prune_stats": "SemDeDup: centroid broadcast + one-shuffle assignment; pair join equi-keyed on cent_id (quadratic bounded by cluster size)",
    "pagerank_copurchase": "PageRank: per-iteration edge join against ONE pre-divided node table; persisted ranks keep AQE stats for broadcast conversion",
    "weighted_sample_chars": "weighted systematic sample: 256-bucket two-phase prefix sum, no global window",
    "zorder_layout_stats": "z-order: 1-row min/max broadcast, narrow bit-interleave projection, one cell agg",
    "mad_order_value_by_segment": "MAD: two stacked two-phase ranks over ONE persisted join",
    "incremental_dedup_matches": "incremental dedup: new-batch bands broadcast against index bands; verify join touches candidates only",
    "multimodal_wav_stats": "real RIFF/WAV decode in Arrow-batched mapInPandas; zero shuffles",
    "bpe_pair_counts": "BPE pair counting: narrow pair emit, ONE counted shuffle, top-20 on aggregated rows",
    "length_outlier_docs": "robust outlier filter: per-source rank windows + broadcast med/MAD, integer compares",
    "watermark_lag_profile": "lateness profile: per-user arrival-order window, one key shuffle",
    "cdc_avro_envelope_roundtrip": "Avro wire bytes: narrow Arrow map encode + decode, single compaction shuffle inherited",
    "cdc_state_checksum": "replica digest: commutative count/xor/sum over row hashes, no sort",
    "data_quality_report": "expectation suite: one conditional-agg scan per table + FK anti-join",
    "text_normalize_stats": "canonicalization: narrow regex projection, zero shuffles",
    "rolling_7d_active_users": "rolling WAU: bounded 7x explode replaces O(days x events) range join",
    "trending_event_types": "windowed top-k: rank runs on the tiny emitted window rows",
    "first_touch_attribution": "attribution: union + range-frame struct-min, one user_id shuffle",
    "cdc_sequence_gap_audit": "gap audit: two-level bucketed lag, no global sort",
    "dedup_cluster_ensemble": "ensemble: 3 audited pair pipelines union into star CC",
    "value_percentiles_by_type": "tail p50/p95/p99: two-phase bucketed rank, integer-rational interpolation",
    "resampled_user_values": "resample+locf: bounded grid explode, one user_id carry-forward window",
    "lsh_ann_recall_vs_exact": "sketch certificate: LSH + brute top-k (both bounded) joined broadcast; 1-row integer floor indicator",
    "simhash_injected_recall": "sketch certificate: SQL-known injected pairs left-joined to SimHash output; 1-row agg",
    "hll_error_bound_by_type": "HLL certificate: sketch + exact distinct in ONE partial-agg pass; per-type bound indicator",
    "cdc_registry_evolution_decode": "per-frame schema-id resolution: id->schema snapshot in closure, Arrow-batched narrow decode, no per-frame registry I/O",
    "bloom_contamination_screen": "native Bloom screen: ~1k-word bitmap broadcast against training grams; no eval-side shuffle of the corpus",
    "cms_heavy_users_certificate": "Count-Min: one mergeable sketch agg + KB driver read; exact top-10 via aggregated rows",
    "approx_quantile_rank_certificate": "quantile sketch + exact rank check: two partial-agg passes, 5-row broadcast",
    "cdc_many_table_fanout_state": "8-way fanout: persisted stream, per-table independent compaction shuffles, no data-sized union shuffle",
    "seasonal_deviation_hours": "seasonal anomaly: hourly agg + tiny hour-of-week baseline broadcast; top-20 via TakeOrderedAndProject, rank window sees 20 rows",
    "top_quality_docs_per_source": "curation top-k: bounded per-partition slice then merge",
    "lineitem_corr_matrix": "corr matrix: 9 co-moments in ONE partial-agg pass",
    "cohort_ltv_triangle": "LTV triangle: two partial-agg shuffles, cumulation over weeks^2 rows",
    "nations_covering_all_brands": "relational division: coverage counts vs 1-row broadcast total",
    # round 5
    "cdc_add_primary_key_midstream": "ADD PK mid-stream: shuffle-free unkeyed append branch + single-shuffle keyed compaction, union without exchange",
    "cdc_error_policy_ddl": "error policy x DDL: O(#schema-changes) control collect; failed-table drop is one literal filter, no shuffle",
    "pg_interval_roundtrip": "interval text round-trip: narrow regex projection, zero shuffles",
    "alpha_mixture_weights": "mixture weights: one partial-agg shuffle + 1-row total broadcast, integer output",
    "ngram_diversity_by_source": "diversity: COUNT(DISTINCT) as two-level agg keyed (source, shingle)",
    # round 7
    "lsh_ann_topk": "md5-parity SRP ANN: dim-row sign table broadcast, exact int64 projections in one partial agg, band equi-join probe — same plan family as the xxhash twin, now SQL-replayable",
    "ivf_ann_topk": "IVF-flat ANN: centroid broadcast, one-shuffle max_by assignment, probe join keyed on cent_id (partition-prunable cells)",
    "lsh_simhash_near_dup": "32-bit md5 SimHash: one tf agg + one 32-expression bit-sum agg, 4x8-bit banded equi-join, bit_count(xor) verify",
    "pg_composite_enum_roundtrip": "composite/enum/domain round-trip: narrow regex + JSON projection, zero shuffles",
    "quartiles_order_value_by_segment": "exact p25/50/75: two-phase bucketed rank; group size via window over the tiny bucket-count table (no join back to stats)",
    "lm_surprise_outliers": "LM quality filter: vocabulary-sized bigram model (one partial-agg pass), doc bigrams join the model keyed (prev, cur), V as 1-row scalar broadcast, exact int64 surprise sums, top-20 via TakeOrderedAndProject",
    "exact_substring_spans": "exact-substring dedup: ONE positional-gram explode, cross-doc via window min/max on the gram (one gram shuffle, O(1) state per gram), island merge re-shuffles only surviving positions by doc",
    "dsir_importance_weights": "DSIR: per-(doc,bucket) counts in one pass; B-row model + two 1-row totals all broadcast; integer score sums; TakeOrderedAndProject top-k",
    "bpe_encode_stats": "BPE encode: trained vocab reconstructs its words (space-strip), one equi-join of the word stream against it, per-source integer agg",
    "pq_ann_topk": "PQ-ADC: codebook + per-query distance table broadcast (data-size independent), scan is index join + partial-agg sum, exact re-rank on the bounded shortlist",
    "ivfpq_ann_topk": "IVF-PQ: probe set + codebook + dtab broadcast; in-cell ADC via (cent_id) join — at scale a partition-pruned read; re-rank touches refine*|Q| vectors",
    "supplier_triangle_counts": "triangle census: per-order collect_set + sorted-pair explode edge build (one orderkey shuffle, no self-join), TakeOrderedAndProject edge budget (distributed top-k, no global sort), degree-oriented wedge hash joins, partial-agg count",
    "token_pmi_topk": "PMI collocations: one bigram explode + partial agg, unigram model joined back on each side, 1-row N broadcast, TakeOrderedAndProject top-k",
    "supplier_kcore": "k-core peeling: per-round alive-filtered degree agg, eager lineage truncation (plan stays flat across rounds), fixpoint via 1-row counts",
    "exact_substring_spans_hashed": "hashed-gram spans: identical two-shuffle shape, gram attribute is LongType (#nL) so the dominant shuffle moves 8-byte keys",
    "hll_distinct_users_by_type": "own-register HLL: one (type,bucket) partial+final agg (state m rows/key), integer harmonic sum, no data-sized anything",
    "kmeans_topic_clusters": "Lloyd's k-means, 4 integer rounds: centroids broadcast (tiny-side BNLJ), map-side-combining argmin, kxdim M-step agg, per-round checkpoint keeps the plan flat",
    # round 10
    "ivf_trained_topk": "trained IVF: Lloyd's rounds (broadcast centroids, map-side argmin, kxdim M-step) feed the SAME cell-keyed broadcast probe as the untrained form — training adds zero vector shuffles",
    "ivfpq_trained_topk": "trained IVF-PQ (FAISS IVFADC): Lloyd's rounds feed the shared probe+codebook+dtab broadcasts; corpus index never shuffles by a model key",
    "bloom_contamination_screen": "Bloom screen: one-row dense bitmap rides a broadcast nested-loop, k probes as ONE forall over the position array (r14 microbench: 1.9x over the r10 word_idx explode+join probe); corpus never shuffled by a join, no SMJ, no collect",
    "gopher_quality_flags": "Gopher rule gate: tokenize once into a bound array attribute, four integer rule columns, one source-keyed partial agg — zero joins, zero explode",
    "source_quota_sample": "per-source quota cap: one window rank per source (the domain is the partition key at scale), integer kept/dropped sums",
    # round 11
    "gopher_repetition_ngram_flags": "Gopher n-gram repetition gate: one instance-level gram explode + (doc,gram) partial agg per n (2/3/5), per-doc left joins coalesce vacuous passes, one source rollup — the winnowing gram-shuffle family, zero cartesians",
    "ccnet_perplexity_buckets": "CCNet terciles: the LM kernel's model-join shape (vocabulary-sized model, 1-row V broadcast), then ONE ntile window per source over integer scores — no corpus collect, no float boundary",
    # round 11, session 2
    "sq_ann_topk": "SQ8-ADC scan: per-dim grid stats fold to ONE broadcast row (map-side partial posexplode agg), encode+reconstruct fused in a narrow indexed transform, full scan with broadcast query side — no shuffle of the corpus, no cartesian",
    "mrl_ann_topk": "Matryoshka funnel: shortlist scans the STORED prefix table (ReadSchema carries t_q/t_n, never embedding — half the bytes physically), per-query window to 150, exact full-dim re-rank joins ONLY the shortlist; both model sides broadcast",
    "containment_near_dup": "containment prefix blocking: df-ranked rare-shingle prefix equi-joined to the full shingle table (frequent keys never enter the join), candidates verified once via array_intersect — no cartesian, no BNLJ",
    "containment_near_dup_capped": "df_cap stopwording: one df aggregate gates the shingle universe (df<=cap semi-join) BEFORE prefix/join/verify — boilerplate keys never reach any shuffle; same join-verify shape as the uncapped plan",
    "lsh_hot_bucket_capped_clusters": "hot-bucket star cap: one window count over (band,bsig) — the same shuffle the bucket join needs — splits normal buckets (all-pairs equi-join) from hot ones (m-1 star rows, no self-join); components via the iterative min-label joins",
    "c4_line_filter_stats": "C4 line gate: verdicts are filter/aggregate over the lines array (no explode), marker detection by substring on the page, ONE source-keyed partial agg — the gopher_quality_flags shape",
    "unimax_language_budgets": "UniMax waterfill: corpus-sized work is one lang-keyed partial agg; the waterfill windows run over #langs rows (bounded metadata) and the 2-scalar fold broadcasts back",
    "perceptron_quality_weights": "balanced batch perceptron: features one (doc,token) partial-agg shuffle persisted once; each round broadcasts the 5-long weight row, filters misclassified (narrow), partial-aggs a 5-row delta; per-round localCheckpoint truncates 1-row lineage — the kmeans E/M shape",
}

ALIAS = {
    "q9 (part_profit_by_nation)": "part_profit_by_nation",
    "q11 (important_part_values)": "important_part_values",
}


def _elide_literals(plan: str) -> str:
    """Collapse huge inline array literals (the Bloom bitmap rides the
    plan as a ~1k-long constant) so PLANS.md stays reviewable; the
    live plan is unchanged — this edits only the dump."""
    import re

    return re.sub(
        r"\[(?:-?\d+,){20,}-?\d+\]",
        "[<int array literal elided>]",
        plan,
    )


def main() -> None:
    import __spark_entry__ as entry
    from bottledwater_pg_spark.plans.inspect import (
        count_broadcast_joins,
        count_exchanges,
        formatted_plan,
        has_partial_aggregation,
        pushed_filters,
    )
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("plan-dump")
    queries = entry.queries()

    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `python scripts/dump_plans.py` at sf_dir={SF_DIR}.",
        "Each section: the scale property the plan must exhibit, the",
        "one-line plan metrics, then the full `explain(formatted)` dump.",
        "",
    ]
    for title, expectation in HEADLINE.items():
        name = ALIAS.get(title, title)
        df = queries[name](spark, SF_DIR)
        plan = _elide_literals(formatted_plan(df))
        metrics = (
            f"shuffles={count_exchanges(df)} "
            f"broadcast_joins={count_broadcast_joins(df)} "
            f"pushed_filter_lists={len([f for f in pushed_filters(df) if f])} "
            f"partial_agg={has_partial_aggregation(df)}"
        )
        out += [
            f"## {title}",
            "",
            f"**Must show:** {expectation}",
            "",
            f"**Metrics:** `{metrics}`",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
