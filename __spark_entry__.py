"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC pipeline — generate the change stream for
    customer at sf0.001, materialize latest-state-by-key (tombstones,
    PK-change rewrite), then aggregate account balances per market
    segment on the materialized state."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.cdc_queries import cdc_materialize_customer

    state = cdc_materialize_customer(spark, "/root/testdata/sf0.001")
    return (
        state.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# Dict order is meaningful: the driver's correctness gate hashes the
# FIRST 50 entries each round. After r1-r4, 121 of 153 queries hold a
# driver record; this round's window closes the ledger: the 32 queries
# no driver round has ever hashed (r1-r4 leftovers + late-r4
# additions) fill slots 1-32, the 4 new r5 queries (ADD PRIMARY KEY
# mid-stream, error-policy x DDL, interval/timetz round-trips) take
# 33-36, and the rest re-certifies every query whose code path changed
# this round (top-k plan rewrites, pagerank node encoding, avro codec
# NaN handling, errors.py). With this window EVERY query in the ledger
# has a driver record from some round. scripts/exact_gate.py still
# re-certifies all 157 locally (EXACTGATE_r5.json).
_FAMILY_SPREAD = [
    # ---- ROUND 15 rotation (optimization round 2): slots for what
    # r15 touched that was OUT of window — cdc_stream_table_join +
    # cdc_topic_routing_counts (both gained the single-action
    # under-split read repartition; records live in CORRECTNESS_r08)
    # and cms_heavy_users_certificate (count folded into the sketch
    # aggregation; records in CORRECTNESS_r01-r10). The other r15
    # touches were already in-window: cdc_merge_sink_customer slot 3
    # (single-pass merge batch), containment pair slots 4/11 + the
    # dedup/minhash family slots 44-48 (shared persisted size
    # tables), lsh_hot_bucket slot 1, supplier_kcore slot 38.
    # Rotated out to make room (multi-round records in
    # CORRECTNESS_r12-r14, code untouched this round):
    # sq_ann_recall_vs_exact, mrl_ann_recall_vs_exact,
    # source_quota_sample.
    "cdc_stream_table_join", "cdc_topic_routing_counts",
    "cms_heavy_users_certificate",
    # ---- ROUND 14 window: the driver hashes the FIRST 50 entries.
    # Slots 1-3 are what r14 changed most: lsh_hot_bucket_capped_
    # clusters (NEW — MinHash-LSH hot-bucket star cap on the
    # boilerplate-cohort fixture; oracle = DuckDB recursive closure
    # over brute-force pairs, certifying component equality),
    # cdc_incremental_agg_minmax_hist (NEW — quantized-histogram IVM
    # for continuous domains; COUNT/SUM exact, extrema as width-exact
    # bucket-edge bounds the oracle recomputes from the final state),
    # and cdc_merge_sink_customer (the MERGE sink now commits bucket
    # state by per-bucket manifest pointer flip — BucketManifestState
    # — instead of dynamic partition overwrite). Slots 4-6 keep r13's
    # three: the IVM family's maintainer gained the first-commit
    # zero-support prune and the statecommit promote fast path this
    # round, so they re-certify the changed path; the manifest commit
    # also re-certifies through cdc_materialize_customer (slot 50),
    # and minhash_lsh_pairs' max_bucket branch re-certifies the
    # uncapped default through lsh_minhash_near_dup + the cluster
    # pair (slots 45-47). Rotated out to make room (records live in
    # CORRECTNESS_r10-r13): lineitem_corr_matrix,
    # quantity_price_corr_exact, hll_error_bound_by_type. The xxhash
    # rows-only cells keep their hash-green accuracy certificates
    # paired in-window.
    "lsh_hot_bucket_capped_clusters", "cdc_incremental_agg_minmax_hist",
    "cdc_merge_sink_customer",
    "containment_near_dup_capped", "cdc_incremental_agg_minmax",
    "cdc_incremental_agg_customer",
    # ---- r12 window below (kept: it still covers the r12 paths).
    # Slots 4-11: the eight r11 session-2 queries — the SQ8
    # scalar-quantization ANN pair (per-dim 8-bit grids, ADC scan,
    # recall certificate), the Matryoshka prefix-dim funnel pair
    # (32-dim shortlist, exact full-dim re-rank), containment
    # near-dup (asymmetric quote-expansion dedup the Jaccard family
    # is blind to), the C4 line-level cleaning stage, the UniMax
    # language-budget waterfill, and the trained perceptron quality
    # classifier (class-balanced batch training unrolled into SQL
    # CTEs).
    "sq_ann_topk",
    "mrl_ann_topk",
    "containment_near_dup", "c4_line_filter_stats",
    "unimax_language_budgets", "perceptron_quality_weights",
    # Slots 9-10: the two queries new in the first r11 session —
    # Gopher's n-gram repetition gate (Rae et al. 2021 A1 char-mass
    # bounds; the fixture injects one repetitive twin per source so
    # BOTH sides of every threshold are certified) and CCNet
    # head/middle/tail perplexity terciles (Wenzek et al. 2020;
    # ntile(3) per source over the integer bigram-surprise kernel,
    # id/score checksums pin the full assignment).
    "gopher_repetition_ngram_flags", "ccnet_perplexity_buckets",
    # Slots 11-14: r11-REFACTORED code paths re-certified in-window:
    # gopher_quality_flags now runs on the shared with_gopher_flags
    # kernel (the streaming gate's), lm_surprise_outliers on the
    # shared _lm_surprise_per_doc kernel (ccnet's),
    # incremental_dedup_matches counts DISTINCT shingles (duplicate
    # index copies no longer inflate jaccard), pagerank_copurchase's
    # edge build moved into copurchase_edges.
    "gopher_quality_flags", "lm_surprise_outliers",
    "incremental_dedup_matches", "pagerank_copurchase",
    # Slots 15-19: the r10 additions age one more round in-window
    # (trained IVF/IVF-PQ + recall certificates, per-source quota).
    "ivf_trained_topk", "ivf_trained_recall_vs_exact",
    "ivfpq_trained_topk", "ivfpq_trained_recall_vs_exact",
    # Next: the deliberate rows-only cells next to their hash-green
    # accuracy certificates (xxhash64 twins — DuckDB cannot recompute
    # those outputs by design), and the hashed-gram span variant.
    "lsh_ann_topk_xxhash", "simhash_xxhash_near_dup",
    "exact_substring_spans_hashed",
    # Next: the most expensive audited plans kept warm (bloom probe,
    # corr string-cast ULP fix, HLL, winnowing, replicate, error
    # policy, graph census) — r10's re-certification block ages in.
    "bloom_contamination_screen",
    "hll_distinct_users_by_type",
    "winnow_near_dup_pairs", "doc_fingerprint_winnow",
    "dedup_cluster_ensemble", "exact_substring_spans",
    "cdc_replicate_all_counts",
    "cdc_error_policy_ddl", "cdc_error_policy_log",
    "supplier_kcore", "supplier_triangle_counts",
    # Next: the lsh/simhash accuracy certificates stay paired with
    # their rows-only xxhash twins above.
    "lsh_ann_recall_vs_exact", "simhash_injected_recall",
    # Next: the dedup family kept warm (incremental_lsh_matches'
    # count_distinct fix touches the family's shared verify shape).
    "lsh_embedding_near_dup",
    "semdedup_prune_stats", "dedup_cluster_canonical_star",
    "dedup_cluster_canonical", "lsh_minhash_near_dup",
    "simhash_md5_near_dup", "dedup_ngram_jaccard",
    "dedup_threshold_sensitivity",
    # To the 50 boundary: flagship + certificates.
    "cdc_materialize_customer",
    # ---- rotated out in r15 (records in CORRECTNESS_r12-r14):
    "sq_ann_recall_vs_exact", "mrl_ann_recall_vs_exact",
    "source_quota_sample",
    # ---- rotated out in r14 (records in CORRECTNESS_r10-r13):
    "lineitem_corr_matrix", "quantity_price_corr_exact",
    "hll_error_bound_by_type",
    # ---- rotated out in r13 (driver records in CORRECTNESS_r09-r12):
    "ivf_ann_recall_vs_exact",
    "kmeans_topic_clusters", "kmeans_semdedup_stats",
    # ---- rotated out in r11 session 2 to make room for the eight
    # new slots (driver records live in CORRECTNESS_r01-r10):
    # cdc_merge_sink_customer,
    # q1_pricing_summary, fraud_rolling_anomalies,
    # cdc_registry_evolution_decode, cms_heavy_users_certificate,
    # approx_quantile_rank_certificate, ivfpq_ann_topk,
    # ann_topk_cosine; earlier rotations: lsh_ann_topk, ivf_ann_topk.
    # (cdc_merge_sink_customer moved to slot 3 this round.)
    "q1_pricing_summary", "fraud_rolling_anomalies",
    "cdc_registry_evolution_decode",
    "cms_heavy_users_certificate",
    "approx_quantile_rank_certificate",
    "ivfpq_ann_topk", "ann_topk_cosine",
    "lsh_ann_topk", "ivf_ann_topk",
    # ---- rotated out in r10 (driver records live in
    # CORRECTNESS_r09): token_pmi_topk, pg_composite_enum_roundtrip,
    # median/mad_order_value_by_segment,
    # quartiles_order_value_by_segment, value_percentiles_by_type,
    # bpe_learn_merges, bpe_encode_stats, dsir_importance_weights,
    # pq_ann_topk.
    "token_pmi_topk", "pg_composite_enum_roundtrip",
    "median_order_value_by_segment", "mad_order_value_by_segment",
    "quartiles_order_value_by_segment", "value_percentiles_by_type",
    "bpe_learn_merges", "bpe_encode_stats",
    "dsir_importance_weights", "pq_ann_topk",
    # ---- rotated out in r9 (driver records live in
    # CORRECTNESS_r08): pq_ann_recall_vs_exact,
    # ivfpq_ann_recall_vs_exact, cdc_export_snapshot_counts,
    # cdc_skip_snapshot_customer, cdc_many_table_fanout_state,
    # lsh_simhash_near_dup, cdc_stream_table_join, bm25_topk_docs,
    # alpha_mixture_weights, ngram_diversity_by_source,
    # pg_interval_roundtrip, pg_timetz_roundtrip,
    # cdc_topic_routing_counts.
    "pq_ann_recall_vs_exact", "ivfpq_ann_recall_vs_exact",
    "cdc_export_snapshot_counts", "cdc_skip_snapshot_customer",
    "cdc_many_table_fanout_state", "lsh_simhash_near_dup",
    "cdc_stream_table_join", "bm25_topk_docs",
    "alpha_mixture_weights", "ngram_diversity_by_source",
    "pg_interval_roundtrip", "pg_timetz_roundtrip",
    "cdc_topic_routing_counts",
    # ---- 50-entry window boundary (everything below already has a
    # driver record from r1-r4 and is re-certified in EXACTGATE_r5)
    "winnow_near_dup_pairs", "simhash_md5_near_dup",
    "semdedup_prune_stats",
    "weighted_sample_chars", "zorder_layout_stats",
    "mad_order_value_by_segment", "cdc_schema_evolution_widen",
    "incremental_dedup_matches", "multimodal_wav_stats",
    "bpe_pair_counts", "length_outlier_docs", "watermark_lag_profile",
    "rolling_7d_active_users", "data_quality_report",
    "cdc_schema_evolution_drop", "cdc_schema_evolution_rename",
    "cdc_zero_column_table", "cdc_skip_snapshot_customer",
    "cdc_export_snapshot_counts",
    "important_part_values", "value_histogram",
    "quantity_price_corr_exact", "fuzzy_supplier_pairs",
    "quartiles_order_value_by_segment",
    "asof_click_to_next_purchase", "ntile_price_bands",
    "supplier_balance_distribution", "top_orderkeys_csv_per_segment",
    "clickers_never_purchased", "orders_in_price_band",
    "unpivot_segment_metrics", "monthly_order_momentum",
    "order_quantity_profiles", "order_calendar_breakdown",
    "funnel_session_conversion", "user_retention_cohorts",
    "dedup_cluster_canonical_star", "dedup_ngram_jaccard",
    "lsh_embedding_near_dup",
    "text_langid", "doc_fingerprint_winnow", "stratified_sample_docs",
    "corpus_shuffle_positions", "sequence_pack_stats",
    "inverted_index_postings",
    "session_window_counts",
    "hierarchical_rollup_daily",
    "ngram_contamination",
    "dedup_cluster_canonical",
    "cdc_incremental_agg_customer", "cdc_scd2_as_of",
    "cdc_snapshot_diff_customer", "cdc_history_scd2",
    "cdc_kafka_sink_shape",
    "cdc_materialize_events_composite", "cdc_append_unkeyed",
    "cdc_topic_routing_counts",
    "cdc_schema_evolution_customer",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "shipmode_case_agg",
    "market_share_by_year", "part_profit_by_nation", "sole_late_suppliers",
    "q22_idle_balance_by_nation", "recursive_hierarchy_depths",
    "top3_orders_per_segment", "rollup_order_stats", "pivot_status_by_segment",
    "customers_in_both_statuses", "asof_purchase_to_click",
    "interval_window_counts", "json_props_aggregation",
    "variant_props_aggregation", "skewed_agg_salted", "pg_array_roundtrip",
    "hstore_roundtrip",
    "dedup_exact",
    "dedup_embedding_cosine", "ann_topk_cosine", "embedding_centroid_step",
    "text_stats_per_doc", "doc_repetition_stats", "passage_dedup_stats",
    "pii_redaction_stats", "corpus_split_counts",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bottledwater_pg_spark.operators import cdc_queries
    from bottledwater_pg_spark.operators import llm_queries
    from bottledwater_pg_spark.operators import queries as relational
    from bottledwater_pg_spark.streaming import queries as streaming_queries

    from bottledwater_pg_spark.session import release_persisted

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(cdc_queries.QUERIES)
    merged.update(relational.QUERIES)
    merged.update(llm_queries.QUERIES)
    merged.update(streaming_queries.QUERIES)

    def _released(fn):
        # Queries run sequentially; by the time query N+1 is built,
        # query N's action has finished — drop its tracked persisted
        # intermediates so cache pressure doesn't accumulate across a
        # 100+ query run.
        def wrapped(spark, sf_dir, _fn=fn):
            release_persisted()
            return _fn(spark, sf_dir)

        return wrapped

    merged = {n: _released(f) for n, f in merged.items()}
    out = {n: merged[n] for n in _FAMILY_SPREAD if n in merged}
    out.update({n: f for n, f in merged.items() if n not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted only for
    genuinely non-SQL-expressible ops — driver then does a rows-only
    check)."""
    from bottledwater_pg_spark.operators import cdc_queries
    from bottledwater_pg_spark.operators import queries as relational

    out: dict[str, str] = {}
    out.update(cdc_queries.ORACLES)
    out.update(relational.ORACLES)
    from bottledwater_pg_spark.operators import llm_queries
    from bottledwater_pg_spark.streaming import queries as streaming_queries

    out.update(llm_queries.ORACLES)
    out.update(streaming_queries.ORACLES)
    return out
