"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side result transfer). Timing excludes Spark session startup
(that is a fixed ~20 s JVM cost, not a query cost) but includes all
planning, IO, shuffles, and Python-UDF work.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # CDC plane
    "cdc_materialize_customer",
    "cdc_materialize_events_composite",
    "cdc_topic_routing_counts",
    "cdc_history_scd2",
    "cdc_merge_sink_customer",
    "cdc_incremental_agg_customer",
    "cdc_incremental_agg_minmax",
    "cdc_stream_table_join",
    "cdc_schema_evolution_customer",
    "cdc_schema_evolution_drop",
    "cdc_skip_snapshot_customer",
    # relational plane
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top3_orders_per_segment",
    "asof_purchase_to_click",
    "large_volume_orders",
    "branded_bracket_revenue",
    "distinct_part_supp_counts",
    "market_share_by_year",
    "customer_order_distribution",
    "sole_late_suppliers",
    "part_profit_by_nation",
    "important_part_values",
    "interval_window_counts",
    # streaming ops (batch mode)
    "windowed_event_counts",
    "sliding_window_counts",
    "session_window_counts",
    "hierarchical_rollup_daily",
    # relational additions
    "clickers_never_purchased",
    "funnel_session_conversion",
    "user_retention_cohorts",
    "ntile_price_bands",
    "quartiles_order_value_by_segment",
    "q22_idle_balance_by_nation",
    # LLM pipeline
    "dedup_exact",
    "dedup_cluster_canonical",
    "lsh_minhash_near_dup",
    "prefix_jaccard_near_dup",
    "lsh_embedding_near_dup",
    "ann_topk_cosine",
    "ivf_ann_topk",
    "embedding_centroid_step",
    "text_stats_per_doc",
    "text_bpe_token_stats",
    "text_chunks",
    "winnow_near_dup_pairs",
    "dedup_cluster_canonical_star",
    "ngram_contamination",
    "simhash_md5_near_dup",
    "median_order_value_by_segment",
    "corpus_split_counts",
    "sequence_pack_stats",
    "pii_redaction_stats",
    "multimodal_decode_meta",
    "multimodal_ppm_stats",
    "doc_repetition_stats",
    "passage_dedup_stats",
    "corpus_shuffle_positions",
    "budget_mix_counts",
    "inverted_index_postings",
    "bm25_topk_docs",
    "fraud_rolling_anomalies",
    # round 4 additions
    "semdedup_prune_stats",
    "pagerank_copurchase",
    "weighted_sample_chars",
    "zorder_layout_stats",
    "mad_order_value_by_segment",
    "cdc_schema_evolution_widen",
    "incremental_dedup_matches",
    "multimodal_wav_stats",
    "bpe_pair_counts",
    "length_outlier_docs",
    "watermark_lag_profile",
    "rolling_7d_active_users",
    "data_quality_report",
    "cdc_state_checksum",
    "text_normalize_stats",
    "cdc_avro_envelope_roundtrip",
    "trending_event_types",
    "first_touch_attribution",
    "cdc_sequence_gap_audit",
    "nation_revenue_share_in_region",
    "resampled_user_values",
    "value_percentiles_by_type",
    "seasonal_deviation_hours",
    "top_quality_docs_per_source",
    "lineitem_corr_matrix",
    "cohort_ltv_triangle",
    "nations_covering_all_brands",
    # round 5 additions
    "cdc_add_primary_key_midstream",
    "cdc_error_policy_ddl",
    "pg_interval_roundtrip",
    "pg_timetz_roundtrip",
    # round 6 additions: sketch-accuracy certificates + registry
    # evolution decode
    "lsh_ann_recall_vs_exact",
    "ivf_ann_recall_vs_exact",
    "simhash_injected_recall",
    "hll_error_bound_by_type",
    "cdc_registry_evolution_decode",
    "cdc_many_table_fanout_state",
    "bloom_contamination_screen",
    "cms_heavy_users_certificate",
    "approx_quantile_rank_certificate",
    # round 7 additions: the newly hash-oracled md5 ANN/SimHash
    # variants (ivf_ann_topk is benched in the LLM block above), the
    # composite/enum type round-trip, and the two new LLM-pipeline
    # operators (BPE merge learning, LM quality filter)
    "lsh_ann_topk",
    "lsh_simhash_near_dup",
    "pg_composite_enum_roundtrip",
    "bpe_learn_merges",
    "lm_surprise_outliers",
    # round 8 additions: exact-substring duplicate spans (Lee et al.
    # 2022) and DSIR hashed-ngram importance weights (Xie et al. 2023)
    "exact_substring_spans",
    "dsir_importance_weights",
    "bpe_encode_stats",
    "pq_ann_topk",
    "pq_ann_recall_vs_exact",
    "ivfpq_ann_topk",
    "ivfpq_ann_recall_vs_exact",
    "supplier_triangle_counts",
    "token_pmi_topk",
    "supplier_kcore",
    # round 9 addition: the hashed-gram production variant of the
    # span audit (the gram shuffle moves longs; the textual twin
    # above stays benched as the exactness reference)
    "exact_substring_spans_hashed",
    "hll_distinct_users_by_type",
    "kmeans_topic_clusters",
    "kmeans_semdedup_stats",
    # round 10 additions: Lloyd's-trained IVF and IVF-PQ (2 training
    # rounds + the shared probe machinery; the untrained forms above
    # stay benched as the baselines)
    "ivf_trained_topk",
    "ivfpq_trained_topk",
    # round 10: Gopher rule filter + per-source quota cap
    "gopher_quality_flags",
    "source_quota_sample",
    # round 11: Gopher n-gram repetition gate (3 instance-level gram
    # shuffles) + CCNet perplexity terciles (LM kernel + 1 window)
    "gopher_repetition_ngram_flags",
    "ccnet_perplexity_buckets",
    # round 11 additions: SQ8 scalar-quantization ANN (full ADC scan
    # at 1/8 vector bytes) + the Matryoshka prefix-dim funnel (32-dim
    # shortlist, 150-deep exact re-rank) complete the quantization
    # ladder; containment near-dup is the asymmetric
    # (quote-expansion) dedup the Jaccard family can't see; the C4
    # line gate and UniMax waterfill are the two curation stages.
    "sq_ann_topk",
    "mrl_ann_topk",
    "containment_near_dup",
    "containment_near_dup_capped",
    "c4_line_filter_stats",
    "unimax_language_budgets",
    # round 11 s2: the trained quality classifier (one (doc,token)
    # shuffle + 4 balanced-perceptron rounds over a broadcast 5-long
    # weight row)
    "perceptron_quality_weights",
    # round 14: the hot-bucket star-capped LSH clustering (boilerplate
    # cohort fixture — the capped candidate path under load) and the
    # quantized-histogram IVM (continuous-domain support table)
    "lsh_hot_bucket_capped_clusters",
    "cdc_incremental_agg_minmax_hist",
    # cdc_replicate_all_counts is gate-checked but not benched: it is
    # the sum of the 10 per-table materializations benched above, and
    # re-timing the whole loop adds ~25 s of pure duplication
]


def streaming_soak(spark, sf_dir: str) -> dict:
    """Streaming-plane latency soak: replay the composite-key events
    CDC stream through StreamingMaterializer as N micro-batches
    (maxFilesPerTrigger=1 — the T3 backpressure shape), recording
    per-batch wall time and end-to-end events/s. The final state is
    count-checked against the batch materialization so the number is
    for a CORRECT pipeline, not a firehose."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.cdc_queries import EVENTS_SPEC
    from bottledwater_pg_spark.operators.materialize import materialize
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import generate_cdc
    from bottledwater_pg_spark.streaming.stream import (
        StreamingMaterializer,
        read_envelope_stream,
        write_envelope_stream,
    )

    base = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        ev = load_table(spark, sf_dir, "events")
        events = generate_cdc(
            ev, ["user_id", "event_id"], F.col("event_id"), 16386, "events",
            EVENTS_SPEC,
        )
        n_events = events.count()
        src = os.path.join(base, "events")
        # >= 20 micro-batches: long enough for state growth to show
        # (message_spec.rb:183-189 is the reference's leak guard)
        write_envelope_stream(events, src, num_files=20)
        mat = StreamingMaterializer(spark, os.path.join(base, "state"),
                                    ev.schema)
        batch_sec: list[float] = []
        orig = mat.process_batch

        def timed(batch, epoch_id):
            t0 = time.perf_counter()
            orig(batch, epoch_id)
            batch_sec.append(round(time.perf_counter() - t0, 3))

        mat.process_batch = timed
        t_start = time.perf_counter()
        q = mat.start(read_envelope_stream(spark, src, 1),
                      os.path.join(base, "ckpt"))
        q.processAllAvailable()
        q.stop()
        wall = round(time.perf_counter() - t_start, 3)
        n_state = mat.current_rows().count()
        n_batch_oracle = materialize(events, ev.schema).count()
        # state growth check: the compacted state holds live keys +
        # tombstones for every key ever deleted; expiring tombstones
        # (Kafka delete.retention analog, safe past the replay
        # horizon) must bring state rows back to exactly live keys
        rows_before_expiry = mat.read_state().count()
        # explicit replay horizon: the source stream is fully drained
        # (processAllAvailable returned), so every producer has
        # delivered through the max lsn in the event set
        replay_horizon = events.agg(F.max("lsn")).collect()[0][0]
        n_expired = mat.expire_tombstones(up_to_lsn=int(replay_horizon))
        rows_after_expiry = mat.read_state().count()
        ordered = sorted(batch_sec)
        return {
            "n_events": n_events,
            "n_batches": len(batch_sec),
            "batch_sec": batch_sec,
            "p50_batch_sec": ordered[len(ordered) // 2] if ordered else None,
            "max_batch_sec": ordered[-1] if ordered else None,
            "total_wall_sec": wall,
            "events_per_sec": round(n_events / wall, 1) if wall else None,
            "state_rows": n_state,
            "state_matches_batch": n_state == n_batch_oracle,
            "state_rows_before_expiry": rows_before_expiry,
            "tombstones_expired": n_expired,
            "state_rows_after_expiry": rows_after_expiry,
            "state_bounded_by_live_keys": rows_after_expiry == n_state,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def many_table_soak(spark, sf_dir: str) -> dict:
    """Many-table routing soak — the reference streams EVERY table in
    the database through one slot (snapshot.c:199-298). The same
    customer CDC event volume is sliced into N synthetic tables by a
    stable key hash and run through ONE MultiTableMaterializer at
    N=10, N=50, and N=200 (the reference's promise is EVERY table in
    the database — a 200-table schema is an ordinary production
    catalog). Reported: per-touched-table per-batch cost at each
    width; a flatness ratio ~1 means adding tables costs only the
    tables actually touched — the property the whole-database promise
    needs. Parity: the 3 busiest tables at the widest width are
    count-checked against their direct batch materialization."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.cdc_queries import CUSTOMER_SPEC
    from bottledwater_pg_spark.operators.materialize import materialize
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import generate_cdc
    from bottledwater_pg_spark.streaming.stream import (
        MultiTableMaterializer,
        read_envelope_stream,
        write_envelope_stream,
    )

    cust = load_table(spark, sf_dir, "customer")
    base_stream = generate_cdc(
        cust, ["c_custkey"], F.col("c_custkey"), 0, "t", CUSTOMER_SPEC
    )
    out: dict = {}
    parity_ok = None
    widths = (10, 50, 200, 500, 1000)
    for n_tables in widths:
        stream = base_stream.withColumn(
            "relid",
            (F.lit(20000) + F.pmod(F.xxhash64("key"), F.lit(n_tables)))
            .cast("long"),
        ).withColumn(
            "topic", F.concat(F.lit("t"), (F.col("relid") - 20000))
        )
        tmp = tempfile.mkdtemp(prefix=f"bench_mt{n_tables}_")
        try:
            src = os.path.join(tmp, "events")
            write_envelope_stream(stream, src, num_files=2)
            mat = MultiTableMaterializer(
                spark, os.path.join(tmp, "state"),
                {20000 + i: (f"t{i}", cust.schema)
                 for i in range(n_tables)},
            )
            t0 = time.perf_counter()
            q = mat.start(read_envelope_stream(spark, src, 1),
                          os.path.join(tmp, "ckpt"))
            q.processAllAvailable()
            q.stop()
            wall = round(time.perf_counter() - t0, 3)
            n_batches = 2
            out[f"wall_sec_{n_tables}_tables"] = wall
            out[f"per_table_batch_sec_{n_tables}"] = round(
                wall / (n_tables * n_batches), 4
            )
            if n_tables == widths[-1]:
                sp = stream.persist()
                busiest = [
                    r["relid"]
                    for r in sp.groupBy("relid").count()
                    .orderBy(F.desc("count"), "relid").limit(3).collect()
                ]
                parity_ok = all(
                    mat.current_rows(r) is not None
                    and mat.current_rows(r).count()
                    == materialize(
                        sp.filter(F.col("relid") == r), cust.schema
                    ).count()
                    for r in busiest
                )
                sp.unpersist()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    out["flatness_ratio_50_vs_10"] = round(
        out["per_table_batch_sec_50"] / out["per_table_batch_sec_10"], 3
    )
    out["flatness_ratio_200_vs_50"] = round(
        out["per_table_batch_sec_200"] / out["per_table_batch_sec_50"], 3
    )
    # r10: the 500-table width — the reference's table_mapper is
    # explicitly per-relid O(1) (table_mapper.c:58-64); this records
    # whether ours keeps per-table cost flat past an ordinary
    # production catalog's size
    out["flatness_ratio_500_vs_200"] = round(
        out["per_table_batch_sec_500"] / out["per_table_batch_sec_200"], 3
    )
    # r11: the 1000-table decade (VERDICT r10 ask #3) — three r10
    # readings at 500 spread 0.904-1.144 across bench mixes, so the
    # curve needed one more decade to call
    out["flatness_ratio_1000_vs_500"] = round(
        out["per_table_batch_sec_1000"] / out["per_table_batch_sec_500"], 3
    )
    out["parity_3_sampled_tables"] = parity_ok
    return out


def scale_soak(spark, sf_dir: str, factor: int = 10) -> dict:
    """Measured scaling evidence: run two representative operators
    (MinHash-LSH dedup, CDC compaction) at x1 and x{factor} of the
    bench fixtures — union-replicated with key offsets and per-replica
    token prefixes (scale_fixtures.py), so the x{factor} corpus
    behaves like {factor} independent shards of fresh data. Reported
    per op: wall at both scales, the ratio, and superlinearity =
    ratio/factor (1.0 = perfectly linear; <= ~1.3 is the budget —
    scheduling constants and bigger shuffles). The FULL soak over the
    five most expensive operators is scripts/scale_soak.py, recorded
    in SCALE.md."""
    import shutil
    import tempfile

    from bottledwater_pg_spark.operators.cdc_queries import (
        cdc_materialize_customer,
    )
    from bottledwater_pg_spark.operators.llm_queries import (
        lsh_minhash_near_dup,
    )
    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir
    from bottledwater_pg_spark.session import release_persisted

    ops = [
        ("lsh_minhash_near_dup", lsh_minhash_near_dup),
        ("cdc_materialize_customer", cdc_materialize_customer),
    ]
    base = tempfile.mkdtemp(prefix="bench_scale_")
    out: dict = {"factor": factor}
    try:
        dirs = {
            f: build_scaled_dir(
                spark, sf_dir, os.path.join(base, f"x{f}"), f,
                tables=("documents", "customer"),
            )
            for f in (1, factor)
        }
        for name, fn in ops:
            release_persisted()
            fn(spark, dirs[1]).count()  # absorb per-op cold start
            rec = {}
            for f in (1, factor):
                release_persisted()
                t0 = time.perf_counter()
                rec[f"x{f}_rows"] = fn(spark, dirs[f]).count()
                rec[f"x{f}_sec"] = round(time.perf_counter() - t0, 3)
            rec["ratio"] = round(rec[f"x{factor}_sec"] / rec["x1_sec"], 2)
            rec["superlinearity"] = round(rec["ratio"] / factor, 3)
            out[name] = rec
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


# r15 (VERDICT r14 ask #2): the CPU-bound ×10 cell. At sf0.1 every
# headline query is fixed-overhead/scheduler-bound — PERF_r14's
# 8-core/32-core ratios read 0.74-0.92 across the whole top list, so
# the bench had no parallelism signal left for optimization work.
# The five heaviest families re-run against a ×10 union-replicated
# fixture dir (scale_fixtures.py, the same machinery as scale_soak),
# where per-row compute dominates the per-job floor; the driver's
# low-core re-run then measures real CPU scaling on these cells.
# The ×10 timings are ADDED to the queries map under an ``x10_``
# prefix (additions only — every sf0.1 entry keeps its name and
# meaning); the headline ``value`` stays the sf0.1 sum so
# total_wall_sec remains comparable to rounds 1-14.
X10_CELL = [
    "containment_near_dup",
    "lsh_hot_bucket_capped_clusters",
    "pagerank_copurchase",
    "cdc_merge_sink_customer",
    "winnow_near_dup_pairs",
]
X10_TABLES = ("documents", "customer", "orders", "lineitem")


def x10_cell(spark, sf_dir: str, queries) -> dict[str, float]:
    """Noop-sink timings of the X10_CELL queries at 10x scale — same
    methodology as the main list (untimed warmup, then min of 2 timed
    passes with the second in reverse order). Keys are ``x10_<name>``."""
    import shutil
    import tempfile

    from bottledwater_pg_spark.scale_fixtures import build_scaled_dir

    base = tempfile.mkdtemp(prefix="bench_x10cell_")
    timings: dict[str, float] = {}
    try:
        d = build_scaled_dir(
            spark, sf_dir, os.path.join(base, "x10"), 10, tables=X10_TABLES
        )
        for name in X10_CELL:
            queries[name](spark, d).write.mode("overwrite").format(
                "noop"
            ).save()
        for order in (X10_CELL, list(reversed(X10_CELL))):
            for name in order:
                t0 = time.perf_counter()
                queries[name](spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                elapsed = round(time.perf_counter() - t0, 3)
                key = f"x10_{name}"
                timings[key] = min(timings.get(key, elapsed), elapsed)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return timings


# Host-speed calibration constants: the three control queries have
# been code-identical since round 1; these are their round-1 driver
# timings (see controls block note in main()).
CONTROLS_R01 = {
    "cdc_materialize_customer": 0.846,
    "q1_pricing_summary": 0.749,
    "pii_redaction_stats": 0.269,
}

#: declared validity band for the interleaved control samples, as the
#: max/min ratio across all control ratio samples in ONE run. In-band
#: sessions have measured ~1.7x (r11: 1.45-2.48); the r11 driver
#: snapshot that was taken mid-throttle spread 1.91-20.29 (~10.6x) and
#: its in-mix numbers contradicted every isolated re-measurement. A
#: run outside the band gets ONE extra reversed timed pass (min-merge
#: absorbs the throttling window) and is flagged either way — a final
#: artifact must say on its face whether its own controls trust it.
CONTROL_SPREAD_BAND = 3.0


def run_controls(queries, spark, sf_dir: str) -> dict[str, float]:
    """One timed pass over the three control queries — called at
    several points THROUGH the bench run (r10 verdict ask #6: the
    host throttles episodically, so a single-point 3-query control
    is noisy at the +-15% level; interleaving 3 passes and taking the
    median-of-9 ratios averages over the throttling windows the same
    way the reversed second query pass does)."""
    out: dict[str, float] = {}
    for name in CONTROLS_R01:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("bottledwater-bench")
    queries = entry.queries()

    # Warmup pass: run every query once untimed. The first execution in
    # a fresh JVM pays JIT compilation, codegen-compiler warmup, Python
    # worker spawn, and OS page-cache fill — measured cold-vs-warm
    # variance is >10x, which would swamp any real regression signal.
    # The timed pass below measures steady-state execution.
    for name in BENCH_QUERIES:
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # min of 2 timed passes: the host shows episodic multi-x CPU
    # throttling; min is the standard noise-robust bench estimator.
    # The second pass runs in REVERSE order so a throttling window (or
    # a Python-worker-heavy neighbor) never hits the same query in both
    # passes. Control passes interleave before/between/after the two
    # query passes (median-of-9 host calibration, see run_controls).
    timings: dict[str, float] = {}
    control_runs = [run_controls(queries, spark, sf_dir)]

    def timed_pass(order) -> None:
        for name in order:
            fn = queries[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
        control_runs.append(run_controls(queries, spark, sf_dir))

    for order in (BENCH_QUERIES, list(reversed(BENCH_QUERIES))):
        timed_pass(order)

    def control_ratios() -> list[float]:
        return sorted(
            run[name] / r01
            for run in control_runs
            for name, r01 in CONTROLS_R01.items()
            if name in run
        )

    # control-spread validity gate: a run whose own interleaved
    # controls disagree by more than the declared band was throttled
    # mid-run — its in-mix numbers are weather, not code. One extra
    # reversed pass lets min() absorb the throttling window; the
    # in_band flag below records the final verdict either way.
    ratios = control_ratios()
    spread_ratio = (
        round(ratios[-1] / ratios[0], 3) if ratios else None
    )
    throttle_retry = False
    if spread_ratio is not None and spread_ratio > CONTROL_SPREAD_BAND:
        throttle_retry = True
        timed_pass(list(reversed(BENCH_QUERIES)))
        ratios = control_ratios()
        spread_ratio = round(ratios[-1] / ratios[0], 3)

    # CDC throughput: events generated+compacted+decoded per second,
    # from the materialize queries' event volumes and min timings
    # (SURVEY §7.3 step 9 calls for an events/sec figure)
    # measure on the LARGEST materialized stream (events, composite key)
    # so per-job fixed overhead doesn't dominate the rate
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.cdc_queries import (
        EVENTS_SPEC,
        generate_cdc,
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    n_events = generate_cdc(
        ev, ["user_id", "event_id"], F.col("event_id"), 16386, "events",
        EVENTS_SPEC,
    ).count()
    cdc_eps = round(n_events / timings["cdc_materialize_events_composite"], 1)

    total = round(sum(timings.values()), 3)
    # Host-speed calibration, recorded IN the bench output so
    # cross-round normalization is mechanical (BASELINE.md: r1->r2
    # drifted 2.7x with zero code change). The three control queries
    # have been code-identical since round 1; `r01` holds their
    # round-1 driver timings. host_speed_ratio ~ 1.0 means an
    # r1-speed host; ~2 means this host runs identical plans 2x
    # slower, and other timings should be divided by it before
    # comparing to the baseline.
    controls_r01 = CONTROLS_R01
    host_ratio = round(ratios[len(ratios) // 2], 3) if ratios else None
    streaming = streaming_soak(spark, sf_dir)
    many_table = many_table_soak(spark, sf_dir)
    scaling = scale_soak(spark, sf_dir)
    # the CPU-bound ×10 cell: added to the per-query map (new names
    # only); `total` above stays the sf0.1 sum for r1-r14 continuity,
    # and n_queries keeps counting the sf0.1 list that sum covers
    n_sf_queries = len(timings)
    x10 = x10_cell(spark, sf_dir, queries)
    timings.update(x10)
    x10_total = round(sum(x10.values()), 3)
    controls = {
        "r01_sec": controls_r01,
        # per-control MEDIAN across the interleaved passes (the old
        # single-point this_run_sec, made robust)
        "this_run_sec": {
            n: sorted(run[n] for run in control_runs)[len(control_runs) // 2]
            for n in controls_r01
        },
        "interleaved_runs_sec": control_runs,
        "host_speed_ratio_vs_r01": host_ratio,
        # spread across all interleaved ratio samples: the honest
        # noise band around the median — per-round deltas smaller
        # than this spread are weather, not code
        "host_speed_ratio_spread": [
            round(ratios[0], 3), round(ratios[-1], 3)
        ] if ratios else None,
        "n_ratio_samples": len(ratios),
        # the validity gate (r11 verdict ask #3): spread_ratio is
        # max/min across the interleaved control samples; a run with
        # in_band=false got the extra pass and STILL disagrees with
        # itself — read its per-query numbers as throttle weather
        "spread_band": CONTROL_SPREAD_BAND,
        "spread_ratio": spread_ratio,
        "in_band": (
            spread_ratio is not None
            and spread_ratio <= CONTROL_SPREAD_BAND
        ),
        # True iff an extra reversed pass RAN because the first
        # control spread exceeded the band (r12 verdict nit: the old
        # name "throttle_retry_pass" read as pass/fail)
        "throttle_retry_ran": throttle_retry,
    }
    full = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cdc_events_per_sec": cdc_eps,
        "x10_cell_total_sec": x10_total,
        "streaming": streaming,
        "many_table": many_table,
        "scale_soak": scaling,
        "controls": controls,
    }
    # Full per-query detail: one line on stdout AND a local artifact
    # (the detail line is ~5 KB, larger than the driver's tail
    # capture, so the file is the durable record).
    print(json.dumps(full))
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_LOCAL_latest.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    # Second-to-last line: the mid-size summary (controls, soaks) that
    # used to BE the last line. r14 postmortem (VERDICT r14 ask #1):
    # with many_table + scale_soak + controls inline it exceeded the
    # driver's tail-capture window, truncating the line's LEADING
    # '"value"' field away — PERF_r14 read prev_bench_ok=false and
    # lost the whole round-over-round comparison. The detail now rides
    # one line up; the LAST line below is guaranteed-small.
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": n_sf_queries,
                "n_x10_cells": len(x10),
                "cdc_events_per_sec": cdc_eps,
                "x10_cell_total_sec": x10_total,
                "streaming_p50_batch_sec": streaming.get("p50_batch_sec"),
                "streaming_events_per_sec": streaming.get("events_per_sec"),
                "many_table": many_table,
                "scale_soak": scaling,
                "controls": controls,
                "queries_detail_file": "BENCH_LOCAL_latest.json",
            }
        )
    )
    # LAST line: minimal and bounded (~1.2 KB: scalars + the 12
    # slowest sf0.1 queries + the 5 ×10 cells), so the driver's tail
    # capture always parses `value` and has a per-query map for the
    # round-over-round and core-count-scaling comparisons.
    tail_queries = dict(
        sorted(
            ((n, s) for n, s in timings.items() if not n.startswith("x10_")),
            key=lambda kv: -kv[1],
        )[:12]
    )
    tail_queries.update({n: timings[n] for n in sorted(x10)})
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": n_sf_queries,
                "n_x10_cells": len(x10),
                "cdc_events_per_sec": cdc_eps,
                "x10_cell_total_sec": x10_total,
                "queries": tail_queries,
                "queries_truncated_to_slowest": 12,
                "queries_detail_file": "BENCH_LOCAL_latest.json",
            }
        )
    )


if __name__ == "__main__":
    main()
