"""Mirror of the driver's correctness gate: run every ``queries()``
entry and its ``oracle_sql()`` twin side by side, compare row count,
column set, and values (order-insensitive). Catches any mismatch
before the driver does."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_df_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = [name for name in QUERIES if name not in ORACLES]
    # non-SQL-expressible ops are allowed to omit the oracle, but keep
    # the list deliberate — every entry here must be justified:
    # the two xxhash64 production twins (DuckDB cannot recompute the
    # hash; their md5 variants are fully oracled and their accuracy is
    # hash-certified). The HLL estimate left this list in r9: the
    # own-register estimator is DuckDB-replayable, so
    # hll_distinct_users_by_type is now fully hash-oracled.
    allowed_rows_only = {
        "lsh_ann_topk_xxhash",
        "simhash_xxhash_near_dup",
    }
    assert set(missing) == allowed_rows_only, f"unexplained oracle-less: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES[name])


def test_driver_window_keeps_the_ledger_closed():
    """The driver hashes only the first 50 queries() entries. The
    current (round-15) window must contain (a) every query with NO
    driver record from r1-r10 (the r11-r13 additions), so the
    every-query-has-a-record invariant survives the rotation,
    (b) every query whose code path the current round touched (the
    df_cap containment hatch, the IVM min/max support fold, and the
    manifest-commit state path behind the cdc IVM/materialize
    queries), and (c) the deliberate rows-only cells next to their
    hash-green accuracy certificates. Rows-only entries inside the
    window stay limited to the ops whose raw outputs are
    engine-specific by design (the two xxhash64 twins)."""
    import json
    import os

    window = list(QUERIES)[:50]
    must_be_in_window = [
        # new r13 queries (no prior driver record) + r13-touched paths
        "containment_near_dup_capped", "cdc_incremental_agg_minmax",
        "cdc_incremental_agg_customer", "cdc_materialize_customer",
        "containment_near_dup",
        # new r11 queries (no prior driver record)
        "gopher_repetition_ngram_flags", "ccnet_perplexity_buckets",
        # r11-refactored code paths re-certified
        "gopher_quality_flags", "lm_surprise_outliers",
        "incremental_dedup_matches", "pagerank_copurchase",
        # the r10 additions age one more round in-window
        "ivf_trained_topk", "ivf_trained_recall_vs_exact",
        "ivfpq_trained_topk", "ivfpq_trained_recall_vs_exact",
        # r15-touched paths rotated in (single-action read
        # repartition; the count-folded CMS aggregation; plus the
        # merge sink / containment / dedup families already present)
        "cdc_stream_table_join", "cdc_topic_routing_counts",
        "cms_heavy_users_certificate",
        "cdc_merge_sink_customer",
        # rows-only cells + their certificates stay paired in-window
        "lsh_ann_topk_xxhash", "simhash_xxhash_near_dup",
        "lsh_ann_recall_vs_exact",
        "simhash_injected_recall",
    ]
    assert not [n for n in must_be_in_window if n not in window]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs: dict = {}
    for r in range(1, 15):
        p = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(p):
            p = os.path.join(repo, f"CORRECTNESS_r{r}.json")
        if os.path.exists(p):
            recs.update(json.load(open(p)))
    uncovered = [
        n for n in QUERIES if n not in recs and n not in window
    ]
    assert not uncovered, uncovered
    allowed_rows_only = {
        "lsh_ann_topk_xxhash", "simhash_xxhash_near_dup",
    }
    unoracled = [
        n for n in window if n not in ORACLES and n not in allowed_rows_only
    ]
    assert not unoracled, unoracled
