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


def test_round10_window_keeps_the_ledger_closed():
    """The driver hashes only the first 50 queries() entries. The
    round-10 window must contain (a) every query with NO driver
    record from r1-r9 (the two new r10 queries: the Lloyd's-trained
    IVF top-k and its recall certificate), so the
    every-query-has-a-record invariant survives the rotation,
    (b) every query whose code path r10 touched (the Bloom
    broadcast-probe restore; the _topk_ivf_probe refactor behind the
    untrained IVF pair), and (c) the deliberate rows-only cells next
    to their hash-green accuracy certificates. Rows-only entries
    inside the window stay limited to the ops whose raw outputs are
    engine-specific by design (the two xxhash64 twins)."""
    import json
    import os

    window = list(QUERIES)[:50]
    must_be_in_window = [
        # new r10 queries (no prior driver record)
        "ivf_trained_topk", "ivf_trained_recall_vs_exact",
        "ivfpq_trained_topk", "ivfpq_trained_recall_vs_exact",
        "gopher_quality_flags", "source_quota_sample",
        # r10-touched code paths re-certified
        "bloom_contamination_screen",
        "lineitem_corr_matrix", "quantity_price_corr_exact",
        "ivf_ann_topk", "ivf_ann_recall_vs_exact",
        # the shared-primitive family kept warm across the refactor
        "kmeans_topic_clusters", "kmeans_semdedup_stats",
        "ann_topk_cosine",
        # rows-only cells + their certificates stay paired in-window
        "lsh_ann_topk_xxhash", "simhash_xxhash_near_dup",
        "lsh_ann_recall_vs_exact",
        "simhash_injected_recall",
    ]
    assert not [n for n in must_be_in_window if n not in window]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs: dict = {}
    for r in (1, 2, 3, 4, 5, 6, 7, 8, 9):
        p = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
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
