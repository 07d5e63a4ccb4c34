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
    # the list deliberate — every entry here must be justified
    allowed_rows_only = {
        n for n in missing if n.startswith(("lsh_", "ivf_", "stream_"))
    } | {"hll_distinct_users_by_type"}  # sketch estimate: engine-specific
    assert set(missing) == allowed_rows_only, f"unexplained oracle-less: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES[name])
