"""Physical-plan inspection helpers — the tooling for keeping plans
honest at scale: is the filter pushed to the parquet scan, how many
exchanges (shuffles) does the plan have, did the small side broadcast,
how wide are the whole-stage-codegen spans.

Used by tests/test_plans.py to pin the *shape* of each operator's plan,
not just its output: a plan regression (lost pushdown, extra shuffle,
broadcast flipped to sort-merge) fails CI before it costs hours at
100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce partitions, but the exchange boundaries are decided here).
    Broadcast exchanges are excluded — they are the cheap kind."""
    # formatted mode prints shuffle exchanges as "(n) Exchange" nodes
    # (broadcasts are "(n) BroadcastExchange" — distinct node name)
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def count_data_exchanges(df: DataFrame) -> int:
    """Like :func:`count_exchanges`, excluding RoundRobinPartitioning
    exchanges — the deliberate read-side parallelizer for under-split
    local inputs (session.load_table(parallel=True) / parallel_scan),
    absent on real multi-split inputs. Plan pins that express "how
    many DATA shuffles does the algorithm need" count these
    separately."""
    plan = formatted_plan(df)
    total = len(re.findall(r"\(\d+\) Exchange\b", plan))
    rr = len(re.findall(
        r"\(\d+\) Exchange\b[^\n]*\n[^\n]*\n?[^\n]*RoundRobinPartitioning",
        plan,
    ))
    # formatted mode lists node args in the details section; fall back
    # to counting RoundRobinPartitioning mentions when the adjacency
    # heuristic finds none
    if rr == 0:
        rr = plan.count("RoundRobinPartitioning(")
    return total - rr


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin",
                          formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — verifies column pruning."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan does map-side partial aggregation before the
    exchange (HashAggregate with partial_ functions)."""
    return "partial_" in formatted_plan(df)
