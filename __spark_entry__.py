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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bottledwater_pg_spark.operators import cdc_queries
    from bottledwater_pg_spark.operators import queries as relational

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(cdc_queries.QUERIES)
    out.update(relational.QUERIES)
    from bottledwater_pg_spark.operators import llm_queries
    from bottledwater_pg_spark.streaming import queries as streaming_queries

    out.update(llm_queries.QUERIES)
    out.update(streaming_queries.QUERIES)
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
