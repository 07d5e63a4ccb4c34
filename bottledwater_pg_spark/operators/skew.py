"""Skew-resistant aggregation and join helpers — the 100 TB answer to
hot keys.

A straight ``groupBy(key)`` on a low-cardinality or Zipf-hot key sends
every row for the hot key through one reducer. The fixes:

* **Two-phase salted aggregation**: aggregate on (key, salt) first —
  the hot key fans out across ``salt_buckets`` reducers — then combine
  the partials per key. Works for any algebraic aggregate (sum, count,
  min, max); here implemented for sum/count shapes.
* **Salted broadcast-side replication join**: replicate the small side
  per salt value, salt the big side randomly — every hot-key row still
  meets its match, but across many partitions.
* AQE's ``skewJoin`` handles the sort-merge case automatically (on in
  session.py); these helpers cover aggregation skew and the explicit
  salting pattern the optimizer can't infer.

Results are EXACTLY equal to the unsalted plan (sum/count are
associative-commutative; decimal accumulation keeps it engine-exact),
so the salted queries share the plain GROUP BY oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    sum_exprs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``sum_exprs`` maps output column name -> column expression to SUM
    (use a decimal cast for money). A ``<name>_cnt`` helper isn't
    emitted; pass ``F.lit(1)`` to count.

    Phase 1 shuffles on (key, salt) — hot keys split ``salt_buckets``
    ways; phase 2 shuffles only |keys| x salt_buckets partial rows.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[F.sum(expr).alias(f"_p_{name}") for name, expr in sum_exprs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in sum_exprs]
    )


def replicate_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side randomly, replicate the
    small side across every salt value, join on (key, salt).

    Use when the big side's join key is hot AND the small side is too
    large to broadcast outright — the replication factor multiplies
    only the small side."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated_small, [on, "_salt"]).drop("_salt")
