"""Fuzzy (edit-distance) self-join via deletion-neighborhood blocking
— entity-resolution-style matching without the O(n^2) cross join.

The classic symmetric-delete technique (popularized by SymSpell): two
strings at Levenshtein distance <= 1 (substitution, insertion, or
deletion) necessarily share a member of each other's deletion
neighborhood — the set of strings obtained by deleting at most one
character. So:

1. expand each string to its <=1-deletion variants (len+1 keys,
   bounded expansion — this is the blocking key);
2. equi-join on the variant (hash join, shuffles on a key Catalyst
   understands);
3. verify candidates with the exact ``levenshtein`` and dedupe.

Cost: O(n x len) blocking keys and only same-block candidate pairs,
vs O(n^2) for the naive theta join — the difference between feasible
and not at a 10^9-row dimension. For distance k > 1 the same pattern
uses k-deletion neighborhoods (expansion len^k — keep k small).

Part of the consumer-side capability surface (data cleaning /
entity resolution) the reference delegates (README.md:30-32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str) -> F.Column:
    """Array of the string plus every single-character-deleted form."""
    one_deleted = F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}))))"
    )
    return F.array_union(F.array(F.col(col)), one_deleted)


def deletion_variants_k2(col: str) -> F.Column:
    """Array of the string, every 1-deletion, and every 2-deletion form.

    Two strings at Levenshtein distance <= 2 share a common member of
    their <=2-deletion neighborhoods (align the edit script; delete the
    mismatched positions on each side), so this is a lossless blocking
    key for radius 2. Expansion is O(len^2 / 2) keys per string —
    ~170 for an 18-char name — which is the price of radius 2; keep the
    blocked column short (names, codes), not whole documents.

    ``sequence(a, b)`` in Spark generates DESCENDING sequences when
    a > b, so both loops are guarded with ``if`` to yield empty arrays
    at the string boundaries instead of phantom indices.
    """
    two_deleted = F.expr(
        f"flatten(transform("
        f"  if(length({col}) >= 2, sequence(1, length({col}) - 1), "
        f"     array()), "
        f"  i -> transform(sequence(i + 1, length({col})), "
        f"    j -> concat(substring({col}, 1, i - 1), "
        f"                substring({col}, i + 1, j - i - 1), "
        f"                substring({col}, j + 1, length({col}))))))"
    )
    return F.array_union(deletion_variants(col), two_deleted)


def edit_distance_pairs(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """All pairs (a, b), a.id < b.id, with levenshtein(a, b) <=
    ``max_dist`` (1 or 2 — the supported deletion-neighborhood
    radii). Returns ``a_id, b_id, dist``.
    """
    if max_dist not in (1, 2):
        raise ValueError("deletion-neighborhood blocking supports max_dist in (1, 2)")
    variants = deletion_variants if max_dist == 1 else deletion_variants_k2
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.explode(variants(str_col)).alias("_block"),
    )
    a = keyed.select(
        F.col("_id").alias("a_id"), F.col("_s").alias("_sa"), "_block"
    )
    b = keyed.select(
        F.col("_id").alias("b_id"), F.col("_s").alias("_sb"), "_block"
    )
    return (
        a.join(b, "_block")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.levenshtein("_sa", "_sb").alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
