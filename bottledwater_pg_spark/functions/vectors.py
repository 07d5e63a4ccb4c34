"""Vector math over ``array<float>`` embedding columns.

Cross-engine determinism is the hard requirement here: floating-point
summation is not associative, so a double-sum dot product computed by
Spark and DuckDB in different orders can differ in the last bits and
break value-hash comparison. Decimal casts are no better: DuckDB
truncates double->decimal while Spark rounds, so the operands
themselves diverge.

Solution: **integer quantization**. Each element is mapped to
``floor(x * 1e6)`` — floor of the *same* IEEE double is bit-identical
in every engine, with no tie-breaking rules involved — and all dot
products / norms are exact int64 arithmetic (associative, order-free).
The final cosine is computed from those integers in double: identical
inputs + identical scalar ops = identical output. Quantization costs
~1e-6 relative accuracy, which is far below any dedup/ANN decision
threshold; the scale keeps 64-dim sums < 2^53 so even the double casts
are exact.

All expressions are built-in higher-order functions (``zip_with`` /
``aggregate``) — per-row, no shuffle, fully codegen'd; this is the
fast JVM path, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000  # 1e-6 resolution; |q| <= ~5.3e8 for unit vectors


def quantize(x: str = "x") -> str:
    """Spark/DuckDB-identical integer quantization of a float element."""
    return f"CAST(FLOOR(CAST({x} AS DOUBLE) * {QUANT_SCALE}.0) AS BIGINT)"


def quantized_vec(a: str) -> Column:
    """array<float> -> array<bigint> quantized once. Higher-order
    functions are interpreted (not codegen'd), so pair-heavy operators
    should quantize each vector ONCE and reuse, not per pair."""
    return F.expr(f"transform({a}, x -> {quantize('x')})")


def dot_q(a: str, b: str) -> Column:
    """Exact int64 dot product of quantized vectors."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> {quantize('x')} * {quantize('y')}), "
        f"CAST(0 AS BIGINT), (acc, p) -> acc + p)"
    )


def dot_pre(qa: str, qb: str) -> Column:
    """int64 dot product of two ALREADY-quantized arrays."""
    return F.expr(
        f"aggregate(zip_with({qa}, {qb}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, p) -> acc + p)"
    )


def norm_pre(qa: str) -> Column:
    """Euclidean norm (double) of an already-quantized array."""
    return F.sqrt(dot_pre(qa, qa).cast("double"))


def cosine(a: str, b: str) -> Column:
    """Cosine similarity on quantized vectors; bit-identical across
    engines (see module doc). Quantizes inline — 3 HOF passes per
    pair; prefer quantized_vec + dot_pre with precomputed norms in
    pair-heavy operators."""
    return (
        dot_q(a, b).cast("double")
        / (F.sqrt(dot_q(a, a).cast("double")) * F.sqrt(dot_q(b, b).cast("double")))
    )


def cosine_pre(qa: str, qb: str, norm_a: str, norm_b: str) -> Column:
    """Cosine from precomputed quantized arrays + norms: ONE
    interpreted pass per pair instead of three."""
    return dot_pre(qa, qb).cast("double") / (F.col(norm_a) * F.col(norm_b))


def sql_dot_q(a: str, b: str) -> str:
    """DuckDB rendering: zip the lists positionally, exact integer sum."""
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> {quantize('p[1]')} * {quantize('p[2]')})) AS BIGINT)"
    )


def sql_cosine(a: str, b: str) -> str:
    return (
        f"(CAST({sql_dot_q(a, b)} AS DOUBLE) / "
        f"(sqrt(CAST({sql_dot_q(a, a)} AS DOUBLE)) * "
        f"sqrt(CAST({sql_dot_q(b, b)} AS DOUBLE))))"
    )
