"""Z-order (Morton-curve) data layout — multi-dimensional clustering
so parquet min/max statistics prune scans on BOTH of two predicate
columns at once (the Delta/Iceberg OPTIMIZE ZORDER primitive).

A single-column sort gives perfect pruning on that column and none on
any other; interleaving the bits of two columns into one z-value and
range-partitioning + sorting by it bounds EVERY file/row-group to a
small rectangle of the (x, y) key space, so min/max skipping works for
predicates on either column (or both). This module computes the
z-value with pure integer bit arithmetic — identical expressions on
Spark and DuckDB, so the layout decision is oracle-checkable — and
exposes the writer-side repartition helper.

Scale design: the z-value is a narrow per-row projection (32 codegen'd
bit ops, no shuffle); ``zorder_repartition`` is ONE range shuffle — the
same cost as any sorted write — after which every downstream scan with
an x or y predicate reads only the rectangles that intersect it. The
bucket-stats query proves the property: per z-bucket, BOTH dimensions
have tight min/max bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension; z fits in 32 bits


def z_expr(x_col: str, y_col: str, bits: int = ZBITS) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    integer columns (x at even positions, y at odd). Negative inputs
    are mapped through a POSITIVE modulus (pmod) — Spark's % keeps
    the dividend sign, which would shift sign bits into the
    interleave."""
    xs = f"CAST(pmod({x_col}, {1 << bits}) AS BIGINT)"
    ys = f"CAST(pmod({y_col}, {1 << bits}) AS BIGINT)"
    terms = [f"shiftleft(shiftright({xs}, {i}) & 1, {2 * i})" for i in range(bits)]
    terms += [
        f"shiftleft(shiftright({ys}, {i}) & 1, {2 * i + 1})" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_z_expr(x_col: str, y_col: str, bits: int = ZBITS) -> str:
    """The identical interleave in DuckDB syntax (>> << & operators);
    the double-mod makes DuckDB's sign-keeping % match Spark's pmod
    for every input."""
    m = 1 << bits
    xs = f"CAST((({x_col} % {m}) + {m}) % {m} AS BIGINT)"
    ys = f"CAST((({y_col} % {m}) + {m}) % {m} AS BIGINT)"
    terms = [f"((({xs} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({ys} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def with_zvalue(df: DataFrame, x_col: str, y_col: str,
                bits: int = ZBITS) -> DataFrame:
    return df.withColumn("zval", F.expr(z_expr(x_col, y_col, bits)))


def zorder_repartition(df: DataFrame, x_col: str, y_col: str,
                       num_partitions: int, bits: int = ZBITS) -> DataFrame:
    """Writer-side layout: range-partition + sort by the z-value, so
    each output file covers one contiguous z-range = one small (x, y)
    rectangle. Write the result with ``partitionBy``-free parquet and
    both columns' min/max file statistics become selective."""
    z = with_zvalue(df, x_col, y_col, bits)
    return z.repartitionByRange(num_partitions, "zval").sortWithinPartitions(
        "zval"
    )
