"""Parsers for Postgres textual output formats — doing better than the
reference, which ships arrays, hstore, and ranges as opaque strings.

Reference: any type without a native Avro mapping goes through the PG
output function and arrives as text — ``int[]`` round-trips as the
literal string ``'{1,2,3,4}'`` (oid2avro.c:752-770;
spec/functional/schema_spec.rb:349-356), hstore as
``'"k"=>"v", ...'``, ranges as ``'[1,5)'``. These helpers decompose
those strings into native Spark arrays/maps/structs so the query plane
can actually compute over them. All built-in expressions (regexp +
higher-order functions) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_pg_int_array(col: str) -> Column:
    """``'{1,2,3,4}'`` -> array<int> (empty array for ``'{}'``)."""
    inner = f"regexp_replace({col}, '^\\\\{{|\\\\}}$', '')"
    return F.expr(
        f"CASE WHEN length({inner}) = 0 THEN array() "
        f"ELSE transform(split({inner}, ','), x -> CAST(trim(x) AS INT)) END"
    )


def sql_parse_pg_int_array(col: str) -> str:
    """DuckDB rendering of :func:`parse_pg_int_array`."""
    inner = f"regexp_replace({col}, '^\\{{|\\}}$', '', 'g')"
    return (
        f"CASE WHEN length({inner}) = 0 THEN [] "
        f"ELSE list_transform(string_split({inner}, ','), "
        f"x -> CAST(trim(x) AS INT)) END"
    )


def parse_hstore(col: str) -> Column:
    """``'"a"=>"1", "b"=>"2"'`` -> map<string,string>.

    Handles the canonical PG hstore output (quoted keys and values);
    embedded ``", "`` inside values is out of scope, as it is for the
    reference's consumers too."""
    pairs = f"split({col}, ',\\\\s*')"
    return F.expr(
        f"map_from_arrays("
        f"transform({pairs}, p -> regexp_extract(p, '\"(.*?)\"\\\\s*=>', 1)), "
        f"transform({pairs}, p -> regexp_extract(p, '=>\\\\s*\"(.*?)\"', 1)))"
    )


def parse_int_range(col: str) -> Column:
    """``'[1,5)'`` -> struct<lo:int, hi:int, lo_inc:boolean,
    hi_inc:boolean> (PG int4range textual form)."""
    return F.expr(
        f"named_struct("
        f"'lo', CAST(regexp_extract({col}, '[\\\\[(](-?\\\\d*),', 1) AS INT), "
        f"'hi', CAST(regexp_extract({col}, ',(-?\\\\d*)[\\\\])]', 1) AS INT), "
        f"'lo_inc', substring({col}, 1, 1) = '[', "
        f"'hi_inc', substring({col}, length({col}), 1) = ']')"
    )
