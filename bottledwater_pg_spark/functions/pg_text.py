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


def parse_pg_timestamp(col: str) -> Column:
    """PG timestamp text incl. the ±infinity sentinels -> struct<ts:
    timestamp_ntz, special: string>.

    The reference encodes date/timestamp as a union
    [null, record, enum SpecialTime{POS_INFINITY, NEG_INFINITY}]
    (oid2avro.c:516-550, 653-661); Spark timestamps cannot hold
    ±infinity, so the sentinel rides a sibling field and ``ts`` is null
    for special values."""
    return F.expr(
        f"named_struct("
        f"'ts', CASE WHEN {col} IN ('infinity', '-infinity') THEN NULL "
        f"ELSE CAST({col} AS TIMESTAMP_NTZ) END, "
        f"'special', CASE WHEN {col} = 'infinity' THEN 'POS_INFINITY' "
        f"WHEN {col} = '-infinity' THEN 'NEG_INFINITY' END)"
    )


def parse_pg_timetz(col: str) -> Column:
    """PG ``timetz`` text (``'17:40:15.123456+01'``) -> struct<micro:
    bigint, zone_offset: int> — micro since midnight plus the ISO-8601
    UTC offset in seconds.

    Matches the reference's timetz record (oid2avro.c:552-588): PG
    *internally* stores the offset west-positive and the reference
    flips it to ISO sign (oid2avro.c:583-585); PG's *text* output is
    already ISO-signed, so parsing text yields the flipped value
    directly."""
    h = f"try_cast(regexp_extract({col}, '^(\\\\d+):', 1) AS BIGINT)"
    m = f"try_cast(regexp_extract({col}, '^\\\\d+:(\\\\d+)', 1) AS BIGINT)"
    s = (
        f"try_cast(regexp_extract({col}, '^\\\\d+:\\\\d+:(\\\\d+(?:\\\\.\\\\d+)?)', 1)"
        f" AS DECIMAL(15,6))"
    )
    zh = f"try_cast(regexp_extract({col}, '([+-]\\\\d+)(?::\\\\d+)?$', 1) AS INT)"
    zm = f"coalesce(try_cast(regexp_extract({col}, '[+-]\\\\d+:(\\\\d+)$', 1) AS INT), 0)"
    return F.expr(
        f"named_struct("
        f"'micro', ({h} * 3600 + {m} * 60) * 1000000 "
        f"  + CAST({s} * 1000000 AS BIGINT), "
        f"'zone_offset', CAST({zh} * 3600 + "
        f"  CASE WHEN {zh} < 0 THEN -{zm} ELSE {zm} END * 60 AS INT))"
    )


def parse_pg_interval(col: str) -> Column:
    """PG interval text (``'1 year 2 mons 3 days 04:05:06.789012'``) ->
    the reference's interval record struct<years,months,days,hours,
    minutes,seconds:int, micro: bigint> (oid2avro.c:703-737). Missing
    components read 0; a leading '-' on the time part negates all three
    time fields (PG's canonical rendering)."""
    years = f"coalesce(try_cast(regexp_extract({col}, '(-?\\\\d+) years?', 1) AS INT), 0)"
    months = f"coalesce(try_cast(regexp_extract({col}, '(-?\\\\d+) mons?', 1) AS INT), 0)"
    days = f"coalesce(try_cast(regexp_extract({col}, '(-?\\\\d+) days?', 1) AS INT), 0)"
    tsign = f"CASE WHEN {col} RLIKE '(^| )-\\\\d+:' THEN -1 ELSE 1 END"
    th = f"coalesce(try_cast(regexp_extract({col}, '(?:^| )-?(\\\\d+):\\\\d+:', 1) AS INT), 0)"
    tm = f"coalesce(try_cast(regexp_extract({col}, '(?:^| )-?\\\\d+:(\\\\d+):', 1) AS INT), 0)"
    ts_ = (
        f"coalesce(try_cast(regexp_extract({col}, "
        f"'(?:^| )-?\\\\d+:\\\\d+:(\\\\d+(?:\\\\.\\\\d+)?)', 1) "
        f"AS DECIMAL(15,6)), 0)"
    )
    return F.expr(
        f"named_struct("
        f"'years', {years}, 'months', {months}, 'days', {days}, "
        f"'hours', {tsign} * {th}, 'minutes', {tsign} * {tm}, "
        f"'seconds', {tsign} * CAST(floor({ts_}) AS INT), "
        f"'micro', {tsign} * CAST(({ts_} - floor({ts_})) * 1000000 AS BIGINT))"
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


def parse_pg_composite(col: str) -> Column:
    """PG composite (row type) text form -> array<string> of field
    texts, null for empty (NULL) fields.

    Handles the CANONICAL output quoting (PG docs 8.16.6, the form
    the reference would receive from the type's output function,
    oid2avro.c:317-349): fields containing ``( ) , " \\`` or
    whitespace arrive double-quoted, internal quotes doubled
    (``""``), internal backslashes doubled (``\\\\``); an unquoted
    empty field is NULL, a quoted empty string (``""``) is ''.

    The comma split uses an even-quotes-ahead lookahead, correct
    because canonical output always balances quotes (a doubled quote
    counts twice). Java regex only — round-trip oracles rebuild
    expected values from base columns, so no RE2 twin is needed.
    """
    inner = f"substring({col}, 2, length({col}) - 2)"
    fields = f"split({inner}, ',(?=([^\"]*\"[^\"]*\")*[^\"]*$)')"
    unq = "substring(f, 2, length(f) - 2)"
    return F.expr(
        f"transform({fields}, f -> "
        f"CASE WHEN f = '' THEN NULL "
        f"WHEN substring(f, 1, 1) = '\"' THEN "
        f"replace(replace({unq}, '\"\"', '\"'), '\\\\\\\\', '\\\\') "
        f"ELSE f END)"
    )
