"""The type system: Postgres-type -> Spark-type mapping and identifier
sanitization, mirroring (and deliberately improving on) the reference's
oid->Avro mapping.

Reference: ``schema_for_oid`` (/root/reference/ext/oid2avro.c:265-362)
maps every PG type OID to an Avro schema; every column is a nullable
union (oid2avro.c:354-361); unknown types fall through to the type's
text output function (oid2avro.c:752-770). Two deliberate improvements
over the reference, which its own tests record as known bugs:

* ``numeric`` maps to DecimalType(38,18) — the reference lossily casts
  to double and its issue #4 renders values as 0
  (oid2avro.c:291-293, 455-457; spec type_specs.rb:148-165).
* ``bytea`` keeps BinaryType end-to-end — the reference's JSON mode
  truncates at embedded NULs (issue #70).

Identifier sanitization (X3): Avro names must match
``[A-Za-z_][A-Za-z0-9_]*``; the reference hex-escapes every invalid
byte as ``_xx_`` (make_avro_safe, oid2avro.c:799-828), e.g.
``person.name/surname`` -> ``person_2e_name_2f_surname`` and
``crêpes`` -> ``cr_c3__aa_pes`` (schema_spec.rb:359-467).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# SURVEY §1.4 table. Textual fall-through types all map to StringType,
# like the reference routing them through the PG output function.
PG_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "integer": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "oid": T.LongType(),
    "money": T.DecimalType(19, 2),  # reference bug #60 multiplies by 100
    "numeric": T.DecimalType(38, 18),  # reference bug #4 renders 0
    "date": T.DateType(),
    "time": T.LongType(),  # µs since midnight (oid2avro.c:299-301)
    "timetz": T.StructType(
        [
            T.StructField("micro", T.LongType()),
            T.StructField("zone_offset", T.IntegerType()),
        ]
    ),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "interval": T.DayTimeIntervalType(),
    "bytea": T.BinaryType(),
    '"char"': T.StringType(),
    "name": T.StringType(),
    "text": T.StringType(),
    "char": T.StringType(),
    "character": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "xml": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
    "bit": T.StringType(),
    "bit varying": T.StringType(),
    "pg_lsn": T.StringType(),
    "tsvector": T.StringType(),
    "tsquery": T.StringType(),
    "point": T.StringType(),
    "line": T.StringType(),
    "lseg": T.StringType(),
    "box": T.StringType(),
    "path": T.StringType(),
    "polygon": T.StringType(),
    "circle": T.StringType(),
    "int4range": T.StringType(),
    "int8range": T.StringType(),
    "numrange": T.StringType(),
    "daterange": T.StringType(),
    "tsrange": T.StringType(),
    "tstzrange": T.StringType(),
    "hstore": T.MapType(T.StringType(), T.StringType()),  # beyond reference
    "int[]": T.ArrayType(T.IntegerType()),  # reference keeps '{1,2,3}' text
    "text[]": T.ArrayType(T.StringType()),
}


def spark_type_for_pg(pg_type: str) -> T.DataType:
    """Map a PG type name to a Spark type; unknown types fall through to
    StringType exactly like the reference's output-function fallback
    (oid2avro.c:752-770)."""
    return PG_TO_SPARK.get(pg_type.lower().strip(), T.StringType())


def schema_for_pg_columns(
    columns: list[tuple[str, str]], sanitize: bool = True
) -> T.StructType:
    """Build a row StructType from (name, pg_type) pairs.

    * every field nullable — the union-[null,T] rule (oid2avro.c:354-361)
    * zero columns -> a dummy boolean field, because Avro rejects empty
      records (oid2avro.c:153-163); kept for parity
    * names sanitized per X3
    """
    if not columns:
        return T.StructType(
            [T.StructField("dummy", T.BooleanType(), True)]
        )
    fields = []
    for name, pg_type in columns:
        out_name = make_avro_safe(name) if sanitize else name
        fields.append(T.StructField(out_name, spark_type_for_pg(pg_type), True))
    return T.StructType(fields)


def make_avro_safe(name: str, dot_preserving: bool = False) -> str:
    """Hex-escape an identifier to a valid Avro name, byte-for-byte
    compatible with the reference's make_avro_safe
    (oid2avro.c:799-828): every byte outside [A-Za-z0-9_] (or not
    [A-Za-z_] at position 0) becomes ``_xx_``; dots pass through when
    ``dot_preserving`` (namespace mode)."""
    out: list[str] = []
    first = True
    for ch in name:
        for i, b in enumerate(ch.encode("utf-8")):
            c = chr(b)
            ok_first = c.isascii() and (c.isalpha() or c == "_")
            ok_rest = c.isascii() and (c.isalnum() or c == "_")
            keep_dot = dot_preserving and c == "."
            if keep_dot or (ok_first if first else ok_rest):
                out.append(c)
            else:
                out.append(f"_{b:02x}_")
            first = False
    return "".join(out) or "_"


def describe_table(df: DataFrame) -> str:
    """Schema-introspection surface (X5): the reference exposes
    bottledwater_row_schema(name) returning schema JSON
    (snapshot.c:51-92); here the Spark schema JSON plays that role."""
    return df.schema.json()
