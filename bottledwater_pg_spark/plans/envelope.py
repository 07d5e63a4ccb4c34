"""The CDC change-event envelope — Spark equivalent of the reference's
wire protocol (its "IR").

Reference: the Frame record is an array of a 6-branch union
(BeginTxn / CommitTxn / TableSchema / Insert / Update / Delete), with
row payloads encoded Avro-within-Avro as ``bytes`` fields
(/root/reference/ext/protocol.c:16-157, protocol.h:19-24).

Spark-first re-expression: one **row per change event** in a DataFrame
with a flat struct schema. The union discriminant becomes the ``op``
column; the nested Avro ``bytes`` payloads become JSON strings decoded
per-table with ``from_json`` (JSON output is a first-class mode in the
reference too: kafka/json.c, ``--output-format=json``). A micro-batch
plays the role of a Frame; Kafka offsets / parquet file order play the
role of the replication stream position.

Envelope columns:

====== ======================================================================
op     'begin' | 'commit' | 'table_schema' | 'insert' | 'update' | 'delete'
relid  table identifier (reference: PG relation OID, protocol.c:83-157)
xid    transaction id; 0 = snapshot pseudo-transaction (connect.c:356-362)
lsn    log sequence number — total order of events; per-key monotonic
key    JSON string of the primary-key struct (null for unkeyed tables)
old_row JSON row image before the change (updates/deletes; may be null —
        the reference only has it when REPLICA IDENTITY FULL,
        protocol_server.c:115-117)
new_row JSON row image after the change (inserts/updates; null = tombstone)
schema_json for op='table_schema': the table's Spark schema as JSON
        (reference sends key+row Avro schema JSON in-band,
        protocol.c:83-99)
topic  routing target, '[prefix.][namespace.]table' (bottledwater.c:386-415)
====== ======================================================================
"""

from __future__ import annotations

from pyspark.sql import types as T

# JSON (de)serialization options for row payloads. Spark's default
# timestamp format in to_json/from_json is millisecond-precision; the
# reference round-trips temporal values at µs fidelity
# (spec/functional/schema_spec.rb:146-230), so we pin µs formats.
ROW_JSON_OPTIONS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "dateFormat": "yyyy-MM-dd",
}

OP_BEGIN = "begin"
OP_COMMIT = "commit"
OP_TABLE_SCHEMA = "table_schema"
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"

DML_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)
CONTROL_OPS = (OP_BEGIN, OP_COMMIT, OP_TABLE_SCHEMA)

ENVELOPE_FIELDS = [
    ("op", T.StringType(), False),
    ("relid", T.LongType(), False),
    ("xid", T.LongType(), False),
    ("lsn", T.LongType(), False),
    ("key", T.StringType(), True),
    ("old_row", T.StringType(), True),
    ("new_row", T.StringType(), True),
    ("schema_json", T.StringType(), True),
    ("topic", T.StringType(), True),
]

ENVELOPE_SCHEMA = T.StructType(
    [T.StructField(name, dtype, nullable) for name, dtype, nullable in ENVELOPE_FIELDS]
)


def envelope_schema() -> T.StructType:
    """Return (a copy of) the envelope StructType."""
    return T.StructType.fromJson(ENVELOPE_SCHEMA.jsonValue())
