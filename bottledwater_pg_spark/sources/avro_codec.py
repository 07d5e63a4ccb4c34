"""Pure-Python Avro BINARY codec for the CDC envelope — closes E1 at
runtime without the missing spark-avro data source.

The reference's default wire format is Avro binary in the Confluent
registry framing: one magic byte 0x00, a big-endian 4-byte schema id,
then the Avro-encoded record (/root/reference/kafka/registry.c:63-87
builds exactly this 5-byte prefix; bottledwater.c:54-61 selects
avro-vs-json). Avro binary encoding itself is small and fully
specified: zigzag-varint longs, length-prefixed utf8/bytes,
little-endian IEEE floats, and a leading varint union index for
nullable fields — so the envelope can be produced and consumed
bit-exactly in pure Python over Arrow batches, no JVM data source
required. The spark-avro JVM path (avro_io.py) remains the fast path
when its jar is present; THIS module is the always-available one, and
its byte output is pinned against the Avro spec's own examples in
tests.

Supported schema subset (everything the envelope needs): records whose
fields are "boolean" | "int" | "long" | "float" | "double" | "string"
| "bytes" or the nullable union ["null", T]. Field order is schema
order, as Avro requires.
"""

from __future__ import annotations

import struct

MAGIC = b"\x00"


# ----------------------------------------------------------- primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc), pos


def _is_null(v) -> bool:
    """Null test that survives pandas round-trips: mapInPandas hands
    null numeric columns back as float NaN (pandas promotes nullable
    int64 to float64) or pd.NA — both must select the Avro null union
    branch, not crash int(NaN) or silently encode NaN where the
    reference wire format emits null."""
    if v is None:
        return True
    try:
        return bool(v != v)  # NaN: the only value unequal to itself
    except (TypeError, ValueError):
        return True  # pd.NA: comparison yields NA, bool(NA) raises


def _write_value(buf: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # union, reference uses ["null", T]
        if _is_null(v):
            # Genuine float NaN in a double/float union is DATA on the
            # reference wire (Avro encodes NaN as its IEEE754 bit
            # pattern); only the pandas int64->float64 promotion case
            # (an integer branch seeing NaN-as-missing) selects the
            # null branch. pd.NA carries no float identity -> null.
            branch = typ[1] if typ[0] == "null" else typ[0]
            if (
                branch in ("double", "float")
                and isinstance(v, float)
                and v != v
            ):
                write_long(buf, typ.index(branch))
                _write_value(buf, branch, v)
                return
            write_long(buf, typ.index("null"))
            return
        idx = 1 if typ[0] == "null" else 0
        write_long(buf, idx)
        _write_value(buf, typ[idx], v)
    elif typ in ("long", "int"):
        write_long(buf, int(v))
    elif typ == "boolean":
        buf.append(1 if v else 0)
    elif typ == "double":
        buf += struct.pack("<d", float(v))
    elif typ == "float":
        buf += struct.pack("<f", float(v))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        write_long(buf, len(raw))
        buf += raw
    elif typ == "bytes":
        write_long(buf, len(v))
        buf += bytes(v)
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _read_value(data: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = read_long(data, pos)
        branch = typ[idx]
        if branch == "null":
            return None, pos
        return _read_value(data, pos, branch)
    if typ in ("long", "int"):
        return read_long(data, pos)
    if typ == "boolean":
        return data[pos] == 1, pos + 1
    if typ == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if typ == "string":
        n, pos = read_long(data, pos)
        return data[pos:pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = read_long(data, pos)
        return bytes(data[pos:pos + n]), pos + n
    raise NotImplementedError(f"avro type {typ!r}")


# -------------------------------------------------------------- records


def encode_record(fields: list[tuple[str, object]], row: dict) -> bytes:
    """Avro-binary encode ``row`` under a record schema given as
    [(field_name, type), ...] in schema order."""
    buf = bytearray()
    for name, typ in fields:
        _write_value(buf, typ, row.get(name))
    return bytes(buf)


def decode_record(fields: list[tuple[str, object]], data: bytes,
                  pos: int = 0) -> tuple[dict, int]:
    out = {}
    for name, typ in fields:
        out[name], pos = _read_value(data, pos, typ)
    return out, pos


def frame(payload: bytes | None, schema_id: int) -> bytes | None:
    """Confluent registry framing: 0x00 + big-endian schema id + body
    (registry.c:63-87). None passes through (tombstone value)."""
    if payload is None:
        return None
    return MAGIC + struct.pack(">I", schema_id) + payload


def unframe(data: bytes) -> tuple[int, bytes]:
    if data[:1] != MAGIC:
        raise ValueError("bad magic byte in registry framing")
    (schema_id,) = struct.unpack_from(">I", data, 1)
    return schema_id, bytes(data[5:])


# ------------------------------------------------- Spark integration

SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def avro_fields_for(df_schema, cols: list[str]) -> list[tuple[str, object]]:
    """Spark schema -> envelope Avro fields; every column is the
    nullable union the reference emits for non-PK columns."""
    fields: list[tuple[str, object]] = []
    for c in cols:
        spark_t = df_schema[c].dataType.simpleString()
        if spark_t.startswith("decimal"):
            # reference maps numeric -> double in its default profile
            avro_t: object = "double"
        else:
            avro_t = SPARK_TO_AVRO[spark_t]
        fields.append((c, ["null", avro_t]))
    return fields


def avro_frames(df, key_cols: list[str], val_cols: list[str],
                key_schema_id: int = 1, val_schema_id: int = 2):
    """(key bytes, value bytes) Confluent-framed Avro envelope for every
    row — the wire bytes the reference's Kafka producer sends. Runs as
    an Arrow-batched mapInPandas (pure-Python codec, no jar); at scale
    this is an embarrassingly parallel narrow map.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    key_fields = avro_fields_for(df.schema, key_cols)
    val_fields = avro_fields_for(df.schema, val_cols)
    cols = list(dict.fromkeys(key_cols + val_cols))
    # Arrow->pandas renders a NULL double/float as NaN, making SQL
    # NULL indistinguishable from genuine NaN data inside the UDF —
    # but the wire must encode NULL as the null branch and NaN as an
    # IEEE754 payload. Ship an explicit JVM-computed null mask for
    # each float-family column so the encoder can tell them apart.
    float_cols = [
        c
        for c in cols
        if df.schema[c].dataType.simpleString() in ("double", "float")
    ]
    mask_of = {c: f"__isnull_{c}" for c in float_cols}
    proj = df.select(
        *cols,
        *[F.isnull(F.col(c)).alias(m) for c, m in mask_of.items()],
    )

    def body(batches):
        for pdf in batches:
            for c, m in mask_of.items():
                null_rows = pdf[m].fillna(False)
                if null_rows.any():
                    # object dtype first: assigning None into a float64
                    # column would coerce straight back to NaN
                    pdf[c] = pdf[c].astype(object)
                    pdf.loc[null_rows, c] = None
            recs = pdf[cols].to_dict("records")
            keys = [
                frame(encode_record(key_fields, r), key_schema_id)
                for r in recs
            ]
            vals = [
                frame(encode_record(val_fields, r), val_schema_id)
                for r in recs
            ]
            yield pd.DataFrame({"key": keys, "value": vals})

    return proj.mapInPandas(body, schema="key binary, value binary")


def decode_frames(df, key_fields, val_fields):
    """Inverse of :func:`avro_frames`: framed bytes -> typed columns
    (the consumer-side avro_binary_value decode,
    client/protocol_client.c:94-294)."""
    import pandas as pd

    names = list(dict.fromkeys(
        [n for n, _ in key_fields] + [n for n, _ in val_fields]
    ))

    base_types = {}
    for name, typ in list(key_fields) + list(val_fields):
        if name not in base_types:
            base_types[name] = typ[1] if isinstance(typ, list) else typ
    # the Arrow output boundary collapses pandas float NaN to NULL, so
    # a decoded NaN payload would silently become SQL NULL — carry a
    # boolean mask out of the UDF and rebuild the NaN JVM-side
    float_names = [
        n for n, b in base_types.items() if b in ("double", "float")
    ]
    nan_mask_of = {n: f"__isnan_{n}" for n in float_names}

    def body(batches):
        for pdf in batches:
            rows = []
            for k, v in zip(pdf["key"], pdf["value"]):
                _, kb = unframe(bytes(k))
                rec, _ = decode_record(key_fields, kb)
                if v is not None:
                    _, vb = unframe(bytes(v))
                    vrec, _ = decode_record(val_fields, vb)
                    rec.update(vrec)
                for n, m in nan_mask_of.items():
                    val = rec.get(n)
                    is_nan = isinstance(val, float) and val != val
                    rec[m] = is_nan
                    if is_nan:
                        rec[n] = None  # rebuilt from the mask outside
                rows.append(rec)
            # explicit columns: an EMPTY Arrow batch must still yield a
            # frame matching the declared schema, not a columnless one
            yield pd.DataFrame(
                rows, columns=names + list(nan_mask_of.values())
            )

    inv = {v: k for k, v in SPARK_TO_AVRO.items()}
    out_schema = [f"{n} {inv[base_types[n]]}" for n in names]
    out_schema += [f"{m} boolean" for m in nan_mask_of.values()]
    out = df.mapInPandas(body, schema=", ".join(out_schema))
    from pyspark.sql import functions as F

    cols = []
    for n in names:
        if n in nan_mask_of:
            cols.append(
                F.when(
                    F.col(nan_mask_of[n]),
                    F.lit(float("nan")).cast(inv[base_types[n]]),
                )
                .otherwise(F.col(n))
                .alias(n)
            )
        else:
            cols.append(F.col(n))
    return out.select(*cols)
