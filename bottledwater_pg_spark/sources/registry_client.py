"""Local schema registry — the R3 surface without the HTTP service.

The reference POSTs each (topic, key|value) schema to a Confluent
registry and prefixes every message with the returned 32-bit id
(/root/reference/kafka/registry.c:93-138 request, 63-87 framing). This
engine keeps per-table schemas in-band (TableSchema events), but a
registry still matters for the PUBLISH side: downstream Avro consumers
resolve frames by id. This module supplies that contract locally:

* ``register(subject, schema)`` -> stable 31-bit id. Ids are CONTENT
  ids (md5 of the canonical schema JSON), not sequential counters —
  deterministic across replicas and restarts with no coordination,
  which is what a 1000-executor producer fleet needs (every executor
  computes the same id; a sequential counter would need a service).
  Compatible with the Confluent framing: any 32-bit id fits.
* ``by_id(id)`` -> schema, for consumer-side frame resolution.
* Persistence is a JSON file per subject under ``state_dir`` (atomic
  replace), mirroring the registry's subject/version model; re-
  registering an identical schema is a no-op returning the same id,
  a changed schema appends a new version under the subject.
"""

from __future__ import annotations

import hashlib
import json
import os


def schema_id_of(schema: object) -> int:
    """Deterministic 31-bit content id of a schema (canonical JSON)."""
    canon = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    digest = hashlib.md5(canon.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "big") & 0x7FFFFFFF


class LocalSchemaRegistry:
    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _subject_path(self, subject: str) -> str:
        safe = subject.replace("/", "_")
        return os.path.join(self.state_dir, f"{safe}.json")

    def _load(self, subject: str) -> list[dict]:
        path = self._subject_path(subject)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def register(self, subject: str, schema: object) -> int:
        """Idempotent: same schema -> same id, no new version; changed
        schema -> new version appended (the registry's compatibility
        hook would run here)."""
        sid = schema_id_of(schema)
        versions = self._load(subject)
        if not any(v["id"] == sid for v in versions):
            versions.append(
                {"version": len(versions) + 1, "id": sid, "schema": schema}
            )
            tmp = self._subject_path(subject) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(versions, f)
            os.replace(tmp, self._subject_path(subject))
        return sid

    def latest(self, subject: str) -> dict | None:
        versions = self._load(subject)
        return versions[-1] if versions else None

    def by_id(self, sid: int) -> object | None:
        for name in os.listdir(self.state_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.state_dir, name)) as f:
                for v in json.load(f):
                    if v["id"] == sid:
                        return v["schema"]
        return None


def frames_with_registry(df, key_cols: list[str], val_cols: list[str],
                         registry: LocalSchemaRegistry, topic: str):
    """Publish-side composition: register the key/value schemas under
    the Confluent subject names (``{topic}-key`` / ``{topic}-value``,
    registry.c:97-101) and emit frames carrying the registered ids."""
    from bottledwater_pg_spark.sources.avro_codec import (
        avro_fields_for,
        avro_frames,
    )

    key_fields = avro_fields_for(df.schema, key_cols)
    val_fields = avro_fields_for(df.schema, val_cols)
    key_id = registry.register(f"{topic}-key", key_fields)
    val_id = registry.register(f"{topic}-value", val_fields)
    return avro_frames(df, key_cols, val_cols,
                       key_schema_id=key_id, val_schema_id=val_id)


def decode_with_registry(df, registry: LocalSchemaRegistry):
    """Consumer-side: resolve each frame's embedded schema id against
    the registry (the reference consumer's schema lookup) and decode.
    Assumes one (key, value) schema pair per input — the per-topic
    case; multi-topic streams route by topic first (routing.py)."""
    import pandas as pd

    from bottledwater_pg_spark.sources.avro_codec import (
        decode_record,
        unframe,
    )

    first = df.select("key", "value").first()
    if first is None:
        raise LookupError(
            "cannot resolve schemas from an empty frame stream; pass "
            "fields explicitly via avro_codec.decode_frames instead"
        )
    key_id, _ = unframe(bytes(first["key"]))
    val_id, _ = unframe(bytes(first["value"]))
    key_raw = registry.by_id(key_id)
    val_raw = registry.by_id(val_id)
    if key_raw is None or val_raw is None:
        raise LookupError("frame schema id not present in registry")
    key_fields = [tuple(f) for f in key_raw]
    val_fields = [tuple(f) for f in val_raw]

    from bottledwater_pg_spark.sources.avro_codec import SPARK_TO_AVRO

    names = list(dict.fromkeys(
        [n for n, _ in key_fields] + [n for n, _ in val_fields]
    ))

    def body(batches):
        for pdf in batches:
            rows = []
            for k, v in zip(pdf["key"], pdf["value"]):
                kid, kb = unframe(bytes(k))
                if kid != key_id:
                    raise ValueError("mixed key schema ids in one decode")
                rec, _ = decode_record(key_fields, kb)
                if v is not None:
                    vid, vb = unframe(bytes(v))
                    if vid != val_id:
                        raise ValueError(
                            "mixed value schema ids in one decode"
                        )
                    vrec, _ = decode_record(val_fields, vb)
                    rec.update(vrec)
                rows.append(rec)
            # explicit columns: empty Arrow batches keep the schema
            yield pd.DataFrame(rows, columns=names)

    inv = {v: k for k, v in SPARK_TO_AVRO.items()}
    out_schema, seen = [], set()
    for name, typ in key_fields + val_fields:
        if name in seen:
            continue
        seen.add(name)
        base = typ[1] if isinstance(typ, list) else typ
        out_schema.append(f"{name} {inv[base]}")
    return df.mapInPandas(body, schema=", ".join(out_schema))
