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

    def subjects(self) -> list[str]:
        """Registered subjects (sanitized names), sorted."""
        return sorted(
            name[: -len(".json")]
            for name in os.listdir(self.state_dir)
            if name.endswith(".json")
        )

    def versions(self, subject: str) -> list[dict]:
        """All versions of a subject, ascending."""
        return self._load(subject)

    def snapshot(self) -> dict[int, object]:
        """Every registered schema by id — the driver-side map a
        consumer ships to executors for per-frame resolution."""
        out: dict[int, object] = {}
        for s in self.subjects():
            for v in self.versions(s):
                out[int(v["id"])] = v["schema"]
        return out

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


def decode_with_registry(df, registry,
                         topic: str | None = None):
    """Consumer-side: resolve EACH frame's embedded schema id against
    the registry (the reference consumer resolves per-frame ids, so a
    topic that evolved mid-stream carries a mix of value schema ids —
    registry.c:63-87 framing). The full id→fields map is snapshotted
    on the driver and shipped in the closure; the output schema is the
    union of the registered fields (newest version wins a name clash),
    with fields absent from an older frame's schema reading null —
    the add-column evolution semantics. Pass ``topic`` to bound the
    output columns to that topic's ``-key``/``-value`` subjects when
    the registry serves many topics; resolution still accepts any
    registered id.

    ``registry`` is any transport exposing ``subjects()`` /
    ``versions(subject)`` — the file-backed
    :class:`LocalSchemaRegistry` or the HTTP client
    (``registry_http.HttpSchemaRegistry`` against a real Confluent
    service)."""
    import pandas as pd

    from bottledwater_pg_spark.sources.avro_codec import (
        SPARK_TO_AVRO,
        decode_record,
        unframe,
    )

    # driver-side snapshot: every registered schema by content id,
    # subject-sorted then version-ascending for a deterministic union
    by_id: dict[int, list[tuple]] = {}
    union_fields: dict[str, object] = {}
    want = None
    if topic is not None:
        safe = topic.replace("/", "_")
        want = {f"{safe}-key", f"{safe}-value"}
    for subject in sorted(registry.subjects()):
        for v in registry.versions(subject):
            fields = [tuple(fld) for fld in v["schema"]]
            by_id[int(v["id"])] = fields
            if want is not None and subject not in want:
                continue
            for fname, ftyp in fields:
                union_fields[fname] = ftyp  # newest version wins
    if not by_id or not union_fields:
        raise LookupError(
            "registry holds no schemas for this decode; pass fields "
            "explicitly via avro_codec.decode_frames instead"
        )
    names = list(union_fields)

    def body(batches):
        for pdf in batches:
            rows = []
            for k, v in zip(pdf["key"], pdf["value"]):
                kid, kb = unframe(bytes(k))
                kf = by_id.get(kid)
                if kf is None:
                    raise LookupError(
                        f"key schema id {kid} not present in registry"
                    )
                rec, _ = decode_record(kf, kb)
                if v is not None:
                    vid, vb = unframe(bytes(v))
                    vf = by_id.get(vid)
                    if vf is None:
                        raise LookupError(
                            f"value schema id {vid} not in registry"
                        )
                    vrec, _ = decode_record(vf, vb)
                    rec.update(vrec)
                rows.append(rec)
            # explicit columns: empty Arrow batches keep the schema,
            # and frames decoded with an older schema leave the
            # later-added columns as NaN→null
            yield pd.DataFrame(rows, columns=names)

    inv = {v: k for k, v in SPARK_TO_AVRO.items()}
    out_schema = []
    for fname, ftyp in union_fields.items():
        base = ftyp[1] if isinstance(ftyp, list) else ftyp
        out_schema.append(f"{fname} {inv[base]}")
    return df.mapInPandas(body, schema=", ".join(out_schema))
