"""Table -> metadata registry (R2) — the driver-side bookkeeping the
reference keeps in ``table_mapper``.

Reference: per-relid registry of topic handle, schema ids, and parsed
schemas; idempotent update; topic rebinding on table rename; a table
whose registration failed is marked deleted so later events hit the
error policy rather than crashing the pipe
(/root/reference/kafka/table_mapper.c:58-147, 185-242 — including the
error-strategy discussion at 88-118, which lands on option (b): drop
that table's updates, keep the pipeline flowing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bottledwater_pg_spark.routing import topic_name


@dataclass
class TableEntry:
    relid: int
    table: str
    namespace: str = "public"
    topic: str = ""
    key_schema_json: str | None = None
    row_schema_json: str | None = None
    deleted: bool = False  # registration failed -> drop its events


@dataclass
class TableRegistry:
    topic_prefix: str | None = None
    entries: dict[int, TableEntry] = field(default_factory=dict)

    def update(
        self,
        relid: int,
        table: str,
        namespace: str = "public",
        key_schema_json: str | None = None,
        row_schema_json: str | None = None,
        topic: str | None = None,
    ) -> TableEntry:
        """Idempotent upsert; recomputes the topic on rename exactly
        like table_metadata_update_topic (table_mapper.c:185-242).

        ``topic`` (when given) is stored verbatim instead of being
        recomputed from table/namespace/prefix — the path for callers
        that only hold the wire topic (an in-band control event on an
        already-prefixed stream), where recomputing would double-apply
        the prefix."""
        entry = self.entries.get(relid)
        new_topic = topic if topic is not None else topic_name(
            table, namespace, self.topic_prefix
        )
        if entry is None:
            entry = TableEntry(relid, table, namespace, new_topic)
            self.entries[relid] = entry
        else:
            if entry.table != table or entry.namespace != namespace:
                # renamed -> events start flowing to the new topic
                entry.table, entry.namespace = table, namespace
                entry.topic = new_topic
        if key_schema_json is not None:
            entry.key_schema_json = key_schema_json
        if row_schema_json is not None:
            entry.row_schema_json = row_schema_json
        entry.deleted = False
        return entry

    def mark_failed(self, relid: int) -> None:
        """Registration failure: keep the pipe alive, drop this table's
        events (the reference's option (b), table_mapper.c:88-118)."""
        if relid in self.entries:
            self.entries[relid].deleted = True

    def lookup(self, relid: int) -> TableEntry | None:
        entry = self.entries.get(relid)
        if entry is None or entry.deleted:
            return None
        return entry

    def topic_for(self, relid: int) -> str | None:
        entry = self.lookup(relid)
        return entry.topic if entry else None
