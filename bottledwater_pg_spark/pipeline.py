"""The ``bottledwater`` main loop as one call (SURVEY §3.1): catalog
scan → per-table CDC stream (snapshot gate + deterministic mutations,
in-band TableSchema announcements) → error policy → one-topic-per-table
routing → per-table materialized state.

Reference mapping: ``bottledwater --postgres ... --slot ...
[--skip-snapshot] [--allow-unkeyed-tables] [--topic-prefix P]
[--on-error exit|log]`` (kafka/bottledwater.c option table) runs
exactly this pipeline against a live database; here the capture side is
the deterministic generator over the fixture tables and the sink is a
parquet state directory per table (the compacted-topic analog).

Scale: the interleaved stream is a union of per-table narrow
generations (no shuffle until each table's own compaction); per-table
materializations are independent jobs over relid-pruned slices, so
table count multiplies small jobs, not data volume — the property the
bench ``many_table`` block measures.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bottledwater_pg_spark.errors import ErrorPolicy, ddl_registry_fold
from bottledwater_pg_spark.operators.materialize import append_only, materialize
from bottledwater_pg_spark.routing import topic_name
from bottledwater_pg_spark.schema_tracker import table_schema_events
from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.sources.catalog import (
    TABLE_PKNUM_SQL,
    get_table_list,
)
from bottledwater_pg_spark.sources.generator import MutationSpec, generate_cdc

# per-table mutation rules matching the driver-contract queries'
# fixtures (cdc_queries.py) so a replicate run's states equal the same
# closed-form oracles those queries pin
TABLE_SPECS: dict[str, MutationSpec] = {
    "customer": MutationSpec(update_exprs={"c_acctbal": "c_acctbal + 100.0"}),
    "orders": MutationSpec(update_exprs={"o_orderstatus": "'X'"}),
    "events": MutationSpec(update_exprs={"value": "value + 1.0"}),
}


def replicate_database(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    pattern: str = "%",
    allow_unkeyed: bool = False,
    skip_snapshot: bool = False,
    topic_prefix: str | None = None,
    on_error: str = "exit",
    stream: bool = False,
) -> dict[str, int]:
    """Replicate every LIKE-matching table end-to-end; returns
    ``{table: surviving_rows}``. ``stream=True`` runs the identical
    event stream through the micro-batched ``MultiTableMaterializer``
    (checkpointed foreachBatch) instead of one batch pass — same final
    state by the idempotent-merge argument, pinned in tests."""
    tables = get_table_list(sf_dir, pattern, allow_unkeyed)
    if not tables:
        raise LookupError(f"no tables match pattern {pattern!r}")
    parts = []
    schemas = {}
    for t in tables:
        # same guard as catalog.export_snapshot: with allow_unkeyed a
        # fixture table absent from TABLE_KEYS is admitted by
        # get_table_list, and TABLE_PKNUM_SQL[t.name] below would raise
        # a bare KeyError instead of naming the registries to fix
        if t.name not in TABLE_PKNUM_SQL:
            raise LookupError(
                f"table {t.name!r} has no pk-number expression: new "
                f"fixture tables must be registered in BOTH "
                f"catalog.TABLE_KEYS and catalog.TABLE_PKNUM_SQL"
            )
        df = load_table(spark, sf_dir, t.name)
        schemas[t.relid] = (t.name, df.schema)
        topic = topic_name(t.name, "public", topic_prefix)
        ctl = table_schema_events(df, t.relid, topic, lsn=-1)
        ev = generate_cdc(
            df,
            list(t.key_columns),
            F.expr(TABLE_PKNUM_SQL[t.name]),
            t.relid,
            t.name,
            spec=TABLE_SPECS.get(t.name),
            topic_prefix=topic_prefix,
            skip_snapshot=skip_snapshot,
        )
        parts.append((t, ctl, ev))

    # Registry fold over the announcements ONLY: the batch
    # materializations below are per-table jobs over their own
    # slices, so the full interleaved union would exist just to be
    # re-split by relid — and at N tables its Catalyst optimization
    # alone costs seconds per job. The announcements are 1-row
    # driver-built frames; folding from their union is milliseconds.
    ctl_union = parts[0][1]
    for _, c, _e in parts[1:]:
        ctl_union = ctl_union.unionByName(c)
    registry, fail_at = ddl_registry_fold(ctl_union, ErrorPolicy(on_error))

    def _table_events(t, ctl, ev):
        """One table's policy-filtered stream (announcement first,
        mirroring the wire order)."""
        events = ctl.unionByName(ev)
        if t.relid in fail_at:
            events = events.filter(F.col("lsn") < F.lit(fail_at[t.relid]))
        return events

    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, int] = {}
    if stream:
        # the streaming path DOES ship one interleaved stream — that
        # is its wire format — so build the union here, where it runs
        # through a single checkpointed query rather than N batch jobs
        good = _table_events(*parts[0])
        for part in parts[1:]:
            good = good.unionByName(_table_events(*part))
        import shutil
        import tempfile

        from bottledwater_pg_spark.streaming.stream import (
            MultiTableMaterializer,
            read_envelope_stream,
            write_envelope_stream,
        )

        tmp = tempfile.mkdtemp(prefix="bw_replicate_")
        try:
            src = os.path.join(tmp, "events")
            write_envelope_stream(good, src, num_files=4)
            mat = MultiTableMaterializer(
                spark, os.path.join(tmp, "state"), schemas
            )
            q = mat.start(
                read_envelope_stream(spark, src, files_per_trigger=2),
                os.path.join(tmp, "ckpt"),
            )
            q.processAllAvailable()
            q.stop()
            for t in tables:
                if not t.keyed:
                    # unkeyed tables hold nothing in the keyed state;
                    # their retention is append-only by definition
                    rows = append_only(
                        good.filter(F.col("relid") == t.relid),
                        schemas[t.relid][1],
                    )
                else:
                    rows = mat.current_rows(t.relid)
                if rows is None:
                    results[t.name] = 0
                    continue
                dest = os.path.join(out_dir, t.name)
                rows.write.mode("overwrite").parquet(dest)
                results[t.name] = spark.read.parquet(dest).count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return results

    # Per-table materializations are INDEPENDENT jobs, each over its
    # own table's generation — no shared union, no shared cache — so
    # run them concurrently from a thread pool: the same fan-out the
    # streaming MultiTableMaterializer uses per micro-batch
    # (stream.py), where the 50-table soak measures the win. Wall
    # cost becomes roughly max(table) instead of sum(table); Spark
    # schedules concurrent jobs from one session safely.
    from concurrent.futures import ThreadPoolExecutor

    def _one(part) -> tuple[str, int]:
        t = part[0]
        sub = _table_events(*part)
        state = (
            materialize(sub, schemas[t.relid][1])
            if t.keyed
            else append_only(sub, schemas[t.relid][1])
        )
        dest = os.path.join(out_dir, t.name)
        state.write.mode("overwrite").parquet(dest)
        return t.name, spark.read.parquet(dest).count()

    with ThreadPoolExecutor(max_workers=min(8, len(parts))) as pool:
        for name, n in pool.map(_one, parts):
            results[name] = n
    return results
