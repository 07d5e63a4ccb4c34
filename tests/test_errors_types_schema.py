"""Error policy (X1), type mapping + name sanitization (X3/P3), and
schema evolution (P4) tests, modeled on the reference suites:
error_handling_spec.rb, schema_spec.rb:359-467, topic_spec.rb:113-274.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bottledwater_pg_spark.errors import (
    ErrorPolicy,
    OversizedRecordError,
    apply_error_policy,
)
from bottledwater_pg_spark.routing import topic_name
from bottledwater_pg_spark.schema_tracker import (
    SchemaTracker,
    resolve_schemas,
    table_schema_events,
)
from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.sources.generator import MutationSpec, generate_cdc
from bottledwater_pg_spark.types import (
    make_avro_safe,
    schema_for_pg_columns,
    spark_type_for_pg,
)

# ------------------------------------------------------------ error policy


def _doc_events(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return generate_cdc(
        docs, ["doc_id"], F.col("doc_id"), 16389, "documents",
        MutationSpec(update_exprs={"text": "text"}),
    )


def test_error_policy_log_skips_bad_rows_and_continues(spark, sf_dir):
    # error_handling_spec.rb:117-129: Wednesday + Friday arrive, the
    # oversized row between them is skipped
    events = _doc_events(spark, sf_dir)
    good, bad = apply_error_policy(events, ErrorPolicy.LOG, max_bytes=400)
    assert bad.count() > 0
    assert good.count() > 0
    assert good.filter(F.octet_length("new_row") > 400).count() == 0


def test_error_policy_exit_halts(spark, sf_dir):
    events = _doc_events(spark, sf_dir)
    with pytest.raises(OversizedRecordError):
        apply_error_policy(events, ErrorPolicy.EXIT, max_bytes=400)


def test_error_policy_exit_passes_when_clean(spark, sf_dir):
    events = _doc_events(spark, sf_dir)
    good, bad = apply_error_policy(events, ErrorPolicy.EXIT, max_bytes=10**7)
    assert bad.count() == 0


# ------------------------------------------------------- types & sanitize


def test_make_avro_safe_matches_reference_examples():
    # schema_spec.rb:359-467 fixtures via oid2avro.c:799-828
    assert make_avro_safe("person.name/surname") == "person_2e_name_2f_surname"
    assert make_avro_safe("crêpes") == "cr_c3__aa_pes"
    assert make_avro_safe("z" * 63) == "z" * 63
    assert make_avro_safe("1abc") == "_31_abc"  # leading digit invalid
    assert make_avro_safe("ok_name9") == "ok_name9"
    assert make_avro_safe("a.b", dot_preserving=True) == "a.b"


def test_type_mapping_improvements():
    # numeric -> decimal (reference bug #4), bytea -> binary (bug #70)
    assert spark_type_for_pg("numeric") == T.DecimalType(38, 18)
    assert spark_type_for_pg("bytea") == T.BinaryType()
    assert spark_type_for_pg("sometype_we_never_heard_of") == T.StringType()
    assert spark_type_for_pg("timestamptz") == T.TimestampType()


def test_zero_column_table_gets_dummy_field():
    # oid2avro.c:153-163: Avro rejects empty records
    schema = schema_for_pg_columns([])
    assert [f.name for f in schema.fields] == ["dummy"]


def test_schema_builder_sanitizes_and_nullable():
    schema = schema_for_pg_columns([("person.name", "text"), ("n", "integer")])
    assert schema.fields[0].name == "person_2e_name"
    assert all(f.nullable for f in schema.fields)


def test_topic_naming_rules():
    # README.md:326-358 naming matrix
    assert topic_name("things") == "things"
    assert topic_name("things", "myapp") == "myapp.things"
    assert topic_name("things", "public", "bw") == "bw.things"
    assert topic_name("things", "myapp", "bw") == "bw.myapp.things"


# -------------------------------------------------------- schema evolution


def test_schema_evolution_add_column(spark, sf_dir):
    """topic_spec.rb ALTER TABLE ADD COLUMN matrix: events encoded
    before the DDL decode with nulls in the new column."""
    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select("c_custkey", "c_name")
    v2 = cust.select("c_custkey", "c_name", "c_acctbal")

    tracker = SchemaTracker()
    assert tracker.observe(1, v1.schema.json()) is True
    assert tracker.observe(1, v1.schema.json()) is False  # unchanged
    assert tracker.observe(1, v2.schema.json()) is True  # DDL drift

    latest = tracker.current(1)
    assert [f.name for f in latest.fields] == ["c_custkey", "c_name", "c_acctbal"]

    # control events round-trip through the envelope
    ctl = table_schema_events(v1, 1, "customer", lsn=0).unionByName(
        table_schema_events(v2, 1, "customer", lsn=1)
    )
    tracker2 = resolve_schemas(ctl)
    assert tracker2.current(1).fieldNames() == latest.fieldNames()

    # old-event payloads decode under the new schema with null fill
    old_payload = spark.createDataFrame(
        [("insert", 1, 0, 10, '{"c_custkey":7}', None,
          '{"c_custkey":7,"c_name":"x"}', None, "customer")],
        schema=ctl.schema,
    )
    from bottledwater_pg_spark.schema_tracker import decode_with_evolution

    decoded = decode_with_evolution(old_payload, 1, tracker2).select("r.*")
    row = decoded.collect()[0]
    assert row["c_custkey"] == 7 and row["c_name"] == "x"
    assert row["c_acctbal"] is None


def test_observed_error_metrics_single_pass(spark):
    """with_observed_error_metrics counts dropped rows as a side
    channel of the one job that filters them — values verified against
    an explicit count."""
    from bottledwater_pg_spark.errors import with_observed_error_metrics

    rows = [("k1", "x" * 10), ("k2", "y" * 2_000_000), ("k3", None)]
    df = spark.createDataFrame(rows, "key string, new_row string")
    good, obs = with_observed_error_metrics(df)
    assert good.count() == 2  # tombstone passes, oversized dropped
    assert obs.get["n_oversized"] == 1
    assert obs.get["n_seen"] == 3


def test_malformed_payload_decodes_null_and_is_countable(spark):
    """A corrupt row payload must not kill the pipeline: from_json is
    PERMISSIVE (null struct), compaction still works on the envelope
    columns, and the bad rows are countable for the error policy —
    the Spark rendering of the reference's log-and-skip."""
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.operators.materialize import compact, decode_rows

    rows = [
        ('{"k":1}', "insert", 1, '{"a": 10, "b": "x"}'),
        ('{"k":2}', "insert", 2, '{"a": oops not json'),
        ('{"k":3}', "insert", 3, None),  # tombstone-like null
    ]
    df = spark.createDataFrame(rows, "key string, op string, lsn long, new_row string")
    compacted = compact(df)
    assert compacted.count() == 3  # compaction untouched by payload health
    decoded = decode_rows(
        compacted.filter(F.col("key") == '{"k":2}'),
        __import__("pyspark.sql.types", fromlist=["x"]).StructType.fromDDL(
            "a long, b string"
        ),
    )
    row = decoded.first()
    assert row["a"] is None and row["b"] is None  # PERMISSIVE null-out
    # error accounting: malformed = non-null payload whose decode
    # nulls out every field (PERMISSIVE nulls the FIELDS, not the
    # struct, in Spark 4)
    bad = (
        compacted.withColumn(
            "r", F.from_json("new_row", "a long, b string")
        )
        .filter(
            F.col("new_row").isNotNull()
            & F.col("r.a").isNull()
            & F.col("r.b").isNull()
        )
        .count()
    )
    assert bad == 1


# ---------------------------- schema-evolution DDL matrix, end-to-end


def test_schema_evolution_drop_column_end_to_end(spark, sf_dir, duck):
    """schema_spec.rb:359-467 drop-column: survivors decode under the
    NEWEST (narrower) schema; v1 payloads' dropped field is ignored."""
    from bottledwater_pg_spark.operators.cdc_queries import (
        CDC_EVOLUTION_DROP_SQL,
        cdc_schema_evolution_drop,
    )
    from tests.conftest import assert_df_matches_oracle

    out = cdc_schema_evolution_drop(spark, sf_dir)
    assert "c_acctbal" not in out.columns  # column really dropped
    assert_df_matches_oracle(out, duck, CDC_EVOLUTION_DROP_SQL)


def test_schema_evolution_rename_end_to_end(spark, sf_dir, duck):
    """topic_spec.rb rename: state continuous across the rename (keyed
    by relid), post-rename events route to the new topic."""
    from bottledwater_pg_spark.operators.cdc_queries import (
        CDC_EVOLUTION_RENAME_SQL,
        cdc_schema_evolution_rename,
    )
    from tests.conftest import assert_df_matches_oracle

    out = cdc_schema_evolution_rename(spark, sf_dir)
    topics = {r["last_topic"] for r in out.select("last_topic").distinct().collect()}
    assert topics == {"custmr", "customer_renamed"}
    assert_df_matches_oracle(out, duck, CDC_EVOLUTION_RENAME_SQL)


def test_zero_column_table_roundtrip(spark, sf_dir, duck):
    """schema_spec.rb zero-column table: dummy-boolean schema parity
    (oid2avro.c:153-163) driven end-to-end through the unkeyed path."""
    from bottledwater_pg_spark.operators.cdc_queries import (
        CDC_ZERO_COLUMN_SQL,
        cdc_zero_column_table,
    )
    from tests.conftest import assert_df_matches_oracle

    out = cdc_zero_column_table(spark, sf_dir)
    assert out.columns == ["dummy"]
    assert_df_matches_oracle(out, duck, CDC_ZERO_COLUMN_SQL)


def test_skip_snapshot_stream_only(spark, sf_dir, duck):
    """snapshot_spec.rb:55-61 --skip-snapshot: only stream-touched keys
    materialize; a tombstone for a never-snapshotted key is a no-op."""
    from bottledwater_pg_spark.operators.cdc_queries import (
        CDC_SKIP_SNAPSHOT_SQL,
        cdc_skip_snapshot_customer,
    )
    from bottledwater_pg_spark.sources.generator import generate_cdc
    from tests.conftest import assert_df_matches_oracle

    out = cdc_skip_snapshot_customer(spark, sf_dir)
    assert_df_matches_oracle(out, duck, CDC_SKIP_SNAPSHOT_SQL)
    # the skip-snapshot stream carries NO xid-0 snapshot events at all
    cust = load_table(spark, sf_dir, "customer")
    stream = generate_cdc(
        cust, ["c_custkey"], F.col("c_custkey"), 1, "customer",
        skip_snapshot=True,
    )
    assert stream.filter(F.col("xid") == 0).count() == 0


# ------------------------------------------------ Avro envelope (E1)


def test_avro_envelope_roundtrip_or_gate(spark, sf_dir):
    """E1: when the spark-avro data source is present, the full binary
    envelope must round-trip (encode customer rows -> Avro bytes ->
    decode -> identical values). In this image the data source is
    absent, so the capability gate must raise with the explanatory
    message instead of failing cryptically at execution time. The SAME
    test passes in both environments — it lights up automatically with
    the jar (kafka/registry.c:63-87 framing is the reference analog).
    """
    from bottledwater_pg_spark.sources.avro_io import (
        avro_available,
        decode_avro,
        encode_rows,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    if avro_available():
        enc = encode_rows(cust, ["c_custkey", "c_name"])
        avro_schema = {
            "type": "record",
            "name": "customer",
            "fields": [
                {"name": "c_custkey", "type": ["null", "long"]},
                {"name": "c_name", "type": ["null", "string"]},
            ],
        }
        dec = enc.select(
            F.col("c_custkey").alias("orig_key"),
            decode_avro(F.col("avro_bytes"), __import__("json").dumps(avro_schema)).alias("r"),
        )
        mismatches = dec.filter(F.col("orig_key") != F.col("r.c_custkey")).count()
        assert mismatches == 0
        assert dec.count() == cust.count()
    else:
        import pytest

        with pytest.raises(NotImplementedError, match="spark-avro"):
            encode_rows(cust, ["c_custkey", "c_name"]).collect()
        with pytest.raises(NotImplementedError, match="spark-avro|avro"):
            cust.select(decode_avro(F.lit(b""), "{}")).collect()


def test_schema_evolution_widen_decodes_v1_ints_as_bigint(spark, sf_dir):
    """After a v2 TableSchema widens c_points int->bigint, ALL
    surviving rows (v1-era included) decode as LongType, and the
    beyond-int32 v2 values round-trip exactly."""
    from pyspark.sql import types as T

    from bottledwater_pg_spark.operators.cdc_queries import (
        cdc_schema_evolution_widen,
    )

    out = cdc_schema_evolution_widen(spark, sf_dir)
    assert isinstance(out.schema["c_points"].dataType, T.LongType)
    pdf = out.toPandas()
    wide = pdf[pdf.c_custkey % 5 == 0]
    narrow = pdf[pdf.c_custkey % 5 != 0]
    assert (wide.c_points >= 5_000_000_000).all()
    assert (narrow.c_points < 1000).all() and (narrow.c_points >= 0).all()


def test_avro_codec_matches_spec_bytes_and_tombstones():
    """Pure-Python Avro binary codec pinned to the Avro spec's own
    examples (zigzag varints, length-prefixed strings) and the
    Confluent 5-byte framing the reference produces
    (kafka/registry.c:63-87); tombstone values frame to None."""
    import struct

    from bottledwater_pg_spark.sources.avro_codec import (
        decode_record,
        encode_record,
        frame,
        read_long,
        unframe,
        write_long,
    )

    pins = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
            2: b"\x04", 64: b"\x80\x01", -64: b"\x7f"}
    for n, want in pins.items():
        buf = bytearray()
        write_long(buf, n)
        assert bytes(buf) == want, (n, bytes(buf))
        assert read_long(bytes(buf), 0)[0] == n
    for n in (-2**63, 2**63 - 1, 123456789012345):
        buf = bytearray()
        write_long(buf, n)
        assert read_long(bytes(buf), 0)[0] == n

    fields = [("id", ["null", "long"]), ("name", ["null", "string"]),
              ("bal", ["null", "double"])]
    row = {"id": 3, "name": "ab", "bal": 1.5}
    enc = encode_record(fields, row)
    # union index 1 (long 3) | union 1 + len 2 'ab' | union 1 + IEEE 1.5
    assert enc == (b"\x02\x06" + b"\x02\x04ab" + b"\x02"
                   + struct.pack("<d", 1.5))
    assert decode_record(fields, enc)[0] == row
    nulls = encode_record(fields, {"id": None, "name": None, "bal": None})
    assert nulls == b"\x00\x00\x00"

    framed = frame(enc, 42)
    assert framed[:5] == b"\x00" + struct.pack(">I", 42)
    sid, body = unframe(framed)
    assert sid == 42 and body == enc
    assert frame(None, 7) is None  # delete -> Kafka tombstone


def test_local_schema_registry_unit(tmp_path):
    """R3 locally: deterministic content ids (same schema -> same id
    on any replica, no coordination), subject versioning, restart
    persistence."""
    from bottledwater_pg_spark.sources.registry_client import (
        LocalSchemaRegistry,
        schema_id_of,
    )

    reg = LocalSchemaRegistry(str(tmp_path / "reg"))
    f1 = [("id", ["null", "long"]), ("name", ["null", "string"])]
    i1 = reg.register("customer-key", f1)
    assert reg.register("customer-key", f1) == i1  # idempotent
    f2 = f1 + [("extra", ["null", "double"])]
    i2 = reg.register("customer-key", f2)
    assert i2 != i1
    assert reg.latest("customer-key")["version"] == 2
    fresh = LocalSchemaRegistry(str(tmp_path / "reg"))  # restart
    assert [tuple(x) for x in fresh.by_id(i2)] == f2
    assert fresh.by_id(999) is None
    assert schema_id_of(f1) == i1  # pure function of content


def test_registry_framed_roundtrip(spark, sf_dir, tmp_path):
    """Publish with registered ids, decode by resolving the embedded
    id against the registry — the reference consumer's lookup path."""
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.registry_client import (
        LocalSchemaRegistry,
        decode_with_registry,
        frames_with_registry,
    )

    reg = LocalSchemaRegistry(str(tmp_path / "reg"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    ).limit(50)
    frames = frames_with_registry(
        cust, ["c_custkey"], ["c_custkey", "c_name", "c_acctbal"],
        reg, "customer",
    )
    back = decode_with_registry(frames, reg).toPandas().sort_values(
        "c_custkey"
    ).reset_index(drop=True)
    want = cust.toPandas().sort_values("c_custkey").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(back[want.columns.tolist()], want)
    assert reg.latest("customer-key") and reg.latest("customer-value")


# ------------------------------------------- error policy x DDL matrix


def _poisoned_two_table_stream(spark, sf_dir):
    from bottledwater_pg_spark.sources.generator import snapshot_events

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    c_rows = snapshot_events(cust, ["c_custkey"], F.col("c_custkey"),
                             16385, "customer")
    o_ctl = table_schema_events(orders, 16388, "orders", lsn=0)
    o_rows = snapshot_events(orders, ["o_orderkey"], F.col("o_orderkey"),
                             16388, "orders")
    poisoned = o_ctl.select(
        "op", "relid", "xid",
        F.lit(1 << 62).cast("long").alias("lsn"),
        "key", "old_row", "new_row",
        F.lit("{not valid json").alias("schema_json"), "topic",
    )
    post = (
        snapshot_events(orders, ["o_orderkey"], F.col("o_orderkey"),
                        16388, "orders")
        .withColumn("lsn", F.col("lsn") + (1 << 62) + 1)
        .withColumn("op", F.lit("update"))
    )
    ctl_c = table_schema_events(cust, 16385, "customer", lsn=0)
    return (
        ctl_c.unionByName(c_rows).unionByName(o_ctl)
        .unionByName(o_rows).unionByName(poisoned).unionByName(post)
    )


def test_ddl_error_policy_exit_halts_with_state_intact(spark, sf_dir):
    """A poisoned TableSchema under exit halts BEFORE any event is
    consumed past the failure — the caller's state dirs are untouched
    (error_policy.c exit semantics: no loss, no corruption)."""
    from bottledwater_pg_spark.errors import (
        SchemaRegistrationError,
        apply_ddl_error_policy,
    )

    stream = _poisoned_two_table_stream(spark, sf_dir)
    with pytest.raises(SchemaRegistrationError):
        apply_ddl_error_policy(stream, ErrorPolicy.EXIT)


def test_ddl_error_policy_log_drops_failed_table_keeps_others(spark, sf_dir):
    """Under log: the poisoned table's post-failure events drop, its
    pre-failure snapshot survives, and the OTHER table is complete
    (table_mapper.c:88-118 option (b))."""
    from bottledwater_pg_spark.errors import apply_ddl_error_policy

    stream = _poisoned_two_table_stream(spark, sf_dir)
    good, registry = apply_ddl_error_policy(stream, ErrorPolicy.LOG)
    assert registry.lookup(16388) is None
    assert registry.lookup(16385) is not None
    n_cust = load_table(spark, sf_dir, "customer").count()
    n_ord = load_table(spark, sf_dir, "orders").count()
    dml = good.filter(F.col("op").isin("insert", "update", "delete"))
    assert dml.filter(F.col("relid") == 16385).count() == n_cust
    # orders: snapshot survived, every post-poison update dropped
    o_good = dml.filter(F.col("relid") == 16388)
    assert o_good.count() == n_ord
    assert o_good.filter(F.col("op") == "update").count() == 0


def test_registry_mixed_schema_id_decode(spark, sf_dir, tmp_path):
    """A topic mid-evolution carries frames under two value schema
    ids; decode resolves EACH frame's embedded id (the reference
    consumer's per-frame lookup) — v1 frames read null for the
    later-added column, and an id missing from the registry fails
    loudly."""
    import pandas as pd
    import pytest as _pytest

    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.registry_client import (
        LocalSchemaRegistry,
        decode_with_registry,
        frames_with_registry,
    )

    reg = LocalSchemaRegistry(str(tmp_path / "reg"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    ).limit(40)
    v1_cols = ["c_custkey", "c_name", "c_acctbal"]
    v1 = cust.filter(F.col("c_custkey") % 2 == 1).select(*v1_cols)
    v2 = cust.filter(F.col("c_custkey") % 2 == 0)
    frames = frames_with_registry(
        v1, ["c_custkey"], v1_cols, reg, "customer"
    ).unionByName(
        frames_with_registry(
            v2, ["c_custkey"], v1_cols + ["c_mktsegment"], reg, "customer"
        )
    )
    got = decode_with_registry(frames, reg, topic="customer").toPandas()
    got = got.sort_values("c_custkey").reset_index(drop=True)
    want = cust.toPandas()
    want.loc[want.c_custkey % 2 == 1, "c_mktsegment"] = None
    want = want.sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    assert len(reg._load("customer-value")) == 2  # two versions live

    # unknown id -> loud failure, not silent mis-decode
    empty_reg = LocalSchemaRegistry(str(tmp_path / "empty"))
    with _pytest.raises(Exception, match="no schemas"):
        decode_with_registry(frames, empty_reg)
