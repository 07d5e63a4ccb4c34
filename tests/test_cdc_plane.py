"""CDC plane tests: generator determinism, materialization semantics
(tombstones, PK-change rewrite, unkeyed policy), envelope shape.

Models the reference's functional suites:
spec/functional/message_spec.rb (insert order, delete tombstone,
update new-value, snapshot continuity, unkeyed policy) and
snapshot_spec.rb (prepopulated rows published).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bottledwater_pg_spark.operators.materialize import (
    append_only,
    latest_by_key,
    materialize,
)
from bottledwater_pg_spark.plans.envelope import (
    ENVELOPE_SCHEMA,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
)
from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.sources.generator import (
    MutationSpec,
    generate_cdc,
    oracle_final_state_sql,
)
from tests.conftest import assert_df_matches_oracle

CUSTOMER_SPEC = MutationSpec(update_exprs={"c_acctbal": "c_acctbal + 100.0"})


def customer_events(spark, sf_dir, markers=False):
    cust = load_table(spark, sf_dir, "customer")
    return cust, generate_cdc(
        cust,
        ["c_custkey"],
        F.col("c_custkey"),
        relid=16385,
        table="customer",
        spec=CUSTOMER_SPEC,
        include_txn_markers=markers,
    )


def test_envelope_schema(spark, sf_dir):
    _, events = customer_events(spark, sf_dir, markers=True)
    got = [(f.name, f.dataType) for f in events.schema.fields]
    want = [(f.name, f.dataType) for f in ENVELOPE_SCHEMA.fields]
    assert got == want
    ops = {r[0] for r in events.select("op").distinct().collect()}
    assert ops == {"begin", "commit", "insert", "update", "delete"}


def test_snapshot_phase_emits_every_row_as_insert(spark, sf_dir):
    # snapshot_spec.rb:21-38 — prepopulated rows are published
    cust, events = customer_events(spark, sf_dir)
    snap = events.filter((F.col("xid") == 0) & (F.col("op") == OP_INSERT))
    assert snap.count() == cust.count()
    assert snap.filter(F.col("key").isNull()).count() == 0


def test_materialized_state_matches_oracle(spark, sf_dir, duck):
    cust, events = customer_events(spark, sf_dir, markers=True)
    state = materialize(events, cust.schema)
    sql = oracle_final_state_sql(
        "customer", ["c_custkey"], "c_custkey", cust.columns, CUSTOMER_SPEC
    )
    assert_df_matches_oracle(state, duck, sql, sort_cols=["c_custkey"])


def test_composite_key_materialization(spark, sf_dir, duck):
    # Composite-key fixture (FIXTURES.md §7). The synthetic lineitem's
    # (l_orderkey, l_linenumber) is NOT unique, so the composite key
    # here is events(user_id, event_id) — unique because event_id is.
    ev = load_table(spark, sf_dir, "events")
    spec = MutationSpec(update_exprs={"value": "value + 1.0"})
    events = generate_cdc(
        ev, ["user_id", "event_id"], F.col("event_id"), 16386, "events", spec
    )
    state = materialize(events, ev.schema)
    sql = oracle_final_state_sql(
        "events", ["user_id", "event_id"], "event_id", ev.columns, spec
    )
    assert_df_matches_oracle(state, duck, sql, sort_cols=["event_id"])


def test_delete_wins_as_tombstone(spark, sf_dir):
    # message_spec.rb:50-61 — delete publishes a null-value tombstone
    # with the same key, which suppresses the earlier insert.
    cust, events = customer_events(spark, sf_dir)
    compacted = latest_by_key(events)
    # keys deleted (pk%7==0, not moved) must be absent
    gone = compacted.select(
        F.get_json_object("key", "$.c_custkey").cast("long").alias("k")
    ).filter((F.col("k") % 7 == 0) & (F.col("k") % 11 != 0) & (F.col("k") < 1000000))
    assert gone.count() == 0


def test_update_publishes_new_value(spark, sf_dir):
    # message_spec.rb:63-76 — update -> new value under same key
    cust, events = customer_events(spark, sf_dir)
    state = materialize(events, cust.schema)
    base = {
        r["c_custkey"]: r["c_acctbal"]
        for r in cust.select("c_custkey", "c_acctbal").collect()
    }
    updated = (
        state.filter(
            (F.col("c_custkey") % 5 == 0)
            & (F.col("c_custkey") % 11 != 0)
            & (F.col("c_custkey") < 1000000)
        )
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    assert updated, "expected some updated rows"
    for row in updated:
        assert abs(row["c_acctbal"] - (base[row["c_custkey"]] + 100.0)) < 1e-9


def test_pk_change_rewrites_to_delete_plus_insert(spark, sf_dir):
    # protocol_server.c:103-143 — PK-change update becomes
    # Delete(old key) + Insert(new key).
    cust, events = customer_events(spark, sf_dir)
    moved = events.filter(F.col("xid") == 2)
    dels = moved.filter(F.col("op") == OP_DELETE).count()
    ins = moved.filter(F.col("op") == OP_INSERT).count()
    upd = moved.filter(F.col("op") == OP_UPDATE).count()
    assert dels == ins and dels > 0 and upd == 0


def test_unkeyed_append_only(spark, sf_dir, duck):
    # message_spec.rb:99-163 — unkeyed tables: null keys, deletes
    # dropped; materialization is append-only.
    ev = load_table(spark, sf_dir, "events")
    spec = MutationSpec(update_exprs={"value": "value + 1.0"})
    events = generate_cdc(ev, [], F.col("event_id"), 16387, "events", spec)
    assert events.filter(F.col("key").isNotNull()).count() == 0
    assert events.filter(F.col("op") == OP_DELETE).count() == 0
    state = append_only(events, ev.schema)
    sql = (
        "SELECT * FROM events UNION ALL "
        "SELECT event_id, ts, user_id, event_type, value + 1.0 AS value, props "
        "FROM events WHERE event_id % 5 = 0"
    )
    assert_df_matches_oracle(state, duck, sql, sort_cols=["event_id", "value"])


def test_per_key_lsn_monotonic(spark, sf_dir):
    # ordering is recovered from lsn, never arrival order — assert the
    # generator emits strictly increasing lsn per key.
    _, events = customer_events(spark, sf_dir)
    dup = (
        events.filter(F.col("key").isNotNull())
        .groupBy("key", "lsn")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_pk_shift_exceeds_every_fixture_max_key(spark, sf_dir):
    """Guard for the pk-change scheme: a shifted key (pk + pk_shift)
    colliding with an EXISTING base key would make compaction silently
    drop the pk-change insert while the closed-form oracle keeps both
    rows. This pins shift > max(pk) for every keyed fixture table at
    the gate SF — when fixtures outgrow the shift, this fails loudly
    instead of the oracles drifting silently."""
    from bottledwater_pg_spark.sources.catalog import (
        TABLE_KEYS,
        TABLE_PKNUM_SQL,
        get_table_list,
    )
    from bottledwater_pg_spark.sources.generator import MutationSpec

    shift = MutationSpec().pk_shift
    for t in get_table_list(sf_dir, "%", allow_unkeyed=True):
        if not t.key_columns:
            continue
        mx = (
            load_table(spark, sf_dir, t.name)
            .selectExpr(f"max({TABLE_PKNUM_SQL[t.name]}) AS m")
            .collect()[0]["m"]
        )
        assert mx < shift, (
            f"{t.name}: max pk {mx} >= pk_shift {shift}; raise pk_shift"
        )
