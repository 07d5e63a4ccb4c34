"""Property-based tests (hypothesis) — beyond the reference's test
strategy, which has no property tests at all (SURVEY §5). Each
property pins an algebraic law of a core operator against a trivially
correct pure-Python model on randomized inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# one event: (key, op, lsn). Payload is derived from lsn so the
# winning payload is checkable.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key space small -> collisions
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=1,
    max_size=25,
)


def _model_compact(rows):
    """Pure-Python latest-by-(key, max lsn) with Spark max_by tie
    semantics out of scope: generated lsns are made unique per key."""
    state = {}
    for k, op, lsn in rows:
        cur = state.get(k)
        if cur is None or lsn > cur[0]:
            state[k] = (lsn, op)
    return {k: v for k, v in state.items()}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_compact_matches_pure_python_fold(spark, raw):
    from bottledwater_pg_spark.operators.materialize import compact

    # make lsn unique per key (duplicate (key, lsn) winners would be
    # tie-broken arbitrarily in both models — not the law under test)
    seen: dict[tuple[int, int], int] = {}
    rows = []
    for k, op, lsn in raw:
        bump = seen.get((k, lsn), 0)
        seen[(k, lsn)] = bump + 1
        rows.append((k, op, lsn * 1000 + bump))

    df = spark.createDataFrame(
        [
            (f'{{"k":{k}}}', op, lsn, f'{{"payload":{lsn}}}' if op != "delete" else None)
            for k, op, lsn in rows
        ],
        "key string, op string, lsn long, new_row string",
    )
    got = {
        r["key"]: (r["lsn"], r["op"]) for r in compact(df).collect()
    }
    want = {
        f'{{"k":{k}}}': v for k, v in _model_compact(rows).items()
    }
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_ivm_count_matches_model(spark, raw):
    """The signed-count fold equals replaying the sequence row-by-row,
    for ANY event sequence whose images are consistent (insert/update
    carry +1 new, update/delete carry -1 old)."""
    from pyspark.sql import types as T

    from bottledwater_pg_spark.operators.ivm import incremental_group_agg

    # build a CONSISTENT event stream from the random ops: per key,
    # force the legal lifecycle insert -> update* -> delete?
    by_key: dict[int, list[str]] = {}
    for k, op, _ in raw:
        by_key.setdefault(k, []).append(op)
    rows, model_count = [], 0
    lsn = 0
    for k, ops in by_key.items():
        alive = False
        val = float(k)
        for op in ops:
            lsn += 1
            if op == "insert" and not alive:
                rows.append(("insert", f'{{"k":{k}}}', None, f'{{"g":"x","v":{val}}}', lsn))
                alive = True
                model_count += 1
            elif op == "update" and alive:
                rows.append(
                    ("update", f'{{"k":{k}}}', f'{{"g":"x","v":{val}}}',
                     f'{{"g":"x","v":{val + 1}}}', lsn)
                )
                val += 1
            elif op == "delete" and alive:
                rows.append(("delete", f'{{"k":{k}}}', f'{{"g":"x","v":{val}}}', None, lsn))
                alive = False
                model_count -= 1
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "op string, key string, old_row string, new_row string, lsn long"
    )
    out = incremental_group_agg(
        df, T.StructType.fromDDL("g string, v double"), "g", "v"
    ).collect()
    got = out[0]["n_rows"] if out else 0
    assert got == model_count
