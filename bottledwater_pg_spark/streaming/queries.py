"""Streaming-operator queries surfaced through the driver contract.

The driver gate runs batch DataFrames, so these run the *same
transformations* the streaming plane uses (windowed aggregation,
session windows) in batch mode — Structured Streaming's unified model
makes that the identical logical plan; the streaming execution itself
(micro-batches, watermarks, checkpoint recovery, foreachBatch merge) is
exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.streaming.stream import (
    hierarchical_rollup,
    sessionized_counts,
    sliding_window_counts,
    windowed_event_counts,
)


def windowed_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


WINDOWED_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def hierarchical_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-level continuous aggregate telescoped through minute and
    hour partials (streaming/stream.py ``hierarchical_rollup``); the
    oracle aggregates the raw events directly — decomposable
    aggregates make the two identical."""
    return hierarchical_rollup(load_table(spark, sf_dir, "events"))


ROLLUP_HIER_SQL = """
SELECT date_trunc('day', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def session_windows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionized_counts(load_table(spark, sf_dir, "events"))


# gaps-and-islands rendering of session_window(ts, 30 min):
# session_end = last event + gap, session_start = first event
SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grouped AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id, COUNT(*) AS n_events
FROM grouped
GROUP BY user_id, session_no
"""

def sliding_windows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_counts(load_table(spark, sf_dir, "events"))


# each event belongs to the 4 slide-aligned windows covering it; Spark
# aligns windows to the naive epoch, reproduced here with exact µs
# modular arithmetic (1800000000 µs = 30 min)
SLIDING_SQL = """
SELECT ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND
         - (i.i * INTERVAL 30 MINUTE) AS window_start,
       event_type, COUNT(*) AS n_events
FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS i) i
GROUP BY 1, 2
"""


QUERIES = {
    "windowed_event_counts": windowed_counts_query,
    "session_window_counts": session_windows_query,
    "sliding_window_counts": sliding_windows_query,
    "hierarchical_rollup_daily": hierarchical_rollup_query,
}

ORACLES = {
    "windowed_event_counts": WINDOWED_SQL,
    "session_window_counts": SESSION_SQL,
    "sliding_window_counts": SLIDING_SQL,
    "hierarchical_rollup_daily": ROLLUP_HIER_SQL,
}


def streaming_fraud_anomalies(events_stream: "DataFrame"):
    """TRUE streaming form of the fraud monitor
    (operators/queries.py ``fraud_rolling_anomalies``): per-user state
    holds the trailing 10 event values as a bounded deque
    (applyInPandasWithState); each arriving event is scored against
    the deque BEFORE being pushed — the same self-excluding baseline
    as the batch window, evaluated incrementally with O(1) state per
    user.

    Emits only flagged events. The batch query is this operator's
    oracle: replaying a bounded stream through it must flag exactly
    the events the batch window flags (pinned in
    tests/test_skew_and_watermark.py).

    Bit-parity with the batch formulation: the batch window sums the
    values as decimal(18,4) (and their products as decimal(38,8))
    exactly, converting to double only for the final fixed
    mean/variance arithmetic.  The scorer reproduces that here —
    each deque value is re-quantized to 4 decimal places with the
    same HALF_UP rule Spark's double→decimal cast uses
    (java BigDecimal.valueOf == repr round-trip), summed exactly as
    Python Decimals, then floated — so both paths compute identical
    doubles and the 3-sigma flag can never diverge on a borderline
    event.
    """
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415 — executor-side import

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("n_baseline", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("window_vals", T.ArrayType(T.DoubleType()))]
    )

    q4 = Decimal("0.0001")

    def _dec4(v: float) -> Decimal:
        # Spark's double→decimal(18,4) cast: shortest round-trip
        # string (BigDecimal.valueOf) then setScale(4, HALF_UP).
        return Decimal(repr(float(v))).quantize(q4, rounding=ROUND_HALF_UP)

    def score_fn(key, pdfs, state):
        vals: list = list(state.get[0]) if state.exists else []
        flagged_ids, flagged_vals, flagged_n = [], [], []
        # A user's micro-batch rows may span several Arrow record
        # batches (arrow.maxRecordsPerBatch); sorting each chunk
        # independently would interleave out of (ts, event_id) order,
        # so concatenate FIRST and sort the whole group once.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            rows = list(allpdf.itertuples(index=False))
        else:
            rows = []
        for r in rows:
            n = len(vals)
            if n >= 5:
                # exact decimal moments over <= 10 values, floated at
                # the same point the batch window casts to double —
                # identical doubles in, identical flag out
                dvals = [_dec4(v) for v in vals]
                s = float(sum(dvals))
                s2 = float(sum(d * d for d in dvals))
                mean = s / n
                var = (s2 - s * s / n) / n
                dev = r.value - mean
                if dev * dev > 9 * var:
                    flagged_ids.append(int(r.event_id))
                    flagged_vals.append(float(r.value))
                    flagged_n.append(n)
            vals.append(float(r.value))
            if len(vals) > 10:
                vals.pop(0)
        state.update((vals,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(flagged_ids),
                "event_id": flagged_ids,
                "value": flagged_vals,
                "n_baseline": flagged_n,
            }
        )

    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            score_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
