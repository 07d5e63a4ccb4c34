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
from pyspark.sql import functions as F

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


def watermark_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from data: per user, how out-of-order the
    event stream actually arrives — lateness of event i = (running
    max event-time over that user's earlier ARRIVALS) - own event
    time, exact integer microseconds. Reports the 20 most disordered
    users (max lateness, out-of-order count, events). This is the
    measurement that justifies a `withWatermark` bound instead of
    guessing it; per-user windows keep the profile embarrassingly
    parallel (key-partitioned, no global sort).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lag = ev.withColumn(
        "late_us",
        F.greatest(F.lit(0), F.max("us").over(w) - F.col("us")).cast("long"),
    )
    return (
        lag.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("late_us") > 0).cast("long")).alias("n_out_of_order"),
            F.max("late_us").alias("max_late_us"),
        )
        .orderBy(F.desc("max_late_us"), "user_id")
        .limit(20)
    )


WATERMARK_LAG_SQL = """
WITH lag AS (
  SELECT user_id,
         GREATEST(0, MAX(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) - epoch_us(ts)) AS late_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(COALESCE(MAX(late_us), 0) AS BIGINT) AS max_late_us
FROM lag
GROUP BY user_id
ORDER BY max_late_us DESC, user_id
LIMIT 20
"""


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU-style) WITHOUT a range
    self-join: each (day, user) contribution is exploded to the <=7
    target days it can serve — bounded fanout instead of an O(days x
    events) join — then one distinct count per target day. Reported
    only for days that actually have events (semi join). At 100 TB
    the same plan holds (fanout stays 7x); beyond that the HLL-sketch
    twin (`hll_distinct_users_by_type`'s machinery) replaces the
    exact distinct."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    days = ev.select("d").distinct()
    contrib = ev.select(
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("day"),
        "user_id",
    )
    return (
        contrib.join(
            days.withColumnRenamed("d", "day"), "day", "left_semi"
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(F.col("day").cast("timestamp").alias("day"), "active_users_7d")
    )


ROLLING_ACTIVE_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS d, user_id FROM events
), contrib AS (
  SELECT CAST(g.day AS DATE) AS day, user_id
  FROM ev, LATERAL (
    SELECT unnest(generate_series(d, d + INTERVAL 6 DAY,
                                  INTERVAL 1 DAY)) AS day) g
), days AS (SELECT DISTINCT d FROM ev)
SELECT CAST(day AS TIMESTAMP) AS day,
       COUNT(DISTINCT user_id) AS active_users_7d
FROM contrib
WHERE day IN (SELECT d FROM days)
GROUP BY day
"""

QUERIES["watermark_lag_profile"] = watermark_lag_profile
ORACLES["watermark_lag_profile"] = WATERMARK_LAG_SQL
QUERIES["rolling_7d_active_users"] = rolling_active_users
ORACLES["rolling_7d_active_users"] = ROLLING_ACTIVE_SQL


def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending: top-3 event types per hour window by count with
    exact-decimal value totals — the windowed-rank composition every
    monitoring dashboard runs on the stream (in streaming mode the
    same aggregation runs windowed with a watermark; ranking happens
    on the emitted window rows, which are tiny). One shuffle for the
    window aggregate; the rank window sorts only (window x type) rows.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("window_start", "event_type", "n_events", "total_value",
                F.col("rank").cast("long").alias("rank"))
    )


TRENDING_SQL = """
WITH counts AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, total_value,
       CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS BIGINT)
         AS rank
FROM counts
QUALIFY rank <= 3
"""

QUERIES["trending_event_types"] = trending_event_types
ORACLES["trending_event_types"] = TRENDING_SQL


def resampled_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: for each user (first
    20), a regular HOURLY grid from their first to last event, each
    grid point carrying the last purchase value at-or-before it — the
    hypertable `time_bucket_gapfill + locf` shape that turns an
    irregular event stream into an aligned series for
    training/monitoring.

    Plan: the per-user grid is a bounded explode of
    sequence(min_hour, max_hour) (fanout = series length, no
    days x events join); the carry-forward is the union + last-non-
    null window — ONE shuffle on user_id, the as-of discipline. Grid
    timestamps are exact integer hours; values exact DECIMAL cast to
    double once.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp")))
        .alias("hr_us"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("hr_us").alias("lo"), F.max("hr_us").alias("hi")
    )
    hour = 3600 * 1_000_000
    grid = bounds.select(
        "user_id",
        F.explode(F.expr(f"sequence(lo, hi, {hour})")).alias("g_us"),
    )
    tagged = ev.select(
        "user_id", F.col("us").alias("t_us"), "v",
        F.lit(0).alias("is_grid"), F.lit(None).cast("long").alias("g_us"),
        F.col("us").alias("tie"),
    ).unionByName(
        grid.select(
            "user_id", (F.col("g_us") + hour - 1).alias("t_us"),
            F.lit(None).cast("decimal(18,2)").alias("v"),
            F.lit(1).alias("is_grid"), "g_us",
            F.lit(2**62).alias("tie"),
        )
    )
    # grid points sort at the END of their hour (t_us = hour end), so
    # the carried value is the last event at-or-before the hour close
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("fill", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.timestamp_micros(F.col("g_us")).cast("timestamp_ntz")
            .alias("bucket"),
            F.col("fill").cast("double").alias("last_value"),
        )
    )


RESAMPLE_SQL = """
WITH ev AS (
  SELECT user_id,
         epoch_us(date_trunc('hour', ts)) AS hr_us,
         epoch_us(ts) AS us,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
  WHERE user_id < 20 AND event_type = 'purchase'
),
bounds AS (
  SELECT user_id, MIN(hr_us) AS lo, MAX(hr_us) AS hi FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, CAST(g.g_us AS BIGINT) AS g_us
  FROM bounds, LATERAL (
    SELECT unnest(generate_series(lo, hi, 3600000000)) AS g_us) g
)
SELECT grid.user_id,
       CAST(make_timestamp(g_us) AS TIMESTAMP) AS bucket,
       CAST((
         SELECT v FROM ev
         WHERE ev.user_id = grid.user_id
           AND ev.us <= g_us + 3599999999
         ORDER BY ev.us DESC LIMIT 1
       ) AS DOUBLE) AS last_value
FROM grid
"""

QUERIES["resampled_user_values"] = resampled_user_values
ORACLES["resampled_user_values"] = RESAMPLE_SQL


def seasonal_deviation_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly report: each (hour, event_type)
    bucket's revenue compared against its HOUR-OF-WEEK baseline (the
    mean of all same-weekday-same-hour buckets) — the monitoring
    pattern that doesn't page on every Saturday dip. Top-20 hours by
    absolute deviation. Exact decimal totals; the baseline is one
    exact-sum/count division; deviation is one double subtract —
    parity-safe. Plan: one hourly aggregation, a tiny (7x24xtypes)
    baseline aggregate broadcast back, ranking on the aggregated
    rows only."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = ev.groupBy("h", "event_type").agg(
        F.sum("v").alias("total")
    ).withColumn("dow", F.dayofweek("h")).withColumn("hod", F.hour("h"))
    baseline = hourly.groupBy("event_type", "dow", "hod").agg(
        (F.sum("total").cast("double") / F.count("*")).alias("baseline")
    )
    dev = hourly.join(
        F.broadcast(baseline), ["event_type", "dow", "hod"]
    ).select(
        "h",
        "event_type",
        F.col("total").cast("double").alias("total"),
        "baseline",
        (F.col("total").cast("double") - F.col("baseline")).alias("deviation"),
    )
    # Top-20 via orderBy().limit() — TakeOrderedAndProject keeps the
    # hours x event_type grid (unbounded under multi-year ranges or
    # high type cardinality) out of a single partition; the rank
    # window then sees only the 20 survivors.
    w = Window.orderBy(F.desc(F.abs("deviation")), "h", "event_type")
    return (
        dev.orderBy(F.desc(F.abs("deviation")), "h", "event_type")
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("h", "event_type", "total", "baseline", "deviation", "rank")
    )


SEASONAL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS total
  FROM events GROUP BY 1, 2
),
tagged AS (
  SELECT h, event_type, total,
         dayofweek(h) AS dow, hour(h) AS hod
  FROM hourly
),
baseline AS (
  SELECT event_type, dow, hod,
         CAST(SUM(total) AS DOUBLE) / COUNT(*) AS baseline
  FROM tagged GROUP BY 1, 2, 3
),
dev AS (
  SELECT t.h, t.event_type,
         CAST(t.total AS DOUBLE) AS total, b.baseline,
         CAST(t.total AS DOUBLE) - b.baseline AS deviation
  FROM tagged t JOIN baseline b USING (event_type, dow, hod)
)
SELECT h, event_type, total, baseline, deviation,
       CAST(ROW_NUMBER() OVER (ORDER BY ABS(deviation) DESC, h, event_type)
            AS BIGINT) AS rank
FROM dev
QUALIFY rank <= 20
"""

QUERIES["seasonal_deviation_hours"] = seasonal_deviation_hours
ORACLES["seasonal_deviation_hours"] = SEASONAL_SQL
