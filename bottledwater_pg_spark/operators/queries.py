"""Relational query plane — the consumer-side capability surface the
reference delegates to downstream systems (SURVEY §2.2; the reference's
README names "calculate analytics" and stream-table joins as the
intended consumers, README.md:30-32, 384-398).

Every query here is a (spark, sf_dir) -> DataFrame callable paired with
an ANSI-SQL oracle (DuckDB) in ``ORACLES``. Conventions that make the
driver's value-hash comparison exact:

* Money arithmetic is done in DECIMAL (exact, associative — immune to
  float summation order differences between engines), and only the
  final aggregate is cast to DOUBLE. The reference lossily casts
  numeric->double (oid2avro.c:291-293, known bug #4); we keep decimal
  through the math.
* Every computed column is aliased identically in the Spark plan and
  the oracle SQL.
* Ordered/limited queries use a unique tie-break key so LIMIT selects
  a deterministic set.

Scale notes are per-query docstrings: which side broadcasts, where the
shuffles are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table, persist_tracked

# ---------------------------------------------------------------- helpers

DEC = "decimal(18,2)"


def _d(col: str):
    """Exact 2-decimal view of a money/quantity double column."""
    return F.col(col).cast(DEC)


def _sql_d(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


def _dbl(dec_col):
    """Decimal -> double through a STRING cast: bit-identical in both
    engines. A wide decimal sum (>= ~17 significant digits — e.g. a
    600k-row sum of squared prices) is correctly rounded by Spark's
    direct cast (BigDecimal) but DuckDB converts hugeint * 10^-s in
    float arithmetic and can land one ULP off (caught by the r10
    full-ledger sf0.1 gate on lineitem_corr_matrix); string -> double
    is IEEE correctly-rounded in both, and for Spark the result is
    identical to the direct cast, so only the oracle side moves."""
    return dec_col.cast("string").cast("double")


def _sql_dbl(expr: str) -> str:
    """DuckDB twin of :func:`_dbl` (see its rounding note)."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    return load_table(spark, sf_dir, name, parallel=parallel)


# ---------------------------------------------------------------- queries


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> partial agg -> final agg.

    Scale: single shuffle on the (tiny-cardinality) group key; columns
    pruned at the parquet scan to the 7 referenced; the shipdate filter
    is pushed to the scan. Partial aggregation makes the exchange carry
    only |groups| x |partitions| rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _d("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_d("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM({_sql_d("l_quantity")}) AS DOUBLE) AS sum_qty,
  CAST(SUM({_sql_d("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")}) * (1 + {_sql_d("l_tax")})) AS DOUBLE) AS sum_charge,
  CAST(SUM({_sql_d("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM({_sql_d("l_extendedprice")}) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join -> agg -> top-k.

    Scale: customer (filtered on segment) broadcasts under AQE at
    real scale it may not — then it's a shuffled hash join on custkey;
    orders->lineitem joins on orderkey (the natural co-partition key).
    Top-k via global sort of the small aggregated result only.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with small-dimension broadcasts.

    Scale: region/nation/supplier/customer are dimensions — broadcast
    explicitly so the only shuffles are lineitem->orders on orderkey.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — entirely pushdown + partial agg.

    Scale: no shuffle at all beyond the final single-row combine.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_d("l_extendedprice") * _d("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = f"""
SELECT CAST(SUM({_sql_d("l_extendedprice")} * {_sql_d("l_discount")}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: join + agg + top-k customers by lost revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by totalprice per market segment.

    Scale: one shuffle on the partition key (5 segments — low
    cardinality, but each partition is only sorted, not collected);
    at 100 TB a segment-level skew would be handled by pre-aggregating
    a per-segment threshold first. Deterministic tie-break on orderkey.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rnk")
    )


TOP3_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rnk <= 3
"""


def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame: cumulative spend per customer over time.

    Exact decimal cumulative sum (cast to double per row) so the
    prefix sums hash identically to the oracle.
    """
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_d("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM({_sql_d("o_totalprice")}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders WHERE o_custkey < 100
"""


def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (status, priority) with subtotals + grand total."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_d("o_totalprice")).cast("double").alias("total_price"),
        )
    )


ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM({_sql_d("o_totalprice")}) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM({_sql_d("l_quantity")}) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind rollup/cube:
    subtotals by (status), by (priority), and the grand total, in one
    expand+aggregate pass (one shuffle)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_d("o_totalprice")).cast("double").alias("total_price"),
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM({_sql_d("o_totalprice")}) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per market segment x order status."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


PIVOT_SQL = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def customers_in_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT: customers with both an 'F' and an 'O' order."""
    orders = _t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return f_cust.intersect(o_cust)


INTERSECT_SQL = """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def customers_only_f_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT: customers with an 'F' order but never an 'O' one."""
    orders = _t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # subtract == EXCEPT (set semantics); exceptAll would keep customers
    # that merely have MORE 'F' orders than 'O' orders
    return f_cust.subtract(o_cust)


EXCEPT_SQL = """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order since 2000-01-01."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
"""


def suppliers_with_returns_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): suppliers that had at least one returned item."""
    supp = _t(spark, sf_dir, "supplier")
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return supp.join(
        returned, supp.s_suppkey == returned.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


SEMI_SQL = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
"""


def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for every purchase
    event, the most recent click by the same user at or before the
    purchase timestamp.

    Implemented as the union-and-carry-forward composition: tag both
    sides, sort within user by (ts, kind), and carry the last click
    forward with last(..., ignorenulls) over an unbounded-preceding
    frame. ONE shuffle on user_id — same cost as any keyed window; no
    O(n^2) range join, no pandas. This is the scalable formulation of
    pd.merge_asof.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("kind"), "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True)
    click_id = F.last(F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True)
    return (
        tagged.withColumn("click_ts", click_ts.over(w))
        .withColumn("click_event_id", click_id.over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "click_ts", "click_event_id")
    )


ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def asof_click_to_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for every click, the next
    purchase by the same user at-or-after the click, kept only when it
    lands within 7 days (attribution-window semantics). Same
    union-and-carry composition as the backward variant but with a
    ``first(..., ignorenulls)`` over the (currentRow,
    unboundedFollowing) frame; the tolerance is applied AFTER nearest
    selection (match nulled, click kept — left semantics), which is
    exactly ``pd.merge_asof(direction='forward', tolerance=...)``.
    Still ONE shuffle on user_id.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("kind"), "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.first(F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True)
    p_id = F.first(
        F.when(F.col("kind") == 1, F.col("event_id")), ignorenulls=True
    )
    within = F.col("_p_ts") <= F.col("ts") + F.expr("INTERVAL 7 DAYS")
    return (
        tagged.withColumn("_p_ts", p_ts.over(w))
        .withColumn("_p_id", p_id.over(w))
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(within, F.col("_p_ts")).alias("purchase_ts"),
            F.when(within, F.col("_p_id")).alias("purchase_event_id"),
        )
    )


ASOF_FWD_SQL = """
SELECT c.event_id, c.user_id, c.ts,
       CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY THEN p.ts END AS purchase_ts,
       CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY THEN p.event_id END
         AS purchase_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def json_props_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON functions over the stringly-typed props column (the
    reference emits json/jsonb as strings, oid2avro.c:317-349; Spark
    lets us query into them)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       -- outer CAST: DuckDB SUM(BIGINT) is HUGEINT, which fetches as
       -- float64 and breaks the driver's exact value-hash
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/string scalar functions: per-month order stats."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_class"),
            _d("o_totalprice").alias("price"),
        )
        .groupBy("yr", "mo", "prio_class")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


MONTHLY_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       UPPER(SUBSTRING(o_orderpriority, 1, 1)) AS prio_class,
       COUNT(*) AS n_orders,
       CAST(SUM({_sql_d("o_totalprice")}) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2, 3
"""


def orders_union_all_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: split on status and reassemble (bag semantics)."""
    orders = _t(spark, sf_dir, "orders")
    lo = orders.filter(F.col("o_totalprice") < 100000).select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    hi = orders.filter(F.col("o_totalprice") >= 100000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    return lo.unionByName(hi)


UNION_SQL = """
SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 100000
UNION ALL
SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice >= 100000
"""


# ------------------------------------------------------------- registry

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "top3_orders_per_segment": top3_orders_per_segment,
    "running_total_per_customer": running_total_per_customer,
    "rollup_order_stats": rollup_order_stats,
    "cube_lineitem_stats": cube_lineitem_stats,
    "grouping_sets_order_stats": grouping_sets_order_stats,
    "pivot_status_by_segment": pivot_status_by_segment,
    "customers_in_both_statuses": customers_in_both_statuses,
    "customers_only_f_status": customers_only_f_status,
    "customers_without_recent_orders": customers_without_recent_orders,
    "suppliers_with_returns_semi": suppliers_with_returns_semi,
    "asof_purchase_to_click": asof_purchase_to_click,
    "json_props_aggregation": json_props_aggregation,
    "monthly_order_stats": monthly_order_stats,
    "orders_union_all_halves": orders_union_all_halves,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "top3_orders_per_segment": TOP3_SQL,
    "running_total_per_customer": RUNNING_SQL,
    "rollup_order_stats": ROLLUP_SQL,
    "cube_lineitem_stats": CUBE_SQL,
    "grouping_sets_order_stats": GROUPING_SETS_SQL,
    "pivot_status_by_segment": PIVOT_SQL,
    "customers_in_both_statuses": INTERSECT_SQL,
    "customers_only_f_status": EXCEPT_SQL,
    "customers_without_recent_orders": ANTI_SQL,
    "suppliers_with_returns_semi": SEMI_SQL,
    "asof_purchase_to_click": ASOF_SQL,
    "json_props_aggregation": JSON_SQL,
    "monthly_order_stats": MONTHLY_SQL,
    "orders_union_all_halves": UNION_SQL,
}


# ------------------------------------------------- subquery-shape queries


def min_price_lineitem_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery, decorrelated into a
    window min (one shuffle on the correlation key instead of a
    re-executed subquery per row)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


Q2_SQL = """
SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice
FROM lineitem l
WHERE l_extendedprice = (
  SELECT MIN(l2.l_extendedprice) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
"""


def late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery -> left-semi join + agg.
    An order is 'late' if any lineitem shipped after the order date."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        orders.join(
            late.select("o_orderkey").distinct(),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def shipmode_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE aggregation — high- vs
    low-priority order counts per lineitem return flag."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: scalar aggregate subquery (avg per part),
    decorrelated into a join against the per-part aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (F.sum(_d("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == avg_qty.p_key)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(_d("l_extendedprice")).cast("double").alias("total_price"),
            F.count("*").alias("n_items"),
        )
    )


Q17_SQL = f"""
WITH avg_q AS (
  SELECT l_partkey AS p_key,
         CAST(SUM({_sql_d("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM({_sql_d("l_extendedprice")}) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem JOIN avg_q ON l_partkey = p_key
WHERE l_quantity < 0.5 * avg_qty
"""


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN + HAVING subquery -> aggregate, filter,
    semi-join back to the detail tables."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM({_sql_d("l_quantity")}) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def branded_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate over a
    join — tests boolean predicate pushdown and OR handling."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_size") >= 40) & F.col("l_quantity").between(20, 30))
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return joined.filter(bracket).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = f"""
SELECT CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_size >= 40 AND l_quantity BETWEEN 20 AND 30)
"""


def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti join —
    above-average-balance customers with no recent orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    avg_bal = cust.agg(
        (F.sum(_d("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


Q22_SQL = f"""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM({_sql_d("c_acctbal")}) AS DOUBLE) / COUNT(*) FROM customer)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
"""


def distinct_part_supp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (TPC-H Q16 shape): distinct parts and
    suppliers per return flag — expand-based distinct agg under the
    hood, one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_items"),
    )


Q16_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES.update(
    {
        "min_price_lineitem_per_part": min_price_lineitem_per_part,
        "late_orders_by_priority": late_orders_by_priority,
        "shipmode_case_agg": shipmode_case_agg,
        "small_quantity_revenue": small_quantity_revenue,
        "large_volume_orders": large_volume_orders,
        "branded_bracket_revenue": branded_bracket_revenue,
        "rich_idle_customers": rich_idle_customers,
        "distinct_part_supp_counts": distinct_part_supp_counts,
    }
)

ORACLES.update(
    {
        "min_price_lineitem_per_part": Q2_SQL,
        "late_orders_by_priority": Q4_SQL,
        "shipmode_case_agg": Q12_SQL,
        "small_quantity_revenue": Q17_SQL,
        "large_volume_orders": Q18_SQL,
        "branded_bracket_revenue": Q19_SQL,
        "rich_idle_customers": Q22_SQL,
        "distinct_part_supp_counts": Q16_SQL,
    }
)


# ------------------------------------------ skew, parsers, more TPC-H


def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 5-value hot key (event_type)
    — the skew-safe plan produces results identical to plain GROUP BY
    (sums are associative; decimal keeps them engine-exact), so it
    shares the plain oracle. See operators/skew.py and SCALE.md."""
    from bottledwater_pg_spark.operators.skew import salted_sum_count

    ev = _t(spark, sf_dir, "events")
    out = salted_sum_count(
        ev,
        ["event_type"],
        {
            "total_value": _d("value"),
            "n_events": F.lit(1),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("n_events").cast("long").alias("n_events"),
    )


SKEW_SQL = f"""
SELECT event_type,
       CAST(SUM({_sql_d("value")}) AS DOUBLE) AS total_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def pg_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG textual array handling, better than the reference: the
    reference ships int[] as the literal string '{1,2,3,4}'
    (oid2avro.c:752-770). Here the pg-literal is built from data,
    parsed back to a native array, and aggregated — the oracle computes
    directly from the base table, so any parser defect mismatches."""
    from bottledwater_pg_spark.functions.pg_text import parse_pg_int_array

    li = _t(spark, sf_dir, "lineitem")
    pg_literal = li.groupBy("l_orderkey").agg(
        F.concat(
            F.lit("{"),
            F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))),
            F.lit("}"),
        ).alias("pg_arr")
    )
    parsed = pg_literal.select(
        "l_orderkey", parse_pg_int_array("pg_arr").alias("arr")
    )
    return parsed.select(
        "l_orderkey",
        F.size("arr").cast("long").alias("n_items"),
        F.expr(
            "CAST(aggregate(arr, 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("sum_linenumbers"),
    )


PG_ARRAY_SQL = """
SELECT l_orderkey, COUNT(*) AS n_items,
       CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumbers
FROM lineitem GROUP BY l_orderkey
"""


def hstore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG hstore handling: build the canonical '"k"=>"v"' text from
    data, parse to a native map, read fields back out — oracle computes
    straight from the base columns."""
    from bottledwater_pg_spark.functions.pg_text import parse_hstore

    ev = _t(spark, sf_dir, "events")
    built = ev.select(
        "event_id",
        F.concat(
            F.lit('"type"=>"'),
            F.col("event_type"),
            F.lit('", "uid"=>"'),
            F.col("user_id").cast("string"),
            F.lit('"'),
        ).alias("h"),
    )
    parsed = built.select("event_id", parse_hstore("h").alias("m"))
    return parsed.select(
        "event_id",
        F.col("m")["type"].alias("type_val"),
        F.col("m")["uid"].alias("uid_val"),
    )


HSTORE_SQL = """
SELECT event_id, event_type AS type_val,
       CAST(user_id AS VARCHAR) AS uid_val
FROM events
"""


def pg_range_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG range-type handling: the reference ships int4range as the
    literal string '[1,5)' (oid2avro.c:317-349; type_specs.rb:111-117).
    Build the canonical literal from data — with mixed bound
    inclusivity — parse it back to a struct, and compute over the
    bounds; the oracle computes straight from the base columns, so any
    parser defect mismatches."""
    from bottledwater_pg_spark.functions.pg_text import parse_int_range

    orders = _t(spark, sf_dir, "orders")
    built = orders.select(
        "o_orderkey",
        F.concat(
            F.lit("["),
            F.col("o_custkey").cast("string"),
            F.lit(","),
            (F.col("o_custkey") + F.col("o_orderkey") % 100).cast("string"),
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("]")).otherwise(
                F.lit(")")
            ),
        ).alias("r"),
    )
    parsed = built.select("o_orderkey", parse_int_range("r").alias("rng"))
    return parsed.select(
        "o_orderkey",
        F.col("rng.lo").cast("long").alias("lo"),
        F.col("rng.hi").cast("long").alias("hi"),
        (F.col("rng.hi") - F.col("rng.lo")).cast("long").alias("width"),
        F.col("rng.lo_inc").alias("lo_inc"),
        F.col("rng.hi_inc").alias("hi_inc"),
    )


PG_RANGE_SQL = """
SELECT o_orderkey,
       CAST(o_custkey AS BIGINT) AS lo,
       CAST(o_custkey + o_orderkey % 100 AS BIGINT) AS hi,
       CAST(o_orderkey % 100 AS BIGINT) AS width,
       TRUE AS lo_inc,
       o_orderkey % 2 = 0 AS hi_inc
FROM orders
"""


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between supplier and customer
    nations — two aliases of one broadcast dimension."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: CASE-filtered revenue ratio. Both numerator and
    denominator are exact decimal sums cast to double; the final
    division is a deterministic scalar op in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
           THEN {_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})
           ELSE 0 END) AS DOUBLE)
       / CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
         AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# ------------------------------------------ Q8 / Q13 / Q15 / Q21 shapes


def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a target nation's share of regional order volume
    per year — nested ratio aggregate over a 7-way join with one nation
    dimension in two roles (customer's and supplier's).

    Scale: every dimension broadcasts (region/nation/customer/supplier
    are all tiny relative to the facts), so the only shuffles are
    lineitem->orders on orderkey and the final tiny groupBy on year.
    Numerator and denominator are exact decimal sums cast to double at
    the end — the ratio is then a deterministic scalar division.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    target = F.when(
        F.col("supp_nation") == "NATION_3", revenue
    ).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(target).cast("double") / F.sum(revenue).cast("double")
            ).alias("mkt_share"),
            F.sum(revenue).cast("double").alias("total_volume"),
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
             THEN {_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})
             ELSE 0 END) AS DOUBLE)
         / CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
         AS mkt_share,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
         AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer, including
    zero-order customers — LEFT OUTER join with an extra join-side
    predicate (not a WHERE filter: that would drop the zero groups),
    then two stacked aggregations.

    Scale: the first groupBy shuffles on c_custkey (high cardinality,
    well distributed); the second input is |customers| rows collapsing
    to |distinct counts| — negligible. The status predicate lives in
    the join condition so customers with only excluded orders still
    appear with c_count = 0.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus != "P"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view + scalar-MAX subquery —
    supplier(s) whose quarterly shipped revenue equals the maximum.

    Scale: one shuffle on l_suppkey for the per-supplier aggregate;
    the global max is a single-row aggregate broadcast back (no
    unpartitioned window, which would funnel all rows through one
    task). The double equality is safe because both sides derive from
    the same exact decimal sum.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who single-handedly held up
    multi-supplier orders — a correlated EXISTS + NOT-EXISTS pair,
    decorrelated into one per-order aggregate ("how many suppliers
    participated / how many shipped late") joined back to the late
    rows. "Late" is shipdate > orderdate + 90 days (the fixture has no
    commit/receipt dates).

    Scale: the EXISTS/NOT-EXISTS pair would be two extra joins against
    lineitem; the per-order countDistinct aggregate computes both
    predicates in ONE shuffle on orderkey (lineitem's natural key, so
    AQE coalesces it with the fact-fact join's exchange), then joins
    back on the same key — no second pass over the fact table.
    """
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_order = joined.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supps"),
    )
    sole = (
        joined.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1)
            ),
            "o_orderkey",
        )
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


Q21_SQL = """
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_suppkey, s_name
"""


def dominant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregate semi-join chain — suppliers
    who shipped more than twice a promo part's average per-supplier
    quantity (a scale-stable dominance test: a fixed fraction of the
    part total thins out as supplier counts grow with the corpus).
    The correlated HAVING subquery (per-part average) decorrelates
    into a second aggregation over the SAME grouped result: the
    per-(part, supplier) aggregate is computed once, its re-aggregation
    to per-part totals is tiny, and the dominance filter is a join
    between the two — no second pass over lineitem, no per-row
    subquery.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    li_promo = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    per_ps = li_promo.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_d("l_quantity")).alias("supp_qty")
    )
    per_p = per_ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count("*").alias("n_supps"),
    )
    dominant = (
        per_ps.join(per_p, per_ps.l_partkey == per_p.pk)
        .filter(
            F.col("supp_qty").cast("double")
            > 2.0 * F.col("part_qty").cast("double") / F.col("n_supps")
        )
        .select("l_suppkey")
        .distinct()
    )
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


Q20_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM({_sql_d("l_quantity")}) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
  GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty, COUNT(*) AS n_supps
  FROM per_ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_p USING (l_partkey)
  WHERE CAST(supp_qty AS DOUBLE)
          > 2.0 * CAST(part_qty AS DOUBLE) / n_supps)
"""


QUERIES.update(
    {
        "market_share_by_year": market_share_by_year,
        "customer_order_distribution": customer_order_distribution,
        "top_supplier_revenue": top_supplier_revenue,
        "sole_late_suppliers": sole_late_suppliers,
        "dominant_promo_suppliers": dominant_promo_suppliers,
    }
)

ORACLES.update(
    {
        "market_share_by_year": Q8_SQL,
        "dominant_promo_suppliers": Q20_SQL,
        "customer_order_distribution": Q13_SQL,
        "top_supplier_revenue": Q15_SQL,
        "sole_late_suppliers": Q21_SQL,
    }
)


QUERIES.update(
    {
        "skewed_agg_salted": skewed_agg_salted,
        "pg_array_roundtrip": pg_array_roundtrip,
        "hstore_roundtrip": hstore_roundtrip,
        "pg_range_roundtrip": pg_range_roundtrip,
        "nation_pair_volume": nation_pair_volume,
        "promo_revenue_share": promo_revenue_share,
    }
)

ORACLES.update(
    {
        "skewed_agg_salted": SKEW_SQL,
        "pg_array_roundtrip": PG_ARRAY_SQL,
        "hstore_roundtrip": HSTORE_SQL,
        "pg_range_roundtrip": PG_RANGE_SQL,
        "nation_pair_volume": Q7_SQL,
        "promo_revenue_share": Q14_SQL,
    }
)


# ------------------------------------------ Q9 / Q11 shapes (22/22 TPC-H)


def part_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year — a
    5-way join (lineitem, part, supplier, nation, orders) with a LIKE
    filter on part name and a derived profit expression. The fixture
    set has no partsupp table, so ``p_retailprice`` stands in for
    ``ps_supplycost`` in the cost term (same join/expression shape).

    Scale: part (LIKE-filtered), supplier, and nation all broadcast —
    the only shuffles are lineitem->orders on orderkey and the final
    small groupBy on (nation, year). Profit is computed per row in
    exact decimal and summed associatively, so partial aggregation is
    safe; the LIKE filter prunes part before the broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount")) - _d(
        "p_retailprice"
    ) * _d("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_sql_d("l_extendedprice")} * (1 - {_sql_d("l_discount")})
                - {_sql_d("p_retailprice")} * {_sql_d("l_quantity")}) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value for one nation's
    suppliers, keeping only parts above a fraction of the global total
    — a grouped aggregate filtered by a scalar subquery over the SAME
    grouped result (no partsupp in the fixtures; lineitem value =
    extendedprice x quantity stands in for supplycost x availqty).

    Scale: the nation->supplier filter broadcasts; one shuffle groups
    lineitem by partkey. The global total is a single-row aggregate of
    the (already small) grouped result, broadcast back for the HAVING
    comparison — the grouped DataFrame is reused for both sides, so
    the fact table is scanned and shuffled exactly once.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    grouped = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_d("l_extendedprice") * _d("l_quantity")).alias("value_dec"))
    )
    total = grouped.agg(
        F.sum("value_dec").cast("double").alias("grand_total")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.lit(0.001) * F.col("grand_total"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


Q11_SQL = f"""
WITH grouped AS (
  SELECT l_partkey,
         SUM({_sql_d("l_extendedprice")} * {_sql_d("l_quantity")}) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM grouped
WHERE CAST(value_dec AS DOUBLE)
      > 0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM grouped)
"""


QUERIES.update(
    {
        "part_profit_by_nation": part_profit_by_nation,
        "important_part_values": important_part_values,
    }
)

ORACLES.update(
    {
        "part_profit_by_nation": Q9_SQL,
        "important_part_values": Q11_SQL,
    }
)


# ------------------------------------------ bucketed interval join


def interval_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: count events inside each of a set
    of 2-hour windows, via operators/rangejoin.py's bucketed
    decomposition (equi-join on time bucket + exact refilter) instead
    of the O(points x intervals) nested-loop join Spark would plan for
    a raw BETWEEN condition.

    Scale: expansion factor is len/bucket+1 = 3 interval replicas per
    window; both sides shuffle on the bucket key (hash join, AQE-
    managed); the exact predicate then drops same-bucket near-misses.
    Survives arbitrarily many windows where the BNLJ would not.
    """
    from bottledwater_pg_spark.operators.rangejoin import interval_join

    ev = _t(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_id") % 1009 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    points = ev.select("event_id", "ts")
    return (
        interval_join(points, windows, "ts", "w_start", "w_end", 3600)
        .groupBy("window_id")
        .agg(F.count("*").alias("n_events"))
    )


INTERVAL_JOIN_SQL = """
SELECT w.window_id, COUNT(*) AS n_events
FROM (SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 2 HOUR AS w_end
      FROM events WHERE event_id % 1009 = 0) w
JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.window_id
"""


QUERIES["interval_window_counts"] = interval_window_counts
ORACLES["interval_window_counts"] = INTERVAL_JOIN_SQL


# ------------------------------------------ histogram / exact corr / fuzzy


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per event type — binning
    entirely in integer arithmetic (floor over exact decimal), so bin
    boundaries are deterministic across engines.

    Scale: scan -> partial agg -> one shuffle on the (tiny) composite
    group key. This is the primitive behind numeric-profile dashboards
    and outlier filters in data-quality pipelines.
    """
    ev = _t(spark, sf_dir, "events")
    bin_col = F.floor(_d("value") / F.lit(50).cast(DEC)).cast("long")
    return (
        ev.groupBy("event_type", bin_col.alias("bin"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_d("value")).cast("double").alias("bin_value"),
        )
    )


HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(floor({_sql_d("value")} / CAST(50 AS DECIMAL(18,2))) AS BIGINT) AS bin,
       COUNT(*) AS n_events,
       CAST(SUM({_sql_d("value")}) AS DOUBLE) AS bin_value
FROM events
GROUP BY 1, 2
"""


def quantity_price_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per return flag — computed from EXACT
    decimal co-moments (n, sum x, sum y, sum xy, sum x^2, sum y^2) and
    assembled in double only at the end. Built-in ``corr`` streams
    float partials whose merge order differs across engines and runs;
    this formulation is bit-reproducible under any parallelism (the
    same discipline as the integer-quantized vector math).

    Scale: identical cost to any single-pass aggregate — partial aggs
    of 6 decimal sums, one shuffle on the group key.
    """
    li = _t(spark, sf_dir, "lineitem")
    x, y = _d("l_quantity"), _d("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        _dbl(F.sum(x)).alias("sx"),
        _dbl(F.sum(y)).alias("sy"),
        _dbl(F.sum(x * y)).alias("sxy"),
        _dbl(F.sum(x * x)).alias("sxx"),
        _dbl(F.sum(y * y)).alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select("l_returnflag", corr.alias("qty_price_corr"))


CORR_SQL = f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {_sql_dbl(f'SUM({_sql_d("l_quantity")})')} AS sx,
         {_sql_dbl(f'SUM({_sql_d("l_extendedprice")})')} AS sy,
         {_sql_dbl(f'SUM({_sql_d("l_quantity")} * {_sql_d("l_extendedprice")})')} AS sxy,
         {_sql_dbl(f'SUM({_sql_d("l_quantity")} * {_sql_d("l_quantity")})')} AS sxx,
         {_sql_dbl(f'SUM({_sql_d("l_extendedprice")} * {_sql_d("l_extendedprice")})')} AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
         AS qty_price_corr
FROM m
"""


def fuzzy_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 supplier-name pairs via deletion-neighborhood
    blocking (operators/fuzzy.py) — the scalable entity-resolution
    join; the oracle is the brute-force quadratic predicate join, so
    the blocking is proven lossless on this corpus.
    """
    from bottledwater_pg_spark.operators.fuzzy import edit_distance_pairs

    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return edit_distance_pairs(supp, "s_suppkey", "s_name")


FUZZY_SQL = """
SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def fuzzy_supplier_pairs_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-2 supplier-name pairs via 2-deletion-neighborhood
    blocking (operators/fuzzy.py ``deletion_variants_k2``) — radius-2
    symmetric-delete; the oracle is the brute-force quadratic
    levenshtein join, proving the O(len^2)-key blocking lossless at
    radius 2 on this corpus.
    """
    from bottledwater_pg_spark.operators.fuzzy import edit_distance_pairs

    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return edit_distance_pairs(supp, "s_suppkey", "s_name", max_dist=2)


FUZZY_K2_SQL = """
SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


def _bucketed_group_ranks(j: DataFrame, group_col: str, rank_exprs: list[str]) -> DataFrame:
    """Two-phase exact rank extraction: per ``group_col``, return the
    rows holding the 1-based ranks named by ``rank_exprs`` (SQL
    expressions over the group size ``n``), each row carrying its
    global in-group rank ``rn`` (ordered by ``v``) and ``n``.

    Scale path (NO single-partition-per-group sort): each value maps
    to a DATA-INDEPENDENT monotone log-scale bucket (~1.6% relative
    width); per-(group, bucket) counts — a tiny table independent of
    row count — prefix-sum into exclusive bucket bases; only the
    buckets that straddle a requested rank are ranked, with a window
    partitioned by (group, bucket) so the sort unit is one bucket's
    rows, never the whole group. With 5 groups the naive windowed
    rank caps parallelism at 5 tasks regardless of cluster size;
    this plan runs groups x straddling-buckets tasks and touches a
    ~1.6%-wide value slice in the rank stage. Because the bucket is a
    pure function of ``v``, there is no per-group min/max pass and no
    stats broadcast — the whole extraction is two passes over the
    cached rows (one count aggregation, one straddler rank), the
    minimum any exact-rank scheme needs without a pre-sorted input.
    Degenerate distributions (all values equal / a point mass) fall
    into one bucket and sort it whole — the same worst case the
    former equi-width map had when lo == hi.

    ``wanted`` is broadcast explicitly: groups x straddling buckets
    (<= 2 per requested rank), always orders of magnitude smaller
    than the data side; at extreme group cardinality (>10M groups)
    drop the hint and AQE picks the join strategy.
    """
    from pyspark.sql import Window

    from bottledwater_pg_spark.session import persist_tracked

    # j feeds two consumers (bucket counts, the final rank join) —
    # persist it once or the upstream join/scan recomputes per
    # consumer; callers like the MAD query invoke this twice, making
    # the recompute quadratic in passes without this
    j = persist_tracked(j)
    # DATA-INDEPENDENT monotone value->bucket map: ~1.6% relative
    # resolution (floor(log2(v) * 64)), with the zero and negative
    # bands offset below every positive bucket (log2 of a double
    # spans ±~68.7k after the x64, so -200k / -400k-f keep the three
    # bands disjoint and ordered). Equal v -> equal bucket; v1 <= v2
    # -> bkt1 <= bkt2 (log/floor/negation of the same IEEE doubles
    # are monotone), so per-bucket rank + bucket base reconstructs
    # the exact global rank. Being a pure function of v, the bucket
    # needs NO per-group min/max pass and no broadcast-stats join —
    # the former stats job disappears and the whole extraction is two
    # passes over the cached rows (count buckets, rank straddlers).
    vd = F.col("v").cast("double")
    bkt = (
        F.when(F.col("v") > 0, F.floor(F.log(2.0, vd) * 64))
        .when(
            F.col("v") < 0,
            F.lit(-400000) - F.floor(F.log(2.0, -vd) * 64),
        )
        .otherwise(F.lit(-200000))
        .cast("long")
    )
    b = j.withColumn("_bkt", bkt)
    cnts = b.groupBy(group_col, "_bkt").agg(F.count("*").alias("_cnt"))
    wb = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # group size for the rank expressions comes from a second window
    # over the SAME tiny bucket table — no join back to any stats
    wtot = Window.partitionBy(group_col)
    cnts = cnts.withColumn(
        "_bbase",
        F.coalesce(F.sum("_cnt").over(wb), F.lit(0)).cast("long"),
    ).withColumn("n", F.sum("_cnt").over(wtot).cast("long"))
    wanted_pred = None
    for e in rank_exprs:
        p = (F.col("_bbase") < F.expr(e)) & (
            (F.col("_bbase") + F.col("_cnt")) >= F.expr(e)
        )
        wanted_pred = p if wanted_pred is None else (wanted_pred | p)
    # wanted carries n so the final join needs nothing else; it is
    # groups x straddling-buckets rows (<= 2 per requested rank) —
    # always broadcastable
    wanted = cnts.filter(wanted_pred).select(
        group_col, "_bkt", "_bbase", "n"
    )
    wloc = Window.partitionBy(group_col, "_bkt").orderBy("v")
    return (
        b.join(F.broadcast(wanted), [group_col, "_bkt"])
        .withColumn(
            "rn", (F.col("_bbase") + F.row_number().over(wloc)).cast("long")
        )
        .select(group_col, "v", "rn", "n")
    )


def median_order_value_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median order value per market segment via explicit rank
    arithmetic — pick the middle one or two elements ((n+1) div 2 and
    (n+2) div 2), average them in double. Built-in
    percentile/quantile_cont interpolate with engine-specific float
    formulas and are never hash-parity-safe; selecting the middle
    DECIMAL values and applying one identical double expression is
    (the same discipline as the exact-corr co-moment query).

    Scale: rank extraction via :func:`_bucketed_group_ranks` — the
    sort unit is a 1/256 value-range bucket, never the whole segment,
    so parallelism is NOT capped at the 5 distinct segments.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    r = _bucketed_group_ranks(
        j, "c_mktsegment", ["(n + 1) div 2", "(n + 2) div 2"]
    )
    mid = r.filter(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return mid.groupBy("c_mktsegment").agg(
        (
            (F.min("v").cast("double") + F.max("v").cast("double")) / F.lit(2.0)
        ).alias("median_order_value"),
        F.max("n").alias("n_orders"),
    )


def clickers_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join over a NULLABLE key: users (including the NULL user
    group) with clicks but no large purchase. Spark's ``left_anti`` keeps
    rows whose key matches nothing, and a NULL key matches nothing —
    which is exactly correlated ``NOT EXISTS`` semantics (NULL = NULL
    is unknown, row kept). The same query via ``NOT IN`` would return
    ZERO rows once the subquery contains one NULL — the classic
    three-valued-logic trap; this pins the null-sane formulation on
    both engines.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    big_purchases = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value").cast("double") >= 200.0)
    ).select("user_id")
    return (
        clicks.join(big_purchases, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )


ANTI_NULL_SQL = """
SELECT user_id, COUNT(*) AS n_clicks
FROM events c
WHERE event_type = 'click'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase'
                    AND p.user_id = c.user_id
                    AND CAST(p.value AS DOUBLE) >= 200.0)
GROUP BY user_id
"""


def top_orderkeys_csv_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per market segment, the 3 highest-
    value order keys as one CSV string — ``collect_list(struct)`` →
    ``sort_array`` (struct order = lexicographic: value desc, key
    desc) → ``slice`` → ``transform`` → ``array_join``, all JVM array
    functions in a single partial-aggregated pass. The CSV projection
    keeps the result scalar so the cross-engine value hash applies
    (array columns hash engine-specifically).

    Scale note: the collect is TWO-PHASE bounded — phase 1 groups by
    (segment, input partition) and keeps only each partition's top-3
    structs, so no aggregation buffer ever holds a segment's full
    order list; phase 2 merges the <=P three-element arrays. Same
    bounded-top-k shape as inverted_index_postings' posting heads.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    arr = F.slice(
        F.sort_array(
            F.collect_list(F.struct(F.col("v"), F.col("o_orderkey"))), asc=False
        ),
        1,
        3,
    )
    return (
        j.groupBy("c_mktsegment", F.spark_partition_id().alias("_pid"))
        .agg(arr.alias("_part"))
        .groupBy("c_mktsegment")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("_part")), asc=False), 1, 3
            ).alias("_arr")
        )
        .select(
            "c_mktsegment",
            F.array_join(
                F.expr("transform(_arr, s -> cast(s.o_orderkey as string))"),
                ",",
            ).alias("top3_orderkeys"),
        )
    )


TOP_CSV_SQL = """
SELECT c_mktsegment,
       array_to_string(
         (list(CAST(o_orderkey AS VARCHAR)
               ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                        o_orderkey DESC))[1:3], ',') AS top3_orderkeys
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def ntile_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking window family over one keyed sort:
    ``ntile(4)`` price bands per market segment with per-band order
    counts and exact-decimal revenue — plus each band's boundary via
    ``min``. Same single shuffle as any ranked window; completes the
    ranking-function surface (row_number/rank/dense_rank are covered
    by the top-k queries).
    """
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("v", "o_orderkey")
    return (
        j.withColumn("band", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "band")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("v").cast("double").alias("band_revenue"),
            F.min("v").cast("double").alias("band_floor"),
        )
    )


NTILE_SQL = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, v,
         NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY v, o_orderkey)
           AS band
  FROM j
)
SELECT c_mktsegment, band, COUNT(*) AS n_orders,
       CAST(SUM(v) AS DOUBLE) AS band_revenue,
       CAST(MIN(v) AS DOUBLE) AS band_floor
FROM r
GROUP BY c_mktsegment, band
"""


def supplier_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window family over supplier balances per nation:
    ``percent_rank``/``cume_dist`` (exact rank ratios — deterministic
    doubles from integer ranks, parity-safe) and ``nth_value`` (the
    2nd-highest balance carried to every row of the frame).
    """
    from pyspark.sql import Window

    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", F.col("s_acctbal").cast("decimal(18,2)").alias("bal")
    )
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("bal"), "s_suppkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.col("bal").cast("double").alias("acctbal"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("bal", 2).over(wf).cast("double").alias("second_highest"),
    )


PCTRANK_SQL = """
SELECT s_suppkey, s_nationkey,
       CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(NTH_VALUE(CAST(s_acctbal AS DECIMAL(18,2)), 2) OVER (
         PARTITION BY s_nationkey
         ORDER BY CAST(s_acctbal AS DECIMAL(18,2)) DESC, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS DOUBLE) AS second_highest
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey
             ORDER BY CAST(s_acctbal AS DECIMAL(18,2)) DESC, s_suppkey)
"""


def _quartile_cols(
    points: tuple = (("p25", 25), ("p50", 50), ("p75", 75)),
) -> list[F.Column]:
    """points: (tag, percent as integer 0..100). Interpolation rank
    arithmetic is INTEGER-RATIONAL ((n-1)*k div/mod 100), never a
    float multiply: floor((n-1)*0.95) drifts an ulp from DuckDB's
    exact-decimal (n-1)*0.95 because 0.95 is not binary-exact —
    p25/50/75 only survived the float form because quarters are.
    The fraction becomes one exact-int division rem/100.0, identical
    in both engines; then pick the two bracketing DECIMAL values by
    integer rank and apply one deterministic float combine. Inside
    the CASE, n/rn are row-level (n constant per group); at group
    level only aggregated min(n) is legal in either engine."""
    cols = []
    for tag, k in points:
        li = f"((n - 1) * {k}) div 100 + 1"
        frac = F.expr(f"(((min(n) - 1) * {k}) % 100) / 100.0d").cast("double")
        lo = F.expr(f"min(case when rn = {li} then v end)").cast("double")
        hi = F.expr(
            f"min(case when rn = least(({li}) + 1, n) then v end)"
        ).cast("double")
        cols.append(
            (lo * (F.lit(1.0) - frac) + hi * frac).alias(tag)
        )
    return cols


def quartiles_order_value_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact interpolated quartiles (p25/p50/p75) of order value per
    market segment — the rank-arithmetic generalization of the median
    query. Rank extraction via the two-phase bucketed plan
    (:func:`_bucketed_group_ranks`, six target ranks), then one
    grouped conditional aggregation; no percentile built-in
    (engine-specific interpolation) anywhere.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    exprs = []
    for k in (25, 50, 75):
        li = f"((n - 1) * {k}) div 100 + 1"
        exprs += [li, f"least(({li}) + 1, n)"]
    r = _bucketed_group_ranks(j, "c_mktsegment", exprs)
    return r.groupBy("c_mktsegment").agg(*_quartile_cols())


def _quartile_sql_cols(
    points: tuple = (("p25", 25), ("p50", 50), ("p75", 75)),
) -> str:
    parts = []
    for tag, k in points:
        li = f"((n - 1) * {k}) // 100 + 1"
        frac = f"CAST(((MIN(n) - 1) * {k}) % 100 AS DOUBLE) / 100.0"
        lo = f"CAST(MIN(CASE WHEN rn = {li} THEN v END) AS DOUBLE)"
        hi = (f"CAST(MIN(CASE WHEN rn = least(({li}) + 1, n) THEN v END)"
              " AS DOUBLE)")
        parts.append(
            f"{lo} * (CAST(1.0 AS DOUBLE) - ({frac}))"
            f" + {hi} * ({frac}) AS {tag}"
        )
    return ",\n       ".join(parts)


QUARTILES_SQL = f"""
WITH j AS (
  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, v,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
)
SELECT c_mktsegment,
       {_quartile_sql_cols()}
FROM r
GROUP BY c_mktsegment
"""


MEDIAN_SQL = """
WITH j AS (
  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, v,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
)
SELECT c_mktsegment,
       (CAST(MIN(v) AS DOUBLE) + CAST(MAX(v) AS DOUBLE)) / 2
         AS median_order_value,
       MAX(n) AS n_orders
FROM r
WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
GROUP BY c_mktsegment
"""


QUERIES.update(
    {
        "value_histogram": value_histogram,
        "quantity_price_corr_exact": quantity_price_corr_exact,
        "fuzzy_supplier_pairs": fuzzy_supplier_pairs,
        "fuzzy_supplier_pairs_k2": fuzzy_supplier_pairs_k2,
        "median_order_value_by_segment": median_order_value_by_segment,
        "quartiles_order_value_by_segment": quartiles_order_value_by_segment,
        "asof_click_to_next_purchase": asof_click_to_next_purchase,
        "ntile_price_bands": ntile_price_bands,
        "supplier_balance_distribution": supplier_balance_distribution,
        "top_orderkeys_csv_per_segment": top_orderkeys_csv_per_segment,
        "clickers_never_purchased": clickers_never_purchased,
    }
)

ORACLES.update(
    {
        "value_histogram": HISTOGRAM_SQL,
        "quantity_price_corr_exact": CORR_SQL,
        "fuzzy_supplier_pairs": FUZZY_SQL,
        "fuzzy_supplier_pairs_k2": FUZZY_K2_SQL,
        "median_order_value_by_segment": MEDIAN_SQL,
        "quartiles_order_value_by_segment": QUARTILES_SQL,
        "asof_click_to_next_purchase": ASOF_FWD_SQL,
        "ntile_price_bands": NTILE_SQL,
        "supplier_balance_distribution": PCTRANK_SQL,
        "top_orderkeys_csv_per_segment": TOP_CSV_SQL,
        "clickers_never_purchased": ANTI_NULL_SQL,
    }
)


# ------------------------------------------ VARIANT semi-structured path


def variant_props_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction — the scale path for repeated
    multi-field access into JSON columns (parse once, probe many;
    ``get_json_object`` re-parses the string per call). The reference
    ships json/jsonb as opaque strings (oid2avro.c:317-349); VARIANT is
    the modern engine-native upgrade.
    """
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count_distinct("k").alias("distinct_k"),
        )
    )


VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS distinct_k
FROM events
GROUP BY event_type
"""

QUERIES["variant_props_aggregation"] = variant_props_aggregation
ORACLES["variant_props_aggregation"] = VARIANT_SQL


# ------------------------------------------ theta join (tiny broadcast side)


def orders_in_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join done the RIGHT way for a tiny build side:
    8 reference price points joined to orders on a ±5% band condition.
    With the band table broadcast, BroadcastNestedLoopJoin costs
    O(|orders| x 8) — a narrow scan-side filter per price point, the
    correct plan here. (When BOTH sides are large, this plan is fatal:
    that regime is operators/rangejoin.py's bucketed decomposition —
    the two queries together pin the decision boundary.)
    """
    orders = _t(spark, sf_dir, "orders")
    bands = (
        spark.range(1, 9)
        .select(
            F.col("id").alias("band_id"),
            (F.col("id") * 25000).cast("double").alias("center"),
        )
    )
    cond = (
        F.col("o_totalprice") >= F.col("center") * 0.95
    ) & (F.col("o_totalprice") <= F.col("center") * 1.05)
    return (
        orders.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_d("o_totalprice")).cast("double").alias("band_total"),
        )
    )


THETA_SQL = f"""
SELECT band_id, COUNT(*) AS n_orders,
       CAST(SUM({_sql_d("o_totalprice")}) AS DOUBLE) AS band_total
FROM orders
JOIN (SELECT i AS band_id, CAST(i * 25000 AS DOUBLE) AS center
      FROM (SELECT unnest(generate_series(1, 8)) AS i)) b
  ON o_totalprice >= center * 0.95 AND o_totalprice <= center * 1.05
GROUP BY band_id
"""

QUERIES["orders_in_price_band"] = orders_in_price_band
ORACLES["orders_in_price_band"] = THETA_SQL


# ------------------------------------------ unpivot / lag analytics


def unpivot_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt): per-segment metrics pivoted into
    (segment, metric, value) rows — the inverse of pivot, used to feed
    metric-agnostic sinks. JVM-side via the native unpivot operator
    (one narrow expand, no shuffle beyond the source agg)."""
    cust = _t(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        F.count("*").cast("double").alias("n_customers"),
        F.sum(_d("c_acctbal")).cast("double").alias("total_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )
    return wide.unpivot(
        ["c_mktsegment"],
        ["n_customers", "total_acctbal", "max_acctbal"],
        "metric",
        "value",
    )


UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(SUM({_sql_d("c_acctbal")}) AS DOUBLE) AS total_acctbal,
         MAX(c_acctbal) AS max_acctbal
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'total_acctbal', total_acctbal FROM wide
UNION ALL
SELECT c_mktsegment, 'max_acctbal', max_acctbal FROM wide
"""


def monthly_order_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: month-over-month order-count delta per
    priority — the trend primitive. One shuffle (partition by
    priority), arithmetic on adjacent frame rows."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.count("*").alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return monthly.select(
        "o_orderpriority",
        "month",
        "n_orders",
        (F.col("n_orders") - F.lag("n_orders").over(w)).alias("mom_delta"),
        F.lead("n_orders").over(w).alias("next_month_orders"),
    )


MOMENTUM_SQL = """
WITH monthly AS (
  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, n_orders,
       n_orders - lag(n_orders) OVER w AS mom_delta,
       lead(n_orders) OVER w AS next_month_orders
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
"""

QUERIES["unpivot_segment_metrics"] = unpivot_segment_metrics
ORACLES["unpivot_segment_metrics"] = UNPIVOT_SQL
QUERIES["monthly_order_momentum"] = monthly_order_momentum
ORACLES["monthly_order_momentum"] = MOMENTUM_SQL


# ------------------------------------------------- TPC-H Q22 shape


def q22_idle_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): an uncorrelated
    scalar-AVG subquery gates the probe side, a NOT EXISTS anti-join
    removes customers with open orders, and the survivors aggregate by a
    small code (here nation, standing in for the phone prefix — the
    synthetic customer table carries no phone column).

    Scale: the scalar average is one tiny aggregate broadcast to every
    probe task (a 1-row cross join — Catalyst plans it as a broadcast
    nested loop, cost O(|customer|)); the anti-join shuffles on
    custkey, the natural key; the final agg groups on ~7 codes. The
    average is computed decimal-exact then cast, so the > comparison
    is bit-deterministic against the oracle.
    """
    cust = _t(spark, sf_dir, "customer")
    open_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    codes = [1, 3, 5, 7, 9, 11, 13]
    elig = cust.filter(F.col("c_nationkey").isin(codes))
    avg_bal = elig.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_d("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        elig.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(open_orders, elig.c_custkey == open_orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = f"""
WITH elig AS (
  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
), avg_b AS (
  SELECT CAST(SUM({_sql_d("c_acctbal")}) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM elig WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM({_sql_d("c_acctbal")}) AS DOUBLE) AS totacctbal
FROM elig, avg_b
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_nationkey
"""

QUERIES["q22_idle_balance_by_nation"] = q22_idle_balance_by_nation
ORACLES["q22_idle_balance_by_nation"] = Q22_SQL


# ------------------------------------------- fraud monitoring consumer use


def fraud_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud monitoring — a consumer use the reference names for its
    stream ("monitor it for fraud", README.md:30-32): flag events
    whose value deviates > 3 sigma from the SAME USER's trailing
    10-event window (a self-excluding frame, so the scored event never
    contaminates its own baseline). Reported per event type.

    Determinism discipline: the window sums run in DECIMAL (exact,
    associative — safe under any frame-evaluation order or engine
    algorithm, unlike float sums where e.g. DuckDB's segment-tree
    sliding windows add in a different order than Spark's running
    frame); mean/variance convert to double only at the final, fixed
    arithmetic. The 3-sigma test squares instead of sqrt-ing:
    (v-mean)^2 > 9*var — same predicate, one less libm call to agree
    on.

    Scale: ONE shuffle on user_id; the frame is 10 rows, state O(1)
    per row. The streaming form of this exact operator is
    applyInPandasWithState holding the trailing deque per user.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return (
        fraud_flag_events(ev)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("anom").alias("n_anomalies"),
        )
    )


def fraud_flag_events(ev: DataFrame) -> DataFrame:
    """Per-event anomaly flag (``anom`` 0/1) against the same user's
    trailing 10-event window — the scoring core of
    :func:`fraud_rolling_anomalies`, exposed so the true-streaming
    deque operator (streaming/queries.py ``streaming_fraud_anomalies``)
    can be pinned to identical flags."""
    from pyspark.sql import Window

    vdec = F.col("value").cast("decimal(18,4)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    cnt = F.count("value").over(w)
    s = F.sum(vdec).over(w).cast("double")
    s2 = F.sum((vdec * vdec).cast("decimal(38,8)")).over(w).cast("double")
    mean = s / cnt
    var = (s2 - (s * s) / cnt) / cnt
    dev = F.col("value") - mean
    anomalous = (cnt >= 5) & (dev * dev > 9 * var)
    return ev.withColumn("anom", anomalous.cast("int"))


FRAUD_SQL = """
WITH scored AS (
  SELECT event_type, value,
         COUNT(value) OVER w AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,4))
                       * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
              OVER w AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN cnt >= 5
                      AND (value - s / cnt) * (value - s / cnt)
                          > 9 * ((s2 - (s * s) / cnt) / cnt)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM scored GROUP BY event_type
"""

# ----------------------------------------- consumer analytics: funnel


def funnel_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized click→purchase funnel — the 'calculate analytics'
    consumer use the reference names for its stream (README.md:30-32):
    events sessionize per user on a 30-minute inactivity gap
    (gaps-and-islands), and a session converts when a purchase occurs
    at-or-after its first click. Daily rollup of sessions / sessions
    with a click / converted sessions.

    Determinism: every comparison runs on integer epoch MICROseconds
    (unix_micros) — never casting timestamps to seconds, which
    truncates sub-second gaps differently than an interval compare.

    Scale: ONE shuffle on user_id serves the lag, the session number,
    and the per-session windows (same partitioning); the rollup
    shuffles only session-level rows. The streaming twin of this
    sessionization is session_window + watermark (streaming/stream.py).
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        # ntz -> timestamp is identity under the UTC session timezone
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_no")
    scored = sess.withColumn(
        "first_click_us",
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).over(ws),
    ).withColumn(
        "conv",
        (
            (F.col("event_type") == "purchase")
            & F.col("first_click_us").isNotNull()
            & (F.col("us") >= F.col("first_click_us"))
        ).cast("int"),
    )
    per_session = scored.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("start_ts"),
        F.max((F.col("event_type") == "click").cast("int")).alias("has_click"),
        F.max("conv").alias("converted"),
    )
    return (
        per_session.groupBy(F.date_trunc("day", "start_ts").alias("day"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("has_click").alias("n_with_click"),
            F.sum("converted").alias("n_converted"),
        )
    )


FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us FROM events
), marked AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > 1800000000
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
), scored AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' THEN us END)
           OVER (PARTITION BY user_id, session_no) AS first_click_us
  FROM sess
), per_session AS (
  SELECT user_id, session_no, MIN(ts) AS start_ts,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         MAX(CASE WHEN event_type = 'purchase' AND first_click_us IS NOT NULL
                   AND us >= first_click_us THEN 1 ELSE 0 END) AS converted
  FROM scored GROUP BY user_id, session_no
)
SELECT date_trunc('day', start_ts) AS day,
       COUNT(*) AS n_sessions,
       CAST(SUM(has_click) AS BIGINT) AS n_with_click,
       CAST(SUM(converted) AS BIGINT) AS n_converted
FROM per_session GROUP BY 1
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — per (first-activity week, weeks-since)
    distinct active users; the classic warehouse retention triangle
    over the CDC-fed events stream.

    Scale: one shuffle to find each user's first event (map-side
    partially aggregated min), one distinct on (user, week), one
    broadcast-or-shuffle join on user_id, and a count-distinct rollup
    whose key space is weeks² — tiny. Week arithmetic stays on whole
    days (datediff of week-truncated timestamps, exactly divisible by
    7) — integer-exact in both engines.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .withColumn(
            "week_no",
            (
                F.datediff(F.col("week"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("long"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS week_no,
       COUNT(DISTINCT user_id) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY 1, 2
"""

QUERIES["funnel_session_conversion"] = funnel_session_conversion
ORACLES["funnel_session_conversion"] = FUNNEL_SQL
QUERIES["user_retention_cohorts"] = user_retention_cohorts
ORACLES["user_retention_cohorts"] = RETENTION_SQL


QUERIES["fraud_rolling_anomalies"] = fraud_rolling_anomalies
ORACLES["fraud_rolling_anomalies"] = FRAUD_SQL


# ------------------------------------------------ recursive CTE surface


def recursive_hierarchy_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native recursive CTE (Spark 4's WITH RECURSIVE): walk the
    implicit binary hierarchy parent(k) = k div 2 over the low
    customer keys and report node counts per depth. This is the
    iterative-fixpoint surface expressed IN SQL — the same class of
    computation operators/graph.py drives imperatively, here delegated
    to the engine's recursion operator (each recursion step is one
    join against the frontier, exactly the propagation round's plan).

    Scale: frontier-sized intermediate per step, depth = log2(keys);
    the per-step join keys on the parent id. Integer-only outputs.
    """
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_rv")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT CAST(c_custkey AS BIGINT) AS k, 0 AS depth
          FROM customer_rv WHERE c_custkey = 1
          UNION ALL
          SELECT CAST(c.c_custkey AS BIGINT) AS k, chain.depth + 1
          FROM customer_rv c JOIN chain ON c.c_custkey DIV 2 = chain.k
          WHERE c.c_custkey BETWEEN 2 AND 511
        )
        SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM chain GROUP BY depth
        """
    )


RECURSIVE_SQL = """
WITH RECURSIVE chain AS (
  SELECT CAST(c_custkey AS BIGINT) AS k, 0 AS depth
  FROM customer WHERE c_custkey = 1
  UNION ALL
  SELECT CAST(c.c_custkey AS BIGINT) AS k, chain.depth + 1
  FROM customer c JOIN chain ON c.c_custkey // 2 = chain.k
  WHERE c.c_custkey BETWEEN 2 AND 511
)
SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM chain GROUP BY depth
"""

QUERIES["recursive_hierarchy_depths"] = recursive_hierarchy_depths
ORACLES["recursive_hierarchy_depths"] = RECURSIVE_SQL


# ------------------------------------------ array higher-order functions


def order_quantity_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface over grouped data: per
    order, the sorted quantity vector and derived profiles — filtered
    count (HOF ``filter``), discounted total (``transform`` +
    ``aggregate`` in exact integer cents), and pairwise quantity gaps
    (``zip_with`` on the array against its own tail). All JVM-side
    lambda expressions; integer outputs so the oracle is exact.

    Scale: one groupBy(orderkey) collect_list (bounded — 7 lineitems
    max per order) then narrow per-row array compute.
    """
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity").cast("long"))
        ).alias("qtys")
    )
    return grouped.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_items"),
        F.expr("CAST(size(filter(qtys, q -> q >= 25)) AS BIGINT)").alias(
            "n_bulk"
        ),
        F.expr(
            "CAST(aggregate(transform(qtys, q -> q * 100L), 0L,"
            " (acc, x) -> acc + x) AS BIGINT)"
        ).alias("total_cents"),
        F.expr(
            "CAST(aggregate(zip_with(slice(qtys, 2, size(qtys)),"
            " slice(qtys, 1, size(qtys) - 1), (a, b) -> a - b),"
            " 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("qty_span"),
    )


HOF_SQL = """
WITH grouped AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, CAST(len(qtys) AS BIGINT) AS n_items,
       CAST(len(list_filter(qtys, q -> q >= 25)) AS BIGINT) AS n_bulk,
       CAST(list_sum(list_transform(qtys, q -> q * 100)) AS BIGINT)
         AS total_cents,
       -- the Spark side sums consecutive zip_with gaps; on a sorted
       -- array that telescopes to max - min, which DuckDB (no list
       -- zip HOF) computes directly — same value, independent route
       CAST(qtys[len(qtys)] - qtys[1] AS BIGINT) AS qty_span
FROM grouped
"""

QUERIES["order_quantity_profiles"] = order_quantity_profiles
ORACLES["order_quantity_profiles"] = HOF_SQL


# ---------------------------------------------- date/time function breadth


def order_calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar-function breadth over orders: truncation,
    component extraction, end-of-month arithmetic, day-of-week
    bucketing, and date diffs — the calendar toolkit consumers lean on
    for reporting over materialized CDC state. Integer/date outputs
    only, so the oracle is exact.

    Scale: narrow projections + one small-cardinality aggregation;
    every function is JVM whole-stage-codegen."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.select(
            F.date_trunc("quarter", d).alias("qtr"),
            F.dayofweek(d).cast("long").alias("dow"),
            (F.datediff(F.last_day(d), d.cast("date")) < 7)
            .cast("int")
            .alias("month_end_rush"),
        )
        .groupBy("qtr", "dow")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("month_end_rush").alias("n_month_end"),
        )
    )


CALENDAR_SQL = """
SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                       last_day(CAST(o_orderdate AS DATE))) < 7
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end
FROM orders
GROUP BY 1, 2
"""

QUERIES["order_calendar_breakdown"] = order_calendar_breakdown
ORACLES["order_calendar_breakdown"] = CALENDAR_SQL


# --------------------------------------------- link analysis (PageRank)


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/graph.py pagerank_integer)
    over the customer<->supplier co-purchase graph: distinct
    (customer, supplier) trade pairs from orders x lineitem, edges in
    both directions (supplier nodes encoded as NEGATED keys — suppkey
    >= 1 so -suppkey never collides with any positive custkey at any
    scale factor, unlike a fixed additive offset which c_custkey =
    150k*SF overruns at SF>=7), 3 power iterations, top-20 nodes by
    exact integer rank — the link-analysis authority signal
    corpus-curation pipelines compute per domain.

    Edge build: the distinct() collapses the many-lineitems-per-pair
    fan-in BEFORE the iteration, so each round's join touches one row
    per graph edge, not one per lineitem. The pair list is persisted —
    it feeds outdeg + 3 contribution rounds.
    """
    from bottledwater_pg_spark.operators.graph import pagerank_integer

    ranks = pagerank_integer(copurchase_edges(spark, sf_dir), iters=3)
    return ranks.orderBy(F.desc("rank"), "node").limit(20)


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The customer<->supplier co-purchase edge list (both directions,
    supplier keys negated — see :func:`pagerank_copurchase`), exposed
    separately so the scale ladder can drive ``pagerank_integer``
    with explicit iteration/checkpoint policies over the same graph
    the benched query uses."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # NOT persisted: since the explode rewrite below, the pair set has
    # exactly ONE consumer (pagerank_integer's own edge persist, or
    # the ladder's) — caching it here wrote ~|pairs| rows to storage
    # that were read back exactly once
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", (-F.col("l_suppkey")).alias("supp"))
        .distinct()
    )
    # both directions in ONE pass over the pair set (the union form
    # read it twice — double work per consumer)
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("o_custkey").alias("src"), F.col("supp").alias("dst")
                ),
                F.struct(
                    F.col("supp").alias("src"), F.col("o_custkey").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         CAST(150000000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
    FROM e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""


PAGERANK_SQL = f"""
WITH p AS (
  SELECT DISTINCT o_custkey AS c, -l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
  SELECT c AS src, s AS dst FROM p
  UNION ALL
  SELECT s AS src, c AS dst FROM p
), nodes AS (
  SELECT DISTINCT src AS node FROM e
), deg AS (
  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes
), {_pagerank_iter_sql("r0", "r1")},
{_pagerank_iter_sql("r1", "r2")},
{_pagerank_iter_sql("r2", "r3")}
SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT 20
"""

QUERIES["pagerank_copurchase"] = pagerank_copurchase
ORACLES["pagerank_copurchase"] = PAGERANK_SQL


# ---------------------------------------------- z-order layout pruning


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (operators/layout.py): range-normalize
    l_partkey and l_suppkey to 16 integer buckets each (the
    rank/range-id step real ZORDER writers use — raw keys of
    different magnitudes would waste interleave bits), Morton-
    interleave the 4+4 bucket bits into a z-value, and report each
    z-cell's row count and min/max of BOTH raw dimensions — the
    min/max rectangles that make two-column scan pruning work.

    All arithmetic is exact integer: the bucket id is
    ((v - min) * 16) div (max - min + 1) with the 1-row min/max
    aggregate broadcast, and the interleave is 8 codegen'd bit ops —
    bit-identical on both engines at any scale factor."""
    from bottledwater_pg_spark.operators.layout import with_zvalue

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    stats = li.agg(
        F.min("l_partkey").alias("_pmin"),
        F.max("l_partkey").alias("_pmax"),
        F.min("l_suppkey").alias("_smin"),
        F.max("l_suppkey").alias("_smax"),
    )
    b = li.crossJoin(F.broadcast(stats)).select(
        "l_partkey",
        "l_suppkey",
        F.expr("((l_partkey - _pmin) * 16) div (_pmax - _pmin + 1)").alias("xb"),
        F.expr("((l_suppkey - _smin) * 16) div (_smax - _smin + 1)").alias("yb"),
    )
    z = with_zvalue(b, "xb", "yb", bits=4)
    return z.groupBy(F.col("zval").alias("zcell")).agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )


from bottledwater_pg_spark.operators.layout import sql_z_expr  # noqa: E402

ZORDER_SQL = f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
  FROM lineitem
), b AS (
  SELECT l_partkey, l_suppkey,
         ((l_partkey - pmin) * 16) // (pmax - pmin + 1) AS xb,
         ((l_suppkey - smin) * 16) // (smax - smin + 1) AS yb
  FROM lineitem, stats
), z AS (
  SELECT l_partkey, l_suppkey, {sql_z_expr("xb", "yb", 4)} AS zval
  FROM b
)
SELECT zval AS zcell,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
FROM z
GROUP BY 1
"""

QUERIES["zorder_layout_stats"] = zorder_layout_stats
ORACLES["zorder_layout_stats"] = ZORDER_SQL


# ------------------------------------- robust dispersion (exact MAD)


def mad_order_value_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order value per market segment —
    the robust dispersion statistic (outlier-resistant sigma) quality
    monitors prefer over stddev. Exact, via TWO stacked applications
    of the two-phase bucketed rank extraction (:func:
    `_bucketed_group_ranks`): first the per-segment median, then the
    median of |v - median|.

    Determinism: v is DECIMAL(18,2); the median is one double
    expression over the middle decimal values; each deviation is one
    double subtraction of identical operands — so the second ranking
    orders identical doubles on both engines. Parallelism is bucket-
    count x groups in both phases, never capped at the 5 segments.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # persisted: the joined value table feeds BOTH rank phases, each of
    # which scans it several times (stats, bucket counts, straddle
    # ranking) — without the cache the orders x customer join runs ~6x
    j = persist_tracked(
        orders.join(cust, orders.o_custkey == cust.c_custkey).select(
            "c_mktsegment",
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
    )
    r = _bucketed_group_ranks(
        j, "c_mktsegment", ["(n + 1) div 2", "(n + 2) div 2"]
    )
    # med is groups-sized (5 rows) but feeds BOTH the deviation build
    # and the final join — persist it or the whole first rank phase
    # (stats + bucket counts + straddle ranking) executes twice
    med = persist_tracked(
        r.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("c_mktsegment")
        .agg(
            (
                (F.min("v").cast("double") + F.max("v").cast("double"))
                / F.lit(2.0)
            ).alias("med"),
            F.max("n").alias("n_orders"),
        )
    )
    dev = persist_tracked(
        j.join(F.broadcast(med), "c_mktsegment").select(
            "c_mktsegment",
            F.abs(F.col("v").cast("double") - F.col("med")).alias("v"),
        )
    )
    r2 = _bucketed_group_ranks(
        dev, "c_mktsegment", ["(n + 1) div 2", "(n + 2) div 2"]
    )
    mad = (
        r2.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("c_mktsegment")
        .agg(
            ((F.min("v") + F.max("v")) / F.lit(2.0)).alias("mad_order_value")
        )
    )
    return med.join(mad, "c_mktsegment").select(
        "c_mktsegment",
        F.col("med").alias("median_order_value"),
        "mad_order_value",
        "n_orders",
    )


MAD_SQL = """
WITH j AS (
  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, v,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
),
med AS (
  SELECT c_mktsegment,
         (CAST(MIN(v) AS DOUBLE) + CAST(MAX(v) AS DOUBLE)) / 2 AS med,
         MAX(n) AS n_orders
  FROM r
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY c_mktsegment
),
dev AS (
  SELECT j.c_mktsegment, ABS(CAST(j.v AS DOUBLE) - med.med) AS v
  FROM j JOIN med USING (c_mktsegment)
),
r2 AS (
  SELECT c_mktsegment, v,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM dev
),
mad AS (
  SELECT c_mktsegment, (MIN(v) + MAX(v)) / 2 AS mad_order_value
  FROM r2
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY c_mktsegment
)
SELECT med.c_mktsegment, med.med AS median_order_value,
       mad.mad_order_value, med.n_orders
FROM med JOIN mad USING (c_mktsegment)
"""

QUERIES["mad_order_value_by_segment"] = mad_order_value_by_segment
ORACLES["mad_order_value_by_segment"] = MAD_SQL


# ------------------------------------------- mergeable sketch surface


# Own-register HyperLogLog (Flajolet et al. 2007), cross-engine exact:
# p=12 → m=4096 registers; the item hash is the proven 60-bit
# md5-prefix (dedup.md5_token_hash's trick) so BOTH engines derive the
# identical registers; top 12 bits pick the register, rank of the
# 48-bit suffix is 49 - length(bin(w)) (bin() exists in Spark AND
# DuckDB and both drop leading zeros — no float log2 at a power-of-two
# boundary). The harmonic sum is kept in scaled INTEGER arithmetic
# (sum of 2^(49-rank) as BIGINT, max m*2^49 = 2^61 — exact and
# addition-order-independent, the same quantization discipline as the
# PMI rational), so the only floating-point steps are one literal
# parse, one cast, one divide, and (small-range) one ln — all verified
# bit-equal Spark-vs-DuckDB by exhaustive sweep (test_approx.py).
_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_RMAX = 60 - _HLL_P + 1  # rank of an all-zero 48-bit suffix
_HLL_W_MOD = 1 << (60 - _HLL_P)
# alpha_m * m^2 * 2^RMAX as ONE shortest-repr double literal: Python
# repr round-trips, and both engines parse scientific literals to the
# nearest double, so the numerator is bit-identical on both sides.
_HLL_NUMER = repr((0.7213 / (1.0 + 1.079 / _HLL_M)) * 2.0 ** (2 * _HLL_P + _HLL_RMAX))


def hll_own_registers(df: DataFrame, key_cols: list,
                      item_col: str) -> DataFrame:
    """(key_cols..., bkt, r): the m-per-key HLL register table for
    ``item_col`` under the md5-derived hash. groupBy(key, bkt).max is
    a partial+final aggregate — per-key state is m rows regardless of
    cardinality, which is the whole point of the sketch at 100 TB."""
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit("hll|"), F.col(item_col).cast("string")),
                    "UTF-8",
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = h % F.lit(_HLL_W_MOD)
    rank = F.when(w == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_RMAX) - F.length(F.bin(w))
    )
    return (
        df.groupBy(*key_cols, F.shiftright(h, 60 - _HLL_P).alias("bkt"))
        .agg(F.max(rank).cast("long").alias("r"))
    )


def hll_estimate_cols(present_col: str, s_present_col: str) -> "F.Column":
    """The HLL estimate (BIGINT) from (#registers present, scaled
    integer harmonic sum): raw harmonic estimate with the standard
    linear-counting small-range correction when E <= 2.5m and empty
    registers exist. Large-range correction is omitted on purpose —
    it patches 32-bit hash saturation and this hash has 60 bits."""
    v = F.lit(_HLL_M) - F.col(present_col)
    s = F.col(s_present_col) + v * F.lit(1 << _HLL_RMAX)
    e_raw = F.lit(float(_HLL_NUMER)) / s.cast("double")
    m_d = F.lit(float(_HLL_M))
    return (
        F.when(
            (e_raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
            F.round(m_d * F.log(m_d / v.cast("double"))),
        )
        .otherwise(F.round(e_raw))
        .cast("long")
    )


def hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per event type, the
    own-register HLL estimate of distinct users NEXT TO the exact
    count. The operational shape at 100 TB is "store m registers per
    partition/day, max-merge at query time" — register max-merge
    equals whole-corpus registers by construction, pinned in
    test_approx.py; the production DataSketches twin
    (hll_sketch_agg) stays accuracy-certified by
    ``hll_error_bound_by_type``.

    DuckDB replays the estimator EXACTLY (md5-derived registers,
    integer harmonic sum, one shared double literal), so this is
    hash-oracled, not rows-only — certify the values, not engine
    internals, the same way the generated corpus does for the
    reference (spec/bin/generate_type_specs.rb:30-45). Scale: both
    aggregations are partial+final; register state is m rows per
    type regardless of user cardinality, unlike the exact distinct
    whose shuffle grows with user count — the query exists to
    document exactly that trade."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    regs = hll_own_registers(ev, ["event_type"], "user_id")
    est = regs.groupBy("event_type").agg(
        F.count("*").alias("_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - r)")
        ).alias("_s_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        est.select(
            "event_type",
            hll_estimate_cols("_present", "_s_present").alias("approx_users"),
        )
        .join(exact, "event_type")
    )


HLL_OWN_SQL = f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h60
  FROM events
),
reg AS (
  SELECT event_type, h60 // {_HLL_W_MOD} AS bkt,
         MAX(CASE WHEN h60 % {_HLL_W_MOD} = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin(h60 % {_HLL_W_MOD})) END) AS r
  FROM h GROUP BY event_type, h60 // {_HLL_W_MOD}
),
agg AS (
  SELECT event_type, COUNT(*) AS present,
         SUM(1::BIGINT << ({_HLL_RMAX} - r))::BIGINT AS s_present
  FROM reg GROUP BY event_type
),
est AS (
  SELECT event_type,
         CAST(CASE WHEN {_HLL_NUMER} / CAST(s_present + ({_HLL_M} - present) * {1 << _HLL_RMAX}::BIGINT AS DOUBLE) <= {2.5 * _HLL_M}
                    AND present < {_HLL_M}
              THEN round({float(_HLL_M)!r} * ln({float(_HLL_M)!r} / CAST({_HLL_M} - present AS DOUBLE)))
              ELSE round({_HLL_NUMER} / CAST(s_present + ({_HLL_M} - present) * {1 << _HLL_RMAX}::BIGINT AS DOUBLE))
              END AS BIGINT) AS approx_users
  FROM agg
)
SELECT est.event_type, est.approx_users,
       x.exact_users
FROM est JOIN (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
) x USING (event_type)
"""

QUERIES["hll_distinct_users_by_type"] = hll_distinct_users_by_type
ORACLES["hll_distinct_users_by_type"] = HLL_OWN_SQL


def hll_error_bound_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable certificate for ``hll_distinct_users_by_type``:
    per event type, the EXACT distinct count (cross-engine checkable —
    the oracle recomputes it) plus an integer indicator that the HLL
    estimate's relative error is within 500 bp. DataSketches HLL at
    the default lgK has ~1.6% standard error; measured error on this
    corpus is 0-40 bp across sf0.001/0.01/0.1, and the sketch is
    seed-free deterministic, so the indicator is a fixed function of
    the data. This upgrades the sketch op from the rows-only check to
    a hash-certified accuracy property (certify the property, not the
    engine-specific estimate)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.ceil(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        ).alias("_approx"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        F.lit(500).cast("long").alias("err_bound_bp"),
        (
            F.abs(F.col("_approx") - F.col("exact_users")) * 10000
            <= F.col("exact_users") * 500
        )
        .cast("long")
        .alias("within_bound"),
    )


HLL_ERROR_BOUND_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(500 AS BIGINT) AS err_bound_bp,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY event_type
"""

QUERIES["hll_error_bound_by_type"] = hll_error_bound_by_type
ORACLES["hll_error_bound_by_type"] = HLL_ERROR_BOUND_SQL


CMS_EPS = 0.001
CMS_CONF = 0.99
CMS_SEED = 42


def cms_heavy_users_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters, certificate-style: ONE mergeable CMS
    over the event stream's user ids (``count_min_sketch`` — partial
    aggregation per partition, sketches merge associatively: the
    store-per-partition/merge-at-read shape that makes frequency
    monitoring feasible at 100 TB), then for the 10 exactly-heaviest
    users emit the exact count (oracle-recomputable) plus two integer
    indicators of the CMS contract: the estimate NEVER undercounts
    (structural — every increment lands in all d cells) and stays
    within eps*N of truth (the (eps, conf) guarantee; seeded hashes
    make it a fixed function of the data). Reading the sketch costs a
    ~100 KB driver transfer + 10 point queries — bounded metadata,
    like the topic-list collects.

    The sketched column is cast to string so the driver-side point
    query (py4j) dispatches on an unambiguous type."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(F.col("user_id").cast("string").alias("u"))
    from bottledwater_pg_spark.session import persist_tracked

    ev = persist_tracked(ev)
    # ONE aggregation job carries the row count AND the sketch (r15:
    # they were two separate driver actions over the same cached
    # projection — same values, one fewer per-job floor)
    meta = ev.agg(
        F.count("*").alias("n"),
        F.expr(
            f"count_min_sketch(u, cast({CMS_EPS} as double), "
            f"cast({CMS_CONF} as double), {CMS_SEED})"
        ).alias("s"),
    ).collect()[0]
    n_total, sketch = meta["n"], meta["s"]
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch)
    )
    top = (
        ev.groupBy("u")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("u").cast("long"))
        .limit(10)
        .collect()
    )
    slack = int(CMS_EPS * n_total) + 1
    rows = []
    for r in top:
        est = jcms.estimateCount(r["u"])
        rows.append(
            (
                int(r["u"]),
                int(r["cnt"]),
                1 if est >= r["cnt"] else 0,
                1 if est <= r["cnt"] + slack else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "user_id bigint, exact_events bigint, "
        "overestimate_ok bigint, within_eps_ok bigint",
    )


CMS_HEAVY_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS exact_events,
       CAST(1 AS BIGINT) AS overestimate_ok,
       CAST(1 AS BIGINT) AS within_eps_ok
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
ORDER BY COUNT(*) DESC, user_id
LIMIT 10
"""

QUERIES["cms_heavy_users_certificate"] = cms_heavy_users_certificate
ORACLES["cms_heavy_users_certificate"] = CMS_HEAVY_SQL


APPROX_PCT_ACCURACY = 1000


def approx_quantile_rank_certificate(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Quantile sketch certificate, completing the mergeable-sketch
    family (HLL / CMS / Bloom / quantiles): ``percentile_approx`` is
    the KLL/GK-style mergeable quantile sketch (partial agg per
    partition, merge at read); its contract is RANK accuracy — the
    returned value's true rank is within n/accuracy of the target
    rank. The certificate computes the approx p50/p95 per event type,
    then the EXACT rank of that returned value (one conditional-agg
    join — cross-engine computable arithmetic), and emits the group
    sizes (oracle-recomputed) plus integer indicators that both rank
    errors are within bound. Deterministic: the sketch is a fixed
    function of the data.

    Scale: sketch agg is one partial+final pass; the rank check joins
    the 5-row approx table broadcast against one counting pass."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("event_type", "value")
    from bottledwater_pg_spark.session import persist_tracked

    ev = persist_tracked(ev)
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.lit(0.5), F.lit(APPROX_PCT_ACCURACY)
        ).alias("p50"),
        F.percentile_approx(
            "value", F.lit(0.95), F.lit(APPROX_PCT_ACCURACY)
        ).alias("p95"),
    )
    ranks = ev.join(F.broadcast(approx), "event_type").groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("value") <= F.col("p50"), 1).otherwise(0)
        ).alias("rank50"),
        F.sum(
            F.when(F.col("value") <= F.col("p95"), 1).otherwise(0)
        ).alias("rank95"),
    )
    tol = F.col("n") / F.lit(APPROX_PCT_ACCURACY) + F.lit(1.0)
    return ranks.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.abs(F.col("rank50") - F.col("n") * 0.5) <= tol)
        .cast("long")
        .alias("p50_rank_ok"),
        (F.abs(F.col("rank95") - F.col("n") * 0.95) <= tol)
        .cast("long")
        .alias("p95_rank_ok"),
    )


APPROX_PCT_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS p50_rank_ok,
       CAST(1 AS BIGINT) AS p95_rank_ok
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""

QUERIES["approx_quantile_rank_certificate"] = approx_quantile_rank_certificate
ORACLES["approx_quantile_rank_certificate"] = APPROX_PCT_SQL


# ---------------------------------------- data-quality expectations


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/dbt-style expectation suite as ONE report: per check, the
    violation count and the rows checked. Same-table row predicates
    (nulls, ranges, domains) fold into a SINGLE conditional-aggregate
    pass over each table — adding a 10th check costs another column,
    not another scan; uniqueness is one counted group-by; referential
    integrity is one anti-join (null-safe NOT EXISTS semantics).

    Scale: two scans of orders (row checks + key uniqueness), one of
    lineitem, one anti-join against the customer build side — the
    whole suite is 4 jobs regardless of how many row-level checks it
    carries. This is the validation stage a 100 TB ingest runs before
    publishing a snapshot.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    li = _t(spark, sf_dir, "lineitem")

    def row(name: str, viol: F.Column, checked: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("check_name"),
            viol.cast("long").alias("n_violations"),
            checked.cast("long").alias("n_checked"),
        )

    o_checks = orders.agg(
        F.array(
            row("orders_custkey_not_null",
                F.sum(F.col("o_custkey").isNull().cast("long")), F.count("*")),
            row("orders_status_in_domain",
                F.sum((~F.col("o_orderstatus").isin("O", "F", "P"))
                      .cast("long")), F.count("*")),
            row("orders_price_positive",
                F.sum((F.col("o_totalprice") <= 0).cast("long")), F.count("*")),
            row("orders_date_in_range",
                F.sum(((F.col("o_orderdate")
                        < F.lit("1992-01-01").cast("timestamp_ntz"))
                       | (F.col("o_orderdate")
                          >= F.lit("1999-01-01").cast("timestamp_ntz")))
                      .cast("long")), F.count("*")),
        ).alias("checks")
    ).select(F.explode("checks").alias("c"))

    li_checks = li.agg(
        F.array(
            row("lineitem_qty_in_range",
                F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
                      .cast("long")), F.count("*")),
            row("lineitem_discount_in_range",
                F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1))
                      .cast("long")), F.count("*")),
        ).alias("checks")
    ).select(F.explode("checks").alias("c"))

    dup = orders.groupBy("o_orderkey").count()
    uniq = dup.agg(
        row("orders_orderkey_unique",
            F.sum((F.col("count") > 1).cast("long")), F.count("*")).alias("c")
    ).select("c")

    orphans = orders.join(cust, orders.o_custkey == cust.c_custkey,
                          "left_anti")
    n_orders = orders.select(F.count("*").alias("n"))
    fk = (
        orphans.agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.struct(
                F.lit("orders_custkey_fk_valid").alias("check_name"),
                F.col("v").cast("long").alias("n_violations"),
                F.col("n").cast("long").alias("n_checked"),
            ).alias("c")
        )
    )

    return (
        o_checks.unionByName(li_checks).unionByName(uniq).unionByName(fk)
        .select("c.check_name", "c.n_violations", "c.n_checked")
    )


DQ_SQL = """
SELECT 'orders_custkey_not_null' AS check_name,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       COUNT(*) AS n_checked FROM orders
UNION ALL
SELECT 'orders_status_in_domain',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM orders
UNION ALL
SELECT 'orders_price_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*) FROM orders
UNION ALL
SELECT 'orders_date_in_range',
       CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                       OR o_orderdate >= TIMESTAMP '1999-01-01'
                THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM orders
UNION ALL
SELECT 'lineitem_qty_in_range',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_discount_in_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM lineitem
UNION ALL
SELECT 'orders_orderkey_unique',
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'orders_custkey_fk_valid',
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
                                      WHERE c_custkey = o_custkey)
                THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*) FROM orders
"""

QUERIES["data_quality_report"] = data_quality_report
ORACLES["data_quality_report"] = DQ_SQL


# ----------------------------------------- first-touch attribution


def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credits the EARLIEST
    click by the same user within the preceding 7 days — the
    complement of the as-of join (which credits the nearest/last
    touch). Formulated as union + carry-forward window like the as-of
    family: one shuffle on user_id, no range-join explosion. The
    carried value is the FIRST click inside a bounded lookback, so
    the window carries (click_ts, click_id) of the oldest click still
    within 7 days — maintained with a min over a range frame bounded
    in event-time microseconds (exact integer bounds, parity-safe).

    Returns purchases with their attributed click (or null when no
    click in window) and the attribution latency in whole seconds.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("c_us"), F.col("event_id").alias("click_id")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us"), F.col("event_id").alias("buy_id")
    )
    week = 7 * 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("c_us")
        .rangeBetween(-week, 0)
    )
    # for each purchase, the first (min) click in [p_us - week, p_us]:
    # union clicks+purchases on the time axis, range-frame min over
    # the click side only (purchases carry null click fields)
    tagged = clicks.select(
        "user_id", F.col("c_us").alias("us"),
        F.struct("c_us", "click_id").alias("c"),
        F.lit(None).cast("long").alias("buy_id"),
    ).unionByName(
        buys.select(
            "user_id", F.col("p_us").alias("us"),
            F.lit(None).cast("struct<c_us:long,click_id:long>").alias("c"),
            "buy_id",
        )
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-week, 0)
    )
    first_click = F.min("c").over(wr)
    return (
        tagged.withColumn("fc", first_click)
        .filter(F.col("buy_id").isNotNull())
        .select(
            "user_id",
            "buy_id",
            F.col("fc.click_id").alias("attributed_click"),
            ((F.col("us") - F.col("fc.c_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("latency_sec"),
        )
    )


FIRST_TOUCH_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
buys AS (
  SELECT user_id, us AS p_us, event_id AS buy_id
  FROM ev WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, us AS c_us, event_id AS click_id
  FROM ev WHERE event_type = 'click'
),
attributed AS (
  SELECT b.user_id, b.buy_id,
         MIN(STRUCT_PACK(c_us := c.c_us, click_id := c.click_id)) AS fc,
         b.p_us
  FROM buys b LEFT JOIN clicks c
    ON c.user_id = b.user_id
   AND c.c_us <= b.p_us
   AND c.c_us >= b.p_us - CAST(604800000000 AS BIGINT)
  GROUP BY b.user_id, b.buy_id, b.p_us
)
SELECT user_id, buy_id,
       fc.click_id AS attributed_click,
       CAST((p_us - fc.c_us) // 1000000 AS BIGINT) AS latency_sec
FROM attributed
"""

QUERIES["first_touch_attribution"] = first_touch_attribution
ORACLES["first_touch_attribution"] = FIRST_TOUCH_SQL


def nation_revenue_share_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its REGION's order
    revenue — a windowed aggregate OVER an aggregate (group to
    nation, window-sum to region), the standard percent-of-total
    report shape. The window runs on the 25-row nation aggregate, so
    its tiny partition count is irrelevant; the heavy work is the
    one partial-aggregated group-by. Exact decimal sums; the share
    is one double division of identical operands on both engines.
    """
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("nation_revenue"),
        (
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double")
        ).alias("region_share"),
    )


REVENUE_SHARE_SQL = """
WITH per_nation AS (
  SELECT r_name, n_name,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev AS DOUBLE) AS nation_revenue,
       CAST(rev AS DOUBLE)
         / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
         AS region_share
FROM per_nation
"""

QUERIES["nation_revenue_share_in_region"] = nation_revenue_share_in_region
ORACLES["nation_revenue_share_in_region"] = REVENUE_SHARE_SQL


# --------------------------------------- tail percentiles (p95/p99)


_TAIL_POINTS = (("p50", 50), ("p95", 95), ("p99", 99))


def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability-style tail report: exact interpolated p50/p95/p99
    of event value per event type — the latency-dashboard shape, via
    the same two-phase bucketed rank machinery as the quartiles (no
    engine-specific percentile built-in; sort unit is a value-range
    bucket, parallelism not capped at the handful of types). At scale
    the approximate twin is `percentile_approx` (mergeable KLL
    sketch, test_approx.py); THIS is the exact nightly job."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("v")
    )
    exprs = []
    for _tag, k in _TAIL_POINTS:
        li = f"((n - 1) * {k}) div 100 + 1"
        exprs += [li, f"least(({li}) + 1, n)"]
    r = _bucketed_group_ranks(ev, "event_type", exprs)
    return r.groupBy("event_type").agg(*_quartile_cols(_TAIL_POINTS))


TAIL_SQL = f"""
WITH r AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(value AS DECIMAL(18,2))) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       {_quartile_sql_cols(_TAIL_POINTS)}
FROM r
GROUP BY event_type
"""

QUERIES["value_percentiles_by_type"] = value_percentiles_by_type
ORACLES["value_percentiles_by_type"] = TAIL_SQL


# ----------------------------------------- correlation matrix, one pass


_CORR_VARS = (("qty", "l_quantity"), ("price", "l_extendedprice"),
              ("disc", "l_discount"))


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation MATRIX over three lineitem
    measures in ONE aggregation pass — all 9 exact-decimal co-moments
    (3 sums, 3 squares, 3 cross-products) stream as partials of the
    same groupBy, so adding a variable costs columns, not scans. The
    matrix is emitted long-form (var_x, var_y, corr) with var_x <
    var_y. Same bit-reproducibility discipline as
    quantity_price_corr_exact, generalized.
    """
    li = _t(spark, sf_dir, "lineitem")
    cols = {tag: _d(col) for tag, col in _CORR_VARS}
    aggs = [F.count("*").cast("double").alias("n")]
    for tag, _c in _CORR_VARS:
        aggs.append(_dbl(F.sum(cols[tag])).alias(f"s_{tag}"))
        aggs.append(
            _dbl(F.sum(cols[tag] * cols[tag])).alias(f"ss_{tag}")
        )
    tags = [t for t, _ in _CORR_VARS]
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            aggs.append(
                _dbl(F.sum(cols[a] * cols[b])).alias(f"sp_{a}_{b}")
            )
    m = li.agg(*aggs)
    pairs = []
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            corr = (
                F.col("n") * F.col(f"sp_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            ) / F.sqrt(
                (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("var_x"),
                    F.lit(b).alias("var_y"),
                    corr.alias("corr"),
                )
            )
    return m.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.var_x", "p.var_y", "p.corr"
    )


def _corr_matrix_sql() -> str:
    sums, pairs = [], []
    tags = [t for t, _ in _CORR_VARS]
    col_of = {t: c for t, c in _CORR_VARS}
    for t in tags:
        d = _sql_d(col_of[t])
        sums.append(f"{_sql_dbl(f'SUM({d})')} AS s_{t}")
        sums.append(f"{_sql_dbl(f'SUM({d} * {d})')} AS ss_{t}")
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            da, db = _sql_d(col_of[a]), _sql_d(col_of[b])
            sums.append(f"{_sql_dbl(f'SUM({da} * {db})')} AS sp_{a}_{b}")
            pairs.append(
                f"SELECT '{a}' AS var_x, '{b}' AS var_y, "
                f"(n * sp_{a}_{b} - s_{a} * s_{b}) / "
                f"sqrt((n * ss_{a} - s_{a} * s_{a}) * "
                f"(n * ss_{b} - s_{b} * s_{b})) AS corr FROM m"
            )
    return (
        "WITH m AS (\n  SELECT CAST(COUNT(*) AS DOUBLE) AS n,\n         "
        + ",\n         ".join(sums)
        + "\n  FROM lineitem\n)\n"
        + "\nUNION ALL\n".join(pairs)
    )


QUERIES["lineitem_corr_matrix"] = lineitem_corr_matrix
ORACLES["lineitem_corr_matrix"] = _corr_matrix_sql()


def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — the revenue twin of the retention
    triangle: per (first-activity week, weeks-since), the exact
    purchase revenue that cohort generated in that week plus its
    CUMULATIVE lifetime value to date. Money stays DECIMAL through
    both the weekly sum and the running cumulation; doubles appear
    once at the output. The cumulative window runs per cohort over
    weeks² rows — tiny — while the heavy work is the same two
    partial-aggregated shuffles as retention.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .withColumn(
            "week_no",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("long"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.sum("v").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return weekly.select(
        "cohort_week",
        "week_no",
        F.col("rev").cast("double").alias("week_revenue"),
        F.sum("rev").over(w).cast("double").alias("cumulative_ltv"),
    )


LTV_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
weekly AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', CAST(f.cohort_week AS DATE),
              CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
           AS week_no,
         SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
  FROM events e JOIN first f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT cohort_week, week_no,
       CAST(rev AS DOUBLE) AS week_revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_no
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cumulative_ltv
FROM weekly
"""

QUERIES["cohort_ltv_triangle"] = cohort_ltv_triangle
ORACLES["cohort_ltv_triangle"] = LTV_SQL


# --------------------------------------------- relational division


def nations_covering_all_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (universal quantification): supplier
    nations that have shipped parts of EVERY brand — the "FOR ALL"
    query shape (suppliers ÷ brands) the classic algebra names as its
    own operator. Implemented the scalable way: count distinct
    covered brands per nation and compare with the 1-row broadcast
    total — two partial-aggregated shuffles, no double-NOT-EXISTS
    nested correlation (which Catalyst would decorrelate into the
    same plan anyway, pinned here explicitly). Also returns each
    qualifying nation's distinct part count for a stronger hash.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    covered = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    per_nation = covered.groupBy("n_name").agg(
        F.count_distinct("p_brand").alias("n_brands"),
        F.count_distinct("p_partkey").alias("n_parts"),
    )
    total = part.agg(F.count_distinct("p_brand").alias("all_brands"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("n_brands") == F.col("all_brands"))
        .select("n_name", "n_parts")
    )


DIVISION_SQL = """
WITH covered AS (
  SELECT n_name, p_brand, p_partkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
per_nation AS (
  SELECT n_name,
         COUNT(DISTINCT p_brand) AS n_brands,
         COUNT(DISTINCT p_partkey) AS n_parts
  FROM covered GROUP BY n_name
)
SELECT n_name, n_parts
FROM per_nation, (SELECT COUNT(DISTINCT p_brand) AS all_brands FROM part) t
WHERE n_brands = all_brands
"""

QUERIES["nations_covering_all_brands"] = nations_covering_all_brands
ORACLES["nations_covering_all_brands"] = DIVISION_SQL


# ------------------------------- interval / timetz text round-trips


def pg_interval_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``interval`` text round-trip as a driver-contract query (the
    reference proves interval fidelity by canonicalizing through PG,
    schema_spec.rb:232-274; its wire struct is oid2avro.c:703-737).
    A canonical PG rendering is BUILT from order columns — one third
    of rows omit the year/month components (missing parts must read
    0), every seventh row carries a negative time part (PG's leading
    '-hh:mm:ss' negates all three time fields) — then parsed back by
    functions.pg_text.parse_pg_interval and reduced to total months /
    days / signed microseconds. The oracle computes the same totals
    straight from the base columns, so any parser defect mismatches.
    Pure JVM expressions (regexp over a built literal): shuffle-free.
    """
    from bottledwater_pg_spark.functions.pg_text import parse_pg_interval

    # ~10 regexes/row of parse + the canonical-text build dominate and
    # sit pre-exchange: opt in to the read repartition (measured 0.36x)
    o = _t(spark, sf_dir, "orders", parallel=True).select("o_orderkey")
    k = F.col("o_orderkey")
    built = o.select(
        "o_orderkey",
        F.concat_ws(
            " ",
            F.when(k % 3 != 0, F.concat((k % 5).cast("string"), F.lit(" years"))),
            F.when(k % 3 != 0, F.concat((k % 12).cast("string"), F.lit(" mons"))),
            F.concat((k % 28).cast("string"), F.lit(" days")),
            F.concat(
                F.when(k % 7 == 0, F.lit("-")).otherwise(F.lit("")),
                F.lpad((k % 24).cast("string"), 2, "0"), F.lit(":"),
                F.lpad(((k * 7) % 60).cast("string"), 2, "0"), F.lit(":"),
                F.lpad(((k * 13) % 60).cast("string"), 2, "0"),
                F.when(
                    k % 4 != 0,
                    F.concat(F.lit("."),
                             F.lpad(((k % 1000) * 1000).cast("string"), 6, "0")),
                ).otherwise(F.lit("")),
            ),
        ).alias("txt"),
    )
    p = built.select("o_orderkey", parse_pg_interval("txt").alias("iv"))
    return p.select(
        "o_orderkey",
        (F.col("iv.years").cast("long") * 12 + F.col("iv.months"))
        .cast("long").alias("months_total"),
        F.col("iv.days").cast("long").alias("days"),
        (
            (F.col("iv.hours").cast("long") * 3600
             + F.col("iv.minutes").cast("long") * 60
             + F.col("iv.seconds")) * 1_000_000
            + F.col("iv.micro")
        ).cast("long").alias("micros_total"),
    )


PG_INTERVAL_SQL = """
SELECT o_orderkey,
       CAST(CASE WHEN o_orderkey % 3 = 0 THEN 0
                 ELSE (o_orderkey % 5) * 12 + (o_orderkey % 12) END
            AS BIGINT) AS months_total,
       CAST(o_orderkey % 28 AS BIGINT) AS days,
       CAST((CASE WHEN o_orderkey % 7 = 0 THEN -1 ELSE 1 END) *
            (((o_orderkey % 24) * 3600 + ((o_orderkey * 7) % 60) * 60
              + ((o_orderkey * 13) % 60)) * 1000000
             + CASE WHEN o_orderkey % 4 = 0 THEN 0
                    ELSE (o_orderkey % 1000) * 1000 END)
            AS BIGINT) AS micros_total
FROM orders
"""


def pg_timetz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``timetz`` text round-trip (reference wire struct
    record{micro, zoneOffset} with the west-positive->ISO sign flip,
    oid2avro.c:552-588; type fidelity suite schema_spec.rb:146-230).
    Canonical text is BUILT per customer — offsets span -13h..+13h,
    half-hour (':30') and whole-hour zones, with and without
    fractional seconds — parsed back by parse_pg_timetz into
    (micro-since-midnight, ISO zone offset seconds), oracle-checked
    against the same arithmetic on the base columns. Shuffle-free.
    """
    from bottledwater_pg_spark.functions.pg_text import parse_pg_timetz

    c = _t(spark, sf_dir, "customer", parallel=True).select("c_custkey")
    k = F.col("c_custkey")
    zh = (k % 27) - 13  # signed whole hours
    zm = F.when(k % 2 == 0, F.lit(30)).otherwise(F.lit(0))
    built = c.select(
        "c_custkey",
        F.concat(
            F.lpad((k % 24).cast("string"), 2, "0"), F.lit(":"),
            F.lpad(((k * 11) % 60).cast("string"), 2, "0"), F.lit(":"),
            F.lpad(((k * 17) % 60).cast("string"), 2, "0"),
            F.when(
                k % 5 != 0,
                F.concat(F.lit("."),
                         F.lpad(((k % 997) * 1000).cast("string"), 6, "0")),
            ).otherwise(F.lit("")),
            F.when(zh < 0, F.lit("-")).otherwise(F.lit("+")),
            F.lpad(F.abs(zh).cast("string"), 2, "0"),
            F.when(zm > 0, F.concat(F.lit(":"), zm.cast("string")))
            .otherwise(F.lit("")),
        ).alias("txt"),
    )
    p = built.select("c_custkey", parse_pg_timetz("txt").alias("tz"))
    return p.select(
        "c_custkey",
        F.col("tz.micro").cast("long").alias("micro"),
        F.col("tz.zone_offset").cast("long").alias("zone_offset"),
    )


PG_TIMETZ_SQL = """
SELECT c_custkey,
       CAST(((c_custkey % 24) * 3600 + ((c_custkey * 11) % 60) * 60
             + ((c_custkey * 17) % 60)) * 1000000
            + CASE WHEN c_custkey % 5 = 0 THEN 0
                   ELSE (c_custkey % 997) * 1000 END
            AS BIGINT) AS micro,
       CAST(((c_custkey % 27) - 13) * 3600
            + CASE WHEN (c_custkey % 27) - 13 < 0 THEN -1 ELSE 1 END
              * CASE WHEN c_custkey % 2 = 0 THEN 30 ELSE 0 END * 60
            AS BIGINT) AS zone_offset
FROM customer
"""

QUERIES["pg_interval_roundtrip"] = pg_interval_roundtrip
ORACLES["pg_interval_roundtrip"] = PG_INTERVAL_SQL
QUERIES["pg_timetz_roundtrip"] = pg_timetz_roundtrip
ORACLES["pg_timetz_roundtrip"] = PG_TIMETZ_SQL


def pg_composite_enum_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG composite + enum + domain text round-trip as a driver query
    (the reference's generated corpus covers every visible pg_type —
    enum/composite/domain values arrive through the type's output
    function as text, oid2avro.c:317-349; corpus generator
    spec/bin/generate_type_specs.rb:30-45).

    Per customer a CANONICAL composite literal is built — a quoted
    field containing quotes/commas (internal quotes doubled), an
    unquoted numeric field, and an every-third-row NULL (empty) field
    — then parsed back by functions.pg_text.parse_pg_composite. An
    enum label (one of 5 pinned labels, a pure text value) rides the
    JSON envelope encode/decode, and a domain over int keeps its base
    value with the constraint evaluated as a flag. The oracle
    recomputes every output straight from the base columns, so any
    parser/quoting defect mismatches. Shuffle-free narrow projection.
    """
    from bottledwater_pg_spark.functions.pg_text import parse_pg_composite
    from bottledwater_pg_spark.plans.envelope import ROW_JSON_OPTIONS

    c = _t(spark, sf_dir, "customer", parallel=True).select("c_custkey", "c_name",
                                             "c_mktsegment")
    k = F.col("c_custkey")
    name_field = F.concat(
        F.lit('said "'), F.col("c_name"), F.lit('", seg ('),
        F.col("c_mktsegment"), F.lit(")"),
    )
    built = c.select(
        "c_custkey",
        F.concat(
            F.lit('("'),
            F.regexp_replace(name_field, '"', '""'),
            F.lit('",'),
            (k % 100).cast("string"),
            F.lit(","),
            F.when(k % 3 == 0, F.lit("")).otherwise(F.col("c_mktsegment")),
            F.lit(")"),
        ).alias("comp_txt"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ("sad", "ok", "happy", "angry", "meh")]),
            (k % 5 + 1).cast("int"),
        ).alias("mood"),
        ((k % 97) - 3).cast("int").alias("dom_val"),
    )
    parsed = built.select(
        "c_custkey",
        parse_pg_composite("comp_txt").alias("f"),
        # enum labels are plain text on the wire: prove the envelope
        # JSON round-trip is lossless for them
        F.from_json(
            F.to_json(F.struct(F.col("mood").alias("m")), ROW_JSON_OPTIONS),
            "m string",
            ROW_JSON_OPTIONS,
        )["m"].alias("enum_label"),
        "dom_val",
    )
    return parsed.select(
        "c_custkey",
        F.element_at("f", 1).alias("f_name"),
        F.element_at("f", 2).cast("long").alias("f_num"),
        F.element_at("f", 3).alias("f_seg"),
        F.size("f").cast("long").alias("n_fields"),
        "enum_label",
        # domain posint_domain: base value + constraint verdict
        F.col("dom_val").cast("long").alias("domain_value"),
        (F.col("dom_val") > 0).cast("long").alias("domain_ok"),
    )


PG_COMPOSITE_ENUM_SQL = """
SELECT c_custkey,
       'said "' || c_name || '", seg (' || c_mktsegment || ')' AS f_name,
       CAST(c_custkey % 100 AS BIGINT) AS f_num,
       CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS f_seg,
       CAST(3 AS BIGINT) AS n_fields,
       CASE c_custkey % 5 WHEN 0 THEN 'sad' WHEN 1 THEN 'ok'
            WHEN 2 THEN 'happy' WHEN 3 THEN 'angry' ELSE 'meh' END
         AS enum_label,
       CAST((c_custkey % 97) - 3 AS BIGINT) AS domain_value,
       CAST(CASE WHEN (c_custkey % 97) - 3 > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS domain_ok
FROM customer
"""

QUERIES["pg_composite_enum_roundtrip"] = pg_composite_enum_roundtrip
ORACLES["pg_composite_enum_roundtrip"] = PG_COMPOSITE_ENUM_SQL


# --------------------------------------- triangle counting (graph)

TRIANGLE_EDGE_BUDGET = 5000



def _strongest_tie_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared supplier co-occurrence graph: top TRIANGLE_EDGE_BUDGET
    strongest ties by shared-order count (ties broken by (a, b)),
    persisted — the one edge set the triangle census and the k-core
    decomposition both analyze (and the SQL twins both rebuild).
    orderBy+limit plans as TakeOrderedAndProject — the distributed
    top-k, never a single-partition global sort of the pair table.

    Pair generation folds each order's supplier set ONCE
    (``collect_set`` dedupes in-agg) and explodes the sorted pairs
    with an array transform — one (l_orderkey) shuffle feeding one
    (a, b) shuffle, replacing the old distinct + same-key self-join +
    agg chain (three data shuffles of the 600k-row lineitem
    projection). Safe because per-order supplier sets are tiny
    (<= 7 lineitems per order bounds |set|), so the per-row pair
    expansion is O(49) worst case — the same bound that kept the old
    self-join's fan-out in check, now without moving the rows twice."""
    from bottledwater_pg_spark.session import persist_tracked

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("sups")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(sups, (x, i) -> "
                "transform(slice(sups, i + 2, size(sups)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    weighted = pairs.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return persist_tracked(
        weighted.orderBy(F.desc("cnt"), "a", "b")
        .limit(TRIANGLE_EDGE_BUDGET)
        .select("a", "b")
    )


def supplier_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-occurrence graph (two
    suppliers are adjacent iff they serve the SAME order) — the
    clustering-coefficient numerator, the classic graph-analytics
    companion to PageRank for community/cohesion signals. Uses the
    degree-ordered node-iterator (:func:`operators.graph.
    triangle_counts`): each triangle is counted once at its
    lowest-(degree, id) vertex, and orientation bounds the wedge
    self-join by the oriented out-degree (O(sqrt(|E|)) on any graph)
    — the property that keeps the quadratic step tractable on a
    power-law graph at warehouse scale. Returns the top 20 suppliers
    by triangle participation plus the global triangle count.

    Edge build: per-order supplier sets are tiny (<= 7 lineitems per
    order), so the same-order self-join is bounded per order. Raw
    co-occurrence saturates toward the COMPLETE graph as orders
    accumulate (every supplier eventually shares some order with every
    other — measured: sf0.01's 100 suppliers form all 4,950 pairs), so
    the graph is the TOP-5000 STRONGEST ties by shared-order count
    (ties broken by (a, b)) — the standard sparsification for
    co-occurrence networks, which keeps the census on meaningful
    community structure and the wedge join bounded at every scale.
    """
    from bottledwater_pg_spark.operators.graph import triangle_counts

    pairs = _strongest_tie_pairs(spark, sf_dir)
    per_node = triangle_counts(pairs)
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    total = per_node.agg(
        (F.sum("n_triangles") / 3).cast("long").alias("total_triangles")
    )
    return (
        per_node.join(deg, "node")
        .crossJoin(F.broadcast(total))
        .select(
            "node", "n_triangles", "deg",
            # local clustering coefficient in basis points: closed
            # wedges at v / possible wedges at v (deg >= 2 whenever a
            # triangle exists, so the div is safe)
            F.expr(
                "n_triangles * 2 * 10000 div (deg * (deg - 1))"
            ).alias("clustering_bp"),
            "total_triangles",
        )
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


TRIANGLE_SQL = f"""
WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), weighted AS (
  SELECT x.l_suppkey AS a, y.l_suppkey AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM os x JOIN os y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_suppkey < y.l_suppkey
  GROUP BY x.l_suppkey, y.l_suppkey
), pairs AS (
  SELECT a, b FROM weighted
  ORDER BY cnt DESC, a, b LIMIT {TRIANGLE_EDGE_BUDGET}
), deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS n FROM pairs UNION ALL SELECT b AS n FROM pairs
  ) GROUP BY n
), oriented AS (
  SELECT CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND p.a < p.b)
              THEN p.a ELSE p.b END AS u,
         CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND p.a < p.b)
              THEN p.b ELSE p.a END AS v
  FROM pairs p
  JOIN deg da ON da.n = p.a
  JOIN deg db ON db.n = p.b
), wedges AS (
  SELECT w1.u, w1.v AS x, w2.v AS y
  FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u
  WHERE w1.v < w2.v
), closing AS (
  SELECT u AS x, v AS y FROM oriented
  UNION ALL
  SELECT v AS x, u AS y FROM oriented
), tri AS (
  SELECT w.u, w.x, w.y
  FROM wedges w JOIN closing c ON w.x = c.x AND w.y = c.y
), per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri
  ) GROUP BY node
), total AS (
  SELECT CAST(SUM(n_triangles) / 3 AS BIGINT) AS total_triangles
  FROM per_node
)
SELECT node, n_triangles, deg.deg AS deg,
       CAST(n_triangles * 2 * 10000 // (deg.deg * (deg.deg - 1))
            AS BIGINT) AS clustering_bp,
       total_triangles
FROM per_node JOIN deg ON deg.n = per_node.node, total
ORDER BY n_triangles DESC, node
LIMIT 20
"""

QUERIES["supplier_triangle_counts"] = supplier_triangle_counts
ORACLES["supplier_triangle_counts"] = TRIANGLE_SQL


KCORE_K = 6
# Convergence bound: the plain fixtures peel in <= 5 rounds; the x10
# scale-soak fixture (cross-replica stitched communities over a
# budget-thinned internal remnant, scale_fixtures.py) measures 10 —
# thinner graphs cascade DEEPER, so the bound carries margin over the
# deepest measured fixture. Extra unrolled rounds in the SQL twin are
# no-ops past the fixpoint.
KCORE_MAX_ROUNDS = 16


def supplier_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core backbone of the supplier co-occurrence graph
    (operators/graph.py kcore_members over the same top-5000
    strongest-tie edge set as the triangle census): peel every
    supplier with fewer than KCORE_K surviving strong ties until the
    fixpoint — the cohesion filter community mining and graph
    sampling apply before anything else. Returns every core member
    with its within-core degree; the member list plus degrees is the
    whole decomposition for one k. Peeling converges in <= 5 rounds
    here and in 10 on the stitched x10 soak fixture (both measured);
    the Spark side detects the fixpoint with a 1-row count per round
    and REFUSES past KCORE_MAX_ROUNDS, which is also exactly how many
    rounds the SQL twin unrolls (extra rounds are no-ops).
    """
    from bottledwater_pg_spark.operators.graph import kcore_members

    pairs = _strongest_tie_pairs(spark, sf_dir)
    return kcore_members(pairs, k=KCORE_K, max_rounds=KCORE_MAX_ROUNDS)


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_MAX_ROUNDS) -> str:
    """SQL twin: the identical peeling unrolled as chained CTEs —
    extra rounds past the fixpoint are no-ops, so a fixed unroll >= 
    the convergence depth replays the Spark loop exactly."""
    # AS MATERIALIZED everywhere: DuckDB inlines plain CTEs per
    # reference, and the unrolled peel references pairs/a{{r}} twice
    # per round — inlining would re-expand the whole chain
    # exponentially (observed as a too-many-open-files blowup on the
    # parquet scan)
    parts = [f"""
WITH os AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), weighted AS MATERIALIZED (
  SELECT x.l_suppkey AS a, y.l_suppkey AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM os x JOIN os y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_suppkey < y.l_suppkey
  GROUP BY x.l_suppkey, y.l_suppkey
), pairs AS MATERIALIZED (
  SELECT a, b FROM weighted
  ORDER BY cnt DESC, a, b LIMIT {TRIANGLE_EDGE_BUDGET}
), a0 AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
  )
)"""]
    for r in range(1, rounds + 1):
        prev = f"a{r - 1}"
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
    SELECT p.a AS node FROM pairs p
    JOIN {prev} x ON x.node = p.a JOIN {prev} y ON y.node = p.b
    UNION ALL
    SELECT p.b FROM pairs p
    JOIN {prev} x ON x.node = p.a JOIN {prev} y ON y.node = p.b
  ) GROUP BY node
),
a{r} AS MATERIALIZED (
  SELECT node FROM d{r} WHERE core_deg >= {k}
)""")
    parts.append(f"""
SELECT node, core_deg FROM d{rounds} WHERE core_deg >= {k}
""")
    return "".join(parts)


QUERIES["supplier_kcore"] = supplier_kcore
ORACLES["supplier_kcore"] = _kcore_sql()
