"""UDF / UDAF / UDTF surface coverage (SURVEY §2.2 last row): Python
UDTFs, grouped-aggregate pandas UDFs, and scalar pandas UDFs all work
against the engine's tables. These stay out of the oracle gate (float
parity / per-engine semantics) but pin the API surface."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bottledwater_pg_spark.session import load_table


def test_python_udtf_chunker(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, part: int, piece: string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            for i, start in enumerate(range(0, len(text), 100)):
                yield doc_id, i, text[start : start + 100]

    docs = load_table(spark, sf_dir, "documents").limit(20)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("chunker", Chunker)
    out = spark.sql(
        "SELECT c.* FROM udtf_docs, LATERAL chunker(doc_id, text) c"
    )
    pdf = out.toPandas()
    assert len(pdf) >= 20
    assert (pdf.groupby("doc_id")["part"].min() == 0).all()
    # chunks reassemble to the original text
    one = pdf[pdf.doc_id == pdf.doc_id.iloc[0]].sort_values("part")
    original = (
        docs.filter(F.col("doc_id") == int(one.doc_id.iloc[0]))
        .collect()[0]["text"]
    )
    assert "".join(one.piece) == original


def test_grouped_agg_pandas_udf(spark, sf_dir):
    @F.pandas_udf("double")
    def mid_range(v: pd.Series) -> float:
        return float((v.max() + v.min()) / 2)

    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderstatus"]: r["mid"]
        for r in orders.groupBy("o_orderstatus")
        .agg(mid_range("o_totalprice").alias("mid"))
        .collect()
    }
    exact = {
        r["o_orderstatus"]: (r["mx"] + r["mn"]) / 2
        for r in orders.groupBy("o_orderstatus")
        .agg(F.max("o_totalprice").alias("mx"), F.min("o_totalprice").alias("mn"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in got:
        assert abs(got[k] - exact[k]) < 1e-9


def test_scalar_pandas_udf_vectorized(spark, sf_dir):
    @F.pandas_udf("double")
    def clamp(v: pd.Series) -> pd.Series:
        return v.clip(lower=0.0)

    cust = load_table(spark, sf_dir, "customer")
    neg = cust.filter(F.col("c_acctbal") < 0).count()
    clamped = cust.select(clamp("c_acctbal").alias("b"))
    assert clamped.filter(F.col("b") < 0).count() == 0
    assert clamped.filter(F.col("b") == 0).count() >= neg


def test_grouped_map_apply_in_pandas_matches_builtin_agg(spark, sf_dir):
    """Grouped-map applyInPandas (Arrow batch per group): per-status
    order stats from pandas must equal the built-in aggregate."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "n": [len(pdf)],
                "total": [float(pdf["o_totalprice"].sum().round(2))],
            }
        )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    got = {
        r["o_orderstatus"]: (r["n"], r["total"])
        for r in orders.groupBy("o_orderstatus")
        .applyInPandas(stats, "o_orderstatus string, n long, total double")
        .collect()
    }
    exact = {
        r["o_orderstatus"]: (r["n"], float(r["total"]))
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            ).cast("double").alias("total"),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in got:
        assert got[k][0] == exact[k][0]
        assert abs(got[k][1] - exact[k][1]) < 1e-6


def test_cogrouped_apply_in_pandas_merge_asof(spark, sf_dir):
    """Cogrouped applyInPandas: per-user pd.merge_asof over the
    (clicks, purchases) cogroup must equal the engine's window-based
    as-of join — the escape hatch for per-key pandas logic the
    DataFrame API can't express, validated against the operator that
    CAN express it."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # GOTCHA: when both cogroup sides derive from the same scan, the
    # shared attribute ids make Spark mis-prune the right side's
    # columns (the UDF receives only the grouping key) — alias the
    # right side to fresh names to break the collision
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
    )

    def asof(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(r):
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "click_event_id": []}
            )
        p = r.sort_values(["p_ts", "p_event_id"]).rename(
            columns={"p_ts": "ts"}
        )
        if not len(l):
            return pd.DataFrame(
                {
                    "event_id": p["p_event_id"],
                    "user_id": p["p_user_id"],
                    "click_event_id": float("nan"),
                }
            )
        c = l.sort_values(["ts", "event_id"])
        m = pd.merge_asof(
            p, c, on="ts", direction="backward", suffixes=("", "_c")
        )
        return pd.DataFrame(
            {
                "event_id": m["p_event_id"],
                "user_id": m["p_user_id"],
                "click_event_id": m["event_id"],
            }
        )

    got = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("p_user_id"))
        .applyInPandas(
            asof, "event_id long, user_id long, click_event_id double"
        )
    )
    from bottledwater_pg_spark.operators.queries import asof_purchase_to_click

    want = (
        asof_purchase_to_click(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id", F.col("click_event_id").cast("double"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
