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
