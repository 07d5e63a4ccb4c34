"""Optional Avro envelope encoding (E1) — gated exactly like the
reference's ``--output-format=avro`` vs ``json``
(/root/reference/kafka/bottledwater.c:54-61; JSON transcoding in
kafka/json.c).

This container ships Avro SQL functions but not the Avro *data source*
(the spark-avro jar), so ``to_avro``/``from_avro`` raise
AVRO_NOT_LOADED at execution time. The capability is detected once and
surfaced as a clear error; with the jar on the classpath these
functions light up unchanged.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@lru_cache(maxsize=1)
def avro_available() -> bool:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct("id"))
        ).collect()
        return True
    except Exception:
        return False


def encode_avro(col: Column) -> Column:
    """struct -> Avro binary, when the data source is loaded."""
    if not avro_available():
        raise NotImplementedError(
            "Avro output needs the spark-avro data source on the "
            "classpath (this image ships only avro-*.jar core); use the "
            "JSON envelope — the reference treats Avro-vs-JSON as a "
            "switchable output format too (bottledwater.c:54-61)"
        )
    from pyspark.sql.avro.functions import to_avro

    return to_avro(col)


def encode_rows(df: DataFrame, cols: list[str], out: str = "avro_bytes") -> DataFrame:
    return df.withColumn(out, encode_avro(F.struct(*cols)))


def decode_avro(col: Column, avro_schema_json: str) -> Column:
    """Avro binary -> struct, when the data source is loaded — the
    consumer-side half of the envelope (the reference's
    avro_binary_value decode, client/protocol_client.c:94-294)."""
    if not avro_available():
        raise NotImplementedError(
            "Avro decode needs the spark-avro data source on the "
            "classpath; this image ships only the core avro jars "
            "(see encode_avro)"
        )
    from pyspark.sql.avro.functions import from_avro

    return from_avro(col, avro_schema_json)
