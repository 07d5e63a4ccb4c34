"""End-to-end CDC replication — the switch-over story for a reference
user, composed entirely from this engine's operators:

  1. CAPTURE    deterministic CDC stream for `customer` (snapshot
                phase + updates/deletes/PK-changes + txn markers —
                everything the reference's WAL decoder emits)
  2. REPLICATE  the stream replayed through Structured Streaming
                (file source, one file per trigger) into the
                foreachBatch materializer: checkpointed, idempotent,
                exactly-once effective
  3. VERIFY     replica-consistency digest (order-independent
                count/xor/sum checksum) of the streamed state MUST
                equal the digest of direct batch materialization —
                the "is the replica right?" check, three scalars,
                no data movement
  4. PUBLISH    the verified state encoded as the reference's actual
                wire bytes: Confluent-framed Avro binary key/value
                pairs (pure-Python codec, spec-pinned)

Run:  python examples/cdc_replication.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_digest(state: DataFrame, cols: list[str]) -> dict:
    """Order-independent (count, xor, bounded-sum) digest over a
    canonical row rendering — commutative aggregates, so ANY replica
    partitioning/order yields identical scalars."""
    rendered = [
        F.col(c).cast("decimal(18,2)") if c == "c_acctbal" else F.col(c)
        for c in cols
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", *rendered)), 1, 12), 16, 10
    ).cast("long")
    row = state.select(h.alias("h")).agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(h)").alias("x"),
        F.sum(F.col("h") % F.lit(1 << 30)).alias("s"),
    ).first()
    return {"n": row["n"], "xor": row["x"], "sum": row["s"]}


def run(spark: SparkSession, sf_dir: str) -> dict:
    from bottledwater_pg_spark.operators.cdc_queries import (
        CUSTOMER_COLS,
        customer_cdc,
    )
    from bottledwater_pg_spark.operators.materialize import materialize
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.avro_codec import (
        avro_fields_for,
        avro_frames,
        decode_frames,
    )
    from bottledwater_pg_spark.streaming.stream import (
        StreamingMaterializer,
        read_envelope_stream,
        write_envelope_stream,
    )

    cust = load_table(spark, sf_dir, "customer")
    events = customer_cdc(spark, sf_dir)

    # batch materialization = the ground truth the replica must match
    direct = materialize(events, cust.schema)
    want = state_digest(direct, CUSTOMER_COLS)

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events"
        write_envelope_stream(events, src, num_files=5)
        stream = read_envelope_stream(spark, src, files_per_trigger=1)
        mat = StreamingMaterializer(spark, f"{tmp}/state", cust.schema)
        q = mat.start(stream, f"{tmp}/ckpt")
        q.processAllAvailable()
        q.stop()
        replica = mat.current_rows()
        got = state_digest(replica, CUSTOMER_COLS)
        verified = got == want

        frames = avro_frames(replica, ["c_custkey"], CUSTOMER_COLS)
        key_f = avro_fields_for(replica.schema, ["c_custkey"])
        val_f = avro_fields_for(replica.schema, CUSTOMER_COLS)
        decoded_back = decode_frames(frames, key_f, val_f)
        n_frames = frames.count()
        n_decoded = decoded_back.count()

    return {
        "digest_direct": want,
        "digest_replica": got,
        "verified": verified,
        "n_frames": n_frames,
        "n_decoded": n_decoded,
    }


def main() -> None:
    from bottledwater_pg_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cdc-replication")
    out = run(spark, sf_dir)
    print("direct  digest:", out["digest_direct"])
    print("replica digest:", out["digest_replica"])
    print("verified:", out["verified"])
    print(f"published {out['n_frames']} avro frames, "
          f"{out['n_decoded']} decoded back")


if __name__ == "__main__":
    main()
