"""Standalone correctness gate: run every ``queries()`` entry against
its ``oracle_sql()`` twin (DuckDB) and print one JSON line per query
plus a summary — the same comparison the driver records in
CORRECTNESS_r{N}.json, runnable locally at any scale factor.

    python scripts/run_gate.py 2>/dev/null            # sf0.01
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python scripts/run_gate.py 2>/dev/null
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("gate")
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    queries, oracles = entry.queries(), entry.oracle_sql()
    n_ok = n_fail = n_rows_only = 0
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            if name not in oracles:
                status = "rows_only"
                n_rows_only += 1
                detail = f"{df.count()} rows"
            else:
                # the exact comparison the pytest gate uses (sorted
                # columns/rows, datetime-unit normalization, 1e-9 tol)
                from tests.conftest import assert_df_matches_oracle

                assert_df_matches_oracle(df, con, oracles[name])
                status, detail = "ok", f"{df.count()} rows"
                n_ok += 1
        except Exception as ex:  # noqa: BLE001 — report, keep gating
            status, detail = "fail", f"{type(ex).__name__}: {str(ex)[:160]}"
            n_fail += 1
        print(
            json.dumps(
                {
                    "query": name,
                    "status": status,
                    "detail": detail,
                    "sec": round(time.perf_counter() - t0, 3),
                }
            )
        )
    print(
        json.dumps(
            {"summary": {"ok": n_ok, "rows_only": n_rows_only, "fail": n_fail,
                         "sf_dir": SF_DIR}}
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
