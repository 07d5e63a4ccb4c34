"""Exact-hash correctness gate — stricter than run_gate.py.

The driver records an order-insensitive *value hash* of the Spark and
DuckDB results; any bitwise value difference (including int64 vs
float64 representation drift, e.g. DuckDB HUGEINT sums fetching as
float64) flips hash_match even when values are numerically equal.
This gate replicates that: canonical per-cell reprs, no tolerance,
dtype-kind must agree.

    python scripts/exact_gate.py 2>/dev/null            # sf0.01
    python scripts/exact_gate.py q1 shipmode 2>/dev/null  # name filter
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon_cell(v):
    """Canonical repr for hashing: floats by repr (bit-faithful for
    round-trippable doubles), NaN/None collapsed, datetimes in µs."""
    import math

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
        return "\x00NULL" if math.isnan(v) else ("f:%r" % v)
    if isinstance(v, float):
        return "f:%r" % v
    if isinstance(v, (np.integer,)):
        return "i:%d" % int(v)
    if isinstance(v, (int,)) and not isinstance(v, bool):
        return "i:%d" % v
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    if v is pd.NaT:
        return "\x00NULL"
    return type(v).__name__[:1] + ":" + str(v)


def frame_rows(df):
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    rows = [tuple(canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return cols, rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from bottledwater_pg_spark.session import get_spark

    name_filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_spark("exact-gate")
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    queries, oracles = entry.queries(), entry.oracle_sql()
    n_ok = n_fail = n_rows_only = 0
    for name in sorted(queries):
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            if name not in oracles:
                status, detail = "rows_only", f"{df.count()} rows"
                n_rows_only += 1
            else:
                mc, mrows = frame_rows(df.toPandas())
                oc, orows = frame_rows(con.sql(oracles[name]).df())
                if mc != oc:
                    status, detail = "fail", f"cols {mc} vs {oc}"
                    n_fail += 1
                elif len(mrows) != len(orows):
                    status, detail = "fail", f"rows {len(mrows)} vs {len(orows)}"
                    n_fail += 1
                elif mrows != orows:
                    diff = next(
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(mrows, orows))
                        if a != b
                    )
                    status = "fail"
                    detail = f"value diff at sorted row {diff[0]}: {diff[1]} vs {diff[2]}"[:300]
                    n_fail += 1
                else:
                    status, detail = "ok", f"{len(mrows)} rows"
                    n_ok += 1
        except Exception as ex:  # noqa: BLE001 — report, keep gating
            status, detail = "fail", f"{type(ex).__name__}: {str(ex)[:200]}"
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
        sys.stdout.flush()
    print(json.dumps({"summary": {"ok": n_ok, "rows_only": n_rows_only, "fail": n_fail, "sf_dir": SF_DIR}}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
