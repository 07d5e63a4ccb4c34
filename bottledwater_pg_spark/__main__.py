"""CLI for the engine: list/run driver-contract queries, show plans.

Usage (from the repo root):

    python -m bottledwater_pg_spark list
    python -m bottledwater_pg_spark run q1_pricing_summary [--sf-dir DIR] [-n 20]
    python -m bottledwater_pg_spark plan q1_pricing_summary [--sf-dir DIR]
    python -m bottledwater_pg_spark export '%' --out /tmp/frames \\
        [--sf-dir DIR] [--allow-unkeyed] [--topic-prefix P]
    python -m bottledwater_pg_spark sql "SELECT count(*) FROM lineitem" \\
        [--sf-dir DIR] [-n 20]

The reference's equivalent surface is the ``bwtest`` monitoring binary
(client/bwtest.c) plus ``bottledwater --help``; here the query plane is
the product, so the CLI fronts the same ``queries()`` registry the
driver gate checks.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bottledwater_pg_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list every driver-contract query")
    for name in ("run", "plan"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument(
            "--sf-dir", default=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            )
        )
        if name == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    pe = sub.add_parser(
        "export",
        help="one-call snapshot export (the bottledwater_export analog): "
        "write the envelope frame stream of every LIKE-matching table",
    )
    pe.add_argument("pattern", nargs="?", default="%")
    pe.add_argument("--out", required=True, help="output parquet directory")
    pe.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )
    pe.add_argument("--allow-unkeyed", action="store_true")
    pe.add_argument("--topic-prefix", default=None)
    pp = sub.add_parser(
        "replicate",
        help="the bottledwater main loop: catalog scan -> CDC stream -> "
        "error policy -> per-table materialized state (parquet per table)",
    )
    pp.add_argument("pattern", nargs="?", default="%")
    pp.add_argument("--out", required=True, help="state output directory")
    pp.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )
    pp.add_argument("--allow-unkeyed", action="store_true")
    pp.add_argument("--skip-snapshot", action="store_true")
    pp.add_argument("--topic-prefix", default=None)
    pp.add_argument("--on-error", choices=["exit", "log"], default="exit")
    pp.add_argument(
        "--stream", action="store_true",
        help="run micro-batched through the checkpointed "
        "MultiTableMaterializer instead of one batch pass",
    )
    pr = sub.add_parser(
        "serve-registry",
        help="run the Confluent-compatible schema-registry HTTP "
        "server over a local state dir (registry.c:93-138 wire; "
        "producers/consumers point HttpSchemaRegistry at the URL)",
    )
    pr.add_argument("--state-dir", required=True)
    pr.add_argument("--host", default="127.0.0.1")
    pr.add_argument("--port", type=int, default=8081)
    ps = sub.add_parser(
        "sql",
        help="run ad-hoc SQL with every fixture table registered as a "
        "temp view (the switch-over surface: any query a reference "
        "consumer runs downstream runs here verbatim)",
    )
    ps.add_argument("statement")
    ps.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    )
    ps.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    if args.cmd == "serve-registry":
        from bottledwater_pg_spark.sources.registry_http import (
            serve_registry,
        )

        server, url = serve_registry(
            args.state_dir, host=args.host, port=args.port
        )
        print(f"schema registry serving at {url} (Ctrl-C to stop)")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entry

    queries = entry.queries()
    if args.cmd == "list":
        oracles = entry.oracle_sql()
        for name in sorted(queries):
            tag = "oracle" if name in oracles else "rows-only"
            print(f"{name:40s} [{tag}]")
        return 0

    if args.cmd == "sql":
        from bottledwater_pg_spark.session import get_spark, register_tables

        spark = get_spark("bottledwater-sql")
        register_tables(spark, args.sf_dir)
        df = spark.sql(args.statement)
        df.show(args.n, truncate=False)
        return 0

    if args.cmd == "replicate":
        from bottledwater_pg_spark.pipeline import replicate_database
        from bottledwater_pg_spark.session import get_spark

        spark = get_spark("bottledwater-replicate")
        results = replicate_database(
            spark,
            args.sf_dir,
            args.out,
            pattern=args.pattern,
            allow_unkeyed=args.allow_unkeyed,
            skip_snapshot=args.skip_snapshot,
            topic_prefix=args.topic_prefix,
            on_error=args.on_error,
            stream=args.stream,
        )
        for name, n in sorted(results.items()):
            print(f"{name:20s} {n} rows")
        return 0

    if args.cmd == "export":
        from bottledwater_pg_spark.session import get_spark
        from bottledwater_pg_spark.sources.catalog import export_snapshot

        spark = get_spark("bottledwater-export")
        frames = export_snapshot(
            spark,
            args.sf_dir,
            args.pattern,
            allow_unkeyed=args.allow_unkeyed,
            topic_prefix=args.topic_prefix,
        )
        frames.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"wrote {n} frames to {args.out}")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("bottledwater-cli")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.n, truncate=False)
    else:
        from bottledwater_pg_spark.plans.inspect import formatted_plan

        print(formatted_plan(df))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
