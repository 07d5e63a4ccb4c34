"""Isolated re-time harness for bench watch items (memory discipline:
re-run and re-time on matched controls before believing a regression).

Runs the three round-1 control queries plus the named watch queries,
each warmed once then timed N passes (alternating order), in an
otherwise-quiet Spark session. Prints one JSON line per query with all
samples, min, and the min normalized by this run's own control ratio —
directly comparable to prior rounds' normalized numbers.

Usage: python scripts/retime_isolated.py [query ...]  (default: the
round-10 watch pair). SPARK_GRAFT_SF_DIR selects the scale.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONTROLS_R01 = {
    "cdc_materialize_customer": 0.846,
    "q1_pricing_summary": 0.749,
    "pii_redaction_stats": 0.269,
}
DEFAULT_WATCH = ["bloom_contamination_screen", "supplier_kcore"]
PASSES = 5


def main() -> None:
    watch = sys.argv[1:] or DEFAULT_WATCH
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from bottledwater_pg_spark.session import get_spark

    spark = get_spark("retime-isolated")
    queries = entry.queries()
    names = list(CONTROLS_R01) + watch

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    for name in names:  # warmup: JIT + codegen + page cache
        run(name)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for i in range(PASSES):
        order = names if i % 2 == 0 else list(reversed(names))
        for name in order:
            samples[name].append(run(name))

    ratios = sorted(
        min(samples[n]) / r01 for n, r01 in CONTROLS_R01.items()
    )
    host_ratio = round(ratios[len(ratios) // 2], 3)
    out = {"sf_dir": sf_dir, "passes": PASSES, "host_ratio": host_ratio}
    print(json.dumps(out))
    for name in names:
        mn = min(samples[name])
        print(json.dumps({
            "query": name,
            "samples": samples[name],
            "min": mn,
            "min_normalized": round(mn / host_ratio, 3),
        }))


if __name__ == "__main__":
    main()
