"""Per-query profiling harness for the optimization rounds (guide §1).

For each requested query (default: every BENCH_QUERIES entry) it
records, after one untimed warmup execution:

- build_sec: wall time of ``queries[name](spark, sf_dir)`` — driver-side
  plan construction (py4j chatter, any eager control actions the
  builder runs: registry collects, training rounds, fixpoint loops)
- exec_sec: wall time of the noop-sink write (guide §1.4)
- jobs/stages/tasks: how many Spark jobs/stages/tasks the TIMED exec
  ran (status-tracker delta) — the fixed-overhead axis at bench scale
- exchanges / broadcast joins / python-eval nodes counted from the
  executed plan

One JSON line per query + a sorted summary at the end; detail file to
PROFILE_LOCAL_latest.json.

    python scripts/profile_queries.py 2>/dev/null             # all
    python scripts/profile_queries.py winnow ivfpq 2>/dev/null  # filter
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_counts(df) -> dict:
    from bottledwater_pg_spark.plans.inspect import formatted_plan

    plan = formatted_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "smj": plan.count("SortMergeJoin"),
        "python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow"),
    }


def main() -> None:
    import __spark_entry__ as entry
    from bottledwater_pg_spark.session import get_spark
    import bench

    name_filters = sys.argv[1:]
    spark = get_spark("profile")
    sc = spark.sparkContext
    queries = entry.queries()
    names = [
        n
        for n in bench.BENCH_QUERIES
        if not name_filters or any(f in n for f in name_filters)
    ]

    out: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        # warmup (untimed): JIT/codegen/page-cache, mirrors bench.py
        try:
            queries[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(json.dumps({"query": name, **out[name]}), flush=True)
            continue
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        jobs_before = sc.statusTracker().getJobIdsForGroup(None)
        n_jobs0 = len(jobs_before)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(None)
        new_jobs = job_ids[n_jobs0:] if len(job_ids) > n_jobs0 else []
        n_stages = n_tasks = 0
        for jid in new_jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        rec = {
            "build_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "total_sec": round(t2 - t0, 3),
            "exec_jobs": len(new_jobs),
            "exec_stages": n_stages,
            "exec_tasks": n_tasks,
            **plan_counts(df),
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        sc.setJobDescription(None)

    ranked = sorted(
        ((n, r) for n, r in out.items() if "total_sec" in r),
        key=lambda kv: -kv[1]["total_sec"],
    )
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "total_sec": round(sum(r.get("total_sec", 0) for r in out.values()), 2),
        "build_sec_sum": round(
            sum(r.get("build_sec", 0) for r in out.values()), 2
        ),
        "exec_sec_sum": round(
            sum(r.get("exec_sec", 0) for r in out.values()), 2
        ),
        "top15": {n: r["total_sec"] for n, r in ranked[:15]},
    }
    print(json.dumps(summary))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PROFILE_LOCAL_latest.json",
        ),
        "w",
    ) as fh:
        json.dump({"summary": summary, "queries": out}, fh, indent=1)


if __name__ == "__main__":
    main()
