"""Long-stream state-compaction soak: drive a sliced streaming index
for hundreds of micro-batches WITH and WITHOUT periodic folding and
record (a) the slice-directory count trajectory and (b) per-epoch
process_batch wall time. The unfolded run's probe cost grows with
epoch count — every probe re-lists every prior (run, epoch) directory
— while the folded run's directory count is bounded by
epochs-since-last-fold and its per-epoch wall stays flat. This is the
falsifiable form of the r10 verdict's scale-killer concern (a
week-long stream at one batch/s accumulates ~600k slice dirs).

The driven index is StreamingSourceQuotaIndex: its probe is the
cheapest of the four (one window rank + one budget count), so
per-epoch wall isolates the slice-machinery overhead the fold is
supposed to bound rather than operator compute. The fold/probe
machinery is the shared _SlicedDedupIndexBase — what holds here holds
for all four index classes.

    python scripts/fold_soak.py [n_epochs] [fold_every] 2>/dev/null

Results recorded in SCALE.md (r11).

r12 extension: a third run drives the TIERED fold mode (l1_max) with
per-fold write instrumentation on both folding runs — every tier
write's on-disk bytes are recorded, so the soak can show the one-tier
fold's per-fold write growing with standing state (it rewrites the
full base each fold) while the tiered run's minor folds stay
delta-sized with only the amortized major merges touching O(state).
That is the falsifiable form of the r11 verdict's remaining
compaction cost concern. Accepted sets must stay identical across all
three runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 240
FOLD_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 40
L1_MAX = int(sys.argv[3]) if len(sys.argv) > 3 else 6
BATCH_ROWS = int(os.environ.get("FOLD_SOAK_BATCH_ROWS", "30"))
BASE_BUCKETS = int(os.environ.get("FOLD_SOAK_BUCKETS", "8"))
N_SOURCES = 10


def window_p50(xs: list[float], lo: int, hi: int) -> float | None:
    w = sorted(xs[lo:hi])
    return round(w[len(w) // 2], 3) if w else None


def instrument_tier_writes(idx, ledger: list) -> None:
    """Record the on-disk bytes of every tier write (base or L1) the
    index performs — the write-amplification the tiered fold exists
    to bound. Wraps _write_slice; live per-epoch slice writes are not
    tier writes and are skipped."""
    from bottledwater_pg_spark.streaming.stream import (
        BASE_RUN_KEY,
        L1_RUN_KEY,
        _is_tier_run,
    )

    orig = idx._write_slice

    def wrapped(df, name, epoch_id, run=None):
        orig(df, name, epoch_id, run=run)
        if run is None or not _is_tier_run(run):
            return
        d = os.path.join(
            idx._path(name), f"run={run}", f"epoch={epoch_id}"
        )
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )
        tier = (
            "base" if run == BASE_RUN_KEY
            else "l1" if run == L1_RUN_KEY
            else "bucket"
        )
        ledger.append(
            {"epoch": epoch_id, "root": name, "tier": tier,
             "bytes": nbytes}
        )

    idx._write_slice = wrapped


def fold_write_summary(ledger: list) -> dict:
    """Per-fold total tier-write bytes (all roots), split by tier."""
    per_fold: dict[int, dict[str, int]] = {}
    for w in ledger:
        slot = per_fold.setdefault(
            w["epoch"], {"base": 0, "l1": 0, "bucket": 0}
        )
        slot[w["tier"]] += w["bytes"]
    folds = sorted(per_fold)
    minor = [per_fold[e]["l1"] for e in folds if per_fold[e]["l1"]]
    base = [per_fold[e]["base"] for e in folds if per_fold[e]["base"]]
    buck = [
        per_fold[e]["bucket"] for e in folds if per_fold[e]["bucket"]
    ]
    per_fold_bytes = [
        per_fold[e]["base"] + per_fold[e]["l1"] + per_fold[e]["bucket"]
        for e in folds
    ]
    out = {
        "fold_epochs": folds,
        "per_fold_bytes": per_fold_bytes,
        "max_single_fold_bytes": max(per_fold_bytes) if folds else 0,
        "total_tier_write_bytes": sum(
            w["bytes"] for w in ledger
        ),
        "n_base_writes": len(base),
        "n_l1_writes": len(minor),
        "n_bucket_writes": len(buck),
    }
    if buck:
        out["max_bucket_write_bytes"] = max(buck)
    if minor:
        out["minor_write_bytes_first_vs_last"] = round(
            minor[-1] / minor[0], 3
        )
    if base:
        out["base_write_bytes_first_vs_last"] = round(
            base[-1] / base[0], 3
        )
    return out


def main() -> int:
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.session import get_spark
    from bottledwater_pg_spark.streaming.stream import (
        StreamingSourceQuotaIndex,
    )

    spark = get_spark("fold_soak")
    spark.range(1).count()

    base = tempfile.mkdtemp(prefix="fold_soak_")
    out: dict = {
        "n_epochs": N_EPOCHS,
        "fold_every": FOLD_EVERY,
        "l1_max": L1_MAX,
        "batch_rows": BATCH_ROWS,
    }
    try:
        # synthetic id-ordered batches: epoch e carries docs
        # [e*B, (e+1)*B) over a fixed source set; a huge cap keeps
        # budgets open so every epoch exercises the full probe path
        def batch(e: int):
            return (
                spark.range(e * BATCH_ROWS, (e + 1) * BATCH_ROWS)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat(
                        F.lit("src"), (F.col("id") % N_SOURCES)
                    ).alias("source"),
                    F.concat(F.lit("document body number "), "id").alias(
                        "text"
                    ),
                )
            )

        runs = {}
        for label, fold, l1, buckets in (
            ("folded", FOLD_EVERY, None, None),
            ("tiered", FOLD_EVERY, L1_MAX, None),
            ("bucketed", FOLD_EVERY, L1_MAX, BASE_BUCKETS),
            ("unfolded", None, None, None),
        ):
            state = os.path.join(base, label)
            idx = StreamingSourceQuotaIndex(
                spark, state, cap=10**9, fold_every=fold, l1_max=l1,
                base_buckets=buckets,
            )
            write_ledger: list = []
            if fold is not None:
                instrument_tier_writes(idx, write_ledger)
            epoch_sec: list[float] = []
            dir_counts: list[int] = []
            for e in range(N_EPOCHS):
                t0 = time.perf_counter()
                idx.process_batch(batch(e), e)
                epoch_sec.append(time.perf_counter() - t0)
                if (e + 1) % FOLD_EVERY == 0:
                    dir_counts.append(idx.slice_dir_count())
            q = N_EPOCHS // 4
            rec = {
                "p50_first_quarter_sec": window_p50(epoch_sec, 0, q),
                "p50_second_quarter_sec": window_p50(epoch_sec, q, 2 * q),
                "p50_third_quarter_sec": window_p50(
                    epoch_sec, 2 * q, 3 * q
                ),
                "p50_last_quarter_sec": window_p50(
                    epoch_sec, 3 * q, N_EPOCHS
                ),
                "slice_dirs_every_fold_window": dir_counts,
                "final_slice_dirs": idx.slice_dir_count(),
                "accepted_rows": idx.accepted_ids().count(),
            }
            if write_ledger:
                rec["tier_writes"] = fold_write_summary(write_ledger)
            runs[label] = rec
            print(json.dumps({label: rec}), flush=True)
        # the fold must not change a single decision
        runs["accepted_sets_equal"] = (
            runs["folded"]["accepted_rows"]
            == runs["tiered"]["accepted_rows"]
            == runs["bucketed"]["accepted_rows"]
            == runs["unfolded"]["accepted_rows"]
            == N_EPOCHS * BATCH_ROWS
        )
        # write-amplification verdict: one-tier folds rewrite the
        # full base, so their per-fold bytes grow with standing state;
        # tiered MINOR folds must stay delta-sized (ratio ~1)
        ft = runs["folded"]["tier_writes"]
        tt = runs["tiered"]["tier_writes"]
        bt = runs["bucketed"]["tier_writes"]
        out["onetier_fold_write_growth"] = ft.get(
            "base_write_bytes_first_vs_last"
        )
        out["tiered_minor_write_growth"] = tt.get(
            "minor_write_bytes_first_vs_last"
        )
        out["tiered_vs_onetier_total_write_bytes"] = round(
            tt["total_tier_write_bytes"]
            / ft["total_tier_write_bytes"],
            3,
        )
        # the bounded-pause verdict: the bucketed run's single biggest
        # fold write vs the monolithic major's (should be ~1/P + L1),
        # and its total amplification vs one-tier
        out["bucketed_vs_tiered_max_single_fold"] = round(
            bt["max_single_fold_bytes"] / tt["max_single_fold_bytes"],
            3,
        )
        out["bucketed_vs_onetier_total_write_bytes"] = round(
            bt["total_tier_write_bytes"]
            / ft["total_tier_write_bytes"],
            3,
        )
        out.update(runs)
        out["probe_flatness_folded_last_vs_first"] = round(
            runs["folded"]["p50_last_quarter_sec"]
            / runs["folded"]["p50_first_quarter_sec"],
            3,
        )
        out["probe_growth_unfolded_last_vs_first"] = round(
            runs["unfolded"]["p50_last_quarter_sec"]
            / runs["unfolded"]["p50_first_quarter_sec"],
            3,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"fold_soak": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
