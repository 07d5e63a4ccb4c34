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
BATCH_ROWS = 30
N_SOURCES = 10


def window_p50(xs: list[float], lo: int, hi: int) -> float | None:
    w = sorted(xs[lo:hi])
    return round(w[len(w) // 2], 3) if w else None


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
        for label, fold in (("folded", FOLD_EVERY), ("unfolded", None)):
            state = os.path.join(base, label)
            idx = StreamingSourceQuotaIndex(
                spark, state, cap=10**9, fold_every=fold
            )
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
            runs[label] = rec
            print(json.dumps({label: rec}), flush=True)
        # the fold must not change a single decision
        runs["accepted_sets_equal"] = (
            runs["folded"]["accepted_rows"]
            == runs["unfolded"]["accepted_rows"]
            == N_EPOCHS * BATCH_ROWS
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
