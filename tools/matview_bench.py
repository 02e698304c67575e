"""Incremental-view-maintenance cost model, measured: refresh after a
small touched set vs the full recompute it replaces.

The matview claim (plans/matview.py) is that a refresh costs
O(keys touched since the last refresh), not O(table): the changelog
prunes both as-of states to the touched keys before the diff. This
bench puts a number on it — append a base tier of N rows, refresh
(cold, = the full aggregate), then supersede a ~1 % slice and measure
the incremental refresh against a from-scratch recompute of the view.

At 100 TB the ratio IS the feature: a continuous-aggregate pipeline
re-deriving a daily tier from 10^12 base rows on every late-data batch
is a full-table shuffle per batch; the IVM path shuffles only the
touched keys' delta.

Deterministic input via sources.synth; no external data. Writes
MATVIEW_BENCH.json and prints a PERF.md-ready block.

Usage: python tools/matview_bench.py [--rows 4000000 --cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/s1tiling_matview_bench")
    args = ap.parse_args()

    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.plans.matview import AdditiveMatView
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.session import build_session
    from s1tiling_spark.sources.synth import synth_sequences

    spark = build_session(
        master=f"local[{args.cpus}]",
        app_name="matview-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    shutil.rmtree(args.dir, ignore_errors=True)
    store = TierStore(spark, args.dir)
    mv = AdditiveMatView(
        store,
        name="daily",
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("day", F.col("bucket_start")),
            "source": F.col("source"),
        },
        sum_cols=("cnt", "sum_n_tok"),
    )

    seq = synth_sequences(spark, args.rows, with_tokens=False)
    base = rollup_sequences(seq, "1h").select(
        "bucket_start", "source", "cnt", "sum_n_tok"
    )
    store.append("1h", base, store.next_commit_seq(), "b-full")
    total_keys = store.read("1h").count()

    t0 = time.monotonic()
    r0 = mv.refresh("mv-cold")
    cold_s = time.monotonic() - t0

    # touch ~1 %: supersede one source inside a 12-hour event window
    touched_df = (
        store.read("1h")
        .filter(
            (F.col("source") == "src_3")
            & (F.col("bucket_start") < F.to_timestamp(F.lit("2024-01-01 12:00:00")))
        )
        .select("bucket_start", "source", "cnt", "sum_n_tok")
        .withColumn("cnt", F.col("cnt") + F.lit(5))
    )
    touched_keys = touched_df.count()
    store.append("1h", touched_df, store.next_commit_seq(), "b-touch")

    t1 = time.monotonic()
    r1 = mv.refresh("mv-incr")
    incr_s = time.monotonic() - t1

    # the alternative the matview replaces: recompute the view from the
    # base's full current state (same plan as the cold refresh)
    t2 = time.monotonic()
    full = (
        store.read("1h")
        .groupBy(
            F.date_trunc("day", F.col("bucket_start")).alias("bucket_start"),
            "source",
        )
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum_n_tok").alias("sum_n_tok"))
    )
    full_rows = full.count()
    full_s = time.monotonic() - t2

    out = {
        "rows": args.rows,
        "cpus": args.cpus,
        "base_keys_total": int(total_keys),
        "touched_keys": int(touched_keys),
        "touched_pct": round(100.0 * touched_keys / max(total_keys, 1), 3),
        "cold_refresh_s": round(cold_s, 2),
        "cold_refresh_rows": r0["rows"],
        "incremental_refresh_s": round(incr_s, 2),
        "incremental_delta_rows": r1["rows"],
        "full_recompute_s": round(full_s, 2),
        "full_recompute_rows": int(full_rows),
        "speedup_vs_full": round(full_s / max(incr_s, 1e-9), 2),
    }
    with open(os.path.join(REPO, "MATVIEW_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
