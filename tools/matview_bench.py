"""Incremental-view-maintenance cost model, measured: refresh after a
small touched set vs the full recompute it replaces.

The matview claim (plans/matview.py) is that a refresh costs O(keys —
and, in scan I/O, DAYS — touched since the last refresh), not O(table):
the changelog prunes both as-of states to the touched keys and opens
only the touched keys' p_date partitions. This bench puts a number on
it with a realistically WIDE base tier (synthesized directly:
``sources × hours`` unique keys — a rollup of the synth raw table would
collapse to ~8.6k keys and fixed job overhead would swamp the signal),
then supersedes one day of one source block and measures the
incremental refresh against a from-scratch recompute of the view.

At 100 TB the ratio IS the feature: a continuous-aggregate pipeline
re-deriving a daily tier from 10^12 base rows on every late-data batch
scans and shuffles the whole table; the IVM path opens the touched
day's partition and shuffles the delta.

Deterministic input (spark.range arithmetic); no external data. Writes
MATVIEW_BENCH.json and prints one JSON line.

Usage: python tools/matview_bench.py [--sources 4096 --hours 1080 --cpus 8]
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


def _base(spark, sources: int, hours: int):
    """One row per (hour bucket, source): a dense wide stat tier."""
    n = sources * hours
    return spark.range(n).select(
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(hours=(F.col("id") % hours).cast("int"))
        ).alias("bucket_start"),
        F.concat(F.lit("s"), (F.col("id") / hours).cast("long")).alias("source"),
        (F.col("id") % 7 + 1).cast("long").alias("cnt"),
        (F.col("id") % 1000 + 10).cast("long").alias("sum_n_tok"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=4096)
    ap.add_argument("--hours", type=int, default=1080)  # 45 days
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/s1tiling_matview_bench")
    args = ap.parse_args()

    from s1tiling_spark.plans.matview import AdditiveMatView
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.session import build_session

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

    base = _base(spark, args.sources, args.hours)
    store.append("1h", base, store.next_commit_seq(), "b-full")
    total_keys = args.sources * args.hours

    t0 = time.monotonic()
    r0 = mv.refresh("mv-cold")
    cold_s = time.monotonic() - t0

    # touch ONE day of ~1 % of sources: supersede those keys
    hot_sources = max(1, args.sources // 100)
    touched_df = (
        _base(spark, args.sources, args.hours)
        .filter(
            (F.col("source").isin([f"s{i}" for i in range(hot_sources)]))
            & (F.col("bucket_start") < F.to_timestamp(F.lit("2024-01-02 00:00:00")))
        )
        .withColumn("cnt", F.col("cnt") + F.lit(5))
    )
    store.append("1h", touched_df, store.next_commit_seq(), "b-touch")
    touched_keys = hot_sources * min(24, args.hours)

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
        "sources": args.sources,
        "hours": args.hours,
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
