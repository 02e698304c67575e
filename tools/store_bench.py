"""TierStore write/read/compact throughput: the MERGE-on-read cost
model, measured.

The store's design trades write-path simplicity (blind appends, one
commit_seq per batch) for a read-side window rank and periodic
compaction — Iceberg's merge-on-read vs copy-on-write trade. This
bench puts numbers on each leg so the 100 TB capacity plan
(PERF.md §7) rests on measurements, not assertions:

1. append throughput: K incremental commits of the 1h rollup, each
   overlapping the previous (late data) so row versions accumulate;
2. merge-read cost: deduped read (window rank over versions) vs the
   raw scan, before compaction — the read tax appends accrue;
3. compact: clustered rewrite (sort-order on (source, bucket_start));
4. post-compact merge-read: the tax after the rewrite (the window
   rank survives — correctness — but over 1 version per key).

Deterministic input via sources.synth; no external data. Writes
STORE_BENCH.json and appends a PERF.md-ready block to stdout.

Usage: python tools/store_bench.py [--rows 2000000 --commits 8 --cpus 8]
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
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--commits", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/s1tiling_store_bench")
    args = ap.parse_args()

    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.session import build_session
    from s1tiling_spark.sources.synth import synth_sequences

    spark = build_session(
        master=f"local[{args.cpus}]",
        app_name="store-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    shutil.rmtree(args.dir, ignore_errors=True)
    store = TierStore(spark, args.dir)

    # K commit batches over a sliding EVENT-TIME window: batch i covers
    # minutes [i*step, i*step + span) of the 45-day span, consecutive
    # commits overlapping 50% — every overlap bucket gets a superseding
    # version (the late-data MERGE shape the read-side rank pays for).
    from s1tiling_spark.sources.sequences import BASE_TS, SPAN_MINUTES

    span = SPAN_MINUTES // (args.commits // 2 + 1)
    step = max(span // 2, 1)
    base = F.lit(BASE_TS).cast("timestamp")
    seq_all = synth_sequences(spark, args.rows, with_tokens=False,
                              num_partitions=args.cpus * 4)
    seq_all = seq_all.persist()
    seq_all.count()  # input generation is not part of the measured legs

    rows_written = 0
    t0 = time.time()
    for i in range(args.commits):
        lo, hi = i * step, i * step + span
        batch = rollup_sequences(
            seq_all.filter(
                (F.col("event_ts") >= F.timestamp_add("MINUTE", F.lit(lo), base))
                & (F.col("event_ts") < F.timestamp_add("MINUTE", F.lit(hi), base))
            ),
            "1h",
        )
        s = store.next_commit_seq()
        rows_written += store.append("1h", batch, s, f"bench-{i}")
    t_append = time.time() - t0

    raw = store.read("1h", deduped=False)
    t0 = time.time()
    n_versions, n_input_agg = raw.agg(
        F.count(F.lit(1)), F.sum("cnt").cast("long")
    ).first()
    t_raw = time.time() - t0

    t0 = time.time()
    n_live = store.read("1h").count()
    t_merge_pre = time.time() - t0

    t0 = time.time()
    stats = store.compact("1h", cluster_by=("source", "bucket_start"))
    t_compact = time.time() - t0

    t0 = time.time()
    n_live_post = store.read("1h").count()
    t_merge_post = time.time() - t0
    assert n_live_post == n_live, (n_live_post, n_live)

    out = {
        "rows_input": args.rows,
        "commits": args.commits,
        "row_versions": n_versions,
        "live_rows": n_live,
        "append_sec": round(t_append, 2),
        # append cost is dominated by AGGREGATING each commit's input
        # slice, not by writing the few thousand tier rows — throughput
        # is input rows aggregated per second (exact: sum of cnt over
        # every written version)
        "input_rows_aggregated": int(n_input_agg),
        "append_input_rows_per_sec": round(int(n_input_agg) / t_append, 1),
        "raw_read_sec": round(t_raw, 3),
        "merge_read_pre_compact_sec": round(t_merge_pre, 3),
        "compact_sec": round(t_compact, 2),
        "files_before": stats["files_before"],
        "files_after": stats["files_after"],
        "merge_read_post_compact_sec": round(t_merge_post, 3),
        "cpus": args.cpus,
    }
    with open(os.path.join(REPO, "STORE_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
