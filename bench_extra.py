"""Extra benchmarks (guide §1.4): run a NAMED SUBSET of the registered
queries with bench.py's exact methodology (same session config, same
materialize-via-count, release_cached + clearCache between queries) so
a single query can be isolated and A/B'd without a full bench run.

bench.py itself is FROZEN for measurement; numbers from here are cited
in OPTIMIZATION_r06.md only.

Usage: python bench_extra.py q1 q2 ...      (default: the heavy tail)
       REPEAT=n python bench_extra.py q1    (n samples per query)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "matview_daily_totals",
    "matview_minmax_daily",
    "retention_lifecycle",
    "branch_merge_lifecycle",
    "wap_publish_lifecycle",
    "merge_into_sync",
    "source_pruned_read",
    "dedup_jaccard_pairs",
    "dedup_components",
    "embedding_near_dup",
    "minhash_lsh_pairs",
]


def main() -> None:
    from s1tiling_spark.session import build_session

    import __spark_entry__ as e

    names = sys.argv[1:] or DEFAULT
    repeat = int(os.environ.get("REPEAT", "1"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "SPARK_GRAFT_TASK_CPUS" not in os.environ and cpus > 8:
        os.environ["SPARK_GRAFT_TASK_CPUS"] = str(cpus // 8)
    conf = {"spark.ui.showConsoleProgress": "false"}
    for kv in os.environ.get("BENCH_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = build_session(
        master=f"local[{cpus}]",
        app_name="s1tiling-spark-bench-extra",
        extra_conf=conf,
    )
    from s1tiling_spark.operators.cache import release_cached

    qs = e.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(repeat):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 2))
            release_cached()
            spark.catalog.clearCache()
        out[name] = samples
        print(f"{name:28s} {samples}", flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
