"""SparkSession factory tuned for the rollup engine.

Mirrors the reference's parallelism model — ``nb_parallel_processes``
single-thread workers × ``nb_otb_threads`` with a per-process RAM budget
(`/root/reference/s1tiling/libs/api.py:220-223`,
`configuration.py:452-457`) — expressed the Spark way: one session,
``local[N]`` threads locally / executor instances on a cluster, AQE for
runtime re-planning, Arrow for the vectorized-UDF path.

At 100 TB this module is where cluster-level knobs live; everything else
in the engine is expressed declaratively so Catalyst/AQE can re-plan when
the data size changes by 1000×.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the s1tiling_spark package for shipping to executors — the
    programmatic equivalent of ``spark-submit --py-files`` (north-rule
    deployment mode). The zip name carries a content hash so edited
    source is never masked by a stale cached zip."""
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                sources.append(full)
    h = hashlib.sha256()
    for full in sorted(sources):
        h.update(full.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    out = os.path.join("/tmp", f"s1tiling_spark_pyfiles_{h.hexdigest()[:12]}.zip")
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full in sources:
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
        os.replace(tmp, out)
    return out


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def build_session(
    master: str | None = None,
    app_name: str = "s1tiling-spark",
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-aware defaults.

    - AQE on (coalesce + skew-join): runtime re-plan replaces the
      reference's hand-built Dask graph regeneration on retry
      (`api.py:296-315`).
    - ``spark.sql.shuffle.partitions`` sized to ~2× cores locally; on a
      real cluster leave AQE to coalesce from a higher initial number.
    - Arrow enabled for pandas-UDF kernels (no per-row Python).
    - Session timezone pinned to UTC so time-bucketing is
      deterministic across environments.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r6): coalescePartitions.parallelismFirst=false was
        # measured and REJECTED as a global default — it halves the
        # lifecycle gates' task storms but collapses the CPU-heavy
        # small-shuffle queries (embedding_near_dup 4.8 -> 8.8 s) by
        # serializing their post-shuffle compute; the cached-plan flag
        # below captures nearly all of the win without that risk.
        # Let AQE re-plan the partitioning of CACHED plan output too:
        # persisted intermediates (rollup outputs, changelog touched
        # sets) otherwise freeze at the initial shuffle partition count
        # and every consumer stage launches that many tasks (measured:
        # the matview mixed-refresh dropped 1509 -> 218 tasks, r6).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(2 * cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
    )
    # local mode = one JVM; spark.driver.memory is the only heap knob.
    # ParallelGC: measured 15-25x faster than the default G1 on this
    # workload at large heaps (G1+48g: 130-230s for a 600M-token scan;
    # ParallelGC+48g: 5-8s) — token-array decode allocates at a rate
    # G1's region management collapses under.
    mem = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM") or "48g"
    builder = builder.config("spark.driver.memory", mem).config(
        "spark.driver.extraJavaOptions", "-XX:+UseParallelGC"
    )
    # Optional task-concurrency cap: spark.task.cpus > 1 runs fewer
    # concurrent tasks than slots. Useful when the host's usable
    # memory-bandwidth parallelism is below its core count (PERF.md §6:
    # this sandbox realizes ~8 threads of JVM scan work regardless of
    # core count). On a real cluster, size executors instead.
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS")
    if task_cpus:
        builder = builder.config("spark.task.cpus", task_cpus)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # make the package importable on executor Python workers no matter
    # where the driver process was started from
    spark.sparkContext.addPyFile(package_zip())
    return spark
