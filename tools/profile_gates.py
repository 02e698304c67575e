"""Phase-level profiler for the heavy store-lifecycle gates.

Runs a gate's body with ``setJobDescription`` labels per phase and an
event log, then reports per-phase wall time, Spark job count, summed
job duration, and the driver-side gap (wall - job time) — the split
PERF.md §20 says matters on tiny-data lifecycle tests (#jobs × job
latency + #plans × analysis).

Usage: python tools/profile_gates.py [gate ...]
Gates: minmax, additive, retention, branch, merge, wap, pruned, cascade
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVLOG_DIR = "/tmp/s1ts_evlog"


class PhaseTimer:
    def __init__(self, spark):
        self.spark = spark
        self.phases: list[tuple[str, float, float]] = []
        self.prefix = ""

    def __call__(self, name):
        return _Phase(self, self.prefix + name)


class _Phase:
    def __init__(self, pt, name):
        self.pt, self.name = pt, name

    def __enter__(self):
        self.pt.spark.sparkContext.setJobDescription(self.name)
        self.t0 = time.time()

    def __exit__(self, *exc):
        self.pt.phases.append((self.name, self.t0, time.time()))
        self.pt.spark.sparkContext.setJobDescription(None)


def build(extra=None):
    from s1tiling_spark.session import build_session

    os.makedirs(EVLOG_DIR, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "SPARK_GRAFT_TASK_CPUS" not in os.environ and cpus > 8:
        os.environ["SPARK_GRAFT_TASK_CPUS"] = str(cpus // 8)
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVLOG_DIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    }
    for kv in os.environ.get("PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    conf.update(extra or {})
    return build_session(master=f"local[{cpus}]",
                         app_name="s1ts-profile", extra_conf=conf)


# ---------------------------------------------------------------- gates
def run_minmax(spark, pt):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.plans.matview import MergeMatView
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.sources.sequences import sequences_from_documents

    seq = sequences_from_documents(spark, SF_DIR)
    base_dir = tempfile.mkdtemp(prefix="s1ts_prof_mm_")
    store = TierStore(spark, base_dir)
    mv = MergeMatView(
        store, name="minmax_daily", base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={"bucket_start": F.date_trunc("day", F.col("bucket_start")),
                    "source": F.col("source")},
        sum_cols=("cnt", "sum_n_tok"), min_cols=("sum_n_tok",),
        max_cols=("sum_n_tok",), hll_cols={"ntok": "sum_n_tok"},
        hll_m=16, group_date_span_days=1,
    )
    with pt("rollup+persist"):
        full = (rollup_sequences(seq, "1h")
                .select("bucket_start", "source", "cnt", "sum_n_tok").persist())
        full.count()
    with pt("append-1(half)"):
        half = full.filter(
            F.pmod(F.xxhash64(F.col("source"), F.col("bucket_start")), F.lit(2)) == 0
        ).withColumn("cnt", F.col("cnt") + F.lit(7))
        store.append("1h", half, store.next_commit_seq(), "batch-1")
    with pt("refresh-1"):
        mv.refresh("mv-1")
    with pt("append-2(full)"):
        store.append("1h", full, store.next_commit_seq(), "batch-2")
    with pt("delete(victims)"):
        victims = full.filter(
            (F.col("source") == "src_hot") | (F.hour("bucket_start") % 5 == 2)
        ).select("bucket_start", "source")
        store.delete("1h", victims, store.next_commit_seq(), "batch-del",
                     keys=("bucket_start", "source"))
    with pt("refresh-2"):
        mv.refresh("mv-2")
    with pt("read+ckpt"):
        view = mv.read()
        out = (view.select("bucket_start", "source", "n_rows", "cnt", "sum_n_tok",
                           "sum_n_tok_min", "sum_n_tok_max",
                           F.posexplode("ntok_regs").alias("reg", "rho"))
               .filter(F.col("rho") > 0).localCheckpoint(eager=True))
        out.count()
    full.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)


def run_retention(spark, pt):
    import datetime as dt
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s1tiling_spark.plans.retention import RetentionRule, apply_retention_policy
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.plans.tiers import TierPipeline, TierPipelineConfig
    from s1tiling_spark.sources.sequences import sequences_from_documents

    seq = sequences_from_documents(spark, SF_DIR)
    base_dir = tempfile.mkdtemp(prefix="s1ts_prof_ret_")
    store = TierStore(spark, base_dir)
    with pt("pipeline.run"):
        TierPipeline(store, TierPipelineConfig(
            tiers=("1h", "1d"), hist=False, compress=False)).run(seq)
    with pt("retention"):
        apply_retention_policy(
            store, [RetentionRule("1h", keep_days=10, guard_tier="1d")],
            as_of=dt.date(2024, 2, 14))
    with pt("read+union+ckpt"):
        cutoff = "2024-02-04"

        def _slice(tier, pred):
            df = store.read(tier)
            return df.filter(pred).select(
                F.lit(tier).alias("tier"), "bucket_start", "source",
                F.col("cnt").cast("long").alias("cnt"),
                F.col("sum_n_tok").cast("long").alias("sum_n_tok"))

        view = _slice("1d", F.col("bucket_start") < cutoff).unionByName(
            _slice("1h", F.col("bucket_start") >= cutoff))
        view.localCheckpoint(eager=True).count()
    shutil.rmtree(base_dir, ignore_errors=True)


def run_additive(spark, pt):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.plans.matview import AdditiveMatView
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.sources.sequences import sequences_from_documents

    seq = sequences_from_documents(spark, SF_DIR)
    base_dir = tempfile.mkdtemp(prefix="s1ts_prof_add_")
    store = TierStore(spark, base_dir)
    mv = AdditiveMatView(
        store, name="daily_totals", base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={"bucket_start": F.date_trunc("day", F.col("bucket_start")),
                    "source": F.col("source")},
        sum_cols=("cnt", "sum_n_tok"))
    with pt("rollup+persist"):
        full = (rollup_sequences(seq, "1h")
                .select("bucket_start", "source", "cnt", "sum_n_tok").persist())
        full.count()
    with pt("append-1(half)"):
        half = full.filter(
            F.pmod(F.xxhash64(F.col("source"), F.col("bucket_start")), F.lit(2)) == 0
        ).withColumn("cnt", F.col("cnt") + F.lit(7))
        store.append("1h", half, store.next_commit_seq(), "batch-1")
    with pt("refresh-1"):
        mv.refresh("mv-1")
    with pt("append-2(full)"):
        store.append("1h", full, store.next_commit_seq(), "batch-2")
    with pt("delete(hot)"):
        hot = full.filter(F.col("source") == "src_hot").select(
            "bucket_start", "source")
        store.delete("1h", hot, store.next_commit_seq(), "batch-del",
                     keys=("bucket_start", "source"))
    with pt("refresh-2"):
        mv.refresh("mv-2")
    with pt("read+ckpt"):
        mv.read().localCheckpoint(eager=True).count()
    full.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)


GATES = {
    "minmax": run_minmax,
    "retention": run_retention,
    "additive": run_additive,
}


def parse_evlog(app_id: str):
    """(phase -> {jobs, job_sec}), from the single event-log file."""
    path = os.path.join(EVLOG_DIR, app_id)
    if not os.path.exists(path):
        # Spark 4 rolling event log: a directory with events_* files
        d = os.path.join(EVLOG_DIR, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, fn) for fn in os.listdir(d)
            if fn.startswith("events_")
        )
        return _parse_files(parts)
    return _parse_files([path])


def _parse_files(paths):
    per_desc: dict[str, list[float]] = defaultdict(list)
    starts: dict[int, tuple[str, float]] = {}
    stage_desc: dict[int, str] = {}
    tm: dict[str, dict] = defaultdict(lambda: defaultdict(float))
    for path in paths:
      with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "?")
                starts[ev["Job ID"]] = (desc, ev["Submission Time"])
                for sid in ev.get("Stage IDs", []):
                    stage_desc[sid] = desc
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    desc, t0 = starts.pop(jid)
                    per_desc[desc].append((ev["Completion Time"] - t0) / 1000.0)
            elif et == "SparkListenerStageCompleted":
                si = ev.get("Stage Info") or {}
                sid = si.get("Stage ID")
                desc = stage_desc.get(sid, "?")
                t0, t1 = si.get("Submission Time"), si.get("Completion Time")
                if t0 and t1:
                    tm[desc].setdefault("stages", [])
                    tm[desc]["stages"].append(
                        ((t1 - t0) / 1000.0, si.get("Number of Tasks", 0),
                         (si.get("Stage Name") or "")[:70]))
            elif et == "SparkListenerTaskEnd":
                desc = stage_desc.get(ev.get("Stage ID"), "?")
                m = ev.get("Task Metrics") or {}
                d = tm[desc]
                d["tasks"] += 1
                d["run"] += m.get("Executor Run Time", 0) / 1000.0
                d["deser"] += m.get("Executor Deserialize Time", 0) / 1000.0
                d["gc"] += m.get("JVM GC Time", 0) / 1000.0
                info = ev.get("Task Info") or {}
                if info.get("Finish Time") and info.get("Launch Time"):
                    d["taskwall"] += (
                        info["Finish Time"] - info["Launch Time"]) / 1000.0
    return per_desc, tm


def _wrap_store_methods():
    """Print per-call wall time of the store/matview methods the gates
    exercise (PROFILE_CALLS=1)."""
    import functools

    from s1tiling_spark.plans import matview, store

    def wrap(cls, name):
        orig = getattr(cls, name)

        @functools.wraps(orig)
        def timed(self, *a, **kw):
            t0 = time.time()
            try:
                return orig(self, *a, **kw)
            finally:
                print(f"    [{cls.__name__}.{name}] {time.time() - t0:6.2f}s",
                      flush=True)

        setattr(cls, name, timed)

    for m in ("append", "read", "delete", "commit_checkpoint",
              "append_metrics", "changes", "read_watermarks", "expire",
              "partitions", "merge_into"):
        wrap(store.TierStore, m)
    wrap(matview.AdditiveMatView, "refresh")


def main():
    names = sys.argv[1:] or ["minmax", "retention", "additive"]
    if os.environ.get("PROFILE_CALLS"):
        _wrap_store_methods()
    spark = build()
    app_id = spark.sparkContext.applicationId
    pt = PhaseTimer(spark)
    t_all = time.time()
    for name in names:
        t0 = time.time()
        pt.prefix = name + "/"
        GATES[name](spark, pt)
        print(f"== {name}: {time.time() - t0:.2f}s total")
    total_wall = time.time() - t_all
    spark.stop()
    per_desc, tm = parse_evlog(app_id)
    print(f"\n{'phase':28s} {'wall':>7s} {'jobs':>5s} {'jobsec':>7s} "
          f"{'gap':>7s} {'tasks':>6s} {'twall':>7s} {'trun':>7s} "
          f"{'tdeser':>7s} {'tgc':>6s}")
    for name, t0, t1 in pt.phases:
        wall = t1 - t0
        jobs = per_desc.get(name, [])
        jsec = sum(jobs)
        d = tm.get(name, {})
        print(f"{name:28s} {wall:7.2f} {len(jobs):5d} {jsec:7.2f} "
              f"{wall - jsec:7.2f} {int(d.get('tasks', 0)):6d} "
              f"{d.get('taskwall', 0):7.2f} {d.get('run', 0):7.2f} "
              f"{d.get('deser', 0):7.2f} {d.get('gc', 0):6.2f}")
    unlabeled = per_desc.get("?", [])
    print(f"{'(unlabeled jobs)':28s} {'':7s} {len(unlabeled):5d} "
          f"{sum(unlabeled):7.2f}")
    if os.environ.get("PROFILE_STAGES"):
        for name, _t0, _t1 in pt.phases:
            stages = tm.get(name, {}).get("stages") or []
            if not stages:
                continue
            print(f"\n-- {name}: top stages by duration")
            for dur, ntask, sname in sorted(stages, reverse=True)[:8]:
                print(f"   {dur:6.2f}s {int(ntask):4d}t  {sname}")
    print(f"total wall (all gates): {total_wall:.2f}s")


if __name__ == "__main__":
    main()
