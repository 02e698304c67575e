"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (N vs 4N executors).

No real multi-node cluster exists in this sandbox, so the proxy is the
same flagship job (full tier cascade over the identical deterministic
input) at two parallelism levels: local[8] and local[32]. Efficiency =
(throughput@32 / throughput@8) / 4; target >= 0.8.

Each level runs in its own subprocess (a JVM can't change master
mid-life). The input parquet is pre-materialized once so both levels
read identical bytes. Writes BENCH_SCALING.json and refreshes the
"Measured results" section of BASELINE.md.

Usage: python tools/scaling_bench.py [--rows N] [--repeat K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Measured results (sandbox scaling evidence)"


def run_level(cpus: int, rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ROWS=str(rows),
        SPARK_GRAFT_BENCH_ONLY="cascade",
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
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    results = {}
    for cpus in (8, 32):
        best = None
        for _ in range(args.repeat):
            r = run_level(cpus, args.rows)
            if best is None or r["points_per_sec"] > best["points_per_sec"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['points_per_sec']:.0f} points/s "
              f"({best['queries']['tier_cascade']}s cascade)")

    pps8 = results[8]["points_per_sec"]
    pps32 = results[32]["points_per_sec"]
    eff = (pps32 / pps8) / 4.0
    summary = {
        "metric": "rolled-up points/sec (all retention tiers), scaling 8→32 threads",
        "rows": args.rows,
        "throughput_local8_pps": round(pps8, 1),
        "throughput_local32_pps": round(pps32, 1),
        "speedup_8_to_32": round(pps32 / pps8, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "cascade_sec_local8": results[8]["queries"]["tier_cascade"],
        "cascade_sec_local32": results[32]["queries"]["tier_cascade"],
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # refresh BASELINE.md results section
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        content = f.read()
    if MARKER in content:
        content = content[: content.index(MARKER)].rstrip() + "\n"
    section = f"""
{MARKER}

Same flagship job (full 1h/1d/30d tier cascade + token-histogram
sketch over the deterministic synthetic sequence table,
{args.rows} rows) at two parallelism levels on identical input bytes
(`python tools/scaling_bench.py`):

| parallelism | throughput (rolled-up points/sec) | cascade wall time |
|---|---|---|
| local[8]  (N)  | {pps8:,.0f} | {summary['cascade_sec_local8']} s |
| local[32] (4N) | {pps32:,.0f} | {summary['cascade_sec_local32']} s |

Speedup 8→32: **{summary['speedup_8_to_32']}×**; scaling efficiency
(speedup/4): **{summary['scaling_efficiency']}** (target ≥ 0.8).
"""
    with open(path, "w") as f:
        f.write(content + section)


if __name__ == "__main__":
    main()
