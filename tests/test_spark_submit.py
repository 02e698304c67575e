"""North-rule deployment mode: the engine must run via
``spark-submit --py-files`` (BASELINE.json north_rule). This drives the
real ``spark-submit`` binary as a subprocess with the packaged zip —
the job script imports the engine ONLY from the --py-files zip (cwd is
a temp dir, repo not on sys.path) and runs a tier rollup end-to-end.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

JOB = textwrap.dedent(
    """
    from pyspark.sql import SparkSession

    from s1tiling_spark.operators.rollup import rollup_from_lower, rollup_sequences
    from s1tiling_spark.sources.synth import synth_sequences

    spark = SparkSession.builder.getOrCreate()
    seq = synth_sequences(spark, 2000)
    t1h = rollup_sequences(seq, "1h")
    t1d = rollup_from_lower(t1h, "1d")
    print(f"TIER_ROWS={t1h.count()}:{t1d.count()}")
    spark.stop()
    """
)


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")
    from s1tiling_spark.session import package_zip

    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    # strip repo from import paths: the zip must be the only source
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            submit,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.session.timeZone=UTC",
            "--py-files",
            package_zip(),
            str(job),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    marker = [l for l in out.stdout.splitlines() if l.startswith("TIER_ROWS=")]
    assert marker, out.stdout[-2000:]
    t1h_rows, t1d_rows = map(int, marker[0].split("=")[1].split(":"))
    assert t1h_rows > t1d_rows > 0
