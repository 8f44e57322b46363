"""The north star's launch form: spark-submit --py-files.

Builds the dist zip, launches tools/submit_job.py through the real
spark-submit binary from a NEUTRAL working directory (so the package can
only be imported from the shipped zip), and checks the job's output
against the same flagship computation run in-process.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit binary in this environment")
def test_spark_submit_pyfiles_launch(tmp_path, spark, sf_dir):
    zip_path = str(tmp_path / "quad_processor_util_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), zip_path],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.getsize(zip_path) > 10_000

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    run = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"), sf_dir],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,  # neutral cwd: repo root NOT importable
    )
    assert run.returncode == 0, run.stderr[-2000:]
    lines = [ln for ln in run.stdout.splitlines()
             if ln.startswith("SUBMIT_RESULT ")]
    assert lines, run.stdout[-2000:] + run.stderr[-1000:]
    result = json.loads(lines[-1].split(" ", 1)[1])

    from quad_processor_util_spark.demo import events_to_transcripts, flagship_quads

    assert result["turns"] == events_to_transcripts(spark, sf_dir).count()
    assert result["quads"] == flagship_quads(spark, sf_dir).count()
    assert result["quads"] > 0
