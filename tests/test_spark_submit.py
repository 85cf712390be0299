"""Deployment contract: the pipeline runs via spark-submit --py-files
from a directory that does NOT contain the package source (only the zip)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pyarrow.parquet as pq
import pytest

from gobulk_spark.corpus import generate_pairs


def _spark_submit() -> str | None:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    submit = _spark_submit()
    assert submit, "spark-submit not found"
    from jobs.package import build

    zip_path = build(str(tmp_path / "gobulk_spark.zip"))
    src = tmp_path / "pairs.parquet"
    pairs, _ = generate_pairs(400, seed=42)
    pq.write_table(pairs, src)
    out = tmp_path / "out"
    job = "/root/repo/jobs/run_quality_filter.py"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # prove the zip provides the package
    r = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            job,
            "--source",
            str(src),
            "--out",
            str(out),
            "--run-id",
            "submit-test",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["phases"]["store"]["rows_in"] > 0
    assert (out / "_checkpoint" / "submit-test" / "store.json").exists()
