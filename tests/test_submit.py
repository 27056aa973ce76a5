"""North-rule launch path: the pipeline must run via
`spark-submit --py-files posmspark.zip` with NO repo on sys.path —
imports come from the shipped archive on driver and executors."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files(tmp_path):
    # package the library like a cluster deploy would
    zpath = tmp_path / "posmspark.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(REPO, "posmspark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    # run the job from OUTSIDE the repo so only the zip provides the pkg
    job = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)

    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zpath), str(job),
         "--workdir", str(tmp_path / "wd"), "--n-docs", "5000"],
        capture_output=True, text=True, timeout=240,
        cwd=str(tmp_path),
        env={**os.environ, "SPARK_GRAFT_CPUS": "4",
             "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("assigned_docs=")][-1]
    # deterministic synth input -> pinned output
    assert line.startswith("assigned_docs=1358 tiles=996"), line
