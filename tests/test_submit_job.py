"""Deployment contract: the engine runs under spark-submit with the
package shipped ONLY as a --py-files zip (no repo on sys.path), per the
north-star submission model."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_with_py_files_zip(tmp_path):
    pkg_zip = tmp_path / "s2pkg.zip"
    src_root = os.path.join(REPO, "s2_geometry_kotlin_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src_root):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    out_dir = tmp_path / "out"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # neutral cwd: the package must come from the zip, not the repo
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(pkg_zip),
         os.path.join(REPO, "scripts", "submit_job.py"),
         "/root/testdata/sf0.001", str(out_dir)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("SUBMIT_JOB_ROWS ")]
    assert rows, proc.stdout[-2000:]
    n = int(rows[-1].split()[1])
    assert n > 0
    assert os.path.isdir(out_dir)
