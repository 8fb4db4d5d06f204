"""North-rule packaging contract: the library runs under spark-submit
with the package shipped via --py-files — no repo on sys.path, driver
and executors import honas_spark from the zip.  `--master local[4]` is
the sandbox stand-in for a multi-executor cluster manager."""

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_with_py_files(tmp_path):
    zpath = str(tmp_path / "honas_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "honas_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.local.dir=/dev/shm/spark-submit-test",
            os.path.join(REPO, "tools", "submit_job.py"),
            out_dir,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(os.path.join(out_dir, "result.json")) as f:
        result = json.load(f)
    # imports really came from the shipped zip, not a checkout
    assert ".zip" in result["package_file"], result["package_file"]
    assert result["sketch_rows"] == 2
    assert result["member_hits"] >= 1  # u=1: the member must be found
    assert result["miss_rows"] == 0    # the never-inserted key dropped
