"""North-rule packaging contract: the engine runs via ``spark-submit
--py-files <zip>`` (BASELINE.json north_rule / scripts/run_job.py docstring),
not only via in-process SparkSession imports from the repo checkout.

The test copies run_job.py OUT of the repo and strips PYTHONPATH, so the
``hipporag_spark`` package can only arrive through the --py-files zip —
the exact mechanism a multi-executor cluster submission uses.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zpath = tmp_path / "hipporag_spark.zip"
    pkg = os.path.join(REPO, "hipporag_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, fnames in os.walk(pkg):
            for fn in fnames:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))

    job = tmp_path / "run_job.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_job.py"), job)
    out = tmp_path / "out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(job),
            "--algorithm", "cc",
            "--n-files", "300",
            "--output", str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["algorithm"] == "cc" and summary["n_vertices"] > 0

    lineage = json.load(open(out / "lineage.json"))
    assert lineage[-1]["converged"]

    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{out}/result/*.parquet'").fetchone()[0]
    assert n == summary["n_vertices"]
