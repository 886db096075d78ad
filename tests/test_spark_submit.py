"""spark-submit --py-files packaging smoke (north rule: the engine ships as
a spark-submit package). Runs the real cluster entry point in a fresh JVM
with ONLY dist/pq_engine.zip on the python path — import leaks from the
repo checkout can't hide here."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_encode_job(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "job_out")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "url": [f"https://x.test/{i}" for i in range(2000)],
                "text": [f"doc body {i % 37} " * 6 for i in range(2000)],
                "lang": [["en", "de", "es"][i % 3] for i in range(2000)],
            }
        ),
        src,
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", os.path.join(REPO, "dist", "pq_engine.zip"),
            os.path.join(REPO, "tools", "encode_job.py"),
            "--input", src, "--output", out, "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary.get("n_pages", 0) > 0 or summary.get("pages", 0) > 0, summary
    assert os.path.isdir(os.path.join(out, "pages"))
