"""End-to-end spark-submit --py-files smoke test (north_rule: the job
'ships via spark-submit --py-files'): builds dist/disco_crawl_spark.zip,
launches the REAL spark-submit binary with the zip on --py-files and
scripts/run_crawl.py as the application, and asserts the crawl runs
rounds and emits the summary JSON — i.e. the package is importable from
the zip alone (driver AND executors), with no repo dir on sys.path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not present")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from scripts.build_pyfiles import build
    zip_path = build(str(tmp_path / "disco_crawl_spark.zip"))
    wh = str(tmp_path / "wh")
    env = dict(os.environ)
    # the zip must be the ONLY way the package is importable: strip any
    # repo paths the parent test process may export
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.ui.showConsoleProgress=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "run_crawl.py"),
         "--warehouse", wh, "--rounds", "3"],
        capture_output=True, text=True, timeout=480,
        cwd=str(tmp_path),  # NOT the repo: import must come from the zip
        env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                summary = json.loads(line)
            except ValueError:
                continue
    assert summary is not None, proc.stdout[-2000:]
    assert summary["rounds"] == 3
    assert summary["fetched"] > 0
    assert summary["hosts"] > 1
    # the warehouse holds committed snapshot tables (resume evidence)
    assert os.path.isdir(wh) and os.listdir(wh)
