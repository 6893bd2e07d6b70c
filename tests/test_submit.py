"""spark-submit --py-files deployment evidence (north-rule run mode)."""

import os
import subprocess
import sys


def test_spark_submit_pyfiles_flagship(tmp_path):
    """Package the engine, ship it via --py-files, run the flagship from a
    NEUTRAL cwd (so imports can only resolve from the shipped zip)."""
    sys.path.insert(0, "/root/repo/tools")
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "robosat_spark.zip"))
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
         "/root/repo/tools/submit_job.py"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": ""},
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("FLAGSHIP_ROWS=")]
    assert lines, r.stdout + r.stderr
    assert int(lines[0].split("=")[1]) > 0
