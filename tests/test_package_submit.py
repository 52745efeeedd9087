"""--py-files packaging: the zip built by tools/package.py must be
importable by executors with the repo absent from sys.path (the north
rule ships the engine via spark-submit --py-files)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package as pkg

    out1 = tmp_path / "a.zip"
    out2 = tmp_path / "b.zip"
    names = pkg.build(str(out1))
    pkg.build(str(out2))
    assert any(n.endswith("operators/correction.py") for n in names)
    assert not any("tests/" in n or "fixtures" in n for n in names)
    assert out1.read_bytes() == out2.read_bytes()  # byte-identical rebuilds


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    """A real spark-submit with --py-files and cwd OUTSIDE the repo:
    imports must resolve from the zip, and the flagship pipeline must
    produce corrected spans."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package as pkg

    zip_path = tmp_path / "engine.zip"
    pkg.build(str(zip_path))
    job = tmp_path / "job.py"
    job.write_text(
        """
import json
from pyspark.sql import SparkSession
from cor_asv_ann_spark.sources.spans import synth_spans
from cor_asv_ann_spark.operators.correction import correct_pipeline
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
out = correct_pipeline(
    synth_spans(spark, "/root/testdata/sf0.001", noisy=True).limit(10))
print("PKGRESULT " + json.dumps({"docs": out.count()}))
spark.stop()
"""
    )
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    r = subprocess.run(
        ["spark-submit", "--py-files", str(zip_path), str(job)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=570, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("PKGRESULT")][0]
    import json

    assert json.loads(line.split(" ", 1)[1])["docs"] == 10


def test_repl_transcode_line(tmp_path):
    """The interactive surface (reference cor-asv-ann-repl parity):
    piped input drives transcode_line end-to-end for both model
    formats — greedy + beam decodes printed with the ASCII alignment
    map, tuple result echoed."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "jobs/repl.py"],
        input="transcode_line('hello!')\n",
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "greedy (ppl=" in r.stdout
    assert "beamed (ppl=" in r.stdout
    assert "now entering REPL" in r.stdout
