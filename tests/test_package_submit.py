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


def test_run_proc_file_to_file(spark, tmp_path):
    """cor-asv-ann-proc parity: plain/TSV/.pkl input files → one
    corrected output file per input (suffix rewrite), in-file line
    order exact, decoding distributed via the trained fixture model —
    the corrected lines must be closer to GT than the noisy input
    (in-distribution lines from the fixture's training corpus)."""
    import difflib
    import json
    import pickle
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.operators.correction import (
        assemble_lines,
        spans_with_line_no,
    )
    from cor_asv_ann_spark.sources.spans import synth_spans

    sf = "/root/testdata/sf0.001"
    gt_f = assemble_lines(spans_with_line_no(synth_spans(spark, sf, noisy=False)))
    no_f = assemble_lines(spans_with_line_no(synth_spans(spark, sf, noisy=True)))
    g = gt_f.select("doc_id", "line_no", F.concat_ws("", "texts").alias("gt"))
    n = no_f.select("doc_id", "line_no", F.concat_ws("", "texts").alias("ocr"))
    rows = (
        g.join(n, ["doc_id", "line_no"])
        .filter((F.length("gt") <= 45) & (F.col("doc_id").cast("int") >= 300))
        .orderBy("doc_id", "line_no").limit(8).collect()
    )
    gt = [r.gt.rstrip("\n") for r in rows]
    noisy = [r.ocr.rstrip("\n") for r in rows]

    (tmp_path / "a.txt").write_text("\n".join(noisy[:4]) + "\n")
    (tmp_path / "b.tsv").write_text(
        "".join(f"{s_}\tignored\n" for s_ in noisy[4:]))
    with open(tmp_path / "c.pkl", "wb") as f:
        pickle.dump(list(zip(noisy[:4], gt[:4])), f)

    r = subprocess.run(
        [sys.executable, "jobs/run_proc.py", "--model",
         "tests/fixtures/trained_w64_d1.npz", "--fast", "--cpus", "4",
         "--new-suffix", ".cor.txt",
         str(tmp_path / "a.txt"), str(tmp_path / "b.tsv"),
         str(tmp_path / "c.pkl")],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["files"] == 3
    out_a = (tmp_path / "a.cor.txt").read_text().splitlines()
    out_b = (tmp_path / "b.cor.txt").read_text().splitlines()
    out_c = (tmp_path / "c.cor.txt").read_text().splitlines()
    assert len(out_a) == 4 and len(out_b) == 4 and len(out_c) == 4
    # NOTE: out_c is not asserted char-equal to out_a — identical
    # sources can decode marginally differently in Arrow batches with
    # different pad lengths (the backward encoder half runs through
    # padding, faithful to the reference's unmasked LSTM graph); the
    # corpus-level CER improvement below is the contract

    def cer(outs, tgts):
        return sum(1 - difflib.SequenceMatcher(None, o, t).ratio()
                   for o, t in zip(outs, tgts)) / len(tgts)

    assert cer(out_a + out_b, gt) < cer(noisy, gt), (out_a + out_b, noisy)
    assert cer(out_c, gt[:4]) < cer(noisy[:4], gt[:4])
