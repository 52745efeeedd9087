"""Resume-from-lineage: a killed run must not recompute completed
buckets, and the resumed output must equal a clean full run."""

import shutil

from pyspark.sql import functions as F

from cor_asv_ann_spark.checkpoint import completed_buckets, run_resumable
from cor_asv_ann_spark.sources.spans import synth_spans


def test_resume_skips_completed_buckets(spark, sf_small, tmp_path):
    noisy = synth_spans(spark, sf_small, noisy=True).cache()
    out1 = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")

    # full run
    s1 = run_resumable(spark, noisy, out1, lin, run_id="r1", n_buckets=4)
    assert s1["buckets_skipped"] == 0
    assert completed_buckets(spark, lin, "r1") == {0, 1, 2, 3}

    # simulate a kill after bucket 1: drop lineage rows for buckets 2,3
    df = spark.read.parquet(lin)
    kept = df.filter(F.col("bucket") < 2).toPandas()
    shutil.rmtree(lin)
    spark.createDataFrame(kept, schema=df.schema).write.parquet(lin)
    out2 = str(tmp_path / "out2")
    # stale outputs for 0,1 remain in out1; resumed run writes only 2,3
    s2 = run_resumable(spark, noisy, out2, lin, run_id="r1", n_buckets=4)
    assert s2["buckets_skipped"] == 2
    import os

    assert sorted(os.listdir(out2)) == ["bucket=2", "bucket=3"]

    # resumed buckets' content matches the full run's same buckets
    a = spark.read.parquet(f"{out1}/bucket=2").select("doc_id", F.explode("spans").alias("s"))
    b = spark.read.parquet(f"{out2}/bucket=2").select("doc_id", F.explode("spans").alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # lineage rows carry throughput + CER metrics
    rows = spark.read.parquet(lin).collect()
    assert all(r.wall_sec > 0 and r.n_docs > 0 for r in rows)
    assert all(r.docs_per_sec is not None for r in rows)


def test_checkpoint_single_execution(spark, sf_small, tmp_path):
    """The correction UDF must run EXACTLY ONCE per line per bucket —
    output write and lineage metrics both derive from the persisted
    corrected-lines frame (a second inference pass doubles the dominant
    cost of the whole job at scale)."""
    from cor_asv_ann_spark.operators.correction import (
        assemble_lines,
        charmap_corrector,
        spans_with_line_no,
    )

    noisy = synth_spans(spark, sf_small, noisy=True).cache()
    n_lines = assemble_lines(spans_with_line_no(noisy)).count()
    acc = spark.sparkContext.accumulator(0)

    def counting_corrector(texts):
        acc.add(len(texts))
        return charmap_corrector(texts)

    run_resumable(
        spark,
        noisy,
        str(tmp_path / "out"),
        str(tmp_path / "lineage"),
        run_id="single",
        n_buckets=2,
        corrector=counting_corrector,
    )
    assert acc.value == n_lines, (
        f"corrector saw {acc.value} lines for {n_lines} input lines — "
        "correction executed more than once per bucket"
    )


def test_real_kill9_mid_job_resume(spark, tmp_path):
    """The north rule's resumability, demonstrated for real: the
    spark-submit entry is SIGKILLed mid-run (no cleanup, no atexit —
    the cluster-preemption case), then re-invoked with the same run-id
    and output dir. The resumed run must skip every lineage-committed
    bucket, rewrite any partially-written one (lineage commits AFTER
    the bucket write, so a torn bucket has no lineage row and
    mode=overwrite repairs it), and the final output must equal a
    clean run's, span for span."""
    import os
    import signal
    import subprocess
    import sys
    import time

    env = dict(os.environ)
    base = [sys.executable, "jobs/run_correction.py",
            "--sf-dir", "/root/testdata/sf0.001", "--buckets", "10",
            "--cpus", "4", "--run-id", "kill9"]

    # clean reference run
    clean_out = str(tmp_path / "clean_out")
    r = subprocess.run(
        base + ["--output", clean_out, "--lineage", str(tmp_path / "clean_lin"),],
        capture_output=True, text=True, cwd="/root/repo", timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    # killed run: SIGKILL the whole process group once >=2 buckets
    # committed but before all 10 are
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lin")
    p = subprocess.Popen(
        base + ["--output", out, "--lineage", lin],
        cwd="/root/repo", start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
    killed = False
    deadline = time.time() + 600
    while time.time() < deadline and p.poll() is None:
        n_committed = 0
        if os.path.isdir(lin):
            n_committed = sum(1 for f in os.listdir(lin)
                              if f.endswith(".parquet"))
        if 2 <= n_committed <= 8:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    p.wait(timeout=60)
    # if the job outran the poller, resumption is trivially a full skip —
    # still assert it, but the interesting path needs the kill to land
    assert killed, "job finished before the kill window; widen buckets"

    # resumed run: same run-id, same output + lineage dirs
    r2 = subprocess.run(
        base + ["--output", out, "--lineage", lin],
        capture_output=True, text=True, cwd="/root/repo", timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    import json

    rep = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep["buckets_skipped"] >= 2, rep
    assert rep["buckets_skipped"] < 10, rep

    # output equality, span for span (NB: verify on the suite's shared
    # session — build_session().getOrCreate() would RETURN that session
    # and stopping it here would kill Spark for every later test)
    a = spark.read.parquet(clean_out).select(
        "doc_id", F.posexplode("spans").alias("i", "s"))
    b = spark.read.parquet(out).select(
        "doc_id", F.posexplode("spans").alias("i", "s"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
