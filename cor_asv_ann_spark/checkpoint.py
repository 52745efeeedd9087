"""Per-bucket lineage checkpointing for resumable runs (north rule:
"every stage checkpoints per-partition lineage and CER/throughput
metrics ... so a killed job resumes without recomputing completed
partitions").

Design: documents hash into B salt buckets (pmod(xxhash64(doc_id), B)).
The driver loop processes one bucket at a time: run the pipeline
filtered to the bucket, append the output partition, then append one
lineage row. On restart, completed buckets are read back and skipped
(an anti-join at driver level — no recomputation). Each bucket commit
is atomic-enough locally via a per-bucket parquet subdirectory; on a
real cluster the same loop commits Iceberg snapshots (writeTo().append()
per bucket) and the lineage table is an Iceberg table keyed
(run_id, bucket).

At 10^12 docs the bucket count B is chosen so one bucket ≈ a few
executor-hours; the pipeline inside a bucket still parallelizes across
all executors (buckets are a *resume* grain, not a parallelism grain).
"""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import LINEAGE_SCHEMA


def completed_buckets(spark: SparkSession, lineage_dir: str, run_id: str) -> set[int]:
    if not os.path.isdir(lineage_dir) or not os.listdir(lineage_dir):
        return set()
    df = spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_dir)
    return {r.bucket for r in df.filter(F.col("run_id") == run_id).select("bucket").collect()}


def append_lineage_row(spark: SparkSession, lineage_dir: str, row: dict) -> None:
    df = spark.createDataFrame([row], schema=LINEAGE_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(lineage_dir)


def run_resumable(
    spark: SparkSession,
    spans_df: DataFrame,
    out_dir: str,
    lineage_dir: str,
    run_id: str,
    n_buckets: int = 8,
    corrector=None,
    stateful_correct_docs=None,
    confmat_df: DataFrame | None = None,
) -> dict:
    """Correct ``spans_df`` bucket-by-bucket with resume. Returns summary
    metrics. Output lands under ``out_dir/bucket=<b>/``.
    ``stateful_correct_docs`` routes the correction stage through the
    doc-sequential stateful path (state carried across a document's
    lines — correction.correct_lines_stateful). ``confmat_df``
    (CONFMAT_SCHEMA) is the confusion-network channel — bucketed by the
    same doc_id salt and joined onto the line frame exactly as
    correct_pipeline does (shipped across the UDF boundary as JSON)."""
    from .operators.correction import (
        assemble_lines,
        correct_lines,
        correct_lines_stateful,
        reassemble,
        salt_bucket,
        spans_with_line_no,
    )

    done = completed_buckets(spark, lineage_dir, run_id)
    summary = {"run_id": run_id, "buckets_total": n_buckets, "buckets_skipped": len(done)}
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        bucketed = spans_df.filter(salt_bucket(F.col("doc_id"), n_buckets) == b)
        # correction (the dominant UDF/inference stage) runs EXACTLY ONCE
        # per bucket: the lineage metrics ride on the write job itself via
        # observe() — no second pass and no persisted copy of the
        # corrected frame (a cache of the full bucket would be the memory
        # bottleneck at 10^12 docs). countDistinct is not allowed in an
        # observation; n_docs comes from the reassembled frame where one
        # row IS one doc.
        from pyspark.sql import Observation

        n_len = F.expr("aggregate(texts, 0, (a, t) -> a + length(t))")
        obs_lines = Observation()
        obs_docs = Observation()
        line_frame = assemble_lines(spans_with_line_no(bucketed))
        if confmat_df is not None:
            cm_b = confmat_df.filter(
                salt_bucket(F.col("doc_id"), n_buckets) == b
            ).withColumn("confmat", F.to_json("confmat"))
            line_frame = line_frame.join(cm_b, ["doc_id", "line_no"], "left")
        if stateful_correct_docs is not None:
            corrected = correct_lines_stateful(line_frame, stateful_correct_docs)
        else:
            corrected = correct_lines(line_frame, corrector)
        lines = corrected.observe(
            obs_lines,
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(n_len).alias("n_chars"),
            F.sum(F.col("line_cer") * n_len).alias("sum_dist_w"),
            F.avg("line_cer").alias("mean_cer"),
        )
        # with_confs: the model's per-span confidences ride to the sink
        # (read_spans' explicit schema drops the extra column for
        # consumers that only want spans; the PAGE-XML writer uses it)
        out = reassemble(lines, with_confs=True).observe(
            obs_docs, F.count(F.lit(1)).alias("n_docs")
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/bucket={b}")
        m = {**obs_lines.get, **obs_docs.get}
        wall = time.time() - t0
        append_lineage_row(
            spark,
            lineage_dir,
            {
                "run_id": run_id,
                "bucket": b,
                "n_docs": int(m.get("n_docs") or 0),
                "n_lines": int(m.get("n_lines") or 0),
                "n_chars": int(m.get("n_chars") or 0),
                "sum_dist": float(m.get("sum_dist_w") or 0.0),
                "cer": float(m["mean_cer"]) if m.get("mean_cer") is not None else None,
                "wall_sec": wall,
                "docs_per_sec": (int(m.get("n_docs") or 0) / wall) if wall > 0 else None,
                "finished_at": datetime.datetime.now(datetime.timezone.utc),
            },
        )
    return summary
