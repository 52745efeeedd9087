"""End-to-end correction pipeline: span-sequence equality vs gold.

The gold table is the GT spans table itself: the noisy table is the GT
degraded through the exactly-invertible historic channel, so the
pipeline's output must match GT on every (kind, text, media_ref, offset)
— the BASELINE.json correctness gate.
"""

import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.correction import (
    assemble_lines,
    correct_pipeline,
    pipeline_metrics,
    spans_with_line_no,
)
from cor_asv_ann_spark.sources.spans import synth_spans


@pytest.fixture(scope="module")
def gt(spark, sf_small):
    return synth_spans(spark, sf_small, noisy=False).cache()


@pytest.fixture(scope="module")
def noisy(spark, sf_small):
    return synth_spans(spark, sf_small, noisy=True).cache()


def test_synth_is_deterministic(spark, sf_small, gt):
    again = synth_spans(spark, sf_small, noisy=False)
    assert gt.exceptAll(again).count() == 0
    assert again.exceptAll(gt).count() == 0


def test_line_numbering_matches_newlines(gt):
    flat = spans_with_line_no(gt)
    # every newline span closes its own line: line_no == number of
    # preceding newlines
    bad = (
        flat.filter(F.col("kind") == "newline")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.countDistinct("line_no").alias("d"))
        .filter(F.col("n") != F.col("d"))
    )
    assert bad.count() == 0


def test_assemble_lines_concat_roundtrip(gt):
    """Concatenated span texts per line must equal the doc's text lines
    (the reference's word/line concat consistency, test_all.py:94-99)."""
    lines = assemble_lines(spans_with_line_no(gt))
    joined = lines.select(
        "doc_id", F.expr("concat_ws('', texts)").alias("line_text")
    )
    # every non-empty line ends with exactly one newline; pure-media
    # trailing lines are empty (media spans carry no text)
    assert joined.filter(
        (F.col("line_text") != "") & ~F.col("line_text").endswith("\n")
    ).count() == 0
    assert joined.filter(F.col("line_text").contains("\n\n")).count() == 0


def test_span_sequence_equality_end_to_end(spark, gt, noisy):
    out = correct_pipeline(noisy)
    # exact multiset equality of (doc_id, kind, text, media_ref, offset)
    gt_flat = gt.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    out_flat = out.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    n_gt = gt_flat.count()
    assert n_gt > 0
    assert out_flat.count() == n_gt
    diff = gt_flat.exceptAll(out_flat).count() + out_flat.exceptAll(gt_flat).count()
    assert diff == 0


def test_noisy_differs_from_gt(gt, noisy):
    gt_flat = gt.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    noisy_flat = noisy.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    assert gt_flat.exceptAll(noisy_flat).count() > 0


def test_pipeline_metrics(noisy):
    lines = assemble_lines(spans_with_line_no(noisy))
    from cor_asv_ann_spark.operators.correction import correct_lines

    corrected = correct_lines(lines)
    m = pipeline_metrics(corrected).collect()[0]
    assert m.n_docs > 0 and m.n_lines >= m.n_docs
    assert 0.0 < m.mean_line_cer < 1.0  # noise was actually corrected away


def test_bucket_filter_partitions_work(noisy, gt):
    """Processing buckets separately and unioning equals processing all
    at once (the checkpoint/resume correctness property)."""
    full = correct_pipeline(noisy).select("doc_id", F.explode("spans").alias("s"))
    parts = None
    for b in range(4):
        p = correct_pipeline(noisy, n_buckets=4, bucket_filter=[b]).select(
            "doc_id", F.explode("spans").alias("s")
        )
        parts = p if parts is None else parts.unionByName(p)
    assert full.exceptAll(parts).count() == 0
    assert parts.exceptAll(full).count() == 0
