"""Robustness under non-invertible (lossy) OCR noise: the pipeline
cannot restore the exact text, but the structural contract must hold —
span skeleton (kind, media_ref, offset) identical, whitespace spans
whitespace-only, no content lost relative to the corrected line, and
the two CER aggregation routes must agree on the damage."""

import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.corelib.edits import EditStats
from cor_asv_ann_spark.corelib.align import levenshtein
from cor_asv_ann_spark.corelib.noise import degrade_lossy
from cor_asv_ann_spark.operators.correction import correct_pipeline
from cor_asv_ann_spark.operators.evaluate import cer_aggregate, with_fast_distance
from cor_asv_ann_spark.sources.spans import synth_spans


@pytest.fixture(scope="module")
def lossy(spark, sf_small):
    gt = synth_spans(spark, sf_small, noisy=False)

    def degrade(spans):
        return [
            {
                "kind": s.kind,
                "text": degrade_lossy(s.text, f"L:{s.offset}", 0.12) if s.kind == "word" else s.text,
                "media_ref": s.media_ref,
                "offset": s.offset,
            }
            for s in spans
        ]

    from pyspark.sql import types as T

    from cor_asv_ann_spark.schema import SPANS_SCHEMA

    deg_udf = F.udf(degrade, SPANS_SCHEMA["spans"].dataType)
    return gt.select("doc_id", deg_udf("spans").alias("spans")).cache()


def test_skeleton_preserved_under_lossy_noise(spark, sf_small, lossy):
    out = correct_pipeline(lossy)
    gt = synth_spans(spark, sf_small, noisy=False)
    skel = lambda df: df.select("doc_id", F.explode("spans").alias("s")).select(  # noqa: E731
        "doc_id", "s.kind", "s.media_ref", "s.offset"
    )
    a, b = skel(out), skel(gt)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_whitespace_invariants_under_lossy_noise(lossy):
    out = correct_pipeline(lossy)
    spans = out.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    # NB: Spark trim() strips only spaces — use a whitespace regex
    ws_bad = spans.filter(
        F.col("kind").isin("space", "newline") & ~F.col("text").rlike(r"^\s*$")
    )
    assert ws_bad.count() == 0
    media_bad = spans.filter((F.col("kind") == "media") & (F.col("text") != ""))
    assert media_bad.count() == 0


def test_cer_routes_agree_on_real_noise(spark, sf_small, lossy):
    """Relational Chan aggregation == pure-Python accumulator on the
    actual lossy corpus (the reference's cross-check on live data)."""
    gt = synth_spans(spark, sf_small, noisy=False)
    to_lines = lambda df, col: (  # noqa: E731
        df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind").isin("word", "space", "newline"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("s.offset", "s.text"))), lambda x: x.text)
            ).alias(col)
        )
    )
    pairs = to_lines(gt, "gt_text").join(to_lines(lossy, "ocr_text"), "doc_id")
    scored = with_fast_distance(pairs)
    agg = cer_aggregate(scored).collect()[0]
    rows = pairs.collect()
    gold = EditStats()
    for r in rows:
        d, n = levenshtein(r.ocr_text, r.gt_text)
        if n:
            gold.add(d, n)
    assert agg.n_lines == gold.steps
    assert agg.mean_rate == pytest.approx(gold.mean, rel=1e-9)
    assert agg.var_rate == pytest.approx(gold.varia, rel=1e-9)
    assert 0.0 < agg.cer < 0.3  # ~12% char noise on word spans
