"""Glyph-level hierarchy (P1): the pipeline must correct and realign
character-grain spans with the same span-sequence-equality guarantee."""

from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.correction import correct_pipeline
from cor_asv_ann_spark.sources.spans import read_spans, synth_spans


def test_glyph_level_span_equality(spark, sf_small):
    gt = synth_spans(spark, sf_small, noisy=False, level="glyph")
    noisy = synth_spans(spark, sf_small, noisy=True, level="glyph")
    out = correct_pipeline(noisy)
    flat = lambda df: df.select("doc_id", F.explode("spans").alias("s")).select(  # noqa: E731
        "doc_id", "s.*"
    )
    a, b = flat(out), flat(gt)
    assert b.filter(F.col("kind") == "glyph").count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_spans_io_roundtrip(spark, sf_small, tmp_path):
    gt = synth_spans(spark, sf_small, noisy=False)
    path = str(tmp_path / "spans")
    from cor_asv_ann_spark.sources.spans import iceberg_or_parquet_write

    fmt = iceberg_or_parquet_write(gt, path)
    assert fmt in ("iceberg", "parquet")
    back = read_spans(spark, path)
    f = lambda df: df.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")  # noqa: E731
    assert f(gt).exceptAll(f(back)).count() == 0
    assert f(back).exceptAll(f(gt)).count() == 0
