"""Confusion-network (encoding 3) pipeline path: the reference
flagship's multi-TextEquiv glyph input
(wrapper/transcode.py:236-277 _line_sequences2confmat_sequences) as a
Spark-side confmat channel joined onto the line frame."""

import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.correction import (
    confmat_argmax_corrector,
    correct_pipeline,
)
from cor_asv_ann_spark.sources.spans import synth_confmat, synth_spans


def spans_tuples(df):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref) for s in r.spans]
        for r in df.collect()
    }


def test_confmat_aligns_with_noisy_glyph_spans(spark, sf_small):
    """Chunk sequences must align 1:1 with the noisy glyph-span texts:
    same chunk count per line, and the primary alternatives concatenate
    to the noisy line text (widths = longest alternative)."""
    noisy = synth_spans(spark, sf_small, noisy=True, level="glyph").limit(5)
    cm = synth_confmat(spark, sf_small)
    lines = (
        noisy.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "media")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    chunks = cm.groupBy("doc_id").agg(F.sum(F.size("confmat")).alias("n_chunks"))
    j = lines.join(chunks, "doc_id").collect()
    assert j and all(r.n_spans == r.n_chunks for r in j)
    # primary alternatives reproduce the noisy glyph text
    one = cm.orderBy("doc_id", "line_no").first()
    primary = "".join(chunk[0].alt for chunk in one.confmat)
    assert primary.endswith("\n")
    degraded = [c for chunk in one.confmat if len(chunk) > 1 for c in chunk]
    assert degraded, "fixture must contain multi-alternative chunks"


def test_confmat_argmax_recovers_gt_spans(spark, sf_small):
    """Span-sequence equality: picking the best alternative per chunk
    recovers the GT glyph span table exactly (kind, text, media_ref,
    order) — the north-rule gate, through the confmat channel."""
    gt = synth_spans(spark, sf_small, noisy=False, level="glyph")
    noisy = synth_spans(spark, sf_small, noisy=True, level="glyph")
    cm = synth_confmat(spark, sf_small)
    out = correct_pipeline(noisy, corrector=confmat_argmax_corrector, confmat_df=cm)
    got = spans_tuples(out.limit(30))
    want = spans_tuples(gt.filter(F.col("doc_id").isin(list(got.keys()))))
    assert got == {k: want[k] for k in got}


def test_model_confmat_single_alt_equals_plain(spark):
    """A full-confidence single-alternative confmat must decode exactly
    like the plain one-hot path through the whole pipeline (encoding
    equivalence, seq2seq.py:1037-1041 semantics)."""
    from pyspark.sql import Row

    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab
    from cor_asv_ann_spark.schema import CONFMAT_SCHEMA, SPANS_SCHEMA

    model = Seq2SeqModel(make_vocab(set("abc \n")), width=16, depth=1, seed=3)
    spans = spark.createDataFrame(
        [
            Row(
                doc_id="d0",
                spans=[
                    Row(kind="glyph", text="a", media_ref="g0", offset=0),
                    Row(kind="glyph", text="b", media_ref="g1", offset=1),
                    Row(kind="newline", text="\n", media_ref=None, offset=2),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    cm = spark.createDataFrame(
        [("d0", 0, [[{"alt": "a", "p": 1.0}], [{"alt": "b", "p": 1.0}], [{"alt": "\n", "p": 1.0}]])],
        schema=CONFMAT_SCHEMA,
    )
    plain = correct_pipeline(spans, corrector=make_model_corrector(spark, model)).collect()
    viacm = correct_pipeline(
        spans,
        corrector=make_model_corrector(spark, model, use_confmat=True),
        confmat_df=cm,
    ).collect()
    assert [r.spans for r in plain] == [r.spans for r in viacm]


def test_confmat_beats_plain_on_degraded_fixture(spark, sf_small):
    """The confmat channel carries recoverable signal the plain noisy
    text lacks: CER(confmat argmax) < CER(noisy identity) on the
    degraded fixture (the reference's motivation for encoding 3)."""
    gt = synth_spans(spark, sf_small, noisy=False, level="glyph").limit(20)
    noisy = synth_spans(spark, sf_small, noisy=True, level="glyph").limit(20)
    cm = synth_confmat(spark, sf_small)

    def doc_text(df, name):
        return df.select(
            "doc_id",
            F.concat_ws(
                "", F.expr("transform(spans, s -> s.text)")
            ).alias(name),
        )

    corrected = correct_pipeline(noisy, corrector=confmat_argmax_corrector, confmat_df=cm)
    j = (
        doc_text(gt, "gt")
        .join(doc_text(noisy, "ocr"), "doc_id")
        .join(doc_text(corrected, "fixed"), "doc_id")
    )
    row = j.agg(
        F.sum(F.levenshtein("ocr", "gt")).alias("d_noisy"),
        F.sum(F.levenshtein("fixed", "gt")).alias("d_fixed"),
    ).collect()[0]
    assert row.d_noisy > 0
    assert row.d_fixed < row.d_noisy
    assert row.d_fixed == 0  # argmax picks the GT alternative exactly
