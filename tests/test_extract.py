"""Main-content extraction: boilerplate strip (jusText-style heuristics)
and media-context mining over the interleaved span payload."""

import pytest
from pyspark.sql import Row

from cor_asv_ann_spark.operators.extract import (
    classify_lines,
    line_features,
    media_context,
    strip_boilerplate,
    with_pseudo_lines,
)
from cor_asv_ann_spark.schema import SPANS_SCHEMA


def test_classify_content_vs_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            Row(
                doc_id="d",
                lines=[
                    "the quick brown fox jumps over the lazy dog and runs away",
                    "HOME | ABOUT | CONTACT",
                    "click http://x.example/a <a href=b> more <div>",
                    "this is a long sentence with plenty of ordinary words in it",
                ],
            )
        ]
    )
    out = {r.line_no: r.is_content for r in classify_lines(line_features(docs)).collect()}
    assert out[0] is True
    assert out[1] is False  # short, no stopwords
    assert out[2] is False  # link/markup dominated
    assert out[3] is True


def test_strip_boilerplate_end_to_end(spark):
    content = "the engine keeps a list of words and is able to hold the line for a while longer"
    docs = spark.createDataFrame([Row(doc_id="d1", text=content + " MENU NAV FOO")])
    row = strip_boilerplate(docs, words_per_line=6, min_chars=10).collect()[0]
    assert row.n_lines == 4  # 19 words / 6 per line
    assert 0 < row.n_kept <= row.n_lines
    assert "the engine keeps" in row.clean_text
    assert row.kept_ratio == pytest.approx(row.n_kept / row.n_lines, abs=1e-6)


def test_strip_boilerplate_empty_doc(spark):
    docs = spark.createDataFrame([Row(doc_id="e", text="")])
    row = strip_boilerplate(docs).collect()[0]
    assert row.n_kept == 0 and row.clean_text == ""


def test_media_context(spark):
    spans = spark.createDataFrame(
        [
            Row(
                doc_id="d",
                spans=[
                    Row(kind="word", text="alpha", media_ref=None, offset=0),
                    Row(kind="space", text=" ", media_ref=None, offset=1),
                    Row(kind="word", text="beta", media_ref=None, offset=2),
                    Row(kind="newline", text="\n", media_ref=None, offset=3),
                    Row(kind="media", text="", media_ref="img://d/1", offset=4),
                    Row(kind="word", text="gamma", media_ref=None, offset=5),
                    Row(kind="space", text=" ", media_ref=None, offset=6),
                    Row(kind="word", text="delta", media_ref=None, offset=7),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    rows = media_context(spans, n_before=2, n_after=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.media_ref == "img://d/1"
    assert r.context_before == "alpha beta"
    assert r.context_after == "gamma delta"


def test_media_context_at_document_start(spark):
    spans = spark.createDataFrame(
        [
            Row(
                doc_id="d",
                spans=[
                    Row(kind="media", text="", media_ref="img://d/0", offset=0),
                    Row(kind="word", text="only", media_ref=None, offset=1),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    r = media_context(spans, n_before=3, n_after=3).collect()[0]
    assert r.context_before == ""
    assert r.context_after == "only"


def test_media_context_on_fixture(spark, sf_small):
    from cor_asv_ann_spark.sources.spans import synth_spans

    spans = synth_spans(spark, sf_small, noisy=False).limit(10)
    rows = media_context(spans).collect()
    assert rows  # the fixture interleaves a media span every 4 lines
    for r in rows:
        assert r.media_ref.startswith("img://")
        assert r.context_before  # media spans follow 4 full lines of text
