"""Property-based invariants of the flagship pipeline over
hypothesis-generated span tables (arbitrary interleavings of words,
whitespace, media and unicode text)."""

import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.correction import correct_pipeline
from cor_asv_ann_spark.schema import SPANS_SCHEMA

WORD = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters=" \n\t\r",
        exclude_categories=("Cs", "Cc", "Zl", "Zp", "Mn"),
    ),
    min_size=1,
    max_size=8,
)


@st.composite
def span_doc(draw, doc_no: int):
    n_lines = draw(st.integers(1, 4))
    spans = []
    off = 0

    def emit(kind, text, ref=None):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += 1

    for _ln in range(n_lines):
        n_words = draw(st.integers(0, 5))
        for wi in range(n_words):
            emit("word", draw(WORD), f"r{off}")
            if wi + 1 < n_words:
                emit("space", " ")
        emit("newline", "\n")
        if draw(st.booleans()):
            emit("media", "", f"img://{doc_no}/{off}")
    return {"doc_id": f"d{doc_no}", "spans": spans}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_identity_corrector_invariants(spark, data):
    """With the identity corrector the pipeline must be a structural
    no-op: same kinds in order, NFC-equal concatenated text per doc,
    media refs untouched, offsets dense."""
    import pandas as pd

    docs = [data.draw(span_doc(i)) for i in range(data.draw(st.integers(1, 4)))]
    df = spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_SCHEMA)

    def identity(texts):
        return texts, None

    out = correct_pipeline(df, corrector=identity).collect()
    got = {r.doc_id: r.spans for r in out}
    for d in docs:
        spans_in = d["spans"]
        if not spans_in:
            continue  # empty docs drop out of the groupBy (documented)
        spans_out = got[d["doc_id"]]
        assert [s.kind for s in spans_out] == [s["kind"] for s in spans_in]
        # text equality up to NFC (the pipeline normalizes on output)
        txt_in = unicodedata.normalize("NFC", "".join(s["text"] for s in spans_in))
        txt_out = unicodedata.normalize("NFC", "".join(s.text for s in spans_out))
        assert txt_out == txt_in
        # media refs ride through untouched, in order
        media_in = [s["media_ref"] for s in spans_in if s["kind"] == "media"]
        media_out = [s.media_ref for s in spans_out if s.kind == "media"]
        assert media_out == media_in
        assert [s.offset for s in spans_out] == [s["offset"] for s in spans_in]
