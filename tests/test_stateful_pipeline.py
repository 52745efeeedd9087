"""Stateful-model correction through the Spark pipeline: doc-contiguous
repartitioning, batch-straddle handling, and span-sequence integrity.

The reference's stateful mode (h5 config stateful=True) carries decoder
LSTM state across a document's lines with reset at document boundaries;
the Spark path trades the salted line exchange for a doc-keyed one so
each document's lines stay sequential (operators/correction.py
correct_lines_stateful)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq, write_keras_fixture


@pytest.fixture(scope="module")
def stateful_model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("m") / "stateful.h5")
    write_keras_fixture(
        p, chars="abcdefghijklmnopqrstuvwxyz .,-ſ", width=16, depth=2,
        seed=9, stateful=True,
    )
    return RefSeq2Seq.load_h5(p)


def _mk_line(doc, line_no, words):
    kinds, texts, mrefs, offs = [], [], [], []
    off = 0
    for w in words:
        kinds.append("word")
        texts.append(w)
        mrefs.append(f"xy://{doc}/{off}")
        offs.append(off)
        off += 1
        kinds.append("space")
        texts.append(" ")
        mrefs.append(None)
        offs.append(off)
        off += 1
    kinds[-1], texts[-1] = "newline", "\n"
    return {
        "doc_id": doc, "line_no": line_no, "kinds": kinds, "texts": texts,
        "media_refs": mrefs, "offsets": offs,
    }


def _doc_frame(n_docs=6, lines_per_doc=3):
    rows = []
    words = ["the", "faſt", "correction", "meets", "spark", "engine"]
    for d in range(n_docs):
        for ln in range(lines_per_doc):
            rows.append(_mk_line(f"d{d}", ln, words[ln : ln + 3]))
    return pd.DataFrame(rows)


def test_stateful_udf_batch_straddle_invariance(spark, stateful_model):
    """Splitting the Arrow stream mid-document must not change any
    output: the UDF holds back the trailing incomplete doc of each
    batch."""
    from cor_asv_ann_spark.model.corrector import make_stateful_doc_corrector
    from cor_asv_ann_spark.operators.correction import (
        make_correct_lines_stateful_udf,
    )

    correct_docs = make_stateful_doc_corrector(spark, stateful_model)
    df = _doc_frame()

    def run(chunks):
        udf = make_correct_lines_stateful_udf(correct_docs, flush_docs=2)
        out = pd.concat(list(udf(iter(chunks))), ignore_index=True)
        return out.sort_values(["doc_id", "line_no"]).reset_index(drop=True)

    whole = run([df])
    # split mid-doc: chunks of 4 rows (docs have 3 lines each)
    split = run([df.iloc[i : i + 4] for i in range(0, len(df), 4)])
    assert len(whole) == len(df) == len(split)
    for col in ("out_texts", "out_confs"):
        for a, b in zip(whole[col], split[col]):
            assert list(a) == list(b), col


def test_stateful_pipeline_end_to_end(spark, sf_small, stateful_model):
    """correct_pipeline(stateful_correct_docs=...) preserves the span
    skeleton (kind, media_ref, offset, order) while rewriting text —
    the north-rule span-sequence contract — with state threading."""
    from cor_asv_ann_spark.model.corrector import make_stateful_doc_corrector
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.sources.spans import synth_spans

    noisy = synth_spans(spark, sf_small, noisy=True).filter(
        F.col("doc_id").cast("int") < 40
    )
    out = correct_pipeline(
        noisy,
        stateful_correct_docs=make_stateful_doc_corrector(spark, stateful_model),
    )
    j = (
        noisy.select("doc_id", F.col("spans").alias("in_spans"))
        .join(out.select("doc_id", F.col("spans").alias("out_spans")), "doc_id")
    )
    rows = j.collect()
    assert len(rows) == noisy.count()
    for r in rows:
        assert len(r.in_spans) == len(r.out_spans)
        for a, b in zip(r.in_spans, r.out_spans):
            assert a.kind == b.kind and a.media_ref == b.media_ref and a.offset == b.offset
            if a.kind == "newline":
                assert b.text == "\n"
            if a.kind == "media":
                assert b.text == a.text  # locked spans never rewritten
    # whitespace discipline survives segmentation
    ws = j.select(
        F.explode("out_spans").alias("s")
    ).filter(F.col("s.kind") == "space")
    assert ws.filter(~F.col("s.text").rlike(r"^\s*$")).count() == 0


def test_stateful_decode_used_not_stateless(spark, stateful_model):
    """The doc path must actually thread state: feeding the same line
    twice within one doc gives a different second-line decode than two
    separate docs would (state reset at the boundary)."""
    m = stateful_model
    line = "the fast correction\n"
    one_doc, _, _ = m.decode_greedy_docs([[line, line]])
    two_docs, _, _ = m.decode_greedy_docs([[line], [line]])
    assert two_docs[0][0] == two_docs[1][0] == one_doc[0][0]
    # second line in-doc decodes from carried state; across docs it
    # restarts — the trajectories must differ (numerically certain with
    # seeded random weights; text may or may not coincide, so compare
    # the decoded strings AND lengths of the prob traces)
    _, p_onedoc, _ = m.decode_greedy_docs([[line, line]])
    _, p_twodocs, _ = m.decode_greedy_docs([[line], [line]])
    same = (
        one_doc[0][1] == two_docs[1][0]
        and len(p_onedoc[0][1]) == len(p_twodocs[1][0])
        and np.allclose(p_onedoc[0][1], p_twodocs[1][0])
    )
    assert not same


def test_npz_model_stateful_docs_api():
    """API symmetry: models trained by our own loop (npz) also decode
    doc-sequentially — first lines match the stateless batch path,
    carried state changes later lines, documents are isolated."""
    import os

    from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel

    m = Seq2SeqModel.load_npz(
        os.path.join(os.path.dirname(__file__), "fixtures", "trained_w64_d1.npz")
    )
    line = "the faſt caſe\n"
    outs, probs, aligns = m.decode_greedy_docs([[line, line], [line]])
    stateless, sprobs, _ = m.decode_greedy_batch([line])
    assert outs[0][0] == stateless[0] == outs[1][0]
    assert np.allclose(probs[0][0], sprobs[0])
    # trained weights: line 2's carried-state decode differs numerically
    same = (
        outs[0][1] == outs[0][0]
        and len(probs[0][1]) == len(probs[0][0])
        and np.allclose(probs[0][1], probs[0][0])
    )
    assert not same, "carried state had no effect"
    # empty line passes through and state survives the gap
    o2, _, _ = m.decode_greedy_docs([[line, "", line]])
    assert o2[0][1] == "\n" and o2[0][2].endswith("\n")
