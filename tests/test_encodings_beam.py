"""Input encodings 2/3 (prob lines, confmat) and the beam-mode
pipeline flag."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab


@pytest.fixture(scope="module")
def model():
    return Seq2SeqModel(make_vocab(set("abcdefgh \n")), width=16, depth=1, seed=3)


def test_problines_encoding(model):
    X, lens = model.encode_problines(["ab\n"], [[0.9, 0.5, 1.0]])
    assert X.shape == (1, 3, model.voc_size)
    a = model.vocab["a"]
    assert X[0, 0, a] == pytest.approx(0.9)
    assert X[0, 0, 0] == pytest.approx(0.1)  # mass to underspecified
    assert X[0, 2, model.vocab["\n"]] == 1.0


def test_problines_full_conf_equals_onehot(model):
    X1, l1 = model.encode_problines(["abc\n"], [[1.0] * 4])
    X2, l2 = model.encode_onehot(["abc\n"])
    assert np.array_equal(X1, X2)
    # and decoding them is identical
    o1 = model.decode_greedy_prob(["abc\n"], [[1.0] * 4])[0]
    o2 = model.decode_greedy_batch(["abc\n"])[0]
    assert o1 == o2


def test_confmat_encoding(model):
    # chunk 1: 'a' (p=.6) vs 'ab' (p=.4) → width 2, padding mass → idx 0
    cm = [[("a", 0.6), ("ab", 0.4)], [("\n", 1.0)]]
    X, lens = model.encode_confmat([cm])
    assert lens[0] == 3
    a, b = model.vocab["a"], model.vocab["b"]
    assert X[0, 0, a] == pytest.approx(1.0)  # both alternatives start 'a'
    assert X[0, 1, b] == pytest.approx(0.4)
    assert X[0, 1, 0] == pytest.approx(0.6)  # shorter alt pads to idx 0
    outs, probs, aligns = model.decode_greedy_confmat([cm])
    assert outs[0].endswith("\n")


def test_beam_pipeline_flag(spark, model):
    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.schema import SPANS_SCHEMA

    df = spark.createDataFrame(
        [
            Row(
                doc_id="d0",
                spans=[
                    Row(kind="word", text="abc", media_ref="r", offset=0),
                    Row(kind="newline", text="\n", media_ref=None, offset=1),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    corr = make_model_corrector(spark, model, beam=True, beam_width=3)
    out = correct_pipeline(df, corrector=corr).collect()
    assert len(out) == 1
    spans = out[0].spans
    assert spans[-1].kind == "newline"
    assert "".join(s.text for s in spans).endswith("\n")


def test_conf_channel_pipeline(spark, model):
    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.schema import SPANS_SCHEMA
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [
            Row(
                doc_id="d0",
                spans=[
                    Row(kind="word", text="abc", media_ref="r", offset=0),
                    Row(kind="newline", text="\n", media_ref=None, offset=1),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    conf_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("line_no", T.IntegerType()),
            T.StructField("conf", T.ArrayType(T.FloatType())),
        ]
    )
    conf = spark.createDataFrame([("d0", 0, [0.9, 0.8, 0.7, 1.0])], schema=conf_schema)
    corr = make_model_corrector(spark, model, use_conf=True)
    out = correct_pipeline(df, corrector=corr, conf_df=conf).collect()
    assert len(out) == 1
    # deterministic: same run twice gives identical output
    out2 = correct_pipeline(df, corrector=corr, conf_df=conf).collect()
    assert out == out2
