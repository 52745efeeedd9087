"""Pickle pair reader (S5 completion) and RTL/bottom-to-top reading
order normalization (transcode.py:693-713 parity)."""

import pickle

import pytest
from pyspark.sql import Row

from cor_asv_ann_spark.operators.reading_order import apply_reading_order
from cor_asv_ann_spark.schema import SPANS_SCHEMA
from cor_asv_ann_spark.sources.lines import read_pairs, read_pickle_pairs


def test_read_pickle_pairs_all_encodings(spark, tmp_path):
    data = [
        ("plain\n", "plain\n"),
        ([("a", 0.9), ("b", 0.5), ("\n", 1.0)], "ab\n"),  # prob line
        ([[("x", 0.7), ("y", 0.3)], [("\n", 1.0)]], "x\n"),  # confmat
        ("", "\n"),  # empty source
    ]
    p = tmp_path / "pairs.pkl"
    p.write_bytes(pickle.dumps(data))
    rows = {r.target: r for r in read_pickle_pairs(spark, str(p)).collect()}
    assert len(rows) == 4
    assert rows["plain\n"].source == "plain\n" and rows["plain\n"].conf is None
    pl = rows["ab\n"]
    assert pl.source == "ab\n"
    assert [round(c, 2) for c in pl.conf] == [0.9, 0.5, 1.0]
    cm = rows["x\n"]
    assert cm.source == "x\n"
    import json

    parsed = json.loads(cm.confmat)
    assert parsed[0][0]["alt"] == "x" and parsed[0][1]["alt"] == "y"
    assert rows["\n"].source == ""
    # suffix dispatch (gen_lines .pkl detection, seq2seq.py:937)
    assert read_pairs(spark, str(p)).count() == 4


def test_read_pickle_many_files_parallel(spark, tmp_path):
    """A directory of dumps parallelizes across files (one task each)."""
    for i in range(3):
        (tmp_path / f"part{i}.pkl").write_bytes(
            pickle.dumps([(f"s{i}\n", f"t{i}\n")])
        )
    df = read_pickle_pairs(spark, str(tmp_path))
    assert sorted(r.source for r in df.collect()) == ["s0\n", "s1\n", "s2\n"]


SPANS = [
    Row(
        doc_id="d",
        spans=[
            Row(kind="word", text="aa", media_ref="r0", offset=0),
            Row(kind="space", text=" ", media_ref=None, offset=1),
            Row(kind="word", text="bb", media_ref="r1", offset=2),
            Row(kind="newline", text="\n", media_ref=None, offset=3),
            Row(kind="word", text="cc", media_ref="r2", offset=4),
            Row(kind="newline", text="\n", media_ref=None, offset=5),
            Row(kind="media", text="", media_ref="img", offset=6),
        ],
    )
]


@pytest.fixture()
def spans_df(spark):
    return spark.createDataFrame(SPANS, schema=SPANS_SCHEMA)


def texts(df):
    return [s.text for s in df.collect()[0].spans]


def kinds(df):
    return [s.kind for s in df.collect()[0].spans]


def test_rtl_reverses_words_within_lines(spans_df):
    out = apply_reading_order(spans_df, right_to_left=True)
    assert texts(out) == ["bb", " ", "aa", "\n", "cc", "\n", ""]
    assert kinds(out) == ["word", "space", "word", "newline", "word", "newline", "media"]
    # offsets densely renumbered in the new order
    assert [s.offset for s in out.collect()[0].spans] == list(range(7))
    # involution: applying RTL twice restores the original text order
    back = apply_reading_order(out, right_to_left=True)
    assert texts(back) == [s.text for s in SPANS[0].spans]


def test_bottom_to_top_reverses_lines(spans_df):
    out = apply_reading_order(spans_df, bottom_to_top=True)
    # line 1 ('cc') now precedes line 0 ('aa bb'); media (line 2) first
    t = texts(out)
    assert t.index("cc") < t.index("aa") < t.index("bb")
    assert kinds(out).count("newline") == 2


def test_noop_returns_input(spans_df):
    assert apply_reading_order(spans_df) is spans_df
