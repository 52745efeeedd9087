"""Property + example tests of whitespace redistribution (corelib).

Invariants from the reference (transcode.py:437-486 asserts and
tests/test_all.py:94-99): no output characters lost, whitespace spans
hold only whitespace, concatenation of spans equals the output line.
"""

import hypothesis.strategies as st
from hypothesis import given, settings

from cor_asv_ann_spark.corelib.noise import correct_charmap, degrade_reversible
from cor_asv_ann_spark.corelib.whitespace import alignment_path, segment_output


def mkline(words):
    texts, is_ws = [], []
    for i, w in enumerate(words):
        texts.append(w)
        is_ws.append(False)
        if i + 1 < len(words):
            texts.append(" ")
            is_ws.append(True)
    texts.append("\n")
    is_ws.append(True)
    return texts, is_ws


def test_identity_passthrough():
    texts, is_ws = mkline(["hello", "world"])
    out, confs = segment_output(texts, is_ws, "".join(texts))
    assert out == texts
    assert all(c == 1.0 for c in confs)


def test_shrinking_correction_realigns():
    texts, is_ws = mkline(["vvindovv", "faſt"])
    line = "".join(texts)
    corrected = correct_charmap(line)
    out, _ = segment_output(texts, is_ws, corrected)
    assert "".join(out) == corrected
    assert out[0] == "window"
    assert out[2] == "fast"
    assert out[1] == " " and out[3] == "\n"


def test_whitespace_never_gains_content():
    # a correction that tries to write letters into the space span
    texts, is_ws = mkline(["ab", "cd"])
    # output where the middle grows: "abX cd\n" — X must attach to 'ab'
    out, _ = segment_output(texts, is_ws, "abX cd\n")
    assert out[1] == " "
    assert "".join(out) == "abX cd\n"


def test_alignment_path_monotonic():
    p = alignment_path("abcdef", "abXdef")
    keys = sorted(p)
    vals = [p[k] for k in keys]
    assert vals == sorted(vals)
    assert p[0] == 0 and p[6] == 6


words_st = st.lists(
    st.text(alphabet="abcdefghwrsäöü", min_size=1, max_size=8), min_size=1, max_size=6
)


@given(words_st)
@settings(max_examples=100, deadline=None)
def test_roundtrip_property(words):
    """degrade → correct → segment must reproduce the GT spans exactly
    (the span-sequence-equality gold semantics)."""
    gt_texts, is_ws = mkline(words)
    noisy_texts = [
        degrade_reversible(t, f"k:{i}") if not is_ws[i] else t
        for i, t in enumerate(gt_texts)
    ]
    noisy_line = "".join(noisy_texts)
    corrected = correct_charmap(noisy_line)
    assert corrected == "".join(gt_texts)  # channel is exactly invertible
    out, confs = segment_output(noisy_texts, is_ws, corrected)
    assert "".join(out) == corrected  # nothing lost
    for k, t in enumerate(out):
        if is_ws[k]:
            assert not t.split()
    assert out == gt_texts  # exact span equality
    assert len(confs) == len(out)
