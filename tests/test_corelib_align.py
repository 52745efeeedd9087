"""Unit tests of the pure alignment/metric core (no Spark).

Mirrors the semantics the reference encodes in lib/alignment.py
(gap distribution, grapheme recombination, equivalence levels,
path-length denominator) — see SURVEY.md §2.8.
"""

import pytest

from cor_asv_ann_spark.corelib.align import (
    GAP,
    adjusted_distance,
    best_alignment,
    chars_equivalent,
    confusion_counts,
    is_bad_pair,
    levenshtein,
    normalize_text,
)
from cor_asv_ann_spark.corelib.edits import EditStats
from cor_asv_ann_spark.corelib.words import split_words


def test_levenshtein_basics():
    assert levenshtein("kitten", "sitting") == (3, 7)
    assert levenshtein("", "") == (0, 0)
    assert levenshtein("abc", "") == (3, 3)
    assert levenshtein("abc", "abc") == (0, 3)


def test_best_alignment_spans_both_sequences():
    src, tgt = "Taust", "Faust"
    pairs = best_alignment(src, tgt)
    assert "".join(s for s, _ in pairs if s != GAP) == src
    assert "".join(t for _, t in pairs if t != GAP) == tgt


def test_best_alignment_replace_gap_distribution():
    # replace with length mismatch: overlap pairs positionally, tail gaps
    pairs = best_alignment("ab", "xyz")
    srcs = [s for s, _ in pairs]
    tgts = [t for _, t in pairs]
    assert srcs.count(GAP) == 1 and tgts.count(GAP) == 0


def test_grapheme_recombination():
    # combining e above (U+0364) reattaches to 'a' on the source side
    pairs = best_alignment("aͤb", "äb")
    assert ("aͤ", "ä") in pairs or ("aͤ", "ä") in pairs


def test_adjusted_distance_path_denominator():
    d, n = adjusted_distance("ab", "xyz")
    assert n == 3  # path length, not max-len==3 here but includes gap slots
    d2, n2 = adjusted_distance("abc", "abc")
    assert (d2, n2) == (0.0, 3)


def test_adjusted_distance_historic_latin():
    # ſ≡s at level 1; normalized equal at level 2 via L2 replacement
    d, _ = adjusted_distance("ſtein", "stein", normalization="historic_latin", gt_level=1)
    assert d == 0.0
    d, _ = adjusted_distance("aͤpfel", "äpfel", normalization="historic_latin", gt_level=2)
    assert d == 0.0
    d, _ = adjusted_distance("ſtein", "stein", normalization=None)
    assert d == 1.0


def test_nfc_normalization_path():
    assert normalize_text("ä", "NFC") == "ä"
    d, _ = adjusted_distance("äb", "äb", normalization="NFC")
    assert d == 0.0


def test_chars_equivalent_levels():
    assert chars_equivalent("s", "ſ", 1)
    assert not chars_equivalent("s", "ſ", 3)
    assert chars_equivalent("x", "x", 3)


def test_confusion_counts_merge_forward():
    pairs = best_alignment("abc", "axc")
    counts = confusion_counts(pairs)
    assert counts.get(("b", "x")) == 1
    # gaps merge forward into multi-char confusions, never appear raw
    pairs2 = best_alignment("abd", "abcd")
    counts2 = confusion_counts(pairs2)
    for (s, t), _ in counts2.items():
        assert GAP not in (s, t)


def test_is_bad_pair():
    assert is_bad_pair("abcdefghij", "zzzzzzzzzz")
    assert not is_bad_pair("abcdefghij", "abcdefghij")
    assert not is_bad_pair("abc", "zzz")  # short lines never dropped


def test_edit_stats_chan_merge_equals_sequential():
    """Parallel subsample merge must equal sequential accumulation
    (the reference cross-checks the same, tests/test_all.py:267-271)."""
    lines = [(2.0, 10), (0.0, 5), (1.0, 4), (3.0, 9), (0.5, 7)]
    seq = EditStats()
    for d, n in lines:
        seq.add(d, n)
    part1, part2 = EditStats(), EditStats()
    for d, n in lines[:2]:
        part1.add(d, n)
    for d, n in lines[2:]:
        part2.add(d, n)
    part1.merge(part2)
    assert part1.length == seq.length
    assert part1.mean == pytest.approx(seq.mean)
    assert part1.varia == pytest.approx(seq.varia)
    # and the mean equals the plain weighted mean (sum-decomposable)
    assert seq.mean == pytest.approx(sum(d for d, _ in lines) / sum(n for _, n in lines))


def test_split_words():
    assert split_words("Hello, world!") == ["Hello", "world"]
    assert split_words("it's a co-op.") == ["it's", "a", "co-op"]
    assert split_words("... --- !!!") == []
