"""Evaluation operators vs pure-Python gold (the reference cross-checks
its two aggregation routes the same way, tests/test_all.py:267-271)."""

import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.corelib.align import adjusted_distance, levenshtein
from cor_asv_ann_spark.corelib.edits import EditStats
from cor_asv_ann_spark.operators.evaluate import (
    cer_aggregate,
    cer_rollup,
    char_histogram,
    confusion_topk,
    histogram_compare,
    perplexity,
    wer_pairs,
    with_adjusted_distance,
    with_fast_distance,
    worst_examples,
)

PAIRS = [
    ("doc1", "l1", "the quick brown fox", "the quiok brwn fox"),
    ("doc1", "l2", "hello world", "hello world"),
    ("doc2", "l1", "ſtein und bein", "stein und bein"),
    ("doc2", "l2", "aͤpfel", "äpfel"),
    ("doc2", "l3", "", ""),
]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(PAIRS, ["doc_id", "line_id", "gt_text", "ocr_text"]).cache()


def test_fast_distance_matches_pure(spark, pairs):
    rows = with_fast_distance(pairs).select("gt_text", "ocr_text", "dist", "length").collect()
    for r in rows:
        d, n = levenshtein(r.ocr_text, r.gt_text)
        assert (r.dist, r.length) == (d, n)


def test_adjusted_distance_matches_pure(spark, pairs):
    rows = with_adjusted_distance(pairs, normalization="historic_latin", gt_level=1).collect()
    for r in rows:
        d, n = adjusted_distance(r.ocr_text, r.gt_text, "historic_latin", 1)
        assert (r.dist, r.length) == (d, n)
    # historic equivalences: ſ≡s makes doc2/l1 distance 0
    by_line = {(r.doc_id, r.line_id): r.dist for r in rows}
    assert by_line[("doc2", "l1")] == 0.0


def test_cer_aggregate_equals_chan_accumulator(spark, pairs):
    scored = with_fast_distance(pairs)
    agg = cer_aggregate(scored).collect()[0]
    gold = EditStats()
    for _, _, gt, ocr in PAIRS:
        d, n = levenshtein(ocr, gt)
        if n:
            gold.add(d, n)
    assert agg.n_lines == gold.steps
    assert agg.sum_len == gold.length
    assert agg.mean_rate == pytest.approx(gold.mean)
    assert agg.var_rate == pytest.approx(gold.varia)
    assert agg.cer == pytest.approx(gold.mean)  # length-weighted mean == sum/sum


def test_cer_rollup_levels(spark, pairs):
    scored = with_fast_distance(pairs)
    rows = cer_rollup(scored, "doc_id", "line_id").collect()
    # grand total + per-doc + per-line rows
    assert any(r.doc_id is None and r.line_id is None for r in rows)
    per_doc = [r for r in rows if r.doc_id is not None and r.line_id is None]
    assert len(per_doc) == 2


def test_confusion_topk(spark, pairs):
    top = confusion_topk(pairs, k=5).collect()
    assert len(top) > 0
    pairs_found = {(r.src, r.tgt) for r in top}
    assert ("o", "ui") in pairs_found or ("ui", "o") in pairs_found or len(pairs_found) >= 1
    # counts descending
    counts = [r.n for r in top]
    assert counts == sorted(counts, reverse=True)


def test_char_histogram_and_compare(spark):
    df = spark.createDataFrame([("aab",), ("bc",)], ["text"])
    h = {r.ch: r.n for r in char_histogram(df).collect()}
    assert h == {"a": 2, "b": 2, "c": 1}
    df2 = spark.createDataFrame([("ad",)], ["text"])
    cmp_ = {
        r.ch: (r.n_left, r.n_right)
        for r in histogram_compare(char_histogram(df), char_histogram(df2)).collect()
    }
    assert cmp_["a"] == (2, 1) and cmp_["d"] == (0, 1) and cmp_["c"] == (1, 0)


def test_worst_examples_order(spark, pairs):
    scored = with_fast_distance(pairs)
    w = worst_examples(scored, ["doc_id", "line_id"], k=2).collect()
    assert len(w) == 2
    assert w[0].cost >= w[1].cost


def test_perplexity(spark):
    import math

    df = spark.createDataFrame([(0.5, 1), (0.25, 1)], ["p", "len"]).withColumn(
        "nll", -F.log("p")
    )
    ppl = perplexity(df, "nll", "len").collect()[0].perplexity
    assert ppl == pytest.approx(math.exp((math.log(2) + math.log(4)) / 2))


def test_wer(spark):
    df = spark.createDataFrame(
        [("the quick fox", "the quikc fox"), ("a b", "a b")], ["gt_text", "ocr_text"]
    )
    rows = wer_pairs(df).collect()
    by = {r.gt_text: (r.dist, r.length) for r in rows}
    assert by["the quick fox"] == (1.0, 3)
    assert by["a b"] == (0.0, 2)


def test_confusion_and_worst_per_group(spark):
    """Grouped confusion_topk / worst_examples (the evaluate
    processor's per-fileGrp report sections): top-k is ranked WITHIN
    each group, worst-k likewise, and the group key survives into
    evaluation_report's confusion dicts."""
    from cor_asv_ann_spark.operators.evaluate import (
        confusion_topk,
        with_fast_distance,
        worst_examples,
    )
    from cor_asv_ann_spark.operators.report import evaluation_report

    rows = []
    # group A: many e→a confusions; group B: many o→0 confusions,
    # plus one much-worse line per group
    for i in range(4):
        rows.append(("d", f"a{i}", "beet", "baat", "A"))
        rows.append(("d", f"b{i}", "moon", "m00n", "B"))
    rows.append(("d", "aw", "worstlineaaaa", "zzzzzzzzzzzzz", "A"))
    rows.append(("d", "bw", "worstlinebbbb", "qqqqqqqqqqqqq", "B"))
    pairs = spark.createDataFrame(
        rows, "doc_id string, line_id string, gt_text string, "
              "ocr_text string, ocr_grp string")

    conf = confusion_topk(pairs, k=1, group_col="ocr_grp").collect()
    top = {r.ocr_grp: (r.src, r.tgt) for r in conf}
    assert top["A"] == ("a", "e")
    assert top["B"] == ("0", "o")
    assert len(conf) == 2  # exactly k per group

    worst = worst_examples(
        with_fast_distance(pairs), ["doc_id", "line_id"], k=1,
        group_col="ocr_grp",
    ).collect()
    assert {(r.ocr_grp, r.line_id) for r in worst} == {("A", "aw"),
                                                       ("B", "bw")}

    rep = evaluation_report(pairs, confusion_k=1, worst_k=1,
                            group_col="ocr_grp")
    assert {c["ocr_grp"] for c in rep["confusion"]} == {"A", "B"}
    assert {w["ocr_grp"] for w in rep["worst"]} == {"A", "B"}
    assert {c["ocr_grp"] for c in rep["cer"]} == {"A", "B"}
