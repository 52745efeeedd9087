"""End-to-end evaluation report — the reference's `cor-asv-ann-eval` /
`ocrd-cor-asv-ann-evaluate` output surface (wrapper/evaluate.py:95-150
workspace merge + 137-146 JSON reports; scripts/eval.py).

Given paired line tables (GT group 0 privileged), produce per-pair and
aggregate metrics: CER/WER (mean ± σ via the distributed Chan
aggregation), top-k confusions, character histograms of both sides,
worst-k example lines, and corpus perplexity when per-line scores are
present. One job, one pass per metric family, one JSON document out —
the same shape the reference writes per page + aggregate.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .evaluate import (
    cer_aggregate,
    char_histogram,
    confusion_topk,
    histogram_compare,
    wer_pairs,
    with_adjusted_distance,
    with_fast_distance,
    worst_examples,
)


def evaluation_report(
    pairs: DataFrame,
    metric: str = "Levenshtein-fast",
    normalization: str | None = "historic_latin",
    gt_level: int = 1,
    confusion_k: int = 10,
    worst_k: int = 10,
    group_col: str | None = None,
) -> dict:
    """pairs: (doc_id, line_id, gt_text, ocr_text[, <group_col>]).
    Returns a JSON-serializable report dict."""
    if metric == "Levenshtein-fast":
        scored = with_fast_distance(pairs)
    else:
        scored = with_adjusted_distance(
            pairs, normalization=normalization, gt_level=gt_level
        )
    scored = scored.persist()
    groups = [group_col] if group_col else []

    cer = cer_aggregate(scored, *groups).collect()
    wer = cer_aggregate(wer_pairs(pairs), *groups).collect()
    conf = confusion_topk(pairs, k=confusion_k).collect()
    worst = worst_examples(scored, ["doc_id", "line_id"], k=worst_k).collect()
    hist = histogram_compare(
        char_histogram(pairs.select(F.col("ocr_text").alias("text"))),
        char_histogram(pairs.select(F.col("gt_text").alias("text"))),
    ).orderBy(F.desc("n_right")).limit(30).collect()
    scored.unpersist()

    def row_dicts(rows):
        return [r.asDict() for r in rows]

    report = {
        "metric": metric,
        "normalization": normalization,
        "gt_level": gt_level,
        "cer": row_dicts(cer),
        "wer": [
            {**r.asDict(), "wer": r.cer} for r in wer
        ],  # same aggregation, word grain
        "confusion": [
            {"source": r.src, "target": r.tgt, "count": r.n} for r in conf
        ],
        "worst": row_dicts(worst),
        "histogram": [
            {"char": r.ch, "ocr": r.n_left, "gt": r.n_right} for r in hist
        ],
    }
    return report


def report_json(report: dict) -> str:
    return json.dumps(report, ensure_ascii=False, indent=2, default=str)
