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
    # per-pair confusion/worst when grouped — the reference's
    # report[pair]['confusion'] / worst-lines sections per fileGrp
    conf = confusion_topk(
        pairs, k=confusion_k, group_col=group_col
    ).collect()
    worst = worst_examples(
        scored, ["doc_id", "line_id"], k=worst_k, group_col=group_col
    ).collect()
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
            {
                **({group_col: r[group_col]} if group_col else {}),
                "source": r.src,
                "target": r.tgt,
                "count": r.n,
            }
            for r in conf
        ],
        "worst": row_dicts(worst),
        "histogram": [
            {"char": r.ch, "ocr": r.n_left, "gt": r.n_right} for r in hist
        ],
    }
    return report


def report_json(report: dict) -> str:
    return json.dumps(report, ensure_ascii=False, indent=2, default=str)


def per_page_reports(
    pairs: DataFrame,
    metric: str = "Levenshtein-fast",
    normalization: str | None = "historic_latin",
    gt_level: int = 1,
) -> DataFrame:
    """pairs (doc_id, line_id, gt_text, ocr_text, ocr_grp) → one row
    per (doc_id, ocr_grp) with the reference's per-page report fields
    (wrapper/evaluate.py:199-213 accumulates Edits per file, then
    report_pair writes num-lines/num-chars/num-words + CER/WER
    mean±varia per pair). Two hash aggregations (char + word grain),
    one join on the tiny aggregate — no per-page driver loop."""
    if metric == "Levenshtein-fast":
        scored = with_fast_distance(pairs)
    else:
        scored = with_adjusted_distance(
            pairs, normalization=normalization, gt_level=gt_level
        )
    cer = cer_aggregate(scored, "doc_id", "ocr_grp").select(
        "doc_id",
        "ocr_grp",
        F.col("n_lines").alias("num_lines"),
        F.col("sum_len").alias("num_chars"),
        F.col("cer").alias("char_error_rate_mean"),
        F.col("var_rate").alias("char_error_rate_varia"),
    )
    wer = cer_aggregate(wer_pairs(pairs), "doc_id", "ocr_grp").select(
        "doc_id",
        "ocr_grp",
        F.col("sum_len").alias("num_words"),
        F.col("cer").alias("word_error_rate_mean"),
        F.col("var_rate").alias("word_error_rate_varia"),
    )
    return cer.join(wer, ["doc_id", "ocr_grp"], "left")


def write_page_reports(per_page: DataFrame, out_dir: str) -> int:
    """Distributed per-page JSON writer: one ``<doc_id>.json`` per page
    under ``out_dir`` (the evaluate processor's per-page output files),
    keyed by OCR group inside each file. Tasks write their partitions;
    returns the number of files written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in per_page.columns if c not in ("doc_id",)]
    agg = per_page.groupBy("doc_id").agg(
        F.collect_list(F.struct(*cols)).alias("rows")
    )

    def write_part(batches):
        import pandas as pd

        n = 0
        for pdf in batches:
            for _, row in pdf.iterrows():
                report = {}
                for r in sorted(row["rows"], key=lambda r: r["ocr_grp"]):
                    report[r["ocr_grp"]] = {
                        k.replace("_", "-"): (
                            float(v) if v is not None else None
                        )
                        for k, v in dict(r).items()
                        if k != "ocr_grp"
                    }
                path = os.path.join(out_dir, f"{row['doc_id']}.json")
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(report, f, ensure_ascii=False, indent=2)
                n += 1
        yield pd.DataFrame({"n": [n]})

    parts = agg.mapInPandas(write_part, schema="n long")
    return sum(r.n for r in parts.collect())
