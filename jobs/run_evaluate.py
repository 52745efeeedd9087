"""spark-submit entry: evaluate OCR vs GT spans tables → JSON report.

    python jobs/run_evaluate.py --sf-dir /root/testdata/sf0.001 \
        [--metric Levenshtein-fast|adjusted] [--out report.json]

With --gt/--ocr pointing at spans parquet paths, evaluates those
instead of synthesizing from testdata.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir")
    ap.add_argument("--gt")
    ap.add_argument("--ocr")
    ap.add_argument("--metric", default="Levenshtein-fast")
    ap.add_argument("--out")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.operators.align_groups import lines_of
    from cor_asv_ann_spark.operators.report import evaluation_report, report_json
    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.spans import read_spans, synth_spans

    spark = build_session(app="evaluate", cpus=args.cpus)
    if args.gt and args.ocr:
        gt, ocr = read_spans(spark, args.gt), read_spans(spark, args.ocr)
    elif args.sf_dir:
        gt = synth_spans(spark, args.sf_dir, noisy=False)
        ocr = synth_spans(spark, args.sf_dir, noisy=True)
    else:
        ap.error("need --sf-dir or --gt/--ocr")

    pairs = (
        lines_of(gt)
        .withColumnRenamed("line_text", "gt_text")
        .join(
            lines_of(ocr).withColumnRenamed("line_text", "ocr_text"),
            ["doc_id", "line_no"],
        )
        .filter(F.col("gt_text") != "")
        .select(
            "doc_id", F.col("line_no").cast("string").alias("line_id"), "gt_text", "ocr_text"
        )
    )
    report = evaluation_report(pairs, metric=args.metric)
    text = report_json(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text[:2000])
    spark.stop()


if __name__ == "__main__":
    main()
