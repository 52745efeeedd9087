"""spark-submit entry: evaluate a correction model on GT pair files —
the Spark re-expression of the reference's `cor-asv-ann-eval` CLI
(/root/reference/ocrd_cor_asv_ann/scripts/eval.py: load a model, decode
the source side of TSV/.pkl pairs greedily and/or beamed, measure error
rates against the targets, optionally confusion table + histogram).

    python jobs/run_model_eval.py --model fixture.h5 --data pairs.tsv \
        [--beam] [--rejection 0.5] [--metric adjusted] [--confusion 10]

Outputs one JSON line: CER for the raw source (baseline), the greedy
decode, and (with --beam) the beamed decode, plus top confusions.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help=".h5 / .npz weights")
    ap.add_argument("--data", required=True, nargs="+", help="TSV or .pkl pair files")
    ap.add_argument("--beam", action="store_true", help="also evaluate beamed decode")
    ap.add_argument("--rejection", type=float, default=0.5)
    ap.add_argument("--metric", default="Levenshtein-fast",
                    choices=["Levenshtein-fast", "adjusted"])
    ap.add_argument("--gt-level", type=int, default=1)
    ap.add_argument("--confusion", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import functions as F

    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.operators.evaluate import (
        cer_aggregate,
        confusion_topk,
        with_adjusted_distance,
    )
    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.lines import read_pairs

    spark = build_session(app="model-eval", cpus=args.cpus)
    if args.model.endswith(".h5"):
        from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq

        model = RefSeq2Seq.load_h5(args.model)
    else:
        from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel

        model = Seq2SeqModel.load_npz(args.model)

    pairs = None
    for path in args.data:
        part = read_pairs(spark, path).select("source", "target")
        pairs = part if pairs is None else pairs.unionByName(part)
    pairs = pairs.persist()

    def decoded_frame(beam: bool):
        corr = make_model_corrector(
            spark, model, beam=beam, beam_width=4, rejection_threshold=args.rejection
        )

        def run(batches):
            for pdf in batches:
                outs, _probs, _paths = corr(pdf["source"])
                yield pd.DataFrame(
                    {"gt_text": pdf["target"], "ocr_text": [o.rstrip("\n") for o in outs]}
                )

        return pairs.mapInPandas(run, schema="gt_text string, ocr_text string")

    def cer_of(df):
        if args.metric == "adjusted":
            scored = with_adjusted_distance(
                df, normalization="historic_latin", gt_level=args.gt_level
            )
            return cer_aggregate(scored).collect()[0].cer
        scored = df.select(
            F.levenshtein("ocr_text", "gt_text").cast("double").alias("dist"),
            F.greatest(F.length("ocr_text"), F.length("gt_text"))
            .cast("double")
            .alias("length"),
        )
        r = scored.agg(
            (F.sum("dist") / F.sum("length")).alias("cer")
        ).collect()[0]
        return float(r.cer) if r.cer is not None else None

    baseline = pairs.select(
        F.col("target").alias("gt_text"),
        F.regexp_replace("source", r"\n$", "").alias("ocr_text"),
    )
    def rounded(x):
        # cer_of is None on empty pair files / null aggregates — report
        # null instead of crashing the job on round(None, 6)
        return round(x, 6) if x is not None else None

    report = {
        "n_lines": pairs.count(),
        "cer_source": rounded(cer_of(baseline)),
    }
    greedy = decoded_frame(beam=False).persist()
    report["cer_greedy"] = rounded(cer_of(greedy))
    if args.confusion:
        report["confusions"] = [
            [r.src, r.tgt, r.n]
            for r in confusion_topk(greedy, k=args.confusion).collect()
        ]
    greedy.unpersist()
    if args.beam:
        report["cer_beam"] = rounded(cer_of(decoded_frame(beam=True)))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
