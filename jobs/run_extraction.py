"""spark-submit entry: the full extraction pipeline in one job.

    HTML pages → DOM boilerplate strip → interleaved span table
      → OCR post-correction (rule / npz / h5 model)
      → exact + MinHash near-dup removal
      → quality scoring + language ID filter
      → clean corpus parquet + one JSON metrics line

Cluster usage (north rule: ships via --py-files):

    zip -r corasv.zip cor_asv_ann_spark/
    spark-submit --py-files corasv.zip jobs/run_extraction.py \
        --html <pages table> --output <dir> [--model weights.h5]

Local smoke:

    python jobs/run_extraction.py --sf-dir /root/testdata/sf0.001 \
        --output /tmp/extracted
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--html", help="parquet of (doc_id, html) pages")
    ap.add_argument("--warc", help="WARC file(s)/glob (crawl segments, .warc or .warc.gz)")
    ap.add_argument("--sf-dir", help="synthesize HTML pages from this testdata dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", help=".h5 / .npz model weights (default: rule corrector)")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.9, help="near-dup threshold")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.operators.dedup import drop_exact_dups, minhash_dedup
    from cor_asv_ann_spark.operators.html_extract import html_to_spans, synth_html
    from cor_asv_ann_spark.operators.textstats import lang_id, quality_score
    from cor_asv_ann_spark.session import build_session

    t0 = time.time()
    spark = build_session(app="extraction", cpus=args.cpus)
    if args.html:
        pages = spark.read.parquet(args.html)
    elif args.warc:
        from cor_asv_ann_spark.sources.warc import read_warc_pages

        pages = read_warc_pages(spark, args.warc)
    elif args.sf_dir:
        pages = synth_html(spark, args.sf_dir)
    else:
        ap.error("one of --html / --warc / --sf-dir is required")

    corrector = None
    if args.model:
        from cor_asv_ann_spark.model.corrector import make_model_corrector

        if args.model.endswith(".h5"):
            from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq

            corrector = make_model_corrector(spark, RefSeq2Seq.load_h5(args.model))
        else:
            from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel

            corrector = make_model_corrector(spark, Seq2SeqModel.load_npz(args.model))

    # 1) DOM strip → span table, 2) correction
    spans = html_to_spans(pages)
    corrected = correct_pipeline(spans, corrector=corrector)
    docs = corrected.select(
        "doc_id",
        F.concat_ws(
            "", F.expr("transform(filter(spans, s -> s.kind != 'media'), s -> s.text)")
        ).alias("text"),
    ).persist()
    n_extracted = docs.count()

    # 3) dedup: one-shuffle exact filter, then MinHash near-dup pairs
    survivors = drop_exact_dups(docs, "text", "doc_id")
    near = minhash_dedup(
        survivors, "text", "doc_id", threshold=args.jaccard, max_bucket=50
    ).select(F.col("id_b").alias("doc_id")).distinct()
    survivors = survivors.join(near, "doc_id", "left_anti")

    # 4) quality + language filters
    scored = quality_score(survivors, "text")
    labeled = lang_id(scored, "text")
    clean = labeled.filter(
        (F.col("quality") >= args.min_quality) & (F.col("pred_lang") != "und")
    ).select("doc_id", "text", "quality", "pred_lang")

    clean.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    n_clean = out.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_pages": n_extracted,
                "n_clean": n_clean,
                "kept_ratio": round(n_clean / max(n_extracted, 1), 4),
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_extracted / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
