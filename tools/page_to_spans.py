"""PAGE-XML workspace → span-table parquet converter (the day-one
ingest tool a reference user needs: their data is PAGE-XML, this
engine's primary input is the interleaved span table).

    python tools/page_to_spans.py --out spans_pq [--level word] \
        [--conf-out conf_pq] [--confmat-out confmat_pq] \
        [--cpus N] GLOB_OR_DIR [...]

Mirrors the reference's ingest walk
(/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:161-234,
693-713, 744-763): reading-order traversal with RTL/BTT handling,
artificial whitespace spans, TextEquiv conf and alternatives. One
binaryFile scan parses everything; the optional confidence channels
(prob-line / confmat, SURVEY §1.2 encodings 2-3) are projections of
the same parsed frame — pass them to correct_pipeline(conf_df=...,
confmat_df=...).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output parquet dir (spans)")
    ap.add_argument("--level", default="word", choices=["line", "word", "glyph"],
                    help="hierarchy grain (reference textequiv_level)")
    ap.add_argument("--conf-out", default=None,
                    help="also write the per-char confidence channel")
    ap.add_argument("--confmat-out", default=None,
                    help="also write the TextEquiv-alternatives channel")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("inputs", nargs="+",
                    help="PAGE-XML files, globs, or directories")
    args = ap.parse_args()

    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.pagexml import read_pagexml_full, spans_of

    # directories pass through as-is: the reader lists them with
    # pathGlobFilter (*.xml), avoiding Hadoop's per-match glob cost
    paths = list(args.inputs)

    spark = build_session(app="page_to_spans", cpus=args.cpus)
    full = read_pagexml_full(spark, paths, level=args.level)
    if args.conf_out or args.confmat_out:
        full = full.cache()
    spans = spans_of(full)
    spans.write.mode("overwrite").parquet(args.out)
    report = {"out": args.out, "level": args.level,
              "docs": spark.read.parquet(args.out).count()}
    if args.conf_out:
        from cor_asv_ann_spark.sources.pagexml import conf_channel

        conf_channel(full).write.mode("overwrite").parquet(args.conf_out)
        report["conf_out"] = args.conf_out
    if args.confmat_out:
        from cor_asv_ann_spark.sources.pagexml import confmat_channel

        confmat_channel(full).write.mode("overwrite").parquet(args.confmat_out)
        report["confmat_out"] = args.confmat_out
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
