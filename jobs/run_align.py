"""spark-submit entry mirroring `ocrd-cor-asv-ann-align` (the
reference's multi-OCR line alignment/voting processor,
wrapper/align.py:27-258 + ocrd-tool.json `ocrd-cor-asv-ann-align`):
N PAGE-XML workspaces (one per OCR engine / fileGrp) in → N-way
character alignment + per-column vote → one PAGE-XML workspace out.

    python jobs/run_align.py --pagexml-in ocrA/ ocrB/ ocrC/ \
        --pagexml-out voted/ [--method majority|confidence|combined] \
        [--cpus 8] [--on-error fail|skip]
    # or on an OCR-D workspace (the reference's own invocation shape,
    # `-I OCR1,OCR2,OCR3 -O ALIGNED`): input fileGrps resolved via the
    # METS fileSec/structMap, output registered as a new fileGrp
    python jobs/run_align.py --mets ws/mets.xml -I OCR1,OCR2,OCR3 \
        -O ALIGNED --method majority

Parity with the reference:
  * the FIRST input group is the master — its pages/lines define the
    output, order and geometry (align.py:102-104 first-non-empty-
    fileGrp-as-base); lines are matched across groups by TextLine @id
    (align.py:109-111), missing/empty lines ignored in the vote.
  * `method` majority/confidence/combined exactly as align.py:62-70
    (majority and combined require ≥3 input groups, align.py:50-52);
    per-character confidences come from TextEquiv/@conf.
  * output drops word/glyph segmentation (align.py:81-83: children
    removed, line-level TextEquiv only) and keeps the master's
    TextLine ids/Coords.

Spark shape: one binaryFile scan per group (line grain, XML parsed
once) → (N-1) equi-joins on (doc_id, line_id) → one Arrow batch pass
doing align+vote (TSP pairwise expansion per line, bounded by N) →
doc-keyed collect_list reassembly → distributed PAGE-XML write. The
joins hash-partition on doc_id/line_id — at corpus scale every stage
is a narrow pass over co-partitioned line rows.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pagexml-in", nargs="+",
                    help="N input PAGE-XML directories (first = master)")
    ap.add_argument("--pagexml-out")
    ap.add_argument("--mets",
                    help="OCR-D workspace mets.xml (alternative to "
                         "--pagexml-in/--pagexml-out; resolves -I/-O "
                         "fileGrps and registers the output fileGrp)")
    ap.add_argument("-I", "--input-file-grp",
                    help="comma-separated input fileGrps (with --mets)")
    ap.add_argument("-O", "--output-file-grp",
                    help="output fileGrp (with --mets)")
    ap.add_argument("--method", default="majority",
                    choices=["majority", "confidence", "combined"])
    ap.add_argument("--on-error", default="fail", choices=["fail", "skip"])
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    register = None
    page_maps = None
    if args.mets:
        if not (args.input_file_grp and args.output_file_grp):
            ap.error("--mets needs -I and -O")
        from cor_asv_ann_spark.sources.mets import resolve_workspace

        # remap_pages: each fileGrp names its files after its own
        # FILEIDs, so cross-group matching must go through the
        # structMap physical page ids, not file basenames
        inputs, out_dir, register, page_maps = resolve_workspace(
            args.mets, args.input_file_grp, args.output_file_grp,
            remap_pages=True,
        )
    elif args.pagexml_in and args.pagexml_out:
        inputs, out_dir = [[d] for d in args.pagexml_in], args.pagexml_out
    else:
        ap.error("need --pagexml-in + --pagexml-out, or --mets with -I/-O")
    if len(inputs) < 2:
        ap.error("need multiple input groups to align (align.py:50)")
    if args.method in ("majority", "combined") and len(inputs) < 3:
        ap.error(f"need more than 2 input groups for method={args.method} "
                 "(align.py:51-52)")

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.operators.align_groups import align_vote_lines
    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.pagexml import (
        line_table,
        read_pagexml_full,
        write_pagexml_corpus,
    )

    spark = build_session(app="align", cpus=args.cpus)
    tables = [
        line_table(
            read_pagexml_full(spark, p, level="line", on_error=args.on_error)
        )
        for p in inputs
    ]
    if page_maps is not None:
        from cor_asv_ann_spark.sources.mets import remap_doc_ids

        tables = [remap_doc_ids(t, m) for t, m in zip(tables, page_maps)]
    voted = align_vote_lines(tables, method=args.method).persist()

    # reassemble the span skeleton per doc: line span (master geometry)
    # + artificial newline, offsets by reading-order position
    agg = voted.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("line_idx", "line_ref", "voted_text", "voted_conf")
            )
        ).alias("a")
    )
    out = agg.select(
        "doc_id",
        F.flatten(
            F.transform(
                "a",
                lambda x, i: F.array(
                    F.struct(
                        F.lit("line").alias("kind"),
                        x["voted_text"].alias("text"),
                        x["line_ref"].alias("media_ref"),
                        (i * 2).cast("int").alias("offset"),
                    ),
                    F.struct(
                        F.lit("newline").alias("kind"),
                        F.lit("\n").alias("text"),
                        F.lit(None).cast("string").alias("media_ref"),
                        (i * 2 + 1).cast("int").alias("offset"),
                    ),
                ),
            )
        ).alias("spans"),
        F.flatten(
            F.transform(
                "a",
                lambda x: F.array(
                    x["voted_conf"].cast("float"), F.lit(1.0).cast("float")
                ),
            )
        ).alias("span_confs"),
    )
    n_files = write_pagexml_corpus(out, out_dir)
    if register is not None:
        import glob as _glob

        register(_glob.glob(f"{out_dir}/*.xml"))
    stats = voted.agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum(F.when(F.col("n_inputs") >= 2, 1).otherwise(0)).alias("voted"),
        F.avg("voted_conf").alias("mean_conf"),
    ).collect()[0]
    voted.unpersist()
    print(json.dumps({
        "files": n_files,
        "lines": stats.lines,
        "voted": int(stats.voted or 0),
        "mean_conf": round(float(stats.mean_conf or 1.0), 4),
        "method": args.method,
        "groups": len(inputs),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
