"""spark-submit entry mirroring `ocrd-cor-asv-ann-join` (the
reference's multi-fileGrp TextEquiv join processor,
wrapper/join.py:24-107 + ocrd-tool.json `ocrd-cor-asv-ann-join`):
N PAGE-XML workspaces in → per-line concatenation of every group's
TextEquiv alternatives → one PAGE-XML workspace out with
multi-TextEquiv lines.

    python jobs/run_join.py --pagexml-in ocrA/ ocrB/ \
        --pagexml-out joined/ [--add-filegrp-comments] \
        [--add-filegrp-index] [--cpus 8] [--on-error fail|skip]
    # or on an OCR-D workspace: -I fileGrps resolved via the METS,
    # output registered as a new fileGrp (names in @comments are the
    # fileGrp names, exactly the reference's annotation)
    python jobs/run_join.py --mets ws/mets.xml -I OCR1,OCR2 -O JOINED \
        --add-filegrp-comments

Parity with the reference:
  * lines matched across groups by TextLine @id (`match-on=id`,
    join.py:60-68; coords/baseline matching needs geometry-only keys
    the span anchor also carries — id is the default and the only
    mode here, documented).
  * the FIRST group is the master (join.py:83-86): its page/line set,
    order and geometry define the output; other groups contribute
    alternatives only where their line id matches.
  * `--add-filegrp-comments` stamps each TextEquiv/@comments with its
    source group name (the input directory's basename),
    `--add-filegrp-index` stamps @index with the group position
    (join.py:89-95); group order = CLI order, so the master's text
    stays the primary alternative (document order).

Spark shape: one scan per group → UNION ALL of line tables (group
provenance as a literal) → ONE hash aggregation per (doc_id, line_id)
collecting alternatives sorted by group index → master left-joins its
line skeleton → doc-keyed reassembly → distributed multi-TextEquiv
PAGE-XML write. The union aggregates map-side; no join is bigger than
the master's line table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pagexml-in", nargs="+",
                    help="N input PAGE-XML directories (first = master)")
    ap.add_argument("--pagexml-out")
    ap.add_argument("--mets",
                    help="OCR-D workspace mets.xml (alternative to "
                         "--pagexml-in/--pagexml-out)")
    ap.add_argument("-I", "--input-file-grp",
                    help="comma-separated input fileGrps (with --mets)")
    ap.add_argument("-O", "--output-file-grp",
                    help="output fileGrp (with --mets)")
    ap.add_argument("--add-filegrp-comments", action="store_true")
    ap.add_argument("--add-filegrp-index", action="store_true")
    ap.add_argument("--match-on", default="id",
                    choices=["id", "coords", "baseline"],
                    help="line match key across groups: TextLine @id, "
                         "Coords/@points, or Baseline/@points with "
                         "Coords fallback (join.py:60-68)")
    ap.add_argument("--on-error", default="fail", choices=["fail", "skip"])
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    register = None
    page_maps = None
    if args.mets:
        if not (args.input_file_grp and args.output_file_grp):
            ap.error("--mets needs -I and -O")
        from cor_asv_ann_spark.sources.mets import resolve_workspace

        inputs, out_dir, register, page_maps = resolve_workspace(
            args.mets, args.input_file_grp, args.output_file_grp,
            remap_pages=True,
        )
        grp_names = args.input_file_grp.split(",")
    elif args.pagexml_in and args.pagexml_out:
        inputs, out_dir = [[d] for d in args.pagexml_in], args.pagexml_out
        grp_names = None
    else:
        ap.error("need --pagexml-in + --pagexml-out, or --mets with -I/-O")
    if len(inputs) < 2:
        ap.error("need multiple input groups to join")

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.pagexml import (
        line_table,
        read_pagexml_full,
        write_pagexml_lines,
    )

    spark = build_session(app="join", cpus=args.cpus)
    if grp_names is None:
        grp_names = [
            os.path.basename(os.path.normpath(d[0])) or d[0] for d in inputs
        ]
    tables = [
        line_table(
            read_pagexml_full(spark, d, level="line", on_error=args.on_error)
        )
        for d in inputs
    ]
    if page_maps is not None:
        from cor_asv_ann_spark.sources.mets import remap_doc_ids

        tables = [remap_doc_ids(t, m) for t, m in zip(tables, page_maps)]
    # the master group feeds BOTH the union leg and the output line
    # skeleton — one cached parse, not two scans of the same fileGrp
    tables[0] = tables[0].persist()
    # match-on=id joins by TextLine @id, coords by the polygon,
    # baseline by Baseline/@points (Coords fallback — join.py:60-68).
    # An EMPTY key (line without @id / without Coords) is nulled so
    # distinct key-less lines cannot cross-merge — such master lines
    # keep their own TextEquiv via the fallback below.
    key = {"id": "line_id", "coords": "line_coords",
           "baseline": "line_baseline"}[args.match_on]
    key_col = F.when(F.col(key) != "", F.col(key))
    line_conf = F.coalesce(
        F.aggregate("confs", F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size("confs"), F.lit(1)),
        F.lit(1.0),
    )
    union = None
    for g, t in enumerate(tables):
        leg = t.select(
            "doc_id",
            key_col.alias("line_key"),
            "text",
            # line-level conf = mean of the per-char channel
            line_conf.alias("conf"),
            F.lit(g).alias("grp"),
        ).filter(F.col("line_key").isNotNull())
        union = leg if union is None else union.unionByName(leg)

    alts = union.groupBy("doc_id", "line_key").agg(
        F.array_sort(
            F.collect_list(F.struct("grp", "text", "conf"))
        ).alias("alts")
    )
    master = tables[0].select(
        "doc_id",
        "line_idx",
        "line_ref",
        key_col.alias("line_key"),
        F.col("text").alias("m_text"),
        line_conf.alias("m_conf"),
    )
    idx_lit = F.lit(args.add_filegrp_index)
    cmt_lit = F.lit(args.add_filegrp_comments)
    grp_name_arr = F.array(*[F.lit(n) for n in grp_names])
    # a master line no group matched (null/unique key) keeps its OWN
    # TextEquiv (the reference writes back line0's equivs either way,
    # join.py:103-106)
    fallback = F.array(
        F.struct(
            F.col("m_text").alias("text"),
            F.col("m_conf").cast("float").alias("conf"),
            F.when(idx_lit, F.lit(0)).cast("int").alias("idx"),
            F.when(cmt_lit, F.lit(grp_names[0])).alias("comments"),
        )
    )
    lines = master.join(alts, ["doc_id", "line_key"], "left").select(
        "doc_id",
        "line_idx",
        F.struct(
            F.col("line_ref").alias("line_ref"),
            F.coalesce(
                F.transform(
                    "alts",
                    lambda a: F.struct(
                        a["text"].alias("text"),
                        a["conf"].cast("float").alias("conf"),
                        F.when(idx_lit, a["grp"]).cast("int").alias("idx"),
                        F.when(
                            cmt_lit, F.element_at(grp_name_arr, a["grp"] + 1)
                        ).alias("comments"),
                    ),
                ),
                fallback,
            ).alias("equivs"),
        ).alias("line"),
    )
    out = lines.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
            lambda x: x["line"],
        ).alias("lines")
    )
    n_files = write_pagexml_lines(out, out_dir)
    if register is not None:
        import glob as _glob

        register(_glob.glob(f"{out_dir}/*.xml"))
    stats = alts.agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum(F.size("alts")).alias("alternatives"),
    ).collect()[0]
    print(json.dumps({
        "files": n_files,
        "lines": stats.lines,
        "alternatives": int(stats.alternatives or 0),
        "groups": grp_names,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
