"""spark-submit entry mirroring `ocrd-cor-asv-ann-join` (the
reference's multi-fileGrp TextEquiv join processor,
wrapper/join.py:24-107 + ocrd-tool.json `ocrd-cor-asv-ann-join`):
N PAGE-XML workspaces in → per-line concatenation of every group's
TextEquiv alternatives → one PAGE-XML workspace out with
multi-TextEquiv lines.

    python jobs/run_join.py --pagexml-in ocrA/ ocrB/ \
        --pagexml-out joined/ [--add-filegrp-comments] \
        [--add-filegrp-index] [--cpus 8] [--on-error fail|skip]

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
    ap.add_argument("--pagexml-in", nargs="+", required=True,
                    help="N input PAGE-XML directories (first = master)")
    ap.add_argument("--pagexml-out", required=True)
    ap.add_argument("--add-filegrp-comments", action="store_true")
    ap.add_argument("--add-filegrp-index", action="store_true")
    ap.add_argument("--on-error", default="fail", choices=["fail", "skip"])
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    if len(args.pagexml_in) < 2:
        ap.error("need multiple input groups to join")

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.pagexml import (
        line_table,
        read_pagexml_full,
        write_pagexml_lines,
    )

    spark = build_session(app="join", cpus=args.cpus)
    grp_names = [
        os.path.basename(os.path.normpath(d)) or d for d in args.pagexml_in
    ]
    union = None
    for g, d in enumerate(args.pagexml_in):
        t = line_table(
            read_pagexml_full(spark, d, level="line", on_error=args.on_error)
        ).select(
            "doc_id",
            "line_id",
            "text",
            # line-level conf = mean of the per-char channel
            F.coalesce(
                F.aggregate(
                    "confs", F.lit(0.0), lambda acc, x: acc + x
                )
                / F.greatest(F.size("confs"), F.lit(1)),
                F.lit(1.0),
            ).alias("conf"),
            F.lit(g).alias("grp"),
        )
        union = t if union is None else union.unionByName(t)

    alts = union.groupBy("doc_id", "line_id").agg(
        F.array_sort(
            F.collect_list(F.struct("grp", "text", "conf"))
        ).alias("alts")
    )
    master = (
        line_table(
            read_pagexml_full(
                spark, args.pagexml_in[0], level="line",
                on_error=args.on_error,
            )
        ).select("doc_id", "line_idx", "line_ref", "line_id")
    )
    idx_lit = F.lit(args.add_filegrp_index)
    cmt_lit = F.lit(args.add_filegrp_comments)
    grp_name_arr = F.array(*[F.lit(n) for n in grp_names])
    lines = master.join(alts, ["doc_id", "line_id"], "left").select(
        "doc_id",
        "line_idx",
        F.struct(
            F.col("line_ref").alias("line_ref"),
            F.transform(
                F.coalesce("alts", F.array()),
                lambda a: F.struct(
                    a["text"].alias("text"),
                    a["conf"].cast("float").alias("conf"),
                    F.when(idx_lit, a["grp"]).cast("int").alias("idx"),
                    F.when(
                        cmt_lit, F.element_at(grp_name_arr, a["grp"] + 1)
                    ).alias("comments"),
                ),
            ).alias("equivs"),
        ).alias("line"),
    )
    out = lines.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
            lambda x: x["line"],
        ).alias("lines")
    )
    n_files = write_pagexml_lines(out, args.pagexml_out)
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
