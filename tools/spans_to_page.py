"""Span-table parquet → PAGE-XML writer (the output half of
tools/page_to_spans.py: the reference's processors emit corrected
PAGE-XML — wrapper/transcode.py writes TextEquivs back into the page
DOM — so a corrected span table must be exportable back to a PAGE-XML
workspace).

    python tools/spans_to_page.py --out pages_dir [--cpus N] SPANS_PARQUET
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output dir (one .xml per doc)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("spans", help="spans parquet path (doc_id, spans)")
    args = ap.parse_args()

    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.pagexml import write_pagexml_corpus
    from cor_asv_ann_spark.sources.spans import read_spans

    spark = build_session(app="spans_to_page", cpus=args.cpus)
    n = write_pagexml_corpus(read_spans(spark, args.spans), args.out)
    print(json.dumps({"out": args.out, "docs": n}))
    spark.stop()


if __name__ == "__main__":
    main()
