"""Reading-order normalization (W1 extension): right-to-left and
bottom-to-top direction handling at ingest.

The reference honors PAGE-XML ``readingDirection``/``textLineOrder``
while walking the tree: BOTTOMTOTOP reverses the line list of a region,
RIGHTTOLEFT reverses the word list of a line (and the glyph list of a
word) — /root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:693-713.

In the flattened span table the same normalization is a pure
DataFrame rewrite: bottom-to-top mirrors line numbers per document;
right-to-left mirrors the offsets of text spans (word/glyph/space)
within their line — [w1, sp, w2, sp, w3] becomes [w3, sp, w2, sp, w1]
because the artificial whitespace spans are position-symmetric, and at
glyph grain the same mirror reverses glyphs within words AND word order
(exactly the reference's nested reversal). The line-final newline and
any media spans keep their positions; offsets are densely renumbered.
One shuffle (the per-document reassembly), all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .correction import spans_with_line_no

TEXT_KINDS = ("word", "glyph", "space")


def apply_reading_order(
    spans_df: DataFrame,
    bottom_to_top: bool = False,
    right_to_left: bool = False,
) -> DataFrame:
    """Rewrite the span order for the given reading direction; offsets
    are renumbered 0..n−1 in the new order."""
    if not (bottom_to_top or right_to_left):
        return spans_df
    flat = spans_with_line_no(spans_df)
    if bottom_to_top:
        w_doc = Window.partitionBy("doc_id")
        flat = flat.withColumn(
            "line_no", F.max("line_no").over(w_doc) - F.col("line_no")
        )
    sort_key = F.col("offset").cast("double")
    if right_to_left:
        is_txt = F.col("kind").isin(*TEXT_KINDS)
        w_line = Window.partitionBy("doc_id", "line_no")
        lo = F.min(F.when(is_txt, F.col("offset"))).over(w_line)
        hi = F.max(F.when(is_txt, F.col("offset"))).over(w_line)
        # mirror text-span offsets within [lo, hi]; newline/media keep
        # their absolute position (ties broken by the original offset)
        sort_key = F.when(is_txt, (lo + hi - F.col("offset")).cast("double")).otherwise(
            F.col("offset").cast("double")
        )
    flat = flat.withColumn("sort_key", sort_key)
    return (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("line_no", "sort_key", "offset", "kind", "text", "media_ref")
                )
            ).alias("sp")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sp, (x, i) -> struct(x.kind as kind, x.text as text,"
                " x.media_ref as media_ref, cast(i as int) as offset))"
            ).alias("spans"),
        )
    )
