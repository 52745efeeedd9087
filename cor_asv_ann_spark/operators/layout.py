"""Layout analysis (north rule 'PDF/layout parse, DOM heuristics'):
recursive XY-cut reading order over geometric text blocks.

A page arrives as unordered blocks with bounding boxes; XY-cut
recursively splits at the widest horizontal/vertical whitespace gap
(columns first, then rows within a column) until regions are atomic,
yielding the classical top-to-bottom / left-to-right-in-columns reading
order. The cut itself is a pure per-document function (pages are small)
run in Arrow batches via applyInPandas keyed on doc_id — the grouping
shuffle is the only exchange; block geometry stays numpy inside the
batch. PDF *decoding* (bytes → blocks) is a codec concern like the
multimodal stubs; the layout algorithm and the Spark plumbing here are
real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("w", T.DoubleType(), False),
        T.StructField("h", T.DoubleType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

ORDERED_SCHEMA = T.StructType(
    list(BLOCKS_SCHEMA.fields) + [T.StructField("order", T.IntegerType(), False)]
)


def xy_cut(boxes: np.ndarray, min_gap: float = 1.0) -> list[int]:
    """Recursive XY-cut over (N, 4) xywh boxes → index permutation in
    reading order. Splits on the widest whitespace gap, preferring
    VERTICAL cuts (column detection) over horizontal, then recurses
    left/top first."""
    idx = np.arange(len(boxes))

    def widest_gap(lo: np.ndarray, hi: np.ndarray) -> tuple[float, float]:
        """(gap_width, cut_position) of the widest uncovered interval
        strictly inside the projection of [lo, hi) intervals."""
        order = np.argsort(lo)
        best_w, best_at = 0.0, 0.0
        cover = -np.inf
        for i in order:
            if cover > -np.inf and lo[i] - cover > best_w:
                best_w, best_at = lo[i] - cover, (lo[i] + cover) / 2
            cover = max(cover, hi[i])
        return best_w, best_at

    def rec(ids: np.ndarray) -> list[int]:
        if len(ids) <= 1:
            return ids.tolist()
        b = boxes[ids]
        # vertical cut (x gap → columns) wins ties: newspapers read
        # column-by-column
        vgap, vat = widest_gap(b[:, 0], b[:, 0] + b[:, 2])
        hgap, hat = widest_gap(b[:, 1], b[:, 1] + b[:, 3])
        if vgap >= min_gap and vgap >= hgap:
            left = ids[b[:, 0] + b[:, 2] / 2 < vat]
            right = ids[b[:, 0] + b[:, 2] / 2 >= vat]
            if len(left) and len(right):
                return rec(left) + rec(right)
        if hgap >= min_gap:
            top = ids[b[:, 1] + b[:, 3] / 2 < hat]
            bottom = ids[b[:, 1] + b[:, 3] / 2 >= hat]
            if len(top) and len(bottom):
                return rec(top) + rec(bottom)
        # atomic region: raster order
        return ids[np.lexsort((b[:, 0], b[:, 1]))].tolist()

    return rec(idx)


def reading_order_blocks(blocks: DataFrame, min_gap: float = 1.0) -> DataFrame:
    """(doc_id, block_id, x, y, w, h, text) → same + ``order`` (the
    XY-cut reading position). One groupBy(doc_id) exchange assembles
    each page into a single array row; the recursive cut itself runs in
    a pandas UDF that sees ONLY the geometry (four array<double>
    columns) and returns the index permutation — the text payload never
    crosses the JVM↔Python boundary in either direction (guide §4.1:
    pass only the columns the function needs; the former mapInPandas
    shipped every block's text out to Python and back, plus a 40k-row
    Python dict-append reassembly loop). The permutation is applied
    JVM-side with transform + posexplode."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def perm_udf(
        xs: pd.Series, ys: pd.Series, ws: pd.Series, hs: pd.Series
    ) -> pd.Series:
        out = []
        for x, y, w, h in zip(xs, ys, ws, hs):
            boxes = np.column_stack(
                [
                    np.asarray(x, dtype=np.float64),
                    np.asarray(y, dtype=np.float64),
                    np.asarray(w, dtype=np.float64),
                    np.asarray(h, dtype=np.float64),
                ]
            )
            out.append(np.asarray(xy_cut(boxes, min_gap=min_gap), dtype=np.int32))
        return pd.Series(out)

    # pre-partition the block grain to a compute-sized partition count
    # (the flagship's exchange-merge pattern, correction.py): the
    # groupBy's ClusteredDistribution is satisfied by the explicit
    # HashPartitioning, so the aggregation adds no exchange of its own —
    # and because user-specified partition counts are not coalesced by
    # AQE, the per-page Python xy_cut stage keeps full parallelism
    # (AQE's size-based coalescing collapsed the tiny geometry rows to
    # ~1 partition, serializing 5000 recursive cuts in one worker —
    # measured 3 Arrow batches total at sf0.1)
    n_parts = blocks.sparkSession.sparkContext.defaultParallelism * 2
    assembled = blocks.repartition(n_parts, "doc_id").groupBy("doc_id").agg(
        F.collect_list(F.struct("block_id", "x", "y", "w", "h", "text")).alias("bs")
    )
    permuted = assembled.select(
        "doc_id",
        "bs",
        perm_udf(
            F.expr("transform(bs, b -> b.x)"),
            F.expr("transform(bs, b -> b.y)"),
            F.expr("transform(bs, b -> b.w)"),
            F.expr("transform(bs, b -> b.h)"),
        ).alias("perm"),
    )
    return permuted.select(
        "doc_id", F.posexplode(F.expr("transform(perm, i -> bs[i])")).alias("order", "b")
    ).select(
        "doc_id",
        F.col("b.block_id").alias("block_id"),
        F.col("b.x").alias("x"),
        F.col("b.y").alias("y"),
        F.col("b.w").alias("w"),
        F.col("b.h").alias("h"),
        F.col("b.text").alias("text"),
        F.col("order").cast("int").alias("order"),
    )


def pdf_to_blocks(pdf_df: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, content: binary) PDF pages → BLOCKS_SCHEMA rows.

    STUB DECODE: no PDF codec ships in this container (same policy as
    operators/multimodal.decode_stub — the Spark plumbing is real, the
    byte-level codec is a stand-in). Each document deterministically
    yields a fake single-column block list derived from its byte length,
    so downstream reading_order_blocks / pipelines are exercised with
    the true schema, partitioning and batch shapes. Swap the inner
    ``_decode`` for pdfminer/pypdf output on a real deployment."""

    def _decode(doc_id: str, content: bytes) -> list[dict]:
        n_blocks = max(1, min(len(content) // 64, 8))
        return [
            {
                "doc_id": doc_id,
                "block_id": i,
                "x": 10.0,
                "y": 10.0 + i * 40.0,
                "w": 100.0,
                "h": 30.0,
                "text": f"stub-block-{i} ({len(content)} bytes)",
            }
            for i in range(n_blocks)
        ]

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"].astype(str), pdf[content_col]):
                rows.extend(_decode(doc_id, bytes(content)))
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    return pdf_df.select("doc_id", content_col).mapInPandas(run, schema=BLOCKS_SCHEMA)


def synth_blocks(
    spark, sf_dir: str, n_columns: int = 2, rows_per_col: int = 4
) -> DataFrame:
    """Deterministic two-column page layout from the documents fixture:
    document words are dealt into column-major blocks so the correct
    XY-cut reading order is known by construction (column 0 top-to-
    bottom, then column 1)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_blocks = n_columns * rows_per_col
    # pure-JVM synthesis (was a mapInPandas + a repartition exchange):
    # words dealt exactly like the former Python loop — per =
    # max(len//n_blocks, 1), block bid gets words[bid*per:(bid+1)*per],
    # col = bid // rows_per_col, row = bid % rows_per_col
    block = (
        f"transform(sequence(0, {n_blocks - 1}), bid -> struct("
        f"  bid as block_id,"
        f"  10.0d + cast(bid div {rows_per_col} as double) * 120.0d as x,"
        f"  10.0d + cast(bid % {rows_per_col} as double) * 40.0d as y,"
        f"  100.0d as w, 30.0d as h,"
        f"  array_join(slice(_ws, bid * _per + 1, _per), ' ') as text))"
    )
    e = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        # hoisted out of the transform lambda: HOF bodies are not
        # subject to loop-invariant code motion, so an inline split
        # would re-tokenize the document once per block
        F.expr("filter(split(text, '\\\\s+'), x -> x != '')").alias("_ws"),
    ).withColumn(
        "_per", F.expr(f"greatest(size(_ws) div {n_blocks}, 1)")
    ).select(
        "doc_id", F.explode(F.expr(block)).alias("b")
    )
    return e.select(
        "doc_id",
        F.col("b.block_id").alias("block_id"),
        F.col("b.x").alias("x"),
        F.col("b.y").alias("y"),
        F.col("b.w").alias("w"),
        F.col("b.h").alias("h"),
        F.col("b.text").alias("text"),
    )
