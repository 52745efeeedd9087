"""XY-cut layout analysis: recursive whitespace-gap reading order."""

import numpy as np
from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.layout import (
    reading_order_blocks,
    synth_blocks,
    xy_cut,
)


def test_xy_cut_two_columns():
    # two columns of two blocks each; correct order: col0 top, col0
    # bottom, col1 top, col1 bottom
    boxes = np.array(
        [
            [120, 10, 100, 30],  # col1 top     → order 2
            [10, 50, 100, 30],   # col0 bottom  → order 1
            [120, 50, 100, 30],  # col1 bottom  → order 3
            [10, 10, 100, 30],   # col0 top     → order 0
        ],
        dtype=float,
    )
    assert xy_cut(boxes) == [3, 1, 0, 2]


def test_xy_cut_single_column_rows():
    boxes = np.array(
        [[10, 90, 100, 20], [10, 10, 100, 20], [10, 50, 100, 20]], dtype=float
    )
    assert xy_cut(boxes) == [1, 2, 0]  # top to bottom


def test_xy_cut_no_gap_raster_fallback():
    # overlapping blocks: no cut possible → raster (y, then x) order
    boxes = np.array(
        [[50, 0, 100, 100], [0, 0, 100, 100], [25, 0, 100, 100]], dtype=float
    )
    assert xy_cut(boxes) == [1, 2, 0]


def test_xy_cut_header_spanning_columns():
    # a full-width header above two columns must come first
    boxes = np.array(
        [
            [10, 60, 100, 30],   # col0 body
            [120, 60, 100, 30],  # col1 body
            [10, 10, 210, 30],   # header spans both columns
        ],
        dtype=float,
    )
    order = xy_cut(boxes)
    assert order[0] == 2
    assert order[1:] == [0, 1]


def test_pdf_stub_plumbing(spark):
    """pdf_to_blocks: real schema/batching, honestly-stubbed codec."""
    from cor_asv_ann_spark.operators.layout import pdf_to_blocks

    df = spark.createDataFrame(
        [("p1", bytearray(b"x" * 200)), ("p2", bytearray(b"y" * 40))],
        "doc_id string, content binary",
    )
    rows = pdf_to_blocks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc["p1"]) == 3 and len(by_doc["p2"]) == 1
    ordered = reading_order_blocks(pdf_to_blocks(df)).collect()
    assert all(r.order == r.block_id for r in ordered)  # single column


def test_reading_order_blocks_on_fixture(spark, sf_small):
    blocks = synth_blocks(spark, sf_small, n_columns=2, rows_per_col=4).filter(
        F.col("doc_id").cast("int") < 20
    )
    ordered = reading_order_blocks(blocks)
    rows = ordered.collect()
    assert rows
    # by construction block_id IS the correct column-major reading order
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.order, r.block_id))
    for doc, pairs in by_doc.items():
        pairs.sort()
        assert [b for _, b in pairs] == list(range(len(pairs))), doc
