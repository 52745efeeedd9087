"""Static schemas of the engine (SURVEY.md §1.4: fixed, externally imposed).

The primary input shape is the interleaved span table from
BASELINE.json `input_hint`:

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

`kind` values mirror the reference's hierarchy levels plus its artificial
whitespace elements (/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:225-232
injects index=-1 space/newline TextEquivs between words and at line ends).
"""

from __future__ import annotations

from pyspark.sql import types as T

KINDS = ("line", "word", "glyph", "space", "newline", "media")
WS_KINDS = ("space", "newline")  # the artificial whitespace elements

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

# exploded (span-grain) shape used inside the pipeline
FLAT_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("conf", T.ArrayType(T.FloatType()), True),
    ]
)

# line-grain shape handed to the correction UDF (one row per text line;
# span arrays are position-aligned)
LINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_no", T.IntegerType(), False),
        T.StructField("kinds", T.ArrayType(T.StringType(), False), False),
        T.StructField("texts", T.ArrayType(T.StringType(), False), False),
        T.StructField("media_refs", T.ArrayType(T.StringType()), False),
        T.StructField("offsets", T.ArrayType(T.IntegerType(), False), False),
    ]
)

# confusion-network channel (SURVEY §1.2 encoding 3): one row per line,
# confmat = horizontal list of chunks, each a vertical list of
# (alternative, prob) — the reference's _line_sequences2confmat_sequences
# shape (wrapper/transcode.py:236-277); offsets advance by the longest
# alternative per chunk
CONFMAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_no", T.IntegerType(), False),
        T.StructField(
            "confmat",
            T.ArrayType(
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("alt", T.StringType(), False),
                            T.StructField("p", T.FloatType(), False),
                        ]
                    ),
                    False,
                ),
                False,
            ),
            False,
        ),
    ]
)

# correction UDF output: corrected per-span texts + per-span mean confidence
CORRECTED_LINE_SCHEMA = T.StructType(
    list(LINE_SCHEMA.fields)
    + [
        T.StructField("out_texts", T.ArrayType(T.StringType(), False), False),
        T.StructField("out_confs", T.ArrayType(T.FloatType(), False), False),
        T.StructField("line_cer", T.DoubleType(), True),
    ]
)

# per-bucket lineage/metrics row (north rule: checkpoint per-partition
# lineage + CER/throughput to a metrics table)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("sum_dist", T.DoubleType(), False),
        T.StructField("cer", T.DoubleType(), True),
        T.StructField("wall_sec", T.DoubleType(), False),
        T.StructField("docs_per_sec", T.DoubleType(), True),
        T.StructField("finished_at", T.TimestampType(), False),
    ]
)

EVAL_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_id", T.StringType(), False),
        T.StructField("gt_text", T.StringType(), False),
        T.StructField("ocr_text", T.StringType(), False),
    ]
)
