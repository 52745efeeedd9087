"""Streaming PAGE-XML workspace ingest.

A production digitization pipeline does not materialize a finished
corpus before correcting it — a scanner/OCR stage drops page files
into the workspace continuously. This module is the streaming twin of
the batch reader (sources/pagexml.py) + correction: a ``binaryFile``
file-source stream over the workspace directory, the SAME Arrow
mapInPandas parser per micro-batch (one code path, no drift between
batch and streaming semantics), and the exactly-once foreachBatch
correction sink of streaming/events.py.

The reference is batch-only (its processor walks a closed METS
workspace); incremental pickup is an engine capability beyond it. At
scale the file-source checkpoint tracks seen files, so a restarted
query resumes where it left off — the streaming analogue of the
lineage anti-join in checkpoint.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BINARY_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_pagexml_stream(
    spark: SparkSession,
    path: str,
    level: str = "word",
    max_files: int = 32,
    on_error: str = "fail",
) -> DataFrame:
    """Streaming (doc_id, spans) frame over a directory new PAGE-XML
    files keep arriving in. ``max_files`` bounds each micro-batch
    (maxFilesPerTrigger); parsing is the batch reader's own
    ``_parse_files`` UDF, so every parity/robustness property of the
    batch path (reading order, RTL/BTT, on_error=skip visibility)
    holds per micro-batch."""
    from ..sources.pagexml import _FULL_SCHEMA, _parse_files

    if level not in ("line", "word", "glyph"):
        raise ValueError(f"level must be line|word|glyph, not {level!r}")
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    raw = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .option("maxFilesPerTrigger", max_files)
        .schema(_BINARY_SCHEMA)
        .load(path)
        .select("path", "content")
    )
    full = raw.mapInPandas(
        _parse_files(level, on_error=on_error), schema=_FULL_SCHEMA
    )
    return full.select("doc_id", "spans")


def streaming_pagexml_correction(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    corrector=None,
    level: str = "word",
    **reader_kw,
):
    """Watch ``pages_dir`` → parse → correct → exactly-once parquet
    epochs under ``out_dir`` (streaming/events.streaming_correction's
    idempotent sink). Returns the StreamingQuery; with the default
    ``availableNow`` trigger it drains everything currently present
    and stops — rerunning with the same checkpoint picks up ONLY pages
    added since (file-source seen-files tracking)."""
    from .events import streaming_correction

    spans = read_pagexml_stream(spark, pages_dir, level=level, **reader_kw)
    return streaming_correction(
        spark, spans, out_dir, checkpoint_dir, corrector=corrector
    )
