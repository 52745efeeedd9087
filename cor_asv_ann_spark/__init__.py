"""cor_asv_ann_spark — a from-scratch PySpark-native OCR post-correction
extraction engine with the query/data-processing capabilities of
ASVLeipzig/cor-asv-ann (reference studied read-only at /root/reference).

Layout
------
corelib/    pure-Python semantics (alignment, edit metrics, whitespace
            redistribution, OCR-noise model) — unit-testable without Spark;
            these are the "gold" functions the Spark pipeline must match.
model/      forward-only numpy seq2seq (encoder–attention–decoder LSTM)
            with greedy + beam decoding, weights broadcast to executors.
sources/    span-table synthesis + readers/writers (parquet now, Iceberg
            behind an import-try).
operators/  Spark DataFrame operators: correction pipeline, evaluation
            (CER/WER/confusion/histogram), dedup, similarity search,
            text statistics, multimodal plumbing.
plans/      plan helpers (salting, explain capture).
streaming/  Structured Streaming demos over the events table.
checkpoint  per-bucket lineage + resume.
"""

__version__ = "0.1.0"
