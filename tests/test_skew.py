"""Long-document skew: the reference sends a whole page as ONE model
batch (transcode.py:110-115) — the exact failure mode the line-grain
redistribution is designed to defeat. A pathologically long document
must (a) spread its lines across many tasks and (b) still reassemble to
exact span equality."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.corelib.noise import degrade_reversible
from cor_asv_ann_spark.operators.correction import (
    assemble_lines,
    correct_lines,
    correct_pipeline,
    spans_with_line_no,
)
from cor_asv_ann_spark.schema import SPANS_SCHEMA
from cor_asv_ann_spark.sources.spans import build_spans


def _spans_df(spark, docs: dict[str, str], noisy: bool):
    rows = []
    for doc_id, text in docs.items():
        spans = build_spans(doc_id, text)
        if noisy:
            spans = [
                (k, degrade_reversible(t, f"{doc_id}:{o}") if k == "word" else t, r, o)
                for (k, t, r, o) in spans
            ]
        rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": r, "offset": o}
                    for (k, t, r, o) in spans
                ],
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=SPANS_SCHEMA)


@pytest.fixture(scope="module")
def skewed_docs():
    words = "the sorrow west rswift wall slow windows fast stream".split()
    giant = " ".join(words[i % len(words)] for i in range(20000))  # ~2900 lines
    docs = {"giant": giant}
    for d in range(50):
        docs[f"small{d:02d}"] = " ".join(words[(d + i) % len(words)] for i in range(30))
    return docs


def test_giant_doc_spreads_across_tasks(spark, skewed_docs):
    noisy = _spans_df(spark, skewed_docs, noisy=True)
    lines = assemble_lines(spans_with_line_no(noisy))

    def pid(it):
        from pyspark import TaskContext

        for pdf in it:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "pid": TaskContext.get().partitionId(),
                    }
                )

    # same explicit repartitioning as correct_lines applies
    n_part = spark.sparkContext.defaultParallelism * 2
    placed = lines.repartition(n_part, "doc_id", "line_no").mapInPandas(
        pid, "doc_id string, pid int"
    )
    giant_parts = placed.filter(F.col("doc_id") == "giant").select("pid").distinct().count()
    assert giant_parts > 4  # the giant doc is NOT one task


def test_skewed_corpus_exact_equality(spark, skewed_docs):
    gt = _spans_df(spark, skewed_docs, noisy=False)
    noisy = _spans_df(spark, skewed_docs, noisy=True)
    out = correct_pipeline(noisy)
    flat = lambda df: df.select("doc_id", F.explode("spans").alias("s")).select(  # noqa: E731
        "doc_id", "s.*"
    )
    a, b = flat(out), flat(gt)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # giant doc reassembled in full, in order
    giant = out.filter(F.col("doc_id") == "giant").select(
        F.expr("transform(spans, x -> x.offset)").alias("offs"),
        F.size("spans").alias("n"),
    ).collect()[0]
    assert giant.n == len(giant.offs)
    offs = list(giant.offs)
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
