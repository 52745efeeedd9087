"""Multi-OCR alignment/vote and TextEquiv merge operators — the Spark
re-expression of the reference CLIs `cor-asv-ann-align`
(wrapper/align.py) and `cor-asv-ann-join` (wrapper/join.py).

* ``align_vote_groups``: N line tables (one per OCR engine / file
  group) are N-way equi-joined on (doc_id, line_no) — the reference's
  zip across file groups, J1 — then each joined row is N-way
  character-aligned and voted inside an Arrow batch (J2+F10).
* ``join_group_texts``: UNION ALL with provenance index — every
  group's text for each line kept as an alternative annotation
  (join.py:98-104 keeps TextEquivs with @index per group, U3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corelib.nway import align_and_vote
from .correction import assemble_lines, spans_with_line_no

VOTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_no", T.IntegerType(), False),
        T.StructField("voted_text", T.StringType(), False),
        T.StructField("voted_conf", T.DoubleType(), False),
        T.StructField("n_inputs", T.IntegerType(), False),
    ]
)


def lines_of(spans_df: DataFrame) -> DataFrame:
    """Spans table → (doc_id, line_no, line_text)."""
    lines = assemble_lines(spans_with_line_no(spans_df))
    return lines.select(
        "doc_id", "line_no", F.expr("concat_ws('', texts)").alias("line_text")
    )


def align_vote_groups(
    groups: list[DataFrame], method: str = "majority"
) -> DataFrame:
    """N spans tables → voted line table. The first group is the master
    (left side — its lines define the output, matching the reference's
    first-non-empty-group-as-base rule); other groups left-join on
    (doc_id, line_no) and may be missing."""
    assert groups, "need at least one input group"
    joined = lines_of(groups[0]).withColumnRenamed("line_text", "t0")
    for g, df in enumerate(groups[1:], 1):
        joined = joined.join(
            lines_of(df).withColumnRenamed("line_text", f"t{g}"),
            ["doc_id", "line_no"],
            "left",
        )
    n = len(groups)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            texts, confs, counts = [], [], []
            # column zip, not iterrows (hot loop of the vote operator)
            for row_seqs in zip(*(pdf[f"t{g}"] for g in range(n))):
                seqs = [s for s in row_seqs if isinstance(s, str) and s]
                t, c = align_and_vote(seqs, method=method)
                texts.append(t)
                confs.append(c)
                counts.append(len(seqs))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "line_no": pdf["line_no"],
                    "voted_text": texts,
                    "voted_conf": confs,
                    "n_inputs": counts,
                }
            )

    return joined.mapInPandas(run, schema=VOTED_SCHEMA)


def join_group_texts(groups: list[DataFrame]) -> DataFrame:
    """UNION ALL of per-line texts across groups with a provenance
    index (the reference's joined multi-TextEquiv annotation), plus an
    aggregated alternatives array per line."""
    union = None
    for g, df in enumerate(groups):
        part = lines_of(df).select(
            "doc_id", "line_no", F.col("line_text").alias("text"), F.lit(g).alias("grp")
        )
        union = part if union is None else union.unionByName(part)
    return (
        union.groupBy("doc_id", "line_no")
        .agg(
            F.array_sort(F.collect_list(F.struct("grp", "text"))).alias("alternatives"),
            F.count(F.lit(1)).alias("n_alternatives"),
        )
    )
