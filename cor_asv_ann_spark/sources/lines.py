"""Flat-file line sources and training-data preparation (SURVEY.md §2.1
S5/S6, §2.2 P3-P7).

The reference's gen_lines (lib/seq2seq.py:919-1018) reads TSV
``source\\ttarget`` pairs or plain text, NFC-normalizes, appends the EOS
newline, optionally applies a charmap, drops misaligned pairs
(quick_ratio < 0.5, is_bad at lib/alignment.py:160-163), and splits
train/validation at a fixed ratio. Spark-side that is: a csv/text scan +
JVM expressions for everything 1:1, pandas UDFs for NFC and the
difflib-based filter, and a seeded randomSplit.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corelib.align import is_bad_pair

EOS = "\n"


def read_tsv_pairs(spark: SparkSession, path: str) -> DataFrame:
    """TSV source\\ttarget reader (S5). No header, tab-separated, keeps
    empty strings."""
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .csv(path)
        .toDF("source", "target")
        .fillna({"source": "", "target": ""})
    )


def read_pickle_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S5: the reference's ``.pkl`` pair dumps (gen_lines detects them by
    suffix, lib/seq2seq.py:937-960): a pickled iterable of
    (source, target) where source is a plain string, a prob line
    (list of (char, conf)), or a confmat (list of chunks of (alt, p)).

    Spark-side: ``binaryFile`` scan (one task per file — pickle is not
    splittable, but a directory of dumps parallelizes across files) +
    per-file unpickle in an Arrow batch. Output columns: source, target,
    conf (array<float> | null), confmat (JSON string | null) — the same
    channels correct_pipeline consumes."""
    import json
    import pickle

    files = spark.read.format("binaryFile").load(path)

    def unpickle(batches: "pd.DataFrame") -> "pd.DataFrame":
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = pickle.loads(bytes(content))
                for source, target in data:
                    conf = None
                    confmat = None
                    if not source:
                        text = ""
                    elif isinstance(source, str):
                        text = source
                    elif isinstance(source[0], tuple) and isinstance(source[0][0], str):
                        # prob line: [(char, conf), ...]
                        text = "".join(ch for ch, _ in source)
                        conf = [float(p) for _, p in source]
                    else:
                        # confmat: [[(alt, p), ...], ...]
                        text = "".join(chunk[0][0] if chunk else "" for chunk in source)
                        confmat = json.dumps(
                            [[{"alt": a, "p": float(p)} for a, p in chunk] for chunk in source]
                        )
                    rows.append(
                        {"source": text, "target": target, "conf": conf, "confmat": confmat}
                    )
            yield pd.DataFrame(rows, columns=["source", "target", "conf", "confmat"])

    return files.select("content").mapInPandas(
        unpickle,
        schema="source string, target string, conf array<float>, confmat string",
    )


def read_pairs(spark: SparkSession, path: str) -> DataFrame:
    """Format-dispatching pair reader (the reference's suffix detection,
    seq2seq.py:937)."""
    if path.endswith(".pkl"):
        return read_pickle_pairs(spark, path)
    return read_tsv_pairs(spark, path)


def read_plain_lines(spark: SparkSession, path: str) -> DataFrame:
    """Plain text reader → unsupervised pairs (source == target),
    mirroring gen_lines(unsupervised=True)."""
    return spark.read.text(path).select(
        F.col("value").alias("source"), F.col("value").alias("target")
    )


@F.pandas_udf(T.StringType())
def nfc_udf(s: pd.Series) -> pd.Series:
    """P6: NFC normalization (no JVM builtin)."""
    return s.map(lambda t: unicodedata.normalize("NFC", t or ""))


@F.pandas_udf(T.BooleanType())
def is_bad_pair_udf(source: pd.Series, target: pd.Series) -> pd.Series:
    """P3: difflib quick_ratio < 0.5 on lines > 5 chars."""
    return pd.Series(
        [is_bad_pair(s or "", t or "") for s, t in zip(source, target)]
    )


def prepare_pairs(
    pairs: DataFrame,
    charmap: dict[str, str] | None = None,
    drop_bad: bool = True,
) -> DataFrame:
    """NFC + charmap-translate (P5) + EOS append + bad-pair filter (P3).
    1:1 charmaps use the JVM translate; m:n fall back to replace chains."""
    out = pairs
    for col in ("source", "target"):
        c = nfc_udf(F.col(col))
        if charmap:
            ones = {k: v for k, v in charmap.items() if len(k) == 1 and len(v) == 1}
            if ones:
                c = F.translate(c, "".join(ones), "".join(ones.values()))
            for k, v in charmap.items():
                if len(k) != 1 or len(v) != 1:
                    c = F.replace(c, F.lit(k), F.lit(v))
        out = out.withColumn(col, F.concat(c, F.lit(EOS)))
    if drop_bad:
        out = out.filter(~is_bad_pair_udf(F.col("source"), F.col("target")))
    return out


def train_val_split(pairs: DataFrame, val_fraction: float = 0.2, seed: int = 42):
    """P4: seeded random split (reproducible partition)."""
    return pairs.randomSplit([1.0 - val_fraction, val_fraction], seed=seed)


def scan_vocabulary(df: DataFrame, cols: tuple[str, ...] = ("source", "target")) -> dict[str, int]:
    """S6/U1: distinct-character scan → {char: index}, index 0 reserved
    (driver collects the tiny distinct set, then broadcasts)."""
    chars = None
    for col in cols:
        c = df.select(F.explode(F.split(F.col(col), "")).alias("ch")).filter(
            F.col("ch") != ""
        )
        chars = c if chars is None else chars.union(c)
    distinct = sorted(r.ch for r in chars.distinct().collect())
    return {ch: i + 1 for i, ch in enumerate(distinct)}


def gap_scrub(col, gap_char: str = "\a"):
    """P7: reserved gap char — empty OCR tokens become the gap on input,
    and the gap is stripped from outputs."""
    return F.regexp_replace(col, gap_char, "")
