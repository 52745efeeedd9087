"""Evaluation operators: CER/WER, confusions, histograms, rollups.

Relational re-expression of the reference's evaluation path
(/root/reference/ocrd_cor_asv_ann/wrapper/evaluate.py:205-314 and
lib/seq2seq.py:651-754):

* the corpus accumulator (lib/alignment.py:366-459, Chan et al. update)
  decomposes into plain ``sum``/``avg``/``var_pop`` aggregates — Spark's
  partial+final hash aggregation IS the Chan merge, so corpus CER is
  ``sum(dist)/sum(len)`` and the rate variance is a length-weighted
  var_pop, all map-side combinable;
* two metric flavours (evaluate.py:266-281): 'Levenshtein-fast' via the
  builtin ``levenshtein()`` (JVM, codegen) with max-length denominator,
  and the exact adjusted distance (NFC/NFKC/historic_latin + grapheme
  recombination + path-length denominator) as an Arrow-batched pandas
  UDF over corelib.align;
* confusion top-k (alignment.py:244-279) = explode edit pairs →
  hash-agg count → TakeOrderedAndProject;
* char/word histograms + union compare (alignment.py:399-417) =
  explode → count → full-outer join;
* worst-k examples (alignment.py:449-459) = orderBy(cost).limit(k);
* per-pair/per-page rollup (evaluate.py:95-150) = ``rollup()``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corelib.align import adjusted_distance, best_alignment, confusion_counts, GAP
from ..corelib.words import split_words

DIST_STRUCT = T.StructType(
    [
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("length", T.IntegerType(), False),
    ]
)


def adjusted_distance_udf(normalization: str | None = None, gt_level: int = 1):
    """Exact metric (F2) as a vectorized pandas UDF returning
    struct(dist, length)."""

    @F.pandas_udf(DIST_STRUCT)
    def _udf(source: pd.Series, target: pd.Series) -> pd.DataFrame:
        out = [
            adjusted_distance(s or "", t or "", normalization, gt_level)
            for s, t in zip(source, target)
        ]
        return pd.DataFrame(out, columns=["dist", "length"])

    return _udf


@F.pandas_udf(T.ArrayType(T.StringType()))
def split_words_udf(text: pd.Series) -> pd.Series:
    """UAX#29-style content words (F5)."""
    return text.map(lambda t: split_words(t or ""))


EDIT_PAIR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("src", T.StringType(), False),
            T.StructField("tgt", T.StringType(), False),
        ]
    )
)


@F.pandas_udf(EDIT_PAIR_SCHEMA)
def edit_pairs_udf(source: pd.Series, target: pd.Series) -> pd.Series:
    """Non-identity confusion pairs per line, gaps merged forward
    (A2 input)."""

    def pairs(s, t):
        if (s or "") == (t or ""):
            return []  # identity alignment: no non-identity pairs
        counts = confusion_counts(best_alignment(s or "", t or ""))
        out = []
        for (a, b), n in counts.items():
            out.extend([{"src": a, "tgt": b}] * n)
        return out

    return pd.Series([pairs(s, t) for s, t in zip(source, target)])


def with_fast_distance(pairs: DataFrame, src: str = "ocr_text", tgt: str = "gt_text") -> DataFrame:
    """Levenshtein-fast (F1): builtin levenshtein, max-length denominator."""
    return pairs.withColumn("dist", F.levenshtein(F.col(src), F.col(tgt)).cast("double")).withColumn(
        "length", F.greatest(F.length(src), F.length(tgt))
    )


def with_adjusted_distance(
    pairs: DataFrame,
    src: str = "ocr_text",
    tgt: str = "gt_text",
    normalization: str | None = "historic_latin",
    gt_level: int = 1,
) -> DataFrame:
    d = adjusted_distance_udf(normalization, gt_level)(F.col(src), F.col(tgt))
    return pairs.withColumn("_d", d).select("*", F.col("_d.dist").alias("dist"), F.col("_d.length").alias("length")).drop("_d")


def cer_aggregate(scored: DataFrame, *group_cols: str) -> DataFrame:
    """Corpus/grouped CER with mean + length-weighted variance of
    per-line rates — the distributed Chan accumulator (A1).

    Single pass: the weighted variance decomposes into weighted moments
    E_w[r²] − E_w[r]² (rates live in [0,1], so the catastrophic-
    cancellation concern that motivates Chan's update for raw data does
    not bite; Spark's partial+final aggregation supplies the same
    mergeability). One hash aggregation — no second scan, no join."""
    rate = (F.col("dist") / F.col("length")).alias("rate")
    base = scored.filter(F.col("length") > 0).select(*group_cols, "dist", "length", rate)
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("dist").alias("sum_dist"),
        F.sum("length").alias("sum_len"),
        (F.sum(F.col("rate") * F.col("length")) / F.sum("length")).alias("mean_rate"),
        (F.sum(F.col("rate") * F.col("rate") * F.col("length")) / F.sum("length")).alias("_m2"),
    )
    return (
        agg.withColumn(
            "var_rate", F.greatest(F.col("_m2") - F.col("mean_rate") * F.col("mean_rate"), F.lit(0.0))
        )
        .drop("_m2")
        .withColumn("cer", F.try_divide(F.col("sum_dist"), F.col("sum_len")))
    )


def cer_rollup(scored: DataFrame, pair_col: str, page_col: str) -> DataFrame:
    """Per-(pair, page) and per-pair totals in one pass (A5)."""
    return (
        scored.rollup(pair_col, page_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("dist").alias("sum_dist"),
            F.sum("length").alias("sum_len"),
        )
        .withColumn("cer", F.try_divide(F.col("sum_dist"), F.col("sum_len")))
    )


def confusion_topk(
    pairs: DataFrame,
    k: int = 10,
    src: str = "ocr_text",
    tgt: str = "gt_text",
    group_col: str | None = None,
) -> DataFrame:
    """Top-k (source, target) edit confusions across the corpus (A2/T1).
    With ``group_col`` (e.g. the evaluate processor's per-fileGrp
    reports), top-k PER group via a partitioned rank instead of one
    global limit."""
    groups = [group_col] if group_col else []
    exploded = pairs.select(
        *groups, F.explode(edit_pairs_udf(F.col(src), F.col(tgt))).alias("p")
    )
    agg = exploded.groupBy(
        *groups, F.col("p.src").alias("src"), F.col("p.tgt").alias("tgt")
    ).agg(F.count(F.lit(1)).alias("n"))
    if not groups:
        return agg.orderBy(F.desc("n"), "src", "tgt").limit(k)
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), "src", "tgt")
    return (
        agg.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
        .orderBy(group_col, F.desc("n"), "src", "tgt")
    )


def char_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character frequency (A3): explode → hash agg."""
    return (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_compare(left: DataFrame, right: DataFrame, key: str = "ch") -> DataFrame:
    """Union-keyed comparison of two histograms (U2): full-outer join."""
    l = left.withColumnRenamed("n", "n_left")
    r = right.withColumnRenamed("n", "n_right")
    return (
        l.join(r, key, "full_outer")
        .select(
            key,
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
        )
    )


def worst_examples(
    scored: DataFrame,
    id_cols: list[str],
    k: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Worst lines by mean*length cost (A4/T2): TakeOrderedAndProject,
    or a partitioned rank per ``group_col``."""
    base = scored.filter(F.col("length") > 0).withColumn(
        "cost", F.col("dist")
    )
    if group_col is None:
        return (
            base.orderBy(F.desc("cost"), *id_cols)
            .select(*id_cols, "dist", "length", "cost")
            .limit(k)
        )
    w = Window.partitionBy(group_col).orderBy(F.desc("cost"), *id_cols)
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(group_col, *id_cols, "dist", "length", "cost")
        .orderBy(group_col, F.desc("cost"), *id_cols)
    )


def perplexity(scores: DataFrame, nll_col: str, len_col: str) -> DataFrame:
    """exp(Σ nll / Σ len) where nll = -log p per item (A6)."""
    return scores.agg(
        F.exp(F.sum(F.col(nll_col)) / F.sum(F.col(len_col))).alias("perplexity")
    )


def wer_pairs(pairs: DataFrame, src: str = "ocr_text", tgt: str = "gt_text") -> DataFrame:
    """Word error rate: adjusted distance over UAX#29 token lists (F5+F2)."""

    @F.pandas_udf(DIST_STRUCT)
    def _wer(source: pd.Series, target: pd.Series) -> pd.DataFrame:
        out = []
        for s, t in zip(source, target):
            if (s or "") == (t or ""):
                out.append((0.0, len(split_words(s or ""))))
                continue
            sw, tw = split_words(s or ""), split_words(t or "")
            pairs_ = best_alignment(sw, tw)
            dist = sum(1 for a, b in pairs_ if a != b)
            out.append((float(dist), len(pairs_)))
        return pd.DataFrame(out, columns=["dist", "length"])

    d = _wer(F.col(src), F.col(tgt))
    return pairs.withColumn("_d", d).select(
        "*", F.col("_d.dist").alias("dist"), F.col("_d.length").alias("length")
    ).drop("_d")
