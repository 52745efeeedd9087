"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All hot-path expressions are builtin ``pyspark.sql.functions`` (JVM,
whole-stage codegen) so they survive a 100 TB scan; nothing here drops
to Python. Each has an ANSI-SQL oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword anchors (heuristic n-gram/stopword voting)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "una"],
}


def _marker_score(text_col: Column, words: list[str]) -> Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(pattern), F.lit(0)))


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"score_{lang}", _marker_score(F.col(text_col), words))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID; 'und' (undetermined) when no marker hits."""
    scored = with_lang_scores(df, text_col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first max wins, deterministic order
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.withColumn("pred_lang", pred)


def token_count(text_col: Column) -> Column:
    """Whitespace tokens (empty-safe)."""
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda x: x != ""))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-flavoured subword proxy: alternating letter-runs/digit-runs/
    punctuation each count as a token (regex segmentation, JVM-side)."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword ratios + mean word length —
    the standard pre-training quality filters."""
    t = F.col(text_col)
    n = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_tok = token_count(t)
    stop = _marker_score(t, LANG_MARKERS["en"])
    return df.select(
        "*",
        n.alias("n_chars_m"),
        (n_alpha / F.greatest(n, F.lit(1))).alias("alpha_ratio"),
        (n_digit / F.greatest(n, F.lit(1))).alias("digit_ratio"),
        (n_punct / F.greatest(n, F.lit(1))).alias("punct_ratio"),
        n_tok.alias("n_tokens"),
        (n_alpha / F.greatest(n_tok, F.lit(1))).alias("mean_word_len"),
        (stop / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality in [0,1]: high alpha ratio, sane word length,
    some stopwords, few digits/punct."""
    q = quality_features(df, text_col)
    score = (
        F.col("alpha_ratio") * 0.4
        + F.least(F.col("stopword_ratio") * 2, F.lit(1.0)) * 0.3
        + (1 - F.least(F.col("digit_ratio") * 5, F.lit(1.0))) * 0.15
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.15
    )
    return q.withColumn("quality", F.round(score, 6))


def fingerprint(df: DataFrame, text_col: str = "text", prefix_len: int = 16) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (stable across engines; used by exact dedup)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fp", F.substring(F.md5(norm), 1, prefix_len))
