"""Main-content extraction over interleaved documents (north rule:
"HTML boilerplate strip, … DOM heuristics"): a jusText/Readability-style
line classifier and a media-context miner for the interleaved payload.

Both are pure builtin-function SQL (JVM side, whole-stage codegen):
the classifier is one narrow projection per document; the context miner
is one ordered window per document. No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the jusText-ish stopword marker set (shared with textstats.lang_id's
# English markers so the oracle can reproduce it)
STOPWORDS = ("the", "and", "of", "is", "was", "a", "in", "to")


def with_pseudo_lines(docs: DataFrame, text_col: str = "text", words_per_line: int = 12) -> DataFrame:
    """Deterministic line segmentation for flat fixture text: chunks of
    ``words_per_line`` whitespace tokens (real corpora ship line/block
    structure; this stands in for it)."""
    lines = F.expr(
        f"""
        transform(
          sequence(0, greatest(cast(ceil(size(_pl_ws) / {words_per_line}.0) as int) - 1, 0)),
          i -> array_join(slice(_pl_ws, i * {words_per_line} + 1, {words_per_line}), ' '))
        """
    )
    # the word array is hoisted into a column: HOF lambda bodies get no
    # loop-invariant code motion, so an inline split({text_col}) would
    # re-tokenize the whole document once per emitted line (quadratic)
    return (
        docs.withColumn("_pl_ws", F.split(F.col(text_col), r"\s+"))
        .withColumn("lines", lines)
        .drop("_pl_ws")
    )


def line_features(docs_with_lines: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode to line grain with the classifier features: char length,
    token count, stopword density, link/markup density (anything
    ``://``-ish or angle-bracketed), digit density."""
    stop_rx = "\\\\b(" + "|".join(STOPWORDS) + ")\\\\b"
    e = docs_with_lines.select(id_col, F.posexplode("lines").alias("line_no", "line"))
    n_tok = F.size(F.filter(F.split(F.col("line"), r"\s+"), lambda x: x != F.lit("")))
    return e.select(
        id_col,
        "line_no",
        "line",
        F.length("line").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(line), '{stop_rx}', 0)"))
        .cast("long")
        .alias("n_stop"),
        F.size(F.expr("regexp_extract_all(line, '(://|<[^>]*>)', 0)"))
        .cast("long")
        .alias("n_link"),
        F.length(F.regexp_replace("line", "[^0-9]", "")).cast("long").alias("n_digit"),
    )


def classify_lines(
    feats: DataFrame,
    min_chars: int = 25,
    min_stop_density: float = 0.05,
    max_link_density: float = 0.1,
) -> DataFrame:
    """jusText-style decision: a line is CONTENT when it is long enough,
    carries function words, and is not link/markup dominated."""
    stop_density = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    link_density = F.col("n_link") / F.greatest(F.col("n_tokens"), F.lit(1))
    return feats.withColumn(
        "is_content",
        (F.col("n_chars") >= min_chars)
        & (stop_density >= min_stop_density)
        & (link_density <= max_link_density),
    )


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 12,
    min_chars: int = 25,
    min_stop_density: float = 0.05,
) -> DataFrame:
    """documents → (doc_id, clean_text, n_lines, n_kept, kept_ratio):
    the main-content extraction pass. One narrow projection + one
    line-grain aggregation; filters push to the scan."""
    from ..session import spread_input

    classified = classify_lines(
        line_features(
            with_pseudo_lines(spread_input(docs), text_col, words_per_line), id_col
        ),
        min_chars=min_chars,
        min_stop_density=min_stop_density,
    )
    return (
        classified.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("is_content"), F.struct("line_no", "line"))
                        )
                    ),
                    lambda x: x.line,
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("is_content").cast("long")).alias("n_kept"),
            F.round(
                F.sum(F.col("is_content").cast("double")) / F.count(F.lit(1)), 6
            ).alias("kept_ratio"),
        )
    )


def media_context(
    spans_df: DataFrame,
    n_before: int = 5,
    n_after: int = 5,
) -> DataFrame:
    """Caption mining over the interleaved payload: for every media span
    the concatenated text of the ``n_before`` preceding and ``n_after``
    following word spans in reading order — (doc_id, media_ref,
    context_before, context_after).

    Pure JVM array HOFs on the spans array itself (the input is already
    per-document) — contexts are computed ONLY at media positions, where
    a window formulation evaluates a collect_list frame for every span
    row (measured 2-3× slower on word-dominated pages). Narrow: zero
    shuffles."""
    # word texts by position (NULL for non-words), media elements with
    # their position — one pass each, then a bounded slice per media span
    ctx = F.expr(
        f"""
        transform(
          filter(transform(spans, (x, i) -> struct(x.media_ref as ref,
                                                   x.offset as off,
                                                   x.kind as kind, i as i)),
                 p -> p.kind = 'media'),
          m -> struct(
            m.ref as media_ref,
            m.off as offset,
            array_join(slice(
              filter(transform(slice(spans, 1, m.i),
                               s -> IF(s.kind = 'word', s.text, NULL)),
                     t -> t IS NOT NULL),
              -{n_before}, {n_before}), ' ') as context_before,
            array_join(slice(
              filter(transform(slice(spans, m.i + 2, size(spans)),
                               s -> IF(s.kind = 'word', s.text, NULL)),
                     t -> t IS NOT NULL),
              1, {n_after}), ' ') as context_after))
        """
    )
    return (
        spans_df.select("doc_id", F.explode(ctx).alias("m"))
        .select(
            "doc_id",
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.offset").alias("offset"),
            F.col("m.context_before").alias("context_before"),
            F.col("m.context_after").alias("context_after"),
        )
    )
