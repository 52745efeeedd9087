"""Character n-gram language model: Spark-side training + incremental
scoring for beam rescoring.

The reference can mix an incremental LM into decoding — with
``lm_predict`` the beam ranks candidates by the LM's probability
instead of the decoder's (seq2seq.py:1430-1434, 1486-1489) while the
decoder still drives feedback. Its LM is a second seq2seq; here the
idiomatic-Spark equivalent is an n-gram model trained as one hash
aggregation over the corpus (map-side combinable, shuffles only the
distinct (context, char) keys) and broadcast as a lookup table —
the 100 TB-safe way to get corpus-level priors into the beam.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_ngram_counts(docs: DataFrame, text_col: str = "text", order: int = 3) -> DataFrame:
    """(context, ch, n) counts for context length ``order−1``, plus the
    unigram fallback (context=''). One explode + one hash agg, all
    JVM-side: each position i of every document emits its
    (preceding-(order−1)-chars, char) pair."""
    k = order - 1
    # ONE struct per position (its (context, char) pair; at i=1 the
    # context degenerates to ctx=''). The unigram ('', char) fallback is
    # DERIVED from the aggregated table afterwards — ('' , ch)'s count
    # is simply the total occurrence count of ch, i.e. the sum over the
    # first aggregation's rows for that ch — so the generate emits half
    # the rows the emit-both formulation did and the big hash
    # aggregation consumes half the volume; the second aggregation runs
    # over the (tiny, vocab-bounded) count table, not the corpus.
    #
    # COMPLEXITY: the document is split into a char ARRAY once and every
    # position slices that array (O(k) per position ⇒ O(n·k) per doc).
    # The obvious substring(text, i-k, k) formulation is O(n) PER CALL
    # on UTF8 strings (codepoint scan from the start) ⇒ O(n²) per doc —
    # measured 2.4× slower at sf0.1's ~600-char docs and asymptotically
    # fatal on book-length documents at corpus scale.
    from ..session import spread_input

    # counts are partition-order independent; spread a single-split
    # input so the char explode + partial aggregation parallelize
    chars = spread_input(docs).select(F.split(F.col(text_col), "").alias("_chs"))
    if k <= 2:
        # NARROW KEY (guide §2.3 "narrower types"): up to order 3 the
        # (ctx, ch) key packs into ONE bigint — each codepoint is
        # ≤ 0x10FFFF (21 bits; Spark's split/ascii are codepoint-aware,
        # astral chars included), stored as cp+1 so 0 means "absent"
        # (distinguishes a real NUL from a short context). The 3M-row
        # generate then carries 8-byte longs instead of two strings,
        # and the hash aggregation compares/hashes fixed-width keys —
        # measured 1.23 s → 0.61 s at sf0.1, bit-identical output
        # including order. Only the aggregated, distinct-trigram-
        # bounded table pays the decode (JVM Character.toString via
        # reflection). Falls through to the string path for order > 3
        # (4+ codepoints no longer fit 63 bits).
        packs = F.expr(
            """
            transform(
              _chs,
              (c, i0) -> IF(c = '', cast(-1 as bigint),
                (IF(i0 >= 2, cast(ascii(element_at(_chs, i0 - 1)) as bigint) + 1,
                    0L) * 4398046511104L)
                + (IF(i0 >= 1, cast(ascii(element_at(_chs, i0)) as bigint) + 1,
                      0L) * 2097152L)
                + cast(ascii(c) as bigint) + 1))
            """
        )  # element_at is 1-based: element_at(_chs, i0) is chs[i0-1]
        kt = (
            chars.select(F.explode(packs).alias("k"))
            .filter(F.col("k") >= 0)
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        dec = (
            lambda c: F.expr(
                f"IF({c} = 0, '', java_method('java.lang.Character',"
                f" 'toString', cast({c} - 1 as int)))"
            )
        )
        ctx_counts = kt.select(
            F.concat(
                dec("(k div 4398046511104)"), dec("(k div 2097152) % 2097152")
            ).alias("ctx"),
            F.expr(
                "java_method('java.lang.Character', 'toString',"
                " cast(k % 2097152 - 1 as int))"
            ).alias("ch"),
            "n",
        )
    else:
        pairs = F.expr(
            f"""
            transform(
              _chs,
              (c, i0) -> struct(IF(i0 > 0,
                                   array_join(slice(_chs,
                                                    greatest(i0 - {k} + 1, 1),
                                                    least({k}, i0)), ''),
                                   '') as ctx,
                                c as ch))
            """
        )
        ctx_counts = (
            chars.select(F.explode(pairs).alias("g"))
            .select("g.ctx", "g.ch")
            .filter(F.col("ch") != "")
            .groupBy("ctx", "ch")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
    uni = (
        ctx_counts.groupBy("ch")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.lit("").alias("ctx"), "ch", "n")
    )
    return ctx_counts.filter(F.col("ctx") != "").unionByName(uni)


def lm_table(
    counts: DataFrame, min_count: int = 1, top_k_per_ctx: int | None = 64
) -> dict[str, dict[str, float]]:
    """Collect the count table into the broadcastable nested dict the
    scorer uses. Two driver-safety bounds compose: ``min_count`` prunes
    the long tail, and ``top_k_per_ctx`` keeps only the k most frequent
    continuations per context (window rank BEFORE collect) — at order>3
    on a 100 TB corpus the distinct-context count explodes while the
    scorer only ever reads the head of each context's distribution.
    ``None`` disables the cap (tiny corpora / exact-parity tests)."""
    pruned = counts.filter(F.col("n") >= min_count)
    if top_k_per_ctx is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("ctx").orderBy(F.desc("n"), "ch")
        pruned = (
            pruned.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= top_k_per_ctx)
            .drop("_rk")
        )
    rows = pruned.collect()
    table: dict[str, dict[str, float]] = {}
    for r in rows:
        table.setdefault(r.ctx, {})[r.ch] = float(r.n)
    return table


class CharNgramLM:
    """Incremental scorer with stupid-backoff to shorter contexts and a
    uniform floor; add-one smoothing per context."""

    def __init__(self, table: dict[str, dict[str, float]], order: int = 3, backoff: float = 0.4):
        self.table = table
        self.order = order
        self.backoff = backoff
        self.voc = len(table.get("", {})) or 1
        self._totals = {ctx: sum(d.values()) for ctx, d in table.items()}

    def logprob(self, history: str, ch: str) -> float:
        penalty = 1.0
        for k in range(self.order - 1, -1, -1):
            ctx = history[-k:] if k else ""
            d = self.table.get(ctx)
            if d and ch in d:
                p = (d[ch] + 1.0) / (self._totals[ctx] + self.voc)
                return math.log(p * penalty)
            penalty *= self.backoff
        return math.log(penalty / self.voc)


def train_char_lm(
    docs: DataFrame, text_col: str = "text", order: int = 3, min_count: int = 1
) -> CharNgramLM:
    return CharNgramLM(lm_table(char_ngram_counts(docs, text_col, order), min_count), order)
