"""Character n-gram LM: Spark-side training counts, incremental
scoring with backoff, and beam rescoring (the reference's lm_predict
mode, seq2seq.py:1430-1434/1486-1489)."""

import math

import pytest
from pyspark.sql import Row

from cor_asv_ann_spark.operators.lm import CharNgramLM, char_ngram_counts, train_char_lm


def test_ngram_counts(spark):
    docs = spark.createDataFrame([Row(text="abab")])
    rows = {(r.ctx, r.ch): r.n for r in char_ngram_counts(docs, order=3).collect()}
    # trigram contexts (i>1 only): 'a'→b (pos2), 'ab'→a (pos3), 'ba'→b (pos4)
    assert rows[("ab", "a")] == 1 and rows[("ba", "b")] == 1
    # unigram fallback row per char occurrence — exactly once per char:
    # pos-1's degenerate empty context must NOT double-count the first char
    assert rows[("", "a")] == 2
    assert rows[("", "b")] == 2
    # no stray empty-context rows beyond the unigram ones
    assert sum(n for (ctx, _), n in rows.items() if ctx == "") == 4


def test_lm_scoring_backoff(spark):
    docs = spark.createDataFrame([Row(text="the the the cat")])
    lm = train_char_lm(docs, order=3)
    # seen trigram beats unseen continuation of the same context
    assert lm.logprob("th", "e") > lm.logprob("th", "z")
    # unseen context backs off to the unigram, still finite
    lp = lm.logprob("qq", "t")
    assert math.isfinite(lp)
    # a frequent char scores higher at the unigram level than a rare one
    assert lm.logprob("qq", "t") > lm.logprob("qq", "c")


def test_beam_lm_rescoring_changes_ranking():
    """With an LM that overwhelmingly prefers one continuation, the beam
    must pick it over the decoder's own preference."""
    from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab

    model = Seq2SeqModel(make_vocab(set("ab \n")), width=16, depth=1, seed=3)
    src = "ab\n"
    base, _, _ = model.decode_beam_batch([src], beam_width=4, rejection_threshold=0.0)

    class PreferA:
        def logprob(self, history, ch):
            return math.log(0.9) if ch == "a" else math.log(0.001)

    lm_out, _, _ = model.decode_beam_batch(
        [src], beam_width=4, rejection_threshold=0.0, lm=PreferA()
    )
    assert set(lm_out[0].strip("\n")) <= {"a"}
    assert lm_out != base or set(base[0].strip("\n")) <= {"a"}


def test_pipeline_beam_with_lm(spark, sf_small):
    """make_model_corrector(lm=...) broadcasts the LM and reranks inside
    the Arrow-batched beam — runs end-to-end and deterministically."""
    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.sources.spans import synth_spans

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lm = train_char_lm(docs.limit(50), order=3)
    model = Seq2SeqModel(make_vocab(set("abcdefghijklmnopqrstuvwxyz .-ſäꝛͤ\n")), width=16, depth=1, seed=3)
    spans = synth_spans(spark, sf_small, noisy=True).limit(4)
    corr = make_model_corrector(spark, model, beam=True, beam_width=3, lm=lm)
    out1 = correct_pipeline(spans, corrector=corr).collect()
    out2 = correct_pipeline(spans, corrector=corr).collect()
    assert sorted(map(str, out1)) == sorted(map(str, out2))
    assert len(out1) == 4


def test_lm_table_top_k_per_ctx_bound(spark):
    """The broadcast table is bounded per context BEFORE collect: with
    top_k_per_ctx=2 no context keeps more than its 2 most frequent
    continuations, and the kept ones are the head of the distribution."""
    from cor_asv_ann_spark.operators.lm import char_ngram_counts, lm_table

    docs = spark.createDataFrame([Row(text="aaab aac aad ab " * 5)])
    counts = char_ngram_counts(docs, order=2)
    full = lm_table(counts, top_k_per_ctx=None)
    capped = lm_table(counts, top_k_per_ctx=2)
    assert all(len(d) <= 2 for d in capped.values())
    for ctx, d in capped.items():
        head = sorted(full[ctx].items(), key=lambda kv: (-kv[1], kv[0]))[: len(d)]
        assert d == dict(head)


def test_ngram_counts_astral_codepoints(spark):
    """The array-slice n-gram path (O(n·k) rewrite) must stay
    codepoint-aware: Spark's split(t, '') yields whole codepoints (no
    surrogate halves), so astral-plane chars (emoji, 𝔄) count exactly
    as the substring formulation and the DuckDB oracle do."""
    from cor_asv_ann_spark.operators.lm import char_ngram_counts

    df = spark.createDataFrame([("𝔄😀𝔄",)], ["text"])
    rows = {(r.ctx, r.ch): r.n for r in char_ngram_counts(df, order=3).collect()}
    assert rows[("", "𝔄")] == 2
    assert rows[("", "😀")] == 1
    assert rows[("𝔄", "😀")] == 1
    assert rows[("𝔄😀", "𝔄")] == 1
    # no surrogate-half keys anywhere
    assert all(
        all(0xD800 > ord(c) or ord(c) > 0xDFFF for c in ctx + ch)
        for ctx, ch in rows
    )
