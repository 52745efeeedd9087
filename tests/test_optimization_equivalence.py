"""Round-6 optimization equivalence pins.

Every optimization that rewrote an operator's internals keeps a test
here proving the rewrite computes the SAME thing as the formulation it
replaced (or as an independent brute-force reference):

* ``_degrade_dist`` (changed-position count) == ``F.levenshtein`` of the
  CER degradation, property-tested over adversarial strings;
* ``asword_col`` (JVM replace-chain + regexp) == the pandas
  ``asword_normalizer`` over a stress alphabet, with and without a
  cascading charmap;
* ``bucket_pairs`` (groupBy + lazy in-bucket explode) == the former
  window-cap + self-join pair set, including the cap and the
  no-silent-caps Observation metrics;
* ``adjusted_distance``'s equal-after-normalization fast path == the
  full difflib path (alignment length after grapheme recombination);
* ``char_ngram_counts``'s derived unigram rows == brute-force counts.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Observation, Row
from pyspark.sql import functions as F

ALPHABET = list("etaoins cl4o1m5xyzäöüſꝛß.-!?0123456789") + ["aͤ", "́"]


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(ALPHABET) for _ in range(n))


def test_degrade_dist_equals_levenshtein(spark):
    import __spark_entry__ as e

    rng = random.Random(7)
    rows = [Row(text=_rand_text(rng, rng.randint(0, 80))) for _ in range(400)]
    rows += [Row(text=t) for t in ("", "etaoins", "cl4o1m5", "ecl", "ttt", "o" * 50)]
    df = spark.createDataFrame(rows)
    lev = F.levenshtein(e._DEGRADE_SPARK(F.col("text")), F.col("text"))
    bad = df.select(
        (lev.cast("double") != e._degrade_dist(F.col("text"))).cast("int").alias("bad")
    ).agg(F.sum("bad").alias("s")).collect()[0].s
    assert bad == 0


STRESS_WORDS = [
    "", "Hello", "wörd", "aͤbc", "Schiff-fahrt", "1870", "—", "x…y",
    "ſtreet", "day's", "漢字かな", "mixed123abc", "́start", "end́",
    "a,b;c", "ÆØÅæøå", "Ʒʒ", "tab\there", "new\nline",
]


@pytest.mark.parametrize("charmap", [None, {"a": "b", "b": "a"}, {"aͤ": "ä", "s": ""}])
def test_asword_col_matches_pandas_normalizer(spark, charmap):
    from cor_asv_ann_spark.operators.mark import asword_col, asword_normalizer

    df = spark.createDataFrame([Row(word=w) for w in STRESS_WORDS])
    out = df.select(
        "word",
        asword_col(F.col("word"), charmap).alias("jvm"),
        asword_normalizer(charmap)(F.col("word")).alias("py"),
    ).collect()
    for r in out:
        assert r.jvm == r.py, f"{r.word!r}: jvm={r.jvm!r} py={r.py!r}"


def _old_self_join_pairs(banded, keys, id_col, max_bucket, observation=None):
    """The pre-round-6 formulation (window cap + self-join), kept here
    as the reference semantics for bucket_pairs."""
    from cor_asv_ann_spark.operators.similarity import cap_buckets

    banded_b = banded
    if max_bucket is not None:
        banded_b = cap_buckets(banded, keys, max_bucket, None)
        banded = cap_buckets(banded, keys, max_bucket, observation)
    a, b = banded.alias("a"), banded_b.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return (
        a.join(b, cond)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


@pytest.mark.parametrize("max_bucket", [None, 4])
def test_bucket_pairs_matches_self_join(spark, max_bucket):
    from cor_asv_ann_spark.operators.similarity import bucket_pairs

    rng = random.Random(3)
    rows = [
        Row(doc_id=i, band=b, code=rng.randint(0, 5))
        for i in range(40)
        for b in range(3)
    ]
    banded = spark.createDataFrame(rows)
    obs_new, obs_old = Observation(), Observation()
    new = bucket_pairs(
        banded, ["band", "code"], "doc_id", max_bucket, obs_new
    ).distinct()
    old = _old_self_join_pairs(banded, ["band", "code"], "doc_id", max_bucket, obs_old)
    new_set = {(r.id_a, r.id_b) for r in new.collect()}
    old_set = {(r.id_a, r.id_b) for r in old.collect()}
    assert new_set == old_set and len(new_set) > 0
    if max_bucket is not None:  # the old form only observes when capped
        mn, mo = obs_new.get, obs_old.get
        assert mn["rows_total"] == mo["rows_total"]
        assert mn["rows_dropped"] == (mo["rows_dropped"] or 0)
        assert round(mn["buckets_dropped"]) == round(mo["buckets_dropped"] or 0.0)


def test_with_shingles_jvm_matches_python_slicing(spark):
    """The JVM transform/slice/array_join shingle window equals plain
    Python codepoint slicing + dict.fromkeys (= array_distinct's
    first-occurrence order) over a unicode stress set (combining
    marks, CJK, astral, short/empty) — the two formulations are
    value-interchangeable; the JVM one is kept for fresh-session speed
    (see the with_shingles docstring for the r6 A/B record)."""
    import re

    from cor_asv_ann_spark.operators.dedup import with_shingles

    cases = [
        "", "a", "ab", "abc", "abcd", "the the the", "Stra\u00dfe \u00fcber",
        "\u00e1b\u0107de", "\u6f22\u5b57\u6f22\u5b57\u30c6\u30b9\u30c8",
        "x\U0001d11ey\U0001d11ez\U0001d11ew", "AAAbbbAAA",
        "  spaced   out  ", None, "mix \u6f22 a\U0001d11eb \u017ftr",
    ]

    def py_shingles(x):
        if x is None:
            return []
        x = re.sub(r"\s+", " ", x).lower()
        if len(x) < 3:
            return []
        return list(dict.fromkeys(x[i : i + 3] for i in range(len(x) - 2)))

    df = spark.createDataFrame([(c,) for c in cases], "text string")
    rows = with_shingles(df, "text", 3).collect()
    by_text = {r.text: r.shingles for r in rows}
    for c in cases:
        assert by_text[c] == py_shingles(c), f"{c!r}: {by_text[c]}"


@pytest.mark.parametrize("max_bucket", [None, 4])
def test_bucket_pairs_nodup_matches_dedup(spark, max_bucket):
    """First-surviving-band emission == generate-then-dedup: same pair
    set, each pair exactly once, same cap observation metrics."""
    from cor_asv_ann_spark.operators.similarity import (
        bucket_pairs,
        bucket_pairs_nodup,
    )

    rng = random.Random(7)
    rows = [
        Row(doc_id=i, band=b, code=rng.randint(0, 5))
        for i in range(40)
        for b in range(3)
    ]
    banded = spark.createDataFrame(rows)
    obs_new, obs_old = Observation(), Observation()
    new = bucket_pairs_nodup(
        banded, "band", "code", "doc_id", 3, 3, max_bucket, obs_new
    ).collect()
    old = bucket_pairs(
        banded, ["band", "code"], "doc_id", max_bucket, obs_old
    ).distinct().collect()
    new_pairs = [(r.id_a, r.id_b) for r in new]
    assert len(new_pairs) == len(set(new_pairs)), "pair emitted twice"
    assert set(new_pairs) == {(r.id_a, r.id_b) for r in old}
    assert len(new_pairs) > 0
    mn, mo = obs_new.get, obs_old.get
    assert mn["rows_total"] == mo["rows_total"]
    assert mn["rows_dropped"] == mo["rows_dropped"]
    assert round(mn["buckets_dropped"]) == round(mo["buckets_dropped"])


def test_bucket_pairs_nodup_dropped_first_band_rescue(spark):
    """A pair whose FIRST matching band is over-capped must still be
    emitted from its first SURVIVING matching band (the masks are built
    post-cap, so survival — not raw code equality — drives emission)."""
    from cor_asv_ann_spark.operators.similarity import bucket_pairs_nodup

    rows = [Row(doc_id=i, band=0, code=0) for i in range(10)]  # capped out
    rows += [Row(doc_id=0, band=1, code=7), Row(doc_id=1, band=1, code=7)]
    rows += [Row(doc_id=i, band=1, code=i - 2) for i in range(2, 8)]  # singletons
    banded = spark.createDataFrame(rows)
    out = bucket_pairs_nodup(banded, "band", "code", "doc_id", 2, 3, 4, None)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(0, 1)}


def test_bucket_pairs_nodup_payloads_and_simhash_query(spark):
    """Payload columns ride correctly, and the simhash query's
    first-match formulation reproduces the dedup formulation's rows
    (including hamming values) on a corpus with real near-dups."""
    from cor_asv_ann_spark.operators.dedup import simhash, simhash_near_pairs
    from cor_asv_ann_spark.operators.similarity import bucket_pairs

    rng = random.Random(11)
    docs = []
    base_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(60):
        words = [base_words[rng.randint(0, 2)] for _ in range(12)]
        if rng.random() < 0.5:
            words[rng.randint(0, 11)] = base_words[rng.randint(3, 5)]
        docs.append(Row(doc_id=i, text=" ".join(words)))
    sh = simhash(spark.createDataFrame(docs))
    new = simhash_near_pairs(sh, max_hamming=6, max_bucket=8)
    rows_new = new.collect()
    # reference: capped in-bucket pairs -> hamming -> cross-band distinct
    chunks = F.array(*[
        F.shiftright(F.col("simhash"), c * 8).bitwiseAND(F.lit(255))
        for c in range(4)
    ])
    banded = sh.select("doc_id", "simhash", F.posexplode(chunks).alias("ci", "cv"))
    ref = (
        bucket_pairs(banded, ["ci", "cv"], "doc_id", 8, None, payload_cols=["simhash"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))),
        )
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
    new_set = {(r.id_a, r.id_b, r.hamming) for r in rows_new}
    assert len(rows_new) == len(new_set), "pair emitted twice"
    assert new_set == {(r.id_a, r.id_b, r.hamming) for r in ref.collect()}
    assert len(new_set) > 0


@pytest.mark.parametrize("max_bucket", [None, 25])
def test_bucket_verify_dots_matches_pair_path(spark, max_bucket):
    """The fused per-bucket verify (masked_buckets + bucket_verify_dots
    + JVM round/filter) returns exactly the rows of the pair-explode +
    indexed-dot path, caps included."""
    import numpy as np

    from cor_asv_ann_spark.operators.dedup import embedding_near_dups
    from cor_asv_ann_spark.operators.similarity import (
        band_codes_udf,
        bucket_pairs_nodup,
        build_dot_index,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((80, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    # fused path (build_dot_index always fits here)
    fused = embedding_near_dups(
        emb, threshold=0.1, n_bands=4, n_bits=2, max_bucket=max_bucket,
        portable=True,
    ).collect()
    # reference: explicit pair stream + indexed dot + JVM round/filter
    codes = band_codes_udf(4, 2, 42, True)
    bb = emb.select(
        F.col("vec_id"), F.posexplode(codes(F.col("embedding"))).alias("band", "code")
    )
    cand = bucket_pairs_nodup(bb, "band", "code", "vec_id", 4, 2, max_bucket)
    idx = build_dot_index(spark, emb, "vec_id", "embedding")
    ids_, mat_ = idx.value
    ref = []
    for r in cand.collect():
        ia, ib = np.searchsorted(ids_, r.id_a), np.searchsorted(ids_, r.id_b)
        d = float(np.einsum("ij,ij->i", mat_[ia : ia + 1], mat_[ib : ib + 1])[0])
        ref.append((r.id_a, r.id_b, d))
    ref_rows = {
        (a, b, _round_half_up6(d)) for a, b, d in ref if _round_half_up6(d) >= 0.1
    }
    got = {(r.id_a, r.id_b, r.cosine) for r in fused}
    assert len(fused) == len(got)
    assert got == ref_rows and len(got) > 0


def _round_half_up6(x: float) -> float:
    """Spark's F.round (HALF_UP on the decimal representation)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_bucket_pairs_payload_cols(spark):
    from cor_asv_ann_spark.operators.similarity import bucket_pairs

    rows = [
        Row(doc_id=i, payload=i * 10, ci=0, cv=i % 2) for i in range(6)
    ]
    banded = spark.createDataFrame(rows)
    out = bucket_pairs(
        banded, ["ci", "cv"], "doc_id", None, None, payload_cols=["payload"]
    ).collect()
    for r in out:
        assert r.id_a < r.id_b
        assert r.payload_a == r.id_a * 10 and r.payload_b == r.id_b * 10
    assert {(r.id_a, r.id_b) for r in out} == {(0, 2), (0, 4), (2, 4), (1, 3), (1, 5), (3, 5)}


def test_adjusted_distance_fast_path_matches_full():
    from cor_asv_ann_spark.corelib.align import adjusted_distance

    cases = [
        ("hello", None),
        ("aͤbc", None),            # combining mark merges onto 'a'
        ("́abc", None),            # leading mark cannot merge
        (".́x", None),             # mark after punctuation: no merge
        ("aſꝛb", "historic_latin"),     # L2-normalized equal
        ("", None),
    ]
    for s, norm in cases:
        fast = adjusted_distance(s, s, norm, 1)
        d_full, n_full, pairs = adjusted_distance(s, s, norm, 1, return_alignment=True)
        assert fast == (d_full, n_full), (s, fast, (d_full, n_full))
        assert n_full == len(pairs)


def test_char_lm_counts_derived_unigrams(spark):
    from collections import Counter

    from cor_asv_ann_spark.operators.lm import char_ngram_counts

    texts = ["abcab", "bca", "", "aa"]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    got = {
        (r.ctx, r.ch): r.n for r in char_ngram_counts(df, "text", order=3).collect()
    }
    want: Counter = Counter()
    for t in texts:
        for i, c in enumerate(t):
            want[("", c)] += 1          # unigram fallback row per char
            if i > 0:
                want[(t[max(i - 2, 0):i], c)] += 1
    assert got == dict(want)


def test_char_lm_counts_packed_key_matches_brute_force_unicode(spark):
    """The order<=3 path packs (ctx, ch) into one bigint (cp+1 per
    21-bit field) and decodes only the aggregated table — pin it against
    a brute-force Python count over a unicode stress corpus: combining
    marks, CJK, astral-plane codepoints (>0xFFFF), and a NUL (cp 0 must
    not alias with the 'absent context' sentinel)."""
    from collections import Counter

    from cor_asv_ann_spark.operators.lm import char_ngram_counts

    texts = [
        "héllo wörld",
        "日本語テキスト",
        "\U0001d518\U0001d52b\U0001d526 frak",  # astral
        "écombining",
        "embedded\x00nul",
        "",
        "aa",
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    got = {
        (r.ctx, r.ch): r.n for r in char_ngram_counts(df, "text", order=3).collect()
    }
    want: Counter = Counter()
    for t in texts:
        for i, c in enumerate(t):
            want[("", c)] += 1
            if i > 0:
                want[(t[max(i - 2, 0):i], c)] += 1
    assert got == dict(want)


def test_synth_spans_jvm_matches_python_generator(spark):
    """The word-level span synthesis is a pure-JVM projection
    (_synth_spans_jvm); pin it byte-identical against the original
    Python generator (build_spans + degrade_reversible in a
    mapInPandas) over edge shapes: empty text, one word, exactly one
    full line, line+1, last-line-short multiples of the media period,
    and degradable characters (w/s/r/a sprinkle interactions)."""
    import pandas as pd

    from cor_asv_ann_spark.corelib.noise import degrade_reversible
    from cor_asv_ann_spark.schema import SPANS_SCHEMA
    from cor_asv_ann_spark.sources.spans import _synth_spans_jvm, build_spans

    texts = [
        ("e0", ""),
        ("e1", "one"),
        ("e7", " ".join(f"w{i}" for i in range(7))),
        ("e8", " ".join(f"w{i}" for i in range(8))),
        ("e28", " ".join(f"aws{i}" for i in range(28))),
        ("e29", " ".join(f"rsau{i}" for i in range(29))),
        ("e56", " ".join(f"x{i}" for i in range(56))),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])

    def python_synth(noisy):
        def gen(batches):
            for pdf in batches:
                rows = []
                for doc_id, text in zip(pdf["doc_id"].astype(str), pdf["text"]):
                    spans = build_spans(doc_id, text, level="word")
                    if noisy:
                        spans = [
                            (k,
                             degrade_reversible(t, f"{doc_id}:{o}")
                             if k in ("word", "glyph") else t,
                             r, o)
                            for (k, t, r, o) in spans
                        ]
                    rows.append({
                        "doc_id": doc_id,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": r, "offset": o}
                            for (k, t, r, o) in spans
                        ],
                    })
                yield pd.DataFrame(rows, columns=["doc_id", "spans"])

        return docs.mapInPandas(gen, schema=SPANS_SCHEMA)

    def canon(df):
        return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in df.collect()}

    for noisy in (False, True):
        assert canon(python_synth(noisy)) == canon(_synth_spans_jvm(docs, noisy))
