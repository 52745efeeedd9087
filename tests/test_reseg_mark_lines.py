"""Resegmentation (W5), marking (P8/A7/W6), line sources (S5/S6/P3-P7)."""

import pytest
from pyspark.sql import Row, functions as F

from cor_asv_ann_spark.operators.mark import (
    dehyphenate_recheck,
    mark_counters,
    mark_words,
    words_from_spans,
)
from cor_asv_ann_spark.operators.resegment import confidence_rollup, resegment_line
from cor_asv_ann_spark.schema import SPANS_SCHEMA
from cor_asv_ann_spark.sources.lines import (
    prepare_pairs,
    read_tsv_pairs,
    scan_vocabulary,
    train_val_split,
)


def test_resegment_merge():
    # deleted space between words → merge
    k, t, r, c, src = resegment_line(
        ["word", "space", "word", "newline"],
        ["fo", "", "o", "\n"],
        ["a", None, "b", None],
        [0.9, 1.0, 0.7, 1.0],
        in_texts=["fo", " ", "o", "\n"],
    )
    assert t == ["foo", "\n"]
    assert k == ["word", "newline"]
    assert r[0] == "a"
    assert c[0] == pytest.approx(0.8)
    # input texts stay position-aligned: the merged span carries the
    # concatenated originals, so "".join(src) preserves the input line
    assert src == ["fo o", "\n"]
    assert len(src) == len(k) == len(t) == len(c)


def test_resegment_split():
    # introduced inner space → split with proportional geometry anchors
    k, t, r, c, src = resegment_line(
        ["word", "newline"], ["ab cd", "\n"], ["g", None], [0.6, 1.0],
        in_texts=["abcd", "\n"],
    )
    assert t == ["ab", " ", "cd", "\n"]
    assert k == ["word", "space", "word", "newline"]
    assert r[0].startswith("g#split[") and r[2].startswith("g#split[")
    # introduced spans carry '' inputs; original rides on the first part
    assert src == ["abcd", "", "", "\n"]
    assert len(src) == len(k)


def test_resegment_split_box_geometry():
    """box:// refs get REAL proportional geometry (reference
    _split_word_at_space: prev w = w·fract, next x = x + w·fract)."""
    k, t, r, c, _src = resegment_line(
        ["word", "newline"], ["ab cd", "\n"], ["box://100,10,50,20", None], [0.6, 1.0]
    )
    assert t == ["ab", " ", "cd", "\n"]
    assert r[0] == "box://100,10,20,20"  # [0, 2/5) of width 50
    assert r[2] == "box://130,10,20,20"  # [3/5, 5/5)
    assert r[1] is None


def test_resegment_merge_box_geometry():
    """Merged words take the bounding-box union (reference _merge_words)."""
    k, t, r, c, _src = resegment_line(
        ["word", "space", "word", "newline"],
        ["fo", "", "o", "\n"],
        ["box://10,10,20,20", None, "box://40,5,10,30", None],
        [0.9, 1.0, 0.7, 1.0],
    )
    assert t == ["foo", "\n"]
    assert r[0] == "box://10,5,40,30"  # union of both boxes


def test_resegment_noop():
    k, t, r, c, src = resegment_line(
        ["word", "newline"], ["ok", "\n"], ["g", None], [1.0, 1.0]
    )
    assert t == ["ok", "\n"] and k == ["word", "newline"]
    assert src == ["ok", "\n"]


SPANS = [
    Row(
        doc_id="d1",
        spans=[
            Row(kind="word", text="hel-", media_ref="r0", offset=0),
            Row(kind="newline", text="\n", media_ref=None, offset=1),
            Row(kind="word", text="lo", media_ref="r1", offset=2),
            Row(kind="space", text=" ", media_ref=None, offset=3),
            Row(kind="word", text="zzzq", media_ref="r2", offset=4),
            Row(kind="newline", text="\n", media_ref=None, offset=5),
        ],
    )
]


def test_mark_and_dehyphenate(spark):
    spans = spark.createDataFrame(SPANS, schema=SPANS_SCHEMA)
    words = words_from_spans(spans)
    lex = spark.createDataFrame([("hello",), ("world",)], ["entry"])
    marked = mark_words(words, lex)
    flags = {(r.line_no, r.word_idx): r.oov for r in marked.collect()}
    assert flags[(0, 0)] is True  # 'hel-' alone is OOV
    assert flags[(1, 0)] is True  # 'lo' alone is OOV
    assert flags[(1, 1)] is True  # 'zzzq' is OOV
    rechecked = dehyphenate_recheck(marked, lex)
    flags2 = {(r.line_no, r.word_idx): r.oov for r in rechecked.collect()}
    assert flags2[(0, 0)] is False  # hel- + lo = hello ∈ lexicon
    assert flags2[(1, 0)] is False  # continuation unmarked too
    assert flags2[(1, 1)] is True
    counters = mark_counters(rechecked).collect()[0]
    assert counters.n_words == 3 and counters.n_oov == 1


def test_confidence_rollup(spark):
    from cor_asv_ann_spark.schema import CORRECTED_LINE_SCHEMA

    corrected = spark.createDataFrame(
        [
            Row(
                doc_id="d",
                line_no=0,
                kinds=["word", "space", "word", "newline"],
                texts=["a", " ", "b", "\n"],
                media_refs=[None] * 4,
                offsets=[0, 1, 2, 3],
                out_texts=["a", " ", "b", "\n"],
                out_confs=[0.8, 1.0, 0.6, 1.0],
                line_cer=0.0,
            )
        ],
        schema=CORRECTED_LINE_SCHEMA,
    )
    row = confidence_rollup(corrected).collect()[0]
    assert row.line_conf == pytest.approx(0.7)
    assert row.doc_conf == pytest.approx(0.7)


def test_tsv_pairs_and_prepare(spark, tmp_path):
    p = tmp_path / "pairs.tsv"
    p.write_text("ſlovv\tslow\nbadbadbad\tzzzzzzzzzzzz\ncafé\tcafé\n")
    pairs = read_tsv_pairs(spark, str(p))
    assert pairs.count() == 3
    prep = prepare_pairs(pairs)
    rows = prep.collect()
    # bad pair dropped (quick_ratio < 0.5, len > 5)
    assert len(rows) == 2
    for r in rows:
        assert r.source.endswith("\n") and r.target.endswith("\n")
    nfc = [r for r in rows if "café" in r.target]
    assert nfc and nfc[0].source == "café\n"  # NFC composed

    charmapped = prepare_pairs(pairs, charmap={"ſ": "s", "vv": "w"}).collect()
    srcs = [r.source for r in charmapped]
    assert "slow\n" in srcs


def test_vocab_and_split(spark, tmp_path):
    p = tmp_path / "v.tsv"
    p.write_text("abc\tabd\nxyz\txyz\n")
    pairs = prepare_pairs(read_tsv_pairs(spark, str(p)), drop_bad=False)
    vocab = scan_vocabulary(pairs)
    assert set(vocab) == set("abcdxyz\n")
    assert 0 not in vocab.values()
    train, val = train_val_split(pairs, 0.5, seed=1)
    assert train.count() + val.count() == 2


def test_mark_with_file_backed_lexicon(spark, tmp_path):
    """A hunspell-style .dic file drops straight into mark_words /
    dehyphenate_recheck: affix flags after '/' are stripped, the leading
    entry-count line ignored — same flags as the DataFrame lexicon."""
    from cor_asv_ann_spark.operators.mark import lexicon_from_wordlist

    dic = tmp_path / "words.dic"
    dic.write_text("2\nhello/MS\nworld\n\n")
    lex_file = lexicon_from_wordlist(spark, str(dic))
    assert sorted(r.entry for r in lex_file.collect()) == ["hello", "world"]

    spans = spark.createDataFrame(SPANS, schema=SPANS_SCHEMA)
    words = words_from_spans(spans)
    lex_df = spark.createDataFrame([("hello",), ("world",)], ["entry"])
    via_file = dehyphenate_recheck(mark_words(words, lex_file), lex_file)
    via_df = dehyphenate_recheck(mark_words(words, lex_df), lex_df)
    f1 = {(r.line_no, r.word_idx): r.oov for r in via_file.collect()}
    f2 = {(r.line_no, r.word_idx): r.oov for r in via_df.collect()}
    assert f1 == f2


def test_affix_expansion_unit():
    """corelib.affix: the hunspell SFX/PFX subset — strip+append with
    conditions, cross-products, flag modes, continuation-flag surface."""
    from cor_asv_ann_spark.corelib.affix import expand_entry, parse_aff

    aff = parse_aff(
        "# German-style fixture\n"
        "SET UTF-8\n"
        "SFX N Y 2\n"
        "SFX N aus äuser aus   # Haus -> Häuser\n"
        "SFX N 0 es [^s]       # Haut -> Hautes (synthetic)\n"
        "SFX A Y 1\n"
        "SFX A e en e          # Lampe -> Lampen\n"
        "PFX U Y 1\n"
        "PFX U 0 un .          # un- prefix, cross-product\n"
    )
    assert expand_entry("Haus/N", aff) == ["Haus", "Häuser"]
    # condition [^s] rejects words ending in s, accepts Haut
    assert expand_entry("Haut/N", aff) == ["Haut", "Hautes"]
    assert expand_entry("Lampe/A", aff) == ["Lampe", "Lampen"]
    # cross product: PFX applies to base AND to SFX results (both Y)
    forms = expand_entry("klar/AU", aff)
    assert forms == ["klar", "unklar"]  # 'klar' fails SFX A's 'e' cond
    forms2 = expand_entry("fade/AU", aff)
    assert set(forms2) == {"fade", "faden", "unfaden", "unfade"}
    # flagless entries and empty lines
    assert expand_entry("und", aff) == ["und"]
    assert expand_entry("", aff) == []
    # FLAG long mode: 2-char flags
    aff_long = parse_aff("FLAG long\nSFX Aa Y 1\nSFX Aa 0 s .\n")
    assert expand_entry("tree/Aa", aff_long) == ["tree", "trees"]
    # FLAG num mode
    aff_num = parse_aff("FLAG num\nSFX 101 Y 1\nSFX 101 0 s .\n")
    assert expand_entry("car/101,9", aff_num) == ["car", "cars"]
    # continuation flags whose groups have no rules: surface form kept
    aff_cont = parse_aff("SFX B Y 1\nSFX B 0 en/XY .\n")
    assert expand_entry("tief/B", aff_cont) == ["tief", "tiefen"]


def test_affix_twofold_continuation():
    """Two-fold stripping (VERDICT r4 #2): continuation flags on the
    appendage ("en/C") apply their rule groups to the affixed form —
    one extra level, suffix-suffix and prefix-continuation both, no
    deeper recursion (hunspell allows at most two suffixes)."""
    from cor_asv_ann_spark.corelib.affix import expand_entry, parse_aff

    aff = parse_aff(
        "SFX B Y 1\n"
        "SFX B 0 en/C .\n"
        "SFX C Y 1\n"
        "SFX C 0 s .\n"
        "PFX U Y 1\n"
        "PFX U 0 un/D .\n"
        "SFX D Y 1\n"
        "SFX D 0 lich .\n"
    )
    assert expand_entry("tief/B", aff) == ["tief", "tiefen", "tiefens"]
    # continuation of a PREFIX rule applies to the prefixed form
    assert expand_entry("klar/U", aff) == ["klar", "unklar", "unklarlich"]
    # exactly one extra level: the continuation rule's own continuation
    # flags do not recurse further
    aff2 = parse_aff(
        "SFX B Y 1\nSFX B 0 en/C .\nSFX C Y 1\nSFX C 0 s/B .\n"
    )
    assert expand_entry("tief/B", aff2) == ["tief", "tiefen", "tiefens"]
    # continuation rule conditions are evaluated against the AFFIXED
    # form, not the base word
    aff3 = parse_aff(
        "SFX B Y 1\nSFX B 0 en/C .\nSFX C Y 1\nSFX C 0 x n\n"
    )
    # 'tiefen' ends in n → C applies; base 'tief' would not have
    assert expand_entry("tief/B", aff3) == ["tief", "tiefen", "tiefenx"]
    # two-fold in long flag mode
    aff_long = parse_aff(
        "FLAG long\nSFX Aa Y 1\nSFX Aa 0 en/BbCc .\n"
        "SFX Bb Y 1\nSFX Bb 0 s .\nSFX Cc Y 1\nSFX Cc 0 d .\n"
    )
    assert expand_entry("tief/Aa", aff_long) == [
        "tief", "tiefen", "tiefens", "tiefend"]


def test_affix_twofold_property():
    """Property (VERDICT r4 #2): for unconditional append-only rules,
    the expansion of word/Q with Q appending a1 and continuing into R
    appending a2 is exactly the dedup of [w, w+a1, w+a1+a2] — checked
    against an independent string-concat oracle."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cor_asv_ann_spark.corelib.affix import expand_entry, parse_aff

    letters = st.text(alphabet="abcdes", min_size=1, max_size=4)

    @settings(max_examples=100, deadline=None)
    @given(word=st.text(alphabet="abcdes", min_size=1, max_size=8),
           a1=letters, a2=letters)
    def check(word, a1, a2):
        aff = parse_aff(
            f"SFX Q Y 1\nSFX Q 0 {a1}/R .\nSFX R Y 1\nSFX R 0 {a2} .\n"
        )
        forms = expand_entry(f"{word}/Q", aff)
        expected = []
        for w in (word, word + a1, word + a1 + a2):
            if w not in expected:
                expected.append(w)
        assert forms == expected

    check()


def test_mark_with_affix_expanded_lexicon(spark, tmp_path):
    """VERDICT r3 #3: 'Haus/N' + an .aff SFX rule must accept Häuser —
    the .aff sitting next to the .dic is picked up automatically and
    inflected forms stop being over-marked OOV."""
    from cor_asv_ann_spark.operators.mark import (
        lexicon_from_wordlist,
        mark_words,
        words_from_spans,
    )

    (tmp_path / "de.aff").write_text(
        "SET UTF-8\nSFX N Y 1\nSFX N aus äuser aus\n", encoding="utf-8"
    )
    (tmp_path / "de.dic").write_text("2\nHaus/N\nLicht\n", encoding="utf-8")
    lex = lexicon_from_wordlist(spark, str(tmp_path / "de.dic"))
    assert sorted(r.entry for r in lex.collect()) == ["Haus", "Häuser", "Licht"]

    spans = spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("word", "Häuser", "xy://0", 0),
                    ("space", " ", None, 1),
                    ("word", "Hxus", "xy://2", 2),
                ],
            )
        ],
        SPANS_SCHEMA,
    )
    marked = mark_words(words_from_spans(spans), lex)
    oov = {r.word: r.oov for r in marked.collect()}
    assert oov == {"Häuser": False, "Hxus": True}

    # without the .aff (plain flag-strip fallback) Häuser IS over-marked
    # — the regression the expansion fixes
    (tmp_path / "solo.dic").write_text("2\nHaus/N\nLicht\n", encoding="utf-8")
    lex_stripped = lexicon_from_wordlist(spark, str(tmp_path / "solo.dic"))
    marked2 = mark_words(words_from_spans(spans), lex_stripped)
    assert {r.word: r.oov for r in marked2.collect()}["Häuser"] is True


def test_affix_expansion_properties():
    """Property test: random SFX/PFX rule sets + random words — the
    expander must (1) keep the base first, (2) emit unique forms, (3)
    emit a suffixed form iff the word ends with the strip AND matches
    the condition (checked against an independent regex oracle), (4)
    never crash on arbitrary comment/garbage lines in the .aff."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cor_asv_ann_spark.corelib.affix import expand_entry, parse_aff

    letters = st.text(alphabet="abcdes", min_size=1, max_size=4)

    @settings(max_examples=150, deadline=None)
    @given(
        word=st.text(alphabet="abcdes", min_size=1, max_size=8),
        strip=st.one_of(st.just(""), letters),
        append=letters,
        cond=st.one_of(st.just("."), st.sampled_from(["a", "s", "e", "[^s]", "[ae]"])),
        garbage=st.text(alphabet="XYZ# \t/", max_size=12),
    )
    def check(word, strip, append, cond, garbage):
        aff = parse_aff(
            f"{garbage}\n"
            "SFX Q Y 1\n"
            f"SFX Q {strip or 0} {append} {cond}\n"
        )
        forms = expand_entry(f"{word}/Q", aff)
        assert forms[0] == word
        assert len(forms) == len(set(forms))
        # independent oracle: hunspell suffix semantics via regex
        cond_re = ".*" if cond == "." else f".*{cond}$"
        applies = word.endswith(strip) and re.fullmatch(cond_re, word)
        expected = word[: len(word) - len(strip)] + append if applies else None
        if expected and expected != word:
            assert forms == [word, expected]
        else:
            assert forms == [word]

    check()


def test_compound_parse_and_acceptance_unit():
    """Hunspell COMPOUND* subset (wrapper/mark.py:59-69 shells out to
    hunspell, which resolves compounds at lookup): positional flags,
    COMPOUNDMIN, COMPOUNDWORDMAX, ONLYINCOMPOUND, CHECKCOMPOUNDDUP,
    CHECKCOMPOUNDTRIPLE, ICONV."""
    from cor_asv_ann_spark.corelib.affix import (
        apply_iconv,
        build_compound_lexicon,
        expand_entry_tagged,
        iconv_sorted,
        parse_aff,
    )

    aff = parse_aff(
        "SET UTF-8\n"
        "COMPOUNDBEGIN B\nCOMPOUNDMIDDLE M\nCOMPOUNDEND E\n"
        "COMPOUNDMIN 3\nCOMPOUNDWORDMAX 3\nONLYINCOMPOUND o\n"
        "CHECKCOMPOUNDDUP\nCHECKCOMPOUNDTRIPLE\n"
        "ICONV 1\nICONV ’ '\n"
    )
    assert aff["compound"] == {
        "begin": "B", "middle": "M", "end": "E",
        "min": 3, "wordmax": 3, "onlyin": "o",
        "checkdup": True, "checktriple": True,
    }
    assert aff["iconv"] == [("’", "'")]

    tagged = []
    for e in ["dampf/BM", "schiff/BM", "fahrt/E", "werk/oE", "berg/B"]:
        tagged += expand_entry_tagged(e, aff)
    # ONLYINCOMPOUND entry is a part, never a standalone word
    assert ("werk", "e") in tagged
    lex = build_compound_lexicon(tagged, aff)
    assert "werk" not in lex.standalone and "werk" in lex.end
    assert lex.accepts_compound("dampffahrt")           # B+E
    assert lex.accepts_compound("dampfschifffahrt") is False  # TRIPLE at junction
    assert lex.accepts_compound("bergwerk")             # B + onlyin-E
    assert not lex.accepts_compound("fahrtdampf")       # E can't begin
    assert not lex.accepts_compound("werk")             # single part ≠ compound
    assert not lex.accepts_compound("dampfschiffschifffahrt")  # DUP + WORDMAX
    assert not lex.accepts_compound("dampfschiffdampffahrt")   # 4 parts > WORDMAX 3
    # COMPOUNDMIN: a 2-char part can't participate
    tagged2 = tagged + expand_entry_tagged("ab/B", aff)
    lex2 = build_compound_lexicon(tagged2, aff)
    assert not lex2.accepts_compound("abfahrt")

    # without CHECKCOMPOUNDTRIPLE the tripled junction is fine
    aff3 = parse_aff("COMPOUNDFLAG X\nCOMPOUNDMIN 3\n")
    t3 = [p for e in ["dampf/X", "schiff/X", "fahrt/X"]
          for p in expand_entry_tagged(e, aff3)]
    lex3 = build_compound_lexicon(t3, aff3)
    assert lex3.accepts_compound("dampfschifffahrt")
    assert lex3.accepts("dampf")  # standalone via the base form

    assert apply_iconv("fin’s", iconv_sorted(aff["iconv"])) == "fin's"
    # longest match wins, each char converted at most once
    pairs = iconv_sorted([("a", "b"), ("aa", "c")])
    assert apply_iconv("aaa", pairs) == "cb"


def test_compound_dp_vs_generation_oracle():
    """Property: the split-point DP must agree with an independent
    GENERATION oracle that enumerates all begin·middle*·end part
    sequences (≤ wordmax parts, adjacent-dup filter) and tests string
    equality — the opposite direction of the parser."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cor_asv_ann_spark.corelib.affix import CompoundLexicon

    parts = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3), min_size=1, max_size=4,
        unique=True,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        begin=parts, middle=parts, end=parts,
        word=st.text(alphabet="ab", min_size=2, max_size=8),
        wordmax=st.integers(min_value=2, max_value=4),
        dup=st.booleans(),
    )
    def check(begin, middle, end, word, wordmax, dup):
        lex = CompoundLexicon(
            standalone=frozenset(),
            begin=frozenset(begin), middle=frozenset(middle),
            end=frozenset(end),
            cmin=1, wordmax=wordmax, checkdup=dup,
        )

        def gen(prefix, count, prev):
            # next part is an END (finishing) or a BEGIN/MIDDLE part
            if count + 1 <= wordmax and count + 1 >= 2:
                for p in end:
                    if dup and p == prev:
                        continue
                    if prefix + p == word:
                        return True
            nxt = begin if count == 0 else middle
            if count + 2 <= wordmax:  # must leave room for the end part
                for p in nxt:
                    if dup and p == prev:
                        continue
                    if word.startswith(prefix + p):
                        if gen(prefix + p, count + 1, p):
                            return True
            return False

        assert lex.accepts_compound(word) == gen("", 0, "")

    check()


def test_mark_with_compound_lexicon(spark, tmp_path):
    """End to end: a German-style .dic/.aff with COMPOUNDFLAG — the
    compound 'Dampfschifffahrt' (never listed as an entry) stops being
    over-marked OOV, an ONLYINCOMPOUND part stays OOV standalone, and
    a hyphenated compound rejoins through dehyphenate_recheck."""
    from cor_asv_ann_spark.operators.mark import (
        compound_lexicon_from_dic,
        lexicon_from_wordlist,
        words_from_spans,
    )

    (tmp_path / "de.aff").write_text(
        "SET UTF-8\nCOMPOUNDFLAG X\nCOMPOUNDMIN 4\nONLYINCOMPOUND o\n"
        "ICONV 1\nICONV ’ '\n"
        "SFX N Y 1\nSFX N aus äuser aus\n",
        encoding="utf-8",
    )
    (tmp_path / "de.dic").write_text(
        "5\nDampf/X\nSchiff/X\nFahrt/X\nHaus/NX\nwerks/oX\n", encoding="utf-8"
    )
    lex = lexicon_from_wordlist(spark, str(tmp_path / "de.dic"))
    # ONLYINCOMPOUND form is excluded from the standalone join lexicon
    assert "werks" not in {r.entry for r in lex.collect()}
    comp = compound_lexicon_from_dic(spark, str(tmp_path / "de.dic"))
    assert comp is not None and comp.cmin == 4

    spans = spark.createDataFrame(
        [
            Row(
                doc_id="d1",
                spans=[
                    Row(kind="word", text="Dampfschifffahrt", media_ref="r0", offset=0),
                    Row(kind="space", text=" ", media_ref=None, offset=1),
                    Row(kind="word", text="werks", media_ref="r1", offset=2),
                    Row(kind="space", text=" ", media_ref=None, offset=3),
                    Row(kind="word", text="Dampfwerks", media_ref="r2", offset=4),
                    Row(kind="space", text=" ", media_ref=None, offset=5),
                    Row(kind="word", text="Häuser", media_ref="r3", offset=6),
                    Row(kind="space", text=" ", media_ref=None, offset=7),
                    Row(kind="word", text="Qqqq", media_ref="r4", offset=8),
                    Row(kind="newline", text="\n", media_ref=None, offset=9),
                    Row(kind="word", text="Dampf-", media_ref="r5", offset=10),
                    Row(kind="newline", text="\n", media_ref=None, offset=11),
                    Row(kind="word", text="fahrt", media_ref="r6", offset=12),
                    Row(kind="newline", text="\n", media_ref=None, offset=13),
                ],
            )
        ],
        schema=SPANS_SCHEMA,
    )
    words = words_from_spans(spans)
    marked = mark_words(words, lex, compound=comp)
    flags = {r.word: r.oov for r in marked.collect()}
    assert flags["Dampfschifffahrt"] is False  # compound DP rescue
    assert flags["werks"] is True              # only-in-compound alone
    assert flags["Dampfwerks"] is False        # compound with onlyin end part
    assert flags["Häuser"] is False            # affix expansion still works
    assert flags["Qqqq"] is True
    # hyphenated across lines: Dampf- + fahrt → compound via recheck
    assert flags["Dampf-"] is False            # 'dampf' is standalone IV
    assert flags["fahrt"] is False
    rechecked = dehyphenate_recheck(marked, lex, compound=comp)
    flags2 = {r.word: r.oov for r in rechecked.collect()}
    assert flags2["Dampf-"] is False and flags2["fahrt"] is False

    # without the compound lexicon the compound IS over-marked — the
    # regression this closes
    marked_plain = mark_words(words, lex)
    assert {r.word: r.oov for r in marked_plain.collect()}[
        "Dampfschifffahrt"
    ] is True


def test_compound_rule_patterns():
    """COMPOUNDRULE pattern compounds (hunspell man page `COMPOUNDRULE`,
    the en_US ordinal mechanism): flags with */? modifiers matched as
    an NFA over ≥2-part splits; parenthesized flags for long/num
    modes; COMPOUNDMIN honored; flag-family and rule compounds
    coexist."""
    from cor_asv_ann_spark.corelib.affix import (
        build_compound_lexicon,
        expand_entry_tagged,
        parse_aff,
        parse_compound_rules,
        rule_flags_of,
    )

    aff = parse_aff(
        "SET UTF-8\nCOMPOUNDMIN 1\nCOMPOUNDRULE 2\n"
        "COMPOUNDRULE AB*C\nCOMPOUNDRULE DD\n"
    )
    assert aff["compound"]["rules"] == ["AB*C", "DD"]
    entries = ["x/A", "y/B", "z/C", "q/D"]
    rw = [(e.partition("/")[0], rule_flags_of(e, aff)) for e in entries]
    assert dict(rw) == {"x": "A", "y": "B", "z": "C", "q": "D"}
    tagged = [t for e in entries for t in expand_entry_tagged(e, aff)]
    lex = build_compound_lexicon(tagged, aff, rule_words=rw)
    assert lex.accepts_compound("xz")        # B* empty
    assert lex.accepts_compound("xyz")
    assert lex.accepts_compound("xyyyz")     # B* repeats
    assert not lex.accepts_compound("xy")    # missing C
    assert not lex.accepts_compound("z")     # single part never
    assert lex.accepts_compound("qq")
    assert not lex.accepts_compound("qqq")   # DD is exactly two
    assert not lex.accepts_compound("xzq")   # no rule concatenation

    # en_US-shaped ordinals ("21st" = 2/n 1/1 st-carrier)
    aff2 = parse_aff(
        "SET UTF-8\nCOMPOUNDMIN 1\nONLYINCOMPOUND c\n"
        "COMPOUNDRULE 2\nCOMPOUNDRULE n*1t\nCOMPOUNDRULE n*mp\n"
    )
    ents = ["0/nm", "1/n1", "2/n1", "3/n1", "0th/pt", "1st/p1t",
            "2nd/p1t", "3rd/p1t"]
    rw2 = [(e.partition("/")[0], rule_flags_of(e, aff2)) for e in ents]
    tg2 = [t for e in ents for t in expand_entry_tagged(e, aff2)]
    lex2 = build_compound_lexicon(tg2, aff2, rule_words=rw2)
    assert lex2.accepts_compound("21st")
    assert lex2.accepts_compound("101st")
    assert lex2.accepts_compound("120th")
    assert lex2.accepts_compound("10th")
    assert not lex2.accepts_compound("1st")   # single part
    assert not lex2.accepts_compound("1th")   # 1 is not m, th needs m+p
    assert not lex2.accepts_compound("0th")   # 0th is one dict word

    # parenthesized (long/num) pattern tokens
    toks = parse_compound_rules(["(1001)(1002)*(1003)?"], "num")
    assert toks == ((("1001", ""), ("1002", "*"), ("1003", "?")),)


def test_compound_permit_forbid_flags():
    """COMPOUNDPERMITFLAG opens inner positions for the affixed form,
    COMPOUNDFORBIDFLAG closes all compound use (on the affix via the
    appendage's continuation flags, on the entry via its own flags)."""
    from cor_asv_ann_spark.corelib.affix import (
        build_compound_lexicon,
        expand_entry_tagged,
        parse_aff,
    )

    aff = parse_aff(
        "SET UTF-8\nCOMPOUNDFLAG X\nCOMPOUNDMIN 4\n"
        "COMPOUNDPERMITFLAG P\nCOMPOUNDFORBIDFLAG F\n"
        "SFX S Y 1\nSFX S 0 s/P .\n"
        "SFX T Y 1\nSFX T 0 er/F .\n"
    )
    assert dict(expand_entry_tagged("Dampf/XS", aff)) == {
        "Dampf": "sbme", "Dampfs": "sbme"}  # permit: inner allowed
    assert dict(expand_entry_tagged("Schiff/XT", aff)) == {
        "Schiff": "sbme", "Schiffer": "s"}  # forbid: no compound use
    # forbid flag directly on an entry: word itself excluded
    assert dict(expand_entry_tagged("Werk/XF", aff)) == {"Werk": "s"}

    tagged = [
        t for e in ["Dampf/XS", "Schiff/XT", "Fahrt/X"]
        for t in expand_entry_tagged(e, aff)
    ]
    lex = build_compound_lexicon(tagged, aff)
    assert lex.accepts_compound("dampfsfahrt")       # permitted inner -s-
    assert lex.accepts_compound("dampfsdampffahrt")
    assert lex.accepts_compound("dampfschiff")
    assert not lex.accepts_compound("fahrtschiffer")  # forbidden suffix
    # without permit/forbid the default edge rule still holds: a plain
    # suffixed form may only END a compound
    aff_plain = parse_aff(
        "SET UTF-8\nCOMPOUNDFLAG X\nCOMPOUNDMIN 4\n"
        "SFX S Y 1\nSFX S 0 s .\n"
    )
    tg = [
        t for e in ["Dampf/XS", "Fahrt/X"]
        for t in expand_entry_tagged(e, aff_plain)
    ]
    lexp = build_compound_lexicon(tg, aff_plain)
    assert not lexp.accepts_compound("dampfsfahrt")
    assert lexp.accepts_compound("fahrtdampfs")


def test_mark_with_compound_rules(spark, tmp_path):
    """COMPOUNDRULE through the real mark operator: pattern compounds
    survive the lexicon-join miss and are rescued by the rule NFA
    inside the same accepts pass. (Letter words only: the mark
    processor's asword strips non-L/M chars BEFORE the spellcheck —
    wrapper/mark.py:59-69 — so digit ordinals never reach hunspell in
    the reference either; the ordinal mechanics are pinned at the
    CompoundLexicon level above.)"""
    from cor_asv_ann_spark.operators.mark import (
        compound_lexicon_from_dic,
        lexicon_from_wordlist,
        mark_words,
    )

    (tmp_path / "en.aff").write_text(
        "SET UTF-8\nCOMPOUNDMIN 2\n"
        "COMPOUNDRULE 1\nCOMPOUNDRULE AB*C\n",
        encoding="utf-8",
    )
    (tmp_path / "en.dic").write_text(
        "5\nfoo/A\nmid/B\nbar/C\nword\nhello\n", encoding="utf-8"
    )
    lex = lexicon_from_wordlist(spark, str(tmp_path / "en.dic"))
    comp = compound_lexicon_from_dic(spark, str(tmp_path / "en.dic"))
    assert comp is not None and comp.rule_tokens
    assert dict(comp.rule_words) == {
        "foo": ("A",), "mid": ("B",), "bar": ("C",)}
    words = spark.createDataFrame(
        [("d1", 0, i, w, 100 + i) for i, w in enumerate(
            ["foobar", "foomidmidbar", "word", "foomid", "barfoo"])],
        "doc_id string, line_no int, word_idx int, word string, offset int",
    )
    flags = {r.word: r.oov for r in mark_words(words, lex, compound=comp).collect()}
    assert flags["foobar"] is False        # A C (B* empty)
    assert flags["foomidmidbar"] is False  # A B B C
    assert flags["word"] is False          # plain join
    assert flags["foomid"] is True         # no C
    assert flags["barfoo"] is True         # wrong order


def test_compound_rule_nfa_vs_bruteforce_oracle():
    """Property pin for the COMPOUNDRULE NFA: against a brute-force
    oracle that enumerates EVERY split of the word into dictionary
    parts and every flag choice per part, then regex-matches the flag
    string against the pattern (opposite decision procedure — regex
    over an enumerated alphabet vs NFA over split points)."""
    import itertools
    import random
    import re

    from cor_asv_ann_spark.corelib.affix import (
        CompoundLexicon,
        parse_compound_rules,
    )

    rnd = random.Random(42)
    flags = "ABCD"
    for trial in range(200):
        # random dictionary: 3-6 words over a tiny alphabet (collisions
        # and prefix-overlap likely), each with 1-2 flags
        words = {}
        for _ in range(rnd.randint(3, 6)):
            w = "".join(rnd.choice("xy") for _ in range(rnd.randint(1, 3)))
            fl = frozenset(rnd.sample(flags, rnd.randint(1, 2)))
            words[w] = words.get(w, frozenset()) | fl
        # random pattern of 2-4 tokens with random modifiers
        toks = [
            (rnd.choice(flags), rnd.choice(["", "*", "?"]))
            for _ in range(rnd.randint(2, 4))
        ]
        pat = "".join(f + m for f, m in toks)
        lex = CompoundLexicon(
            standalone=frozenset(), begin=frozenset(), middle=frozenset(),
            end=frozenset(), cmin=1,
            rule_tokens=parse_compound_rules([pat]),
            rule_words=tuple(
                sorted((w, tuple(sorted(fl))) for w, fl in words.items())
            ),
        )
        rx = re.compile("".join(
            (f"{f}{m}" if m else f) for f, m in toks) + "$")

        def oracle(word: str) -> bool:
            n = len(word)

            def splits(pos):
                if pos == n:
                    yield []
                    return
                for j in range(pos + 1, n + 1):
                    part = word[pos:j]
                    if part in words:
                        for rest in splits(j):
                            yield [part] + rest

            for parts in splits(0):
                if len(parts) < 2:
                    continue
                for choice in itertools.product(
                    *[sorted(words[p]) for p in parts]
                ):
                    if rx.match("".join(choice)):
                        return True
            return False

        # probe words: concatenations of dict words + random junk
        probes = set()
        ws = list(words)
        for _ in range(12):
            probes.add("".join(
                rnd.choice(ws) for _ in range(rnd.randint(1, 3))))
            probes.add("".join(
                rnd.choice("xy") for _ in range(rnd.randint(1, 6))))
        for w in probes:
            got = lex._accepts_rule_compound(w)
            want = oracle(w)
            assert got == want, (trial, pat, dict(words), w, got, want)
