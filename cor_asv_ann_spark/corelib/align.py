"""Character alignment and edit metrics.

Re-expresses the semantics of the reference's alignment library
(/root/reference/ocrd_cor_asv_ann/lib/alignment.py) from scratch:

* ``best_alignment``        — Ratcliff/Obershelp (difflib) pairing of two
  character sequences with a gap element, distributing length mismatch of
  ``replace`` opcodes into trailing gaps (alignment.py:165-200 semantics).
* grapheme-cluster recombination — combining marks reattach to the
  preceding base letter on either side (alignment.py:206-242 semantics).
* ``levenshtein``           — exact minimal edit distance (numpy DP; the
  reference uses rapidfuzz, alignment.py:281-290, with max-length
  denominator — "Levenshtein-fast").
* ``adjusted_distance``     — normalize (NFC/NFKC/historic_latin), align,
  recombine graphemes, count non-equivalent pairs; denominator is the
  alignment-path length (alignment.py:292-356 semantics).
* ``confusion_counts``      — (source, target) edit-pair counting with
  merge-forward across gaps (alignment.py:244-258 semantics).

The Spark-side hot path uses the builtin ``levenshtein()`` SQL function
for the fast metric and wraps ``adjusted_distance`` in a pandas UDF for
the exact one (SURVEY.md §2.8 F1/F2).
"""

from __future__ import annotations

import unicodedata
from difflib import SequenceMatcher

GAP = 0  # gap element in alignment tuples (never a valid character)

# --- historic-latin equivalence data -------------------------------------
# Derived from the public conventions the reference encodes (OCR-D GT
# transcription levels for historic Latin script): level-1 treats visually/
# semantically close glyph pairs as equal; level-2 expands ligatures and
# long-s style variants to modern composed forms. We keep a compact set
# covering the engine's synthetic corpus + the most common Fraktur cases.

# Level-1: sets of mutually-equivalent single characters.
L1_EQUIV_SETS: tuple[frozenset[str], ...] = (
    frozenset({"s", "ſ"}),
    frozenset({"r", "ꝛ"}),
    frozenset({"z", "ʒ"}),
    frozenset({"-", "­", "—", "–", "‐", "⸗"}),
    frozenset({"'", "’", "‘", "´", "`"}),
    frozenset({'"', "“", "”", "„"}),
    frozenset({"I", "J"}),
    frozenset({"u", "v"}),
    frozenset({"0", "O"}),
    frozenset({"1", "l"}),
)

# Level-2: string replacements mapping historic multi-codepoint or ligature
# forms to modern composed forms (applied to BOTH sides before aligning).
L2_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("aͤ", "ä"),  # a + combining e above
    ("oͤ", "ö"),
    ("uͤ", "ü"),
    ("Aͤ", "Ä"),
    ("Oͤ", "Ö"),
    ("Uͤ", "Ü"),
    ("ﬀ", "ff"),
    ("ﬁ", "fi"),
    ("ﬂ", "fl"),
    ("ﬃ", "ffi"),
    ("ﬄ", "ffl"),
    ("ﬅ", "ft"),
    ("ﬆ", "st"),
    ("ꜩ", "tz"),
    ("ꝛ", "r"),
    ("ſ", "s"),
    ("ʒ", "z"),
)

_L1_LOOKUP: dict[str, frozenset[str]] = {}
for _s in L1_EQUIV_SETS:
    for _c in _s:
        _L1_LOOKUP[_c] = _s


def chars_equivalent(a: str, b: str, level: int = 1) -> bool:
    """True if the two aligned symbols count as equal at this GT level."""
    if a == b:
        return True
    if level == 1:
        s = _L1_LOOKUP.get(a)
        return s is not None and b in s
    return False


def normalize_text(text: str, method: str | None = None, gt_level: int = 1) -> str:
    """Apply the normalization the reference supports: None, NFC, NFKC,
    or 'historic_latin' (L2 replacements when gt_level < 3)."""
    if method in ("NFC", "NFKC"):
        return unicodedata.normalize(method, text)
    if method == "historic_latin" and gt_level < 3:
        for old, new in L2_REPLACEMENTS:
            if old in text:
                text = text.replace(old, new)
        return text
    return text


# --- alignment -------------------------------------------------------------


def best_alignment(source: str, target: str) -> list[tuple]:
    """Pair up codepoints of two strings via difflib opcodes.

    'replace' opcodes pair the overlapping prefix positionally and emit
    trailing gaps for the length mismatch; 'insert'/'delete' emit pure
    gap pairs. Then combining marks are folded onto the previous base
    letter on each side (grapheme recombination), keeping both sides the
    same length.
    """
    sm = SequenceMatcher(isjunk=None, autojunk=False)
    sm.set_seqs(source, target)
    pairs: list[tuple] = []
    for op, sb, se, tb, te in sm.get_opcodes():
        if op == "equal":
            pairs.extend(zip(source[sb:se], target[tb:te]))
        elif op == "replace":
            n_src, n_tgt = se - sb, te - tb
            n = min(n_src, n_tgt)
            pairs.extend(zip(source[sb : sb + n], target[tb : tb + n]))
            for k in range(n, n_src):
                pairs.append((source[sb + k], GAP))
            for k in range(n, n_tgt):
                pairs.append((GAP, target[tb + k]))
        elif op == "insert":
            pairs.extend((GAP, c) for c in target[tb:te])
        elif op == "delete":
            pairs.extend((c, GAP) for c in source[sb:se])
    if isinstance(source, list) or isinstance(target, list):
        return pairs  # token sequences: no grapheme recombination
    return _recombine_graphemes(pairs)


def _is_letterish(sym) -> bool:
    return sym != GAP and isinstance(sym, str) and sym and unicodedata.category(sym[0])[0] == "L"


def _recombine_graphemes(pairs: list[tuple]) -> list[tuple]:
    """Attach combining codepoints to the preceding letter on each side."""
    out: list[list] = []
    changed = False
    for s, t in pairs:
        s_comb = s != GAP and isinstance(s, str) and s and unicodedata.combining(s)
        t_comb = t != GAP and isinstance(t, str) and t and unicodedata.combining(t)
        if s_comb and out and _is_letterish(out[-1][0]):
            out[-1][0] += s
            changed = True
            if t == GAP:
                continue
            if t_comb and _is_letterish(out[-1][1]):
                out[-1][1] += t
                continue
            s = GAP  # source consumed; target char still needs a slot
        elif t_comb and out and _is_letterish(out[-1][1]):
            out[-1][1] += t
            changed = True
            if s == GAP:
                continue
            t = GAP
        out.append([s, t])
    return [tuple(p) for p in out] if changed else pairs


# --- metrics ---------------------------------------------------------------


def levenshtein(source: str, target: str) -> tuple[int, int]:
    """Exact minimal edit distance; denominator = max length
    ("Levenshtein-fast" semantics, matching Spark's levenshtein())."""
    if source == target:
        return 0, max(len(source), len(target))
    if not source or not target:
        return max(len(source), len(target)), max(len(source), len(target))
    prev = list(range(len(target) + 1))
    for i, sc in enumerate(source, 1):
        cur = [i] + [0] * len(target)
        for j, tc in enumerate(target, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (sc != tc))
        prev = cur
    return prev[-1], max(len(source), len(target))


def adjusted_distance(
    source: str,
    target: str,
    normalization: str | None = None,
    gt_level: int = 1,
    return_alignment: bool = False,
):
    """Normalize → align → count non-equivalent pairs.

    Distance denominator is the alignment path length (not max string
    length), and level-1 historic_latin treats confusable pairs as equal.
    Returns (dist, length[, alignment]).
    """
    src = normalize_text(source, normalization, gt_level)
    tgt = normalize_text(target, normalization, gt_level)
    if src == tgt and not return_alignment:
        # equal after normalization: the alignment is the identity
        # (one 'equal' opcode), dist is 0, and the path length is the
        # pair count after grapheme recombination — computed directly
        # in O(n) instead of running the quadratic-ish SequenceMatcher.
        # On real corpora most lines are unchanged, so this is the
        # dominant branch of the exact metric.
        if src.isascii():
            return 0.0, len(src)
        n = 0
        prev_first = ""
        for c in src:
            # mirror _recombine_graphemes on equal sides: a combining
            # mark merges (on both sides at once) iff the previous
            # emitted pair's first codepoint is a letter
            if (
                unicodedata.combining(c)
                and n
                and prev_first
                and unicodedata.category(prev_first)[0] == "L"
            ):
                continue
            n += 1
            prev_first = c
        return 0.0, n
    pairs = best_alignment(src, tgt)
    use_l1 = normalization == "historic_latin" and gt_level == 1
    dist = 0
    for s, t in pairs:
        if s == t:
            continue
        if use_l1 and isinstance(s, str) and isinstance(t, str) and chars_equivalent(s, t, 1):
            continue
        dist += 1
    if return_alignment:
        return float(dist), len(pairs), pairs
    return float(dist), len(pairs)


def confusion_counts(pairs: list[tuple]) -> dict[tuple[str, str], int]:
    """Count non-identity edit pairs, merging gap positions forward into
    multi-character entries (so confusions never contain the gap)."""
    counts: dict[tuple[str, str], int] = {}
    for pos, pair in enumerate(pairs):
        if GAP in pair:
            continue
        s, t = pair
        p = pos
        while p and GAP in pairs[p - 1]:
            p -= 1
            ps, pt = pairs[p]
            s = (ps if ps != GAP else "") + s
            t = (pt if pt != GAP else "") + t
        if s == t:
            continue
        counts[(s, t)] = counts.get((s, t), 0) + 1
    return counts


def is_bad_pair(source: str, target: str) -> bool:
    """Training-pair filter: drop pairs too dissimilar to be real GT
    (quick_ratio < 0.5 on lines longer than 5 chars)."""
    if len(source) <= 5:
        return False
    sm = SequenceMatcher(isjunk=None, autojunk=False)
    sm.set_seqs(source, target)
    return sm.quick_ratio() < 0.5
