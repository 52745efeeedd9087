"""Deterministic OCR-noise model + rule-based correctors.

Two noise channels, both keyed by a stable string (doc_id:offset) so any
partitioning of the data reproduces byte-identical text:

* reversible  — historic-glyph substitutions (modern → Fraktur-style)
  whose exact inverse is ``correct_charmap``. Used to build the
  span-sequence-equality gold fixtures: pipeline(correct(noisy)) == GT.
* lossy       — seeded confusions drawn from the historic-latin
  equivalence classes plus random substitutions, for CER/WER evaluation
  fixtures (gold = metric values, not exact text).

The correction direction mirrors the reference's charmap parameter
(/root/reference/ocrd_cor_asv_ann/lib/seq2seq.py:929-930 applies a
str.translate charmap before decoding) and NFC ingest normalization
(seq2seq.py:978-979).
"""

from __future__ import annotations

import hashlib
import unicodedata

# GT (modern) → OCR (historic). Multi-char expansions change string
# length on purpose: the pipeline must realign span boundaries.
REVERSIBLE_NOISE: tuple[tuple[str, str], ...] = (
    ("w", "vv"),
    ("ä", "aͤ"),
    ("ö", "oͤ"),
    ("ü", "uͤ"),
    ("s", "ſ"),
    ("r", "ꝛ"),
)

# inverse, applied longest-first so 'vv'→'w' wins over any single-char rule
REVERSIBLE_FIX: tuple[tuple[str, str], ...] = tuple(
    sorted(((ocr, gt) for gt, ocr in REVERSIBLE_NOISE), key=lambda p: -len(p[0]))
)

LOSSY_CONFUSIONS: tuple[tuple[str, str], ...] = (
    ("e", "c"),
    ("n", "u"),
    ("i", "j"),
    ("t", "l"),
    ("o", "0"),
    ("a", "á"),
)

GAP_CHAR = "\a"  # reserved gap/rejection symbol (seq2seq.py:11 semantics)


def _key_int(key: str) -> int:
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")


def degrade_reversible(text: str, key: str) -> str:
    """Apply historic substitutions to ~2/3 of spans (hash-gated), all
    occurrences within a chosen span. Exactly inverted by
    ``correct_charmap`` provided the GT never contains the OCR forms."""
    if _key_int(key) % 3 == 0:
        return text
    for gt, ocr in REVERSIBLE_NOISE:
        if gt in text:
            text = text.replace(gt, ocr)
    return text


def degrade_lossy(text: str, key: str, rate: float = 0.1) -> str:
    """Seeded character confusions at roughly ``rate`` per character."""
    out = []
    for pos, ch in enumerate(text):
        h = _key_int(f"{key}:{pos}")
        if (h % 1000) < rate * 1000:
            for a, b in LOSSY_CONFUSIONS:
                if ch == a:
                    ch = b
                    break
            else:
                if (h >> 10) % 3 == 0 and ch not in (" ", "\n"):
                    ch = ""  # deletion
        out.append(ch)
    return "".join(out)


def correct_charmap(text: str) -> str:
    """The rule-based corrector: invert REVERSIBLE_NOISE, strip the
    reserved gap char, NFC-normalize."""
    for ocr, gt in REVERSIBLE_FIX:
        if ocr in text:
            text = text.replace(ocr, gt)
    text = text.replace(GAP_CHAR, "")
    return unicodedata.normalize("NFC", text)


def span_confidence(key: str) -> float:
    """Deterministic pseudo-confidence in (0.5, 1.0)."""
    return 0.5 + (_key_int(key) % 5000) / 10000.0
