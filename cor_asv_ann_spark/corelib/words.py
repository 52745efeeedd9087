"""Word segmentation for WER (UAX#29-style).

The reference delegates to uniseg.wordbreak and then drops "words" made
only of punctuation/whitespace/symbols (alignment.py:461-486). uniseg is
not available here; the ``regex`` module's Unicode properties give us an
equivalent segmentation for the scripts we handle: maximal runs of
letters/marks/digits (with word-internal apostrophes and hyphens kept,
as UAX#29 WB6/WB7 do for MidLetter).
"""

from __future__ import annotations

try:
    import regex as _re

    _WORD_RE = _re.compile(r"[\p{L}\p{M}\p{N}]+(?:['’\-][\p{L}\p{M}\p{N}]+)*")
except ImportError:  # pragma: no cover - regex is expected in the image
    import re as _re

    _WORD_RE = _re.compile(r"[\w]+(?:['’\-][\w]+)*", _re.UNICODE)


def split_words(text: str) -> list[str]:
    """Segment into content words, dropping punctuation/space tokens."""
    return _WORD_RE.findall(text)
