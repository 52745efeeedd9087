"""Span geometry (F8): proportional box split and bounding-box merge.

The reference keeps PAGE-XML ``Coords`` consistent through word
resegmentation: a split divides the word's bounding box horizontally at
the character fraction of the split point
(/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:600-628
``_split_word_at_space``: prev w = w·fract, next x = x + w·fract), and
a merge takes the bounding box of both words' points
(transcode.py:550-554 ``_merge_words`` via xywh_from_points of the
concatenated point lists = min/max union).

Here geometry rides in ``media_ref`` as ``box://x,y,w,h``. Refs in any
other format fall back to opaque ``#split[…]`` anchors (the round-1
behavior) so non-geometric anchors still stitch back losslessly.
"""

from __future__ import annotations

Box = tuple[float, float, float, float]


def parse_box(ref: str | None) -> Box | None:
    if not ref or not ref.startswith("box://"):
        return None
    try:
        x, y, w, h = (float(v) for v in ref[6:].split(","))
        return (x, y, w, h)
    except ValueError:
        return None


def format_box(box: Box) -> str:
    return "box://" + ",".join(f"{v:g}" for v in box)


def split_box(box: Box, start_frac: float, end_frac: float) -> Box:
    """Horizontal slice [start_frac, end_frac) of the box — the
    reference's repeated split-at-space generalized to one slice per
    produced part."""
    x, y, w, h = box
    return (x + w * start_frac, y, w * (end_frac - start_frac), h)


def merge_boxes(a: Box, b: Box) -> Box:
    """Bounding-box union (xywh of the concatenated point lists)."""
    x0 = min(a[0], b[0])
    y0 = min(a[1], b[1])
    x1 = max(a[0] + a[2], b[0] + b[2])
    y1 = max(a[1] + a[3], b[1] + b[3])
    return (x0, y0, x1 - x0, y1 - y0)
