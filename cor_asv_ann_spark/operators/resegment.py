"""Post-correction word resegmentation (SURVEY.md §2.5 W5) and
confidence roll-up (§2.4 A8).

The reference merges Words whose separating whitespace was deleted by
the correction and splits Words where the correction introduced an
inner space, splitting the geometry proportionally
(/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:488-628). Here
the same rewrite runs per corrected line row inside an Arrow batch
(cardinality changes stay inside the line's span arrays; offsets are
renumbered per document at reassembly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corelib.geometry import format_box, merge_boxes, parse_box, split_box
from ..schema import CORRECTED_LINE_SCHEMA


def resegment_line(
    kinds: list[str],
    texts: list[str],
    refs: list[str | None],
    confs: list[float],
    in_texts: list[str] | None = None,
) -> tuple[list[str], list[str], list[str | None], list[float], list[str]]:
    """Pure per-line rewrite: merge around emptied whitespace, split at
    introduced inner whitespace. The original input texts are rewritten
    in lock-step so every output array stays position-aligned (merged
    spans carry the concatenated inputs; spans introduced by a split
    carry ''), preserving the CORRECTED_LINE_SCHEMA parallel-array
    invariant for downstream consumers that zip texts with out_texts."""
    if in_texts is None:
        in_texts = texts
    out_k: list[str] = []
    out_t: list[str] = []
    out_r: list[str | None] = []
    out_c: list[float] = []
    out_in: list[str] = []

    def emit(k, t, r, c, src):
        out_k.append(k)
        out_t.append(t)
        out_r.append(r)
        out_c.append(c)
        out_in.append(src)

    i = 0
    n = len(kinds)
    while i < n:
        k, t, r, c = kinds[i], texts[i], refs[i], confs[i]
        if k == "space" and t == "" and out_k and out_k[-1] == "word" and i + 1 < n and kinds[i + 1] == "word":
            # deleted space → merge previous word with next word
            out_t[-1] = out_t[-1] + texts[i + 1]
            out_c[-1] = (out_c[-1] + confs[i + 1]) / 2.0
            # the merged span's INPUT is the concatenation of all three
            # originals (word + swallowed space + word)
            out_in[-1] = out_in[-1] + in_texts[i] + in_texts[i + 1]
            # geometry of the merge: bounding-box union of both words
            # (reference _merge_words, transcode.py:550-554); opaque
            # anchors keep the left side
            ba, bb = parse_box(out_r[-1]), parse_box(refs[i + 1])
            if ba and bb:
                out_r[-1] = format_box(merge_boxes(ba, bb))
            i += 2
            continue
        if k == "word" and " " in t.strip() and t.strip():
            # introduced inner space → split into word/space/word...
            parts = t.split(" ")
            total = max(len(t), 1)
            box = parse_box(r)
            pos = 0
            first = True
            for j, p in enumerate(parts):
                if p:
                    # proportional geometry split by character share
                    # (reference _split_word_at_space,
                    # transcode.py:600-628: prev w = w·fract,
                    # next x = x + w·fract)
                    if box:
                        ref = format_box(
                            split_box(box, pos / total, (pos + len(p)) / total)
                        )
                    elif r:
                        ref = f"{r}#split[{pos}-{pos + len(p)}/{total}]"
                    else:
                        ref = r
                    emit("word", p, ref, c, in_texts[i] if first else "")
                    first = False
                pos += len(p)
                if j + 1 < len(parts):
                    emit("space", " ", None, 1.0, "")
                    pos += 1
            i += 1
            continue
        emit(k, t, r, c, in_texts[i])
        i += 1
    return out_k, out_t, out_r, out_c, out_in


def resegment_lines(corrected: DataFrame) -> DataFrame:
    """Apply resegment_line to each corrected line row (Arrow-batched);
    offsets are re-derived as dense per-line positions — documents get
    globally renumbered at reassembly time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            # column zip, not iterrows: ~10× less per-row overhead in the
            # Arrow batch hot loop (same pattern as correction.py)
            for doc_id, line_no, kinds, texts, refs, offsets, out_texts, out_confs, cer in zip(
                pdf["doc_id"],
                pdf["line_no"],
                pdf["kinds"],
                pdf["texts"],
                pdf["media_refs"],
                pdf["offsets"],
                pdf["out_texts"],
                pdf["out_confs"],
                pdf["line_cer"],
            ):
                k, t, r, c, src = resegment_line(
                    list(kinds),
                    list(out_texts),
                    list(refs),
                    list(out_confs),
                    in_texts=list(texts),
                )
                base = int(offsets[0]) if len(offsets) else 0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "line_no": line_no,
                        "kinds": k,
                        "texts": src,
                        "media_refs": r,
                        "offsets": list(range(base, base + len(k))),
                        "out_texts": t,
                        "out_confs": c,
                        "line_cer": cer,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in CORRECTED_LINE_SCHEMA.fields])

    return corrected.mapInPandas(run, schema=CORRECTED_LINE_SCHEMA)


def confidence_rollup(corrected: DataFrame) -> DataFrame:
    """A8: glyph/word→line→document confidence as the mean of children
    (the reference averages TextEquiv conf up the tree,
    transcode.py:714-742). Pure relational: explode + two-level agg."""
    per_span = corrected.select(
        "doc_id",
        "line_no",
        F.explode(F.arrays_zip(F.col("kinds").alias("kind"), F.col("out_confs").alias("conf"))).alias("s"),
    ).select("doc_id", "line_no", F.col("s.kind").alias("kind"), F.col("s.conf").alias("conf"))
    word_conf = per_span.filter(F.col("kind") == "word")
    line_level = word_conf.groupBy("doc_id", "line_no").agg(F.avg("conf").alias("line_conf"))
    doc_level = line_level.groupBy("doc_id").agg(F.avg("line_conf").alias("doc_conf"))
    return line_level.join(doc_level, "doc_id")
