"""HTML main-content extraction (north rule: "HTML boilerplate strip
... DOM heuristics") → the engine's interleaved span table.

A stdlib-``html.parser`` DOM walk per document inside Arrow batches:

* wholesale-dropped subtrees: script/style/template/nav/header/footer/
  aside (the DOM heuristic — structural boilerplate never reaches the
  classifier);
* remaining block elements (p/div/li/h1-h6/…) become text blocks with
  per-block link-character density; blocks that are too short or
  link-dominated are dropped (the jusText-style density rule, shared
  thresholds with operators/extract.classify_lines);
* ``<img src>`` inside kept content becomes a ``media`` span at its
  reading position — the output IS the BASELINE.json input_hint table
  (kind/text/media_ref/offset), so extracted pages feed straight into
  correct_pipeline.

No external parser libraries: html.parser is event-driven C-backed
stdlib, and the per-doc walk is Arrow-batched (one mapInPandas, no
shuffle — the span table groups later at line grain inside the
correction pipeline itself).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import SPANS_SCHEMA

DROP_TAGS = {"head", "title", "script", "style", "template", "nav", "header", "footer", "aside"}
BLOCK_TAGS = {
    "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "article", "section", "blockquote", "pre", "main", "body",
}


class _Walker(HTMLParser):
    """Collect (text, n_link_chars, media_refs) per block element."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur: dict | None = None
        self._drop_depth = 0
        self._link_depth = 0

    def _flush(self):
        if self._cur and (self._cur["parts"] or self._cur["media"]):
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure(self):
        if self._cur is None:
            self._cur = {"parts": [], "link_chars": 0, "media": []}

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1
        elif tag == "img":
            self._ensure()
            src = dict(attrs).get("src")
            if src:
                # remember the media position relative to the text so far
                pos = len(" ".join(self._cur["parts"]))
                self._cur["media"].append((pos, src))
        elif tag == "br":
            self._ensure()
            self._cur["parts"].append(" ")

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(self._drop_depth - 1, 0)
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(self._link_depth - 1, 0)

    def handle_data(self, data):
        if self._drop_depth:
            return
        text = data.strip()
        if not text:
            return
        self._ensure()
        self._cur["parts"].append(text)
        if self._link_depth:
            self._cur["link_chars"] += len(text)

    def close(self):
        super().close()
        self._flush()


def parse_blocks(html: str) -> list[dict]:
    """HTML → [{text, link_density, media: [(pos, src)]}]."""
    w = _Walker()
    w.feed(html)
    w.close()
    out = []
    for b in w.blocks:
        text = " ".join(b["parts"]).strip()
        n = max(len(text), 1)
        out.append(
            {"text": text, "link_density": b["link_chars"] / n, "media": b["media"]}
        )
    return out


def content_blocks(
    blocks: list[dict], min_chars: int = 25, max_link_density: float = 0.3
) -> list[dict]:
    """Density rule on the surviving DOM blocks."""
    return [
        b
        for b in blocks
        if (len(b["text"]) >= min_chars and b["link_density"] <= max_link_density)
        or b["media"]
    ]


def _blocks_to_spans(blocks: list[dict]) -> list[dict]:
    """Kept blocks → interleaved span list (block = line)."""
    spans: list[dict] = []
    off = 0

    def emit(kind, text, ref=None):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += 1

    for b in blocks:
        words = b["text"].split()
        media = sorted(b["media"])
        mi = 0
        pos = 0
        for wi, w in enumerate(words):
            while mi < len(media) and media[mi][0] <= pos:
                emit("media", "", media[mi][1])
                mi += 1
            emit("word", w)
            pos += len(w) + 1
            if wi + 1 < len(words):
                emit("space", " ")
        while mi < len(media):
            emit("media", "", media[mi][1])
            mi += 1
        if words or media:
            emit("newline", "\n")
    return spans


def html_to_spans(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 0.3,
) -> DataFrame:
    """(doc_id, html) → the input_hint span table: DOM boilerplate strip
    + density classification + interleaved span emission. One Arrow pass,
    zero shuffles."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf[id_col].astype(str), pdf[html_col]):
                kept = content_blocks(
                    parse_blocks(html or ""),
                    min_chars=min_chars,
                    max_link_density=max_link_density,
                )
                spans = _blocks_to_spans(kept)
                if spans:
                    rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return df.select(id_col, html_col).mapInPandas(run, schema=SPANS_SCHEMA)


def synth_html(spark, sf_dir: str, words_per_para: int = 20) -> DataFrame:
    """Deterministic HTML pages from the documents fixture: nav/footer
    link boilerplate + the document text as <p> paragraphs + one <img>
    per page, so exact recovery is checkable (content == document text,
    boilerplate dropped, img → media span)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # repartition BEFORE synthesis so the exchange carries only the raw
    # text (not the fatter HTML) and the downstream Python parse stage
    # gets full parallelism; the synthesis itself is pure JVM string
    # assembly (was a mapInPandas round-trip of every page)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    body = (
        f"array_join(transform("
        f"  sequence(0, cast(ceil(greatest(size(_ws), 1) / {words_per_para}.0) as int) - 1),"
        f"  i -> concat('<p>', array_join(slice(_ws, i * {words_per_para} + 1,"
        f"                                      {words_per_para}), ' '), '</p>')), "
        f"  '\\n')"
    )
    html = F.concat(
        F.lit(
            "<html><head><title>x</title><style>p{}</style></head><body>"
            "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
            "<header><h1>site</h1></header><main>"
        ),
        F.expr(body),
        F.lit("<p>figure: <img src='img://"),
        F.col("doc_id").cast("string"),
        F.lit(
            "/0'> caption text that is long enough to keep around here</p></main>"
            "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>"
            "</body></html>"
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        # word array hoisted out of the HOF lambda (no loop-invariant
        # code motion inside transform)
        F.expr("filter(split(text, '\\\\s+'), x -> x != '')").alias("_ws"),
    ).select("doc_id", html.alias("html"))
