"""HTML DOM boilerplate strip → interleaved span table (north rule's
'HTML boilerplate strip, DOM heuristics' leg)."""

from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.html_extract import (
    content_blocks,
    html_to_spans,
    parse_blocks,
    synth_html,
)

PAGE = """
<html><head><style>.x{color:red}</style><script>var x=1;</script></head>
<body>
  <nav><a href="/">Home</a> <a href="/about">About</a></nav>
  <header><h1>My Site</h1></header>
  <main>
    <p>This is the first real paragraph of the article with plenty of words.</p>
    <div>Short.</div>
    <p>See <a href="/x">this link</a> inside an otherwise wordy and long paragraph.</p>
    <p><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> link farm</p>
    <p>An illustrated point <img src="img://p/7"> with a caption that runs long enough.</p>
  </main>
  <footer><a href="/terms">Terms</a> and <a href="/priv">Privacy</a></footer>
</body></html>
"""


def test_dom_drop_and_density():
    blocks = parse_blocks(PAGE)
    texts = [b["text"] for b in blocks]
    # script/style/nav/header/footer subtrees never surface
    assert not any("Home" in t or "My Site" in t or "Terms" in t or "var x" in t for t in texts)
    kept = content_blocks(blocks)
    kept_texts = [b["text"] for b in kept]
    assert any("first real paragraph" in t for t in kept_texts)
    assert any("wordy and long paragraph" in t for t in kept_texts)  # inline link ok
    assert not any(t == "Short." for t in kept_texts)  # too short
    assert not any("link farm" in t for t in kept_texts)  # link-dominated
    media = [m for b in kept for m in b["media"]]
    assert media and media[0][1] == "img://p/7"


def test_html_to_spans_structure(spark):
    df = spark.createDataFrame([("d0", PAGE)], "doc_id string, html string")
    out = html_to_spans(df).collect()
    assert len(out) == 1
    spans = out[0].spans
    kinds = [s.kind for s in spans]
    assert "media" in kinds and "word" in kinds and "newline" in kinds
    # offsets dense and ordered
    assert [s.offset for s in spans] == list(range(len(spans)))
    media = [s for s in spans if s.kind == "media"]
    assert media[0].media_ref == "img://p/7" and media[0].text == ""
    # one newline per kept block (first para, inline-link para, img para)
    assert kinds.count("newline") == 3


def test_exact_recovery_on_fixture(spark, sf_small):
    """Extraction recovers the original document text exactly: the
    fixture wraps it in nav/header/footer boilerplate that must vanish,
    and the per-page img must surface as a media span."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    html = synth_html(spark, sf_small).join(docs.select("doc_id"), "doc_id")
    # min_chars=1: exact recovery tests the DOM strip alone (a short
    # tail paragraph is real content here; the density rule has its own
    # unit tests above)
    spans = html_to_spans(html, min_chars=1)
    text_back = spans.select(
        "doc_id",
        F.array_join(
            F.expr(
                "transform(filter(spans, s -> s.kind in ('word', 'space', 'newline')),"
                " s -> s.text)"
            ),
            "",
        ).alias("extracted"),
    )
    j = docs.select("doc_id", "text").join(text_back, "doc_id").collect()
    assert j
    for r in j:
        # kept paragraphs reproduce the document text, followed by the
        # synthetic caption paragraph
        norm = " ".join(r.text.split())
        extracted_flat = " ".join(r.extracted.split())
        assert extracted_flat.startswith(norm)
        assert "caption text" in extracted_flat
    media = spans.select(F.explode("spans").alias("s")).filter(
        F.col("s.kind") == "media"
    )
    assert media.count() == len(j)


def test_extracted_spans_feed_correction_pipeline(spark, sf_small):
    """End-to-end: HTML → spans → correct_pipeline (the full extraction
    story of the north rule in one chain)."""
    from cor_asv_ann_spark.operators.correction import correct_pipeline

    html = synth_html(spark, sf_small)
    spans = html_to_spans(html).limit(5)
    out = correct_pipeline(spans)
    rows = out.collect()
    assert rows and all(len(r.spans) > 0 for r in rows)
