"""WARC reader: spec-conformant records (plain + per-record gzip
members) → pages → the full extraction chain."""

from pyspark.sql import functions as F

from cor_asv_ann_spark.sources.warc import (
    parse_warc,
    read_warc_pages,
    write_warc_fixture,
)

PAGES = [
    (
        "http://example.com/a",
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<p>the first page has a reasonably long content paragraph in it</p>"
        "</body></html>",
    ),
    (
        "http://example.com/b",
        "<html><body><p>and the second page is also made of plenty of words</p>"
        "<img src='img://b/0'></body></html>",
    ),
]


def test_parse_plain_and_gzip(tmp_path):
    for gz in (False, True):
        p = tmp_path / f"crawl{'_gz' if gz else ''}.warc"
        write_warc_fixture(str(p), PAGES, gz=gz)
        pages = parse_warc(p.read_bytes())
        assert [pg["url"] for pg in pages] == [u for u, _ in PAGES]
        assert all("text/html" in pg["content_type"] for pg in pages)
        assert "first page" in pages[0]["html"]
        assert not pages[0]["html"].startswith("HTTP/")  # HTTP header stripped


def test_read_warc_pages_parallel_files(spark, tmp_path):
    write_warc_fixture(str(tmp_path / "seg0.warc.gz"), PAGES[:1], gz=True)
    write_warc_fixture(str(tmp_path / "seg1.warc.gz"), PAGES[1:], gz=True)
    df = read_warc_pages(spark, str(tmp_path))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {u for u, _ in PAGES}
    assert rows["http://example.com/a"].doc_id == "http://example.com/a"
    assert rows["http://example.com/b"].warc_date.startswith("2026-")


def test_warc_to_span_pipeline(spark, tmp_path):
    """WARC → DOM strip → span table → correction: the whole web-scale
    ingestion chain."""
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.operators.html_extract import html_to_spans

    write_warc_fixture(str(tmp_path / "c.warc"), PAGES)
    pages = read_warc_pages(spark, str(tmp_path / "c.warc"))
    spans = html_to_spans(pages)
    out = correct_pipeline(spans).collect()
    assert len(out) == 2
    kinds = {s.kind for r in out for s in r.spans}
    assert "word" in kinds and "media" in kinds  # page b's img survived
    texts = {r.doc_id: "".join(s.text for s in r.spans) for r in out}
    assert "first page" in texts["http://example.com/a"]
    # nav boilerplate stripped
    assert "Home" not in texts["http://example.com/a"]
