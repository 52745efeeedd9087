"""WARC web-archive reader: the canonical input format of a web-scale
extraction pipeline (ISO 28500 — the public format Common-Crawl-style
corpora ship as).

Pure-stdlib parser over a ``binaryFile`` scan: WARC files are not
splittable (per-record gzip members), so the parallel unit is the file
— exactly how crawl dumps are laid out (thousands of ~1 GB segment
files). Each ``response``/``resource`` record yields
(url, warc_date, content_type, html); chain into
``operators.html_extract.html_to_spans`` for the full
WARC → DOM strip → span table → correction pipeline.

A fixture writer emits spec-conformant records (both plain and
gzip-member files) so the reader is exercised against the real layout.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = "doc_id string, url string, warc_date string, content_type string, html string"


def _split_gzip_members(data: bytes):
    """Iterate the decompressed payloads of a multi-member gzip stream
    (WARC.gz stores one member per record)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        yield d.decompress(data[pos:])
        consumed = len(data[pos:]) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def parse_warc(data: bytes) -> list[dict]:
    """bytes of one WARC file (plain or .gz) → page dicts."""
    if data[:2] == b"\x1f\x8b":
        chunks = b"".join(_split_gzip_members(data))
    else:
        chunks = data
    pages = []
    pos = 0
    n = len(chunks)
    while pos < n:
        head_end = chunks.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        header = chunks[pos:head_end].decode("utf-8", "replace")
        if not header.startswith("WARC/"):
            pos = head_end + 4
            continue
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", 0))
        body = chunks[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # records are separated by two CRLFs
        while chunks[pos : pos + 2] == b"\r\n":
            pos += 2
        rtype = fields.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue
        url = fields.get("warc-target-uri", "")
        date = fields.get("warc-date", "")
        ctype = fields.get("content-type", "")
        payload = body
        if payload.startswith(b"HTTP/"):
            # response record: strip the HTTP header block
            hdr_end = payload.find(b"\r\n\r\n")
            if hdr_end >= 0:
                http_header = payload[:hdr_end].decode("utf-8", "replace")
                for line in http_header.split("\r\n")[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()
                payload = payload[hdr_end + 4 :]
        if "html" not in ctype and not payload.lstrip()[:1] == b"<":
            continue
        pages.append(
            {
                "url": url,
                "warc_date": date,
                "content_type": ctype,
                "html": payload.decode("utf-8", "replace"),
            }
        )
    return pages


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s)/glob → (doc_id, url, warc_date, content_type, html).
    doc_id = url (crawls key on target URI); one task per file."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for page in parse_warc(bytes(content)):
                    page["doc_id"] = page["url"]
                    rows.append(page)
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "warc_date", "content_type", "html"]
            )

    return files.select("content").mapInPandas(run, schema=PAGE_SCHEMA)


def write_warc_fixture(path: str, pages: list[tuple[str, str]], gz: bool = False) -> None:
    """Spec-conformant WARC writer for fixtures: one response record per
    (url, html) with an HTTP header block; ``gz=True`` writes one gzip
    member per record (the crawl-dump layout)."""
    out = io.BytesIO()
    for url, html in pages:
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + html.encode("utf-8")
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n"
        ).encode("utf-8")
        record = header + b"\r\n" + body + b"\r\n\r\n"
        out.write(gzip.compress(record) if gz else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
