"""Interleaved span-table synthesis and I/O.

The engine's primary input is the BASELINE.json `input_hint` table::

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

We synthesize it deterministically from the driver's read-only
``documents`` parquet (TESTDATA.md) — one spans row per document, lines of
N words interleaved with artificial ``space``/``newline`` spans (the
reference injects the same index=-1 whitespace TextEquivs,
/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:225-232) and
occasional ``media`` spans anchoring images between lines. A noisy
variant degrades word spans with the reversible historic-glyph channel
(corelib.noise), preserving doc_id/media_ref/offset — the skeleton the
span-sequence-equality check rides on.

Determinism is per-document (keyed on doc_id content hashes), so output
is identical under any partitioning or parallelism level.

At production scale this table is an Iceberg table; locally we read/write
parquet with the identical layout (Iceberg jars are not in the image —
see ``iceberg_or_parquet``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corelib.noise import degrade_reversible, _key_int
from ..schema import SPANS_SCHEMA

WORDS_PER_LINE = 7
MEDIA_EVERY = 4  # a media span after every 4th line


def build_spans(
    doc_id: str, text: str, level: str = "word"
) -> list[tuple[str, str, str | None, int]]:
    """Pure: document text → ordered interleaved span list
    (kind, text, media_ref, offset). ``level`` picks the hierarchy grain
    (the reference corrects at line/word/glyph level, transcode.py
    `textequiv_level`): 'word' emits word spans; 'glyph' emits one span
    per character of each word."""
    words = text.split()
    spans: list[tuple[str, str, str | None, int]] = []
    off = 0

    def emit(kind: str, txt: str, ref: str | None = None):
        nonlocal off
        spans.append((kind, txt, ref, off))
        off += 1

    line_no = 0
    for i in range(0, len(words), WORDS_PER_LINE):
        line_words = words[i : i + WORDS_PER_LINE]
        for wi, w in enumerate(line_words):
            # sprinkle non-ASCII GT so NFC/grapheme paths are exercised
            if _key_int(f"{doc_id}:w{i + wi}") % 7 == 0:
                w = w.replace("a", "ä")
            if level == "glyph":
                for g in w:
                    emit("glyph", g, f"xy://{doc_id}/{off}")
            else:
                emit("word", w, f"xy://{doc_id}/{off}")
            if wi + 1 < len(line_words):
                emit("space", " ")
        emit("newline", "\n")
        line_no += 1
        if line_no % MEDIA_EVERY == 0:
            emit("media", "", f"img://{doc_id}/{line_no}")
    return spans


def _md5mod(key_expr: str, m: int) -> str:
    """SQL for ``corelib.noise._key_int(key) % m``: the first 8 md5
    bytes as an unsigned 64-bit integer, taken mod m. ``conv`` yields
    the unsigned decimal STRING (a plain bigint cast would overflow the
    sign bit); decimal(20,0) holds 2^64 exactly, and decimal %
    is exact integer modulo."""
    return (
        f"(cast(conv(substring(md5({key_expr}), 1, 16), 16, 10)"
        f" as decimal(20,0)) % {m})"
    )


def _synth_spans_jvm(docs: DataFrame, noisy: bool) -> DataFrame:
    """Pure-JVM build_spans + degrade_reversible for level='word' —
    byte-identical to the Python generator (exact-compared at sf0.01
    and sf0.1, GT + noisy + tiled; pinned by a fingerprint gate and
    test_optimization_equivalence). The Python path built every span
    dict in a mapInPandas loop and Arrow-shipped the full nested table
    out of Python per pass; here the whole synthesis is one projection.

    Offset arithmetic is closed-form because only the LAST line can be
    short: a full line is 7 words + 6 spaces + newline = 14 spans, and
    a media span follows every 4th line, so line l starts at offset
    14·l + l div 4. The historic-glyph degradation chain and its
    hash gates replay ``_key_int`` via md5/conv (see _md5mod)."""
    sprinkle = _md5mod("concat(doc_id, ':w', cast(g as string))", 7)
    ws = (
        f"transform(filter(split(text, '\\\\s+'), x -> x != ''),"
        f" (w, g) -> IF({sprinkle} = 0, replace(w, 'a', 'ä'), w))"
    )
    # degrade_reversible: gate md5(doc:offset) % 3 == 0 keeps the span
    # clean; otherwise the ordered replace chain (w→vv first) — built
    # below over the actual word expression
    # per line l (0-based): k = least(7, _n - 7*l) words, start offset
    # s = 14*l + (l div 4); word wi at s+2*wi, inter-word space at
    # s+2*wi+1, newline at s+2*k-1, media (after every 4th line) at
    # s+2*k
    spans = """
      flatten(transform(_lines, l -> concat(
        flatten(transform(sequence(0, least(7, _n - 7 * l) - 1, 1), wi ->
          concat(
            array(named_struct(
              'kind', 'word',
              'text', {WORDTEXT},
              'media_ref', concat('xy://', doc_id, '/',
                                  cast(14 * l + (l div 4) + 2 * wi as string)),
              'offset', cast(14 * l + (l div 4) + 2 * wi as int))),
            IF(wi < least(7, _n - 7 * l) - 1,
               array(named_struct(
                 'kind', 'space', 'text', ' ',
                 'media_ref', cast(null as string),
                 'offset', cast(14 * l + (l div 4) + 2 * wi + 1 as int))),
               array())
          ))),
        array(named_struct(
          'kind', 'newline', 'text', '\\n',
          'media_ref', cast(null as string),
          'offset', cast(14 * l + (l div 4) + 2 * least(7, _n - 7 * l) - 1
                         as int))),
        IF((l + 1) % 4 = 0,
           array(named_struct(
             'kind', 'media', 'text', '',
             'media_ref', concat('img://', doc_id, '/',
                                 cast(l + 1 as string)),
             'offset', cast(14 * l + (l div 4) + 2 * least(7, _n - 7 * l)
                            as int))),
           array())
      )))
    """
    w_expr = "element_at(_ws, cast(l * 7 + wi + 1 as int))"
    o_expr = "14 * l + (l div 4) + 2 * wi"
    if noisy:
        chain_w = "element_at(_ws, cast(l * 7 + wi + 1 as int))"
        for gt, ocr in (("w", "vv"), ("ä", "aͤ"), ("ö", "oͤ"),
                        ("ü", "uͤ"), ("s", "ſ"), ("r", "ꝛ")):
            chain_w = f"replace({chain_w}, '{gt}', '{ocr}')"
        gate_o = _md5mod(f"concat(doc_id, ':', cast({o_expr} as string))", 3)
        word_text_sql = f"IF({gate_o} = 0, {w_expr}, {chain_w})"
    else:
        word_text_sql = w_expr
    spans = spans.replace("{WORDTEXT}", word_text_sql)
    return (
        docs.withColumn("_ws", F.expr(ws))
        .withColumn("_n", F.expr("size(_ws)"))
        .withColumn(
            "_lines",
            F.expr("IF(_n = 0, array(), sequence(0, (_n + 6) div 7 - 1, 1))"),
        )
        .select(F.col("doc_id").cast("string").alias("doc_id"), F.expr(spans).alias("spans"))
    )


def synth_spans(
    spark: SparkSession, sf_dir: str, noisy: bool = False, level: str = "word",
    times: int = 1,
) -> DataFrame:
    """documents.parquet → spans table (GT or reversibly-degraded).

    ``times`` > 1 tiles the corpus with re-keyed copies (doc_id#k) via
    a narrow explode — no join, no extra scan — for scale/throughput
    measurements where fixed per-stage costs must amortize (the
    '10×-corpus' runs in BENCH/BASELINE.md)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if times > 1:
        docs = docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(times - 1))).alias("_copy"),
        ).select(
            F.concat_ws("#", "doc_id", "_copy").alias("doc_id"), "text"
        )
    # the fixture is a single parquet file → one input split; spread the
    # generator across the cluster (a real 10^12-doc Iceberg table arrives
    # already split, so this shuffle exists only in the synthetic path)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    if level == "word":
        # pure-JVM synthesis (exact-equivalent; see _synth_spans_jvm) —
        # the glyph/line grains keep the Python generator (per-char
        # emission; cold paths, materialized once per sf)
        return _synth_spans_jvm(docs, noisy)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"].astype(str), pdf["text"]):
                spans = build_spans(doc_id, text, level=level)
                if noisy:
                    spans = [
                        (
                            k,
                            degrade_reversible(t, f"{doc_id}:{o}")
                            if k in ("word", "glyph")
                            else t,
                            r,
                            o,
                        )
                        for (k, t, r, o) in spans
                    ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": r, "offset": o}
                            for (k, t, r, o) in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return docs.mapInPandas(gen, schema=SPANS_SCHEMA)


def synth_confmat(
    spark: SparkSession,
    sf_dir: str,
    p_primary: float = 0.4,
    p_alt: float = 0.6,
) -> DataFrame:
    """Confusion-network channel for the glyph-level noisy span table:
    per line a confmat (list of chunks, each a list of (alt, p)) in the
    reference's _line_sequences2confmat_sequences shape
    (wrapper/transcode.py:236-277). Degraded glyphs carry the OCR form
    as the primary alternative plus the engine's second guess — the
    multi-TextEquiv glyph annotations the reference's flagship consumes.
    Deterministic per (doc_id, offset): same keys as synth_spans'
    degradation, so chunks align 1:1 with the noisy glyph spans."""
    from ..schema import CONFMAT_SCHEMA

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"].astype(str), pdf["text"]):
                spans = build_spans(doc_id, text, level="glyph")
                line_no = 0
                chunks: list[list[dict]] = []
                for k, t, _r, o in spans:
                    if k == "media":
                        continue  # media spans carry no text position
                    if k == "glyph":
                        noisy = degrade_reversible(t, f"{doc_id}:{o}")
                        if noisy != t:
                            chunk = [
                                {"alt": noisy, "p": p_primary},
                                {"alt": t, "p": p_alt},
                            ]
                        else:
                            chunk = [{"alt": t, "p": 1.0}]
                    else:  # space / newline
                        chunk = [{"alt": t, "p": 1.0}]
                    chunks.append(chunk)
                    if k == "newline":
                        rows.append({"doc_id": doc_id, "line_no": line_no, "confmat": chunks})
                        chunks = []
                        line_no += 1
                if chunks:
                    rows.append({"doc_id": doc_id, "line_no": line_no, "confmat": chunks})
            yield pd.DataFrame(rows, columns=["doc_id", "line_no", "confmat"])

    return docs.mapInPandas(gen, schema=CONFMAT_SCHEMA)


def iceberg_or_parquet_write(df: DataFrame, path_or_table: str, mode: str = "overwrite") -> str:
    """Write to Iceberg when the catalog is on the classpath, else parquet
    with the identical layout. Returns the format used."""
    try:
        df.writeTo(path_or_table).createOrReplace()
        return "iceberg"
    except Exception:
        df.write.mode(mode).parquet(path_or_table)
        return "parquet"


def read_spans(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SPANS_SCHEMA).parquet(path)
