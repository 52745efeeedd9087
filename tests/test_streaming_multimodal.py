"""Streaming windowed metrics + streaming correction, and the
multimodal decode/feature plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    synth_media_table,
    FEATURE_DIM,
)
from cor_asv_ann_spark.sources.spans import synth_spans
from cor_asv_ann_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    streaming_correction,
    windowed_metrics,
)


def test_windowed_metrics_stream_equals_batch(spark, sf_small, tmp_path):
    # the file stream source wants a directory of files
    import shutil

    src_dir = tmp_path / "events"
    src_dir.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", src_dir / "part-0.parquet")
    stream = read_event_stream(spark, str(src_dir))
    agg = windowed_metrics(stream)
    run_stream_to_memory(agg, "win_out")
    got = spark.sql("SELECT * FROM win_out")
    # batch equivalent over the same file
    batch = spark.read.parquet(f"{sf_small}/events.parquet")
    want = (
        batch.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )
    g = got.select("w_start", "event_type", "n", "sum_value")
    assert g.count() > 0
    # append mode: every emitted row must equal the batch result; windows
    # still open when the stream drained (watermark can't pass them) are
    # legitimately withheld
    assert g.exceptAll(want).count() == 0
    withheld = want.exceptAll(g).count()
    n_types = batch.select("event_type").distinct().count()
    assert withheld <= 4 * n_types  # at most watermark-horizon worth of windows


def test_streaming_correction_equals_batch(spark, sf_small, tmp_path):
    from cor_asv_ann_spark.operators.correction import correct_pipeline

    noisy = synth_spans(spark, sf_small, noisy=True)
    src = str(tmp_path / "src")
    noisy.write.parquet(src)
    stream = (
        spark.readStream.schema(noisy.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = streaming_correction(spark, stream, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out_dir}/epoch=*").select(
        "doc_id", F.explode("spans").alias("s")
    )
    want = correct_pipeline(noisy).select("doc_id", F.explode("spans").alias("s"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_media_plumbing(spark, sf_small):
    spans = synth_spans(spark, sf_small, noisy=False)
    media = synth_media_table(spark, spans)
    n = media.count()
    assert n > 0
    feats = extract_features(media)
    rows = feats.limit(10).collect()
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(r.n_bytes == 128 for r in rows)
    # deterministic regardless of partitioning
    a = {r.media_ref: r.feature for r in extract_features(media.repartition(8)).collect()}
    b = {r.media_ref: r.feature for r in extract_features(media.coalesce(1)).collect()}
    assert a == b


def test_decode_stub_contract():
    v = decode_stub(b"x" * 16, "image")
    assert v.shape == (64,) and v.dtype == np.float32
    assert np.array_equal(v, decode_stub(b"x" * 16, "image"))
    with pytest.raises(NotImplementedError):
        decode_stub(b"x", "hologram")


def test_streaming_stateful_dedup(spark, tmp_path):
    """First-seen-wins across micro-batches: the duplicate arriving in a
    LATER batch must be dropped by the keyed state."""
    import pandas as pd
    from pyspark.sql import types as T

    from cor_asv_ann_spark.streaming.events import streaming_dedup

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a1", "a2"], "text": ["hello world", "unique one"]}),
        schema=schema,
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ["b1", "b2"], "text": ["Hello  WORLD", "another doc"]}),
        schema=schema,
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # 'Hello  WORLD' normalizes to the same fingerprint as 'hello world'
    assert "a2" in rows and "b2" in rows
    kept_hello = {"a1", "b1"} & rows
    assert len(kept_hello) == 1  # exactly one copy of the duplicate survives
    assert len(rows) == 3


def test_resize_and_frame_sample_plumbing(spark, sf_small):
    """Resize + frame-sample (prompt's multimodal op list): type filter
    reaches the rows, metadata rewrites to target geometry, frame rows
    are 1→N with duration-derived timestamps bounded by max_frames, and
    both are deterministic across partitionings (the stub-decode
    discipline: Spark plumbing real, codec faked)."""
    from cor_asv_ann_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synth_media_table,
    )
    from cor_asv_ann_spark.sources.spans import synth_spans

    media = synth_media_table(spark, synth_spans(spark, sf_small)).cache()
    types = {r.media_ref: r.media_type for r in media.collect()}

    resized = resize_images(media, width=48, height=24).collect()
    assert len(resized) == sum(1 for t in types.values() if t == "image")
    assert all(r.meta_width == 48 and r.meta_height == 24 for r in resized)
    assert all(len(r.payload) == 16 for r in resized)

    frames = sample_frames(media, every_ms=5000, max_frames=4).collect()
    by_ref = {}
    for r in frames:
        assert types[r.media_ref] == "video"
        assert r.t_ms == r.frame_idx * 5000
        by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
    durs = {r.media_ref: r.meta_duration_ms for r in media.collect()}
    for ref, idxs in by_ref.items():
        n = min(max(durs[ref] // 5000, 1), 4)
        assert sorted(idxs) == list(range(n))

    # partitioning-invariant (deterministic stub decode)
    a = {(r.media_ref, r.frame_idx): r.frame
         for r in sample_frames(media.repartition(7), every_ms=5000, max_frames=4).collect()}
    b = {(r.media_ref, r.frame_idx): r.frame
         for r in sample_frames(media.coalesce(1), every_ms=5000, max_frames=4).collect()}
    assert a == b

    # null duration (the schema declares meta_duration_ms nullable):
    # must yield the min-1-frame row, not a TypeError inside the UDF
    from cor_asv_ann_spark.operators.multimodal import MEDIA_SCHEMA

    null_dur = spark.createDataFrame(
        [("v0", "d0", "video", bytearray(b"\x01\x02"), None, None, None)],
        schema=MEDIA_SCHEMA,
    )
    rows = sample_frames(null_dur, every_ms=5000, max_frames=4).collect()
    assert len(rows) == 1 and rows[0].frame_idx == 0 and rows[0].t_ms == 0


def test_streaming_pagexml_incremental(spark, tmp_path):
    """Streaming PAGE-XML ingest: drain wave 1 with availableNow,
    then ONLY the pages added afterwards are processed by a rerun on
    the same checkpoint (file-source seen-files tracking) — and the
    corrected output equals the batch pipeline's on the same pages."""
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.sources.pagexml import (
        read_pagexml,
        synth_page_xml,
    )
    from cor_asv_ann_spark.streaming.pages import (
        streaming_pagexml_correction,
    )

    pages = tmp_path / "pages"
    pages.mkdir()
    (pages / "p1.xml").write_bytes(
        synth_page_xml("p1", "first page words here\n", words_per_line=4))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = streaming_pagexml_correction(spark, str(pages), out, ckpt)
    q.awaitTermination(120)
    wave1 = spark.read.parquet(out)
    assert {r.doc_id for r in wave1.select("doc_id").collect()} == {"p1"}

    # wave 2: a new page arrives; same checkpoint → only p2 processed
    (pages / "p2.xml").write_bytes(
        synth_page_xml("p2", "second page arrives later\n", words_per_line=4))
    q2 = streaming_pagexml_correction(spark, str(pages), out, ckpt)
    q2.awaitTermination(120)
    all_out = spark.read.parquet(out)
    docs = {r.doc_id for r in all_out.select("doc_id").collect()}
    assert docs == {"p1", "p2"}
    # epoch partitioning: p1 only in the first epoch's directory (the
    # second run did NOT reprocess it)
    import glob

    epochs = sorted(glob.glob(f"{out}/epoch=*"))
    assert len(epochs) >= 2
    first = spark.read.parquet(epochs[0]).select("doc_id").distinct()
    assert [r.doc_id for r in first.collect()] == ["p1"]

    # parity with the batch pipeline on the same pages
    batch = correct_pipeline(read_pagexml(spark, str(pages)))
    b = {(r.doc_id,): r for r in batch.collect()}
    s = {(r.doc_id,): r for r in all_out.collect()}
    assert set(b) == set(s)
    for k in b:
        assert [tuple(x) for x in b[k].spans] == [tuple(x) for x in s[k].spans]
