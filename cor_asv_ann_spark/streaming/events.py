"""Structured Streaming entry points.

The reference is batch-only (SURVEY.md §2.9) — its nearest construct is
the generator pipeline gen_lines → gen_data (seq2seq.py:846-917). The
engine still ships streaming equivalents of the two operators that make
sense over an event/span stream, because a production extraction
pipeline ingests documents incrementally:

* windowed throughput/CER metrics (watermark + tumbling window);
* streaming correction: the same Arrow-batched correction UDF applied
  per micro-batch via foreachBatch (exactly-once with an idempotent
  per-batch sink — the streaming twin of checkpoint.run_resumable).

Local tests drive these with the file source over the driver's parquet
and a memory sink (processAllAvailable → synchronous completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_metrics(events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window per-type counts/sums with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


def run_stream_to_memory(agg: DataFrame, name: str) -> None:
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_minutes: int | None = None,
):
    """Stateful streaming exact-dedup: only the FIRST document bearing
    each content fingerprint survives, across micro-batches — the
    streaming twin of operators/dedup.exact_dedup, keyed state via
    applyInPandasWithState (one tiny state row per fingerprint).

    At warehouse scale the state store is RocksDB-backed and the key
    space is the md5 fingerprint (uniform, no skew by construction).
    ``state_ttl_minutes`` bounds the state store on an unbounded stream:
    a fingerprint not seen for the TTL is evicted (duplicates arriving
    later than the TTL pass through again — the standard
    state-size/recall trade at 10^12-key scale)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = docs_stream.withColumn(
        "fp", F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def keep_first(key, pdfs, state: GroupState):
        if state_ttl_minutes and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if state_ttl_minutes:
                state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
            # key already surfaced in a prior micro-batch: drop everything
            for _ in pdfs:
                pass
            return
        # a key's rows within one micro-batch may span several Arrow
        # chunks — track the running min across ALL chunks so the
        # survivor is chunking-independent
        best = None
        for pdf in pdfs:
            if len(pdf):
                cand = pdf.sort_values(id_col).head(1)
                if best is None or cand[id_col].iloc[0] < best[id_col].iloc[0]:
                    best = cand
        if best is not None:
            state.update((1,))
            if state_ttl_minutes:
                state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
            yield best[["fp", id_col]]

    return hashed.groupBy("fp").applyInPandasWithState(
        keep_first,
        outputStructType=f"fp string, {id_col} string",
        stateStructType="n int",
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def streaming_correction(
    spark: SparkSession,
    spans_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    corrector=None,
):
    """Micro-batch correction with exactly-once parquet output: the batch
    pipeline applied inside foreachBatch. Returns the StreamingQuery."""
    from ..operators.correction import correct_pipeline

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = correct_pipeline(batch_df, corrector=corrector)
        # foreachBatch is at-least-once: a replayed epoch must OVERWRITE
        # its own epoch=<id> directory (idempotent sink), never append —
        # append would duplicate rows on retry after a crash between the
        # parquet write and the checkpoint commit
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        spans_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
