"""Watermarked windowed streaming aggregation + stateful streaming dedup.

The reference is batch-only (SURVEY §2.8); these are the Structured-
Streaming surfaces a live training-data ingest needs:

- start_windowed_event_counts: readStream → withWatermark → tumbling-window
  aggregation, APPEND mode — a window only emits once the watermark passes
  its end, so late events within the watermark still land in their window
  and older-than-watermark events are dropped. The aggregation expressions
  are the SAME as the batch operator (operators/events.py); the stream==
  batch equivalence is tested.
- start_streaming_dedup: applyInPandasWithState keyed by content sha — emits
  only the FIRST occurrence of each document across all micro-batches (the
  streaming form of dedup.exact_dedup's keep-one contract). State per key is
  one boolean; at 10^12 docs the state store shards by key exactly like the
  batch groupBy would.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def start_windowed_event_counts(
    spark: SparkSession,
    input_path: str,
    checkpoint: str,
    output_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """JSON-dir event stream → watermarked tumbling-window counts APPENDED
    to parquet (file sinks recover from the checkpoint, so window state and
    the watermark survive restarts). Returns the StreamingQuery."""
    src = spark.readStream.schema(EVENT_SCHEMA).json(input_path)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("text_sha", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("is_first", BooleanType(), False),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", BooleanType(), False)])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    best = None
    if not state.exists:
        # first time this content sha is seen: keep the smallest doc_id in
        # the batch (exact_dedup's deterministic keep-one contract)
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None or m < best else best
        if best is not None:
            state.update((True,))
    if best is not None:
        yield pd.DataFrame(
            {"text_sha": [key[0]], "doc_id": [best], "is_first": [True]}
        )


def start_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    checkpoint: str,
    output_path: str,
    available_now: bool = True,
):
    """JSON-dir doc stream (doc_id long, text string) → keep-first exact
    dedup across micro-batches via per-sha group state. Emits (text_sha,
    doc_id, is_first) once per distinct content, ever."""
    src = spark.readStream.schema("doc_id long, text string").json(input_path)
    keyed = src.withColumn("text_sha", F.sha2("text", 256)).groupBy("text_sha")
    deduped = keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
