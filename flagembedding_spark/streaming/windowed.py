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
    DoubleType,
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


# ---------------------------------------------------------------------------
# stateful streaming sessionization — the streaming twin of
# operators/events.sessionize (gap-based sessions per user)
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("start_s", LongType(), False),
        StructField("end_s", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType(), False),
        StructField("start_s", LongType(), False),
        StructField("last_s", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)


def _make_session_fn(gap_s: int, close_idle: bool = False):
    def session_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        """Per-user fold over (ts, event_id)-ordered events. The OPEN
        session lives in state; a session is EMITTED the moment an event
        arrives more than gap_s after it — identical numbering and
        aggregates to the batch operator for every closed session. Assumes
        per-user batches arrive in event-time order across micro-batches
        (the watermarked-ingest contract).

        With ``close_idle`` the open session ALSO closes when the event-time
        watermark passes its last event + gap (state timeout) — no successor
        event needed; the session counter survives in a tombstone state
        (start_s = −1) so numbering stays batch-identical if the user
        returns."""
        if close_idle and state.hasTimedOut:
            sid, start_s, last_s, n_ev, sval = state.get
            if start_s is not None and start_s >= 0:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_id": [sid],
                        "n_events": [n_ev],
                        "start_s": [start_s],
                        "end_s": [last_s],
                        "sum_value": [round(sval, 6)],
                    }
                )
            state.update((sid, -1, -1, 0, 0.0))
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["sec", "event_id"])
        if state.exists:
            sid, start_s, last_s, n_ev, sval = state.get
            if start_s is not None and start_s < 0:
                start_s, last_s = None, None  # tombstone: counter only
        else:
            sid, start_s, last_s, n_ev, sval = 0, None, None, 0, 0.0
        closed = []
        for sec, val in zip(pdf["sec"].tolist(), pdf["value"].tolist()):
            if start_s is None or sec - last_s > gap_s:
                if start_s is not None:
                    closed.append((sid, n_ev, start_s, last_s, sval))
                sid += 1
                start_s, n_ev, sval = sec, 0, 0.0
            n_ev += 1
            sval += val
            last_s = sec
        state.update((sid, start_s, last_s, n_ev, sval))
        if close_idle:
            state.setTimeoutTimestamp((last_s + gap_s) * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "start_s": [c[2] for c in closed],
                    "end_s": [c[3] for c in closed],
                    "sum_value": [round(c[4], 6) for c in closed],
                }
            )

    return session_fn


def start_streaming_sessionize(
    spark: SparkSession,
    input_path: str,
    checkpoint: str,
    output_path: str,
    gap_s: int = 1800,
    available_now: bool = True,
    close_idle: bool = False,
    watermark: str = "2 hours",
):
    """JSON-dir event stream → gap-based sessions per user via
    applyInPandasWithState keyed by user_id (state shards by key exactly
    like the batch window's partitionBy). Emits CLOSED sessions with the
    SAME schema/semantics as operators/events.sessionize; the open session
    stays in state until a later event closes it — or, with ``close_idle``,
    until the event-time WATERMARK passes its last event + gap (idle
    sessions finalize without a successor event; late events older than the
    watermark are dropped by the engine, the usual trade)."""
    src = spark.readStream.schema(EVENT_SCHEMA).json(input_path)
    base = src.withColumn("sec", F.unix_timestamp("ts"))
    if close_idle:
        base = base.withWatermark("ts", watermark)
    keyed = base.select("user_id", "event_id", "ts", "sec", "value").groupBy(
        "user_id"
    )
    sessions = keyed.applyInPandasWithState(
        _make_session_fn(gap_s, close_idle),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if close_idle
            else GroupStateTimeout.NoTimeout
        ),
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
