"""Streaming twins vs batch operators: watermarked windowed aggregation
(stream == batch on the same data; late-within-watermark events included)
and keep-first stateful dedup across micro-batches."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.operators.events import windowed_event_counts
from flagembedding_spark.streaming.windowed import (
    start_streaming_dedup,
    start_windowed_event_counts,
)


@pytest.fixture()
def tmproot():
    d = tempfile.mkdtemp(prefix="fes_swin_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_events(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}.json", "w") as f:
        for eid, ts, uid, etype, val in rows:
            f.write(json.dumps({
                "event_id": eid, "ts": ts, "user_id": uid,
                "event_type": etype, "value": val,
            }) + "\n")


WAVE1 = [
    (0, "2024-01-01 00:10:00", 1, "click", 1.0),
    (1, "2024-01-01 00:40:00", 2, "view", 2.0),
    (2, "2024-01-01 01:10:00", 1, "click", 3.0),
]
WAVE2 = [
    (3, "2024-01-01 03:05:00", 3, "view", 4.0),   # advances watermark to 01:05
    (4, "2024-01-01 00:50:00", 2, "click", 5.0),  # LATE but within watermark
]


def test_windowed_stream_matches_batch_with_late_data(spark, tmproot):
    inp = f"{tmproot}/in"
    ck = f"{tmproot}/ck"
    _write_events(inp, "w1", WAVE1)
    out = f"{tmproot}/out"
    q = start_windowed_event_counts(spark, inp, ck, out)
    q.awaitTermination(120)
    _write_events(inp, "w2", WAVE2)
    q = start_windowed_event_counts(spark, inp, ck, out)
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    # hour-0 windows finalized once the watermark (03:05 − 2h) passed 01:00 —
    # and they INCLUDE the late 00:50 event from wave 2
    all_rows = WAVE1 + WAVE2
    batch = spark.createDataFrame(
        [(e, t, u, k, v) for e, t, u, k, v in all_rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want_all = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }
    hour0 = {k: v for k, v in want_all.items()
             if k[0] < 1704070800}  # windows ending ≤ 01:00 UTC
    for k, v in hour0.items():
        assert got.get(k) == v, (k, got.get(k), v)
    # the late event really landed in its hour-0 window
    late_key = next(k for k in hour0 if k[1] == "click" and k[0] == 1704067200)
    assert got[late_key][0] == 2  # 00:10 click + late 00:50 click


def test_streaming_dedup_keep_first_across_batches(spark, tmproot):
    inp = f"{tmproot}/docs"
    ck = f"{tmproot}/ck2"

    def wave(name, rows):
        os.makedirs(inp, exist_ok=True)
        with open(f"{inp}/{name}.json", "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    out = f"{tmproot}/dedup_out"
    wave("w1", [(10, "alpha"), (11, "beta"), (12, "alpha")])
    q = start_streaming_dedup(spark, inp, ck, out)
    q.awaitTermination(120)
    wave("w2", [(13, "alpha"), (14, "gamma"), (15, "beta")])
    q = start_streaming_dedup(spark, inp, ck, out)
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    got = {(r["text_sha"], r["doc_id"]) for r in rows}
    sha = {t: spark.sql(f"SELECT sha2('{t}', 256) s").first()["s"]
           for t in ("alpha", "beta", "gamma")}
    # each content once, smallest doc_id of its FIRST batch, never re-emitted
    assert got == {(sha["alpha"], 10), (sha["beta"], 11), (sha["gamma"], 14)}
    assert all(r["is_first"] for r in rows)


def test_streaming_sessionize_matches_batch_closed_sessions(spark, tmproot):
    """Stream == batch for every CLOSED session: feed two in-order waves
    (sessions close both inside a wave and across the wave boundary), then
    compare to batch sessionize minus each user's final (still-open)
    session."""
    from flagembedding_spark.operators.events import sessionize
    from flagembedding_spark.streaming.windowed import (
        start_streaming_sessionize,
    )

    w1 = [
        (0, "2024-01-01 00:00:00", 1, "c", 1.0),
        (1, "2024-01-01 00:10:00", 1, "c", 2.0),
        (2, "2024-01-01 02:00:00", 1, "c", 3.0),   # closes u1 session 1
        (3, "2024-01-01 00:05:00", 2, "c", 4.0),
    ]
    w2 = [
        (4, "2024-01-01 02:20:00", 1, "c", 5.0),   # continues u1 session 2
        (5, "2024-01-01 05:00:00", 1, "c", 6.0),   # closes u1 session 2
        (6, "2024-01-01 03:00:00", 2, "c", 7.0),   # closes u2 session 1
        (7, "2024-01-01 03:10:00", 3, "c", 8.0),   # u3: single open session
    ]
    inp, ck, out = f"{tmproot}/sin", f"{tmproot}/sck", f"{tmproot}/sout"
    _write_events(inp, "w1", w1)
    q = start_streaming_sessionize(spark, inp, ck, out)
    q.awaitTermination(120)
    _write_events(inp, "w2", w2)
    q = start_streaming_sessionize(spark, inp, ck, out)
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_s"], r["end_s"], r["sum_value"]
        )
        for r in spark.read.parquet(out).collect()
    }

    all_events = spark.createDataFrame(
        [(e, ts, u, t, v) for e, ts, u, t, v in w1 + w2],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = sessionize(all_events, gap_s=1800).collect()
    last = {}
    for r in batch:
        last[r["user_id"]] = max(last.get(r["user_id"], 0), r["session_id"])
    want = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_s"], r["end_s"], r["sum_value"]
        )
        for r in batch
        if r["session_id"] < last[r["user_id"]]
    }
    assert got == want
    assert len(got) == 3  # u1 ×2 closed, u2 ×1 closed, u3 none


def test_streaming_sessionize_close_idle_via_timeout(spark, tmproot):
    """With close_idle, an idle user's open session finalizes once the
    watermark passes last_event + gap — no successor event needed — and the
    session counter survives for later events (batch-identical numbering)."""
    from flagembedding_spark.operators.events import sessionize
    from flagembedding_spark.streaming.windowed import (
        start_streaming_sessionize,
    )

    w1 = [
        (0, "2024-01-01 00:00:00", 1, "c", 1.0),
        (1, "2024-01-01 00:10:00", 1, "c", 2.0),
        (2, "2024-01-01 00:05:00", 2, "c", 4.0),
    ]
    # watermark driver: far-future event for user 3 pushes the watermark
    # past (u1 last + gap) and (u2 last + gap) → both idle sessions close
    w2 = [(3, "2024-01-02 12:00:00", 3, "c", 8.0)]
    # u1 returns AFTER its idle close: numbering must continue at 2
    w3 = [
        (4, "2024-01-03 00:00:00", 1, "c", 16.0),
        (5, "2024-01-04 00:00:00", 4, "c", 1.0),  # watermark driver again
    ]
    inp, ck, out = f"{tmproot}/iin", f"{tmproot}/ick", f"{tmproot}/iout"
    for name, wave in (("w1", w1), ("w2", w2), ("w3", w3)):
        _write_events(inp, name, wave)
        q = start_streaming_sessionize(
            spark, inp, ck, out, close_idle=True, watermark="1 hour"
        )
        q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_s"], r["end_s"], r["sum_value"]
        )
        for r in spark.read.parquet(out).collect()
    }
    all_events = spark.createDataFrame(
        w1 + w2 + w3,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_s"], r["end_s"], r["sum_value"]
        )
        for r in sessionize(all_events, gap_s=1800).collect()
    }
    # u1 session 1 (2 events) and u2 session 1 closed by TIMEOUT; u1
    # session 2 (the return) closed by the w3 watermark driver eventually —
    # check what's emitted is exactly a batch-consistent prefix
    assert (1, 1) in got and got[(1, 1)] == batch[(1, 1)]
    assert (2, 1) in got and got[(2, 1)] == batch[(2, 1)]
    for k, v in got.items():
        assert batch[k] == v, k
