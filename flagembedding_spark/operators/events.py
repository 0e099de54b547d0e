"""Event-stream analytics operators (the driver's ``events`` table:
event_id, ts timestamp, user_id, event_type, value, props JSON).

The reference has no event processing (SURVEY §2.8 — batch-only), but a
training-data platform ingests its corpus as an event stream; these are the
batch forms whose STREAMING twins live in streaming/windowed.py (same
aggregation expressions — the stream==batch equivalence is tested).

All timestamps are reduced to epoch SECONDS (long) at the output boundary:
cross-engine timestamp hashing is timezone-fragile, integer epochs are not.

- windowed_event_counts : tumbling-window counts/sums per event_type
  (the batch twin of the watermarked streaming agg)
- sessionize            : gap-based sessions per user (lag + running sum —
  the classic hard-in-SQL window composition)
- event_props_extract   : JSON field extraction from the props column
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_S = 1800  # 30 min


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """→ (window_start long epoch-s, event_type, n_events, sum_value 6dp).
    Tumbling windows via F.window — identical semantics to the streaming
    form (streaming/windowed.py uses this same aggregation)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
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


def sessionize(
    events: DataFrame, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_s``. → (user_id, session_id
    1-based per user, n_events, start_s, end_s, sum_value 6dp). Ordering is
    (ts, event_id) so equal timestamps are deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    new_sess = F.when(
        F.lag(sec).over(w).isNull() | (sec - F.lag(sec).over(w) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(sec).alias("start_s"),
            F.max(sec).alias("end_s"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def event_props_extract(events: DataFrame, field: str = "k") -> DataFrame:
    """→ (event_id, k int): JSON field from the props column
    (get_json_object — JVM-side JSON path)."""
    return events.select(
        "event_id",
        F.get_json_object("props", f"$.{field}").cast("int").alias(field),
    )
