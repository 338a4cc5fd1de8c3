"""Stream-stream interval join: view -> click attribution.

The FIFTH streaming operator family in the suite (after the custom
sessionizer, the built-in windowed rollup, dropDuplicates dedup, and
the stream-static enrichment join): a watermarked STREAM-STREAM inner
join, the Structured Streaming surface that buffers BOTH sides in the
state store and needs an event-time range condition to bound that
state.

Semantics (ad-attribution shape): pair every click with every view by
the same user that happened within the preceding ``window_minutes``
(``view_ts <= click_ts < view_ts + window``).  At 100 TB this is the
canonical impression x conversion join:

* Both sides carry ``withWatermark`` and the join condition is an
  event-time RANGE, so Spark derives a state-eviction bound for each
  side (a view older than watermark - window can never match a future
  click and is dropped from the state store) -- without the range
  condition the join state grows without bound and the query is
  rejected for append mode.
* Inner join results emit EAGERLY (as soon as a match is seen), so a
  finite run drains completely under Trigger.AvailableNow with no
  clock-event trick; the streamed output equals the batch join exactly
  and the DuckDB oracle can hash-verify it.
* The equality key (user_id) is the shuffle key; the range condition
  is evaluated post-shuffle per key.  Skewed users bound state by
  window width, not corpus size.

``attribution_join_complete`` stages each side as one file (see
harness.run_finite_stream2 for why single-file staging is
load-bearing) and returns the drained memory-sink table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 120,
) -> DataFrame:
    """Watermarked stream-stream inner join of two event streams.

    Both inputs are raw event streams with (event_id, ts, user_id)
    columns; the caller pre-filters by event_type.  The watermark delay
    equals the join window: a view is kept in state until the click
    watermark passes view_ts + window, the exact horizon after which it
    can no longer match.
    """
    delay = f"{window_minutes} minutes"
    # parquet TIMESTAMP_NTZ -> LTZ cast first (session runs UTC, the
    # wall-clock epoch is preserved; same convention as sessions.py)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
        "user_id",
    ).withWatermark("view_ts", delay)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.col("user_id").alias("click_user"),
    ).withWatermark("click_ts", delay)
    cond = (
        (v["user_id"] == c["click_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (
            c["click_ts"]
            < v["view_ts"] + F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
        )
    )
    return v.join(c, cond, "inner").select(
        "user_id",
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (
            F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("view_ts"))
        ).alias("lag_us"),
    )


def attribution_join_complete(
    spark,
    events: DataFrame,
    window_minutes: int = 120,
    work_dir: str = None,
    query_name: str = "attribution_join_complete",
) -> DataFrame:
    """Run the stream-stream attribution join over a finite event set.

    Inner-join rows emit on match, so no clock event is needed: one
    availableNow pass over the two single-file stages yields every pair
    and the result equals the batch interval join bit-for-bit.
    """
    from .harness import run_finite_stream2

    cols = ["event_id", "ts", "user_id"]
    views = events.filter(F.col("event_type") == "view").select(*cols)
    clicks = events.filter(F.col("event_type") == "click").select(*cols)
    return run_finite_stream2(
        spark,
        views,
        clicks,
        lambda v, c: attribution_join_stream(v, c, window_minutes),
        query_name,
        work_dir=work_dir,
    )
