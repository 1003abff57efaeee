"""Time-series rollup and sessionization over event streams.

The reference is batch-only (SURVEY.md §2.3 "Streaming: none"), but a
large-scale training-data pipeline needs the time dimension: hypertable-style
bucketed rollups and gap-based sessionization.  Both are pure Catalyst
(window + hash aggregate); the same expressions run under Structured
Streaming with a watermark (see streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_rollup(
    df: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_cols=("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Bucketed rollup: count / sum / mean / exact median per (bucket, keys).

    One hash aggregate keyed on `date_trunc(bucket, ts)` + keys — the shuffle
    key is time-prefixed, so range-partitioned sinks stay append-friendly at
    scale (late buckets touch few partitions).
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    return df.groupBy(b, *key_cols).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.median(value_col).alias("median_value"),
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the user's inter-event
    gap exceeds `gap_seconds`.  lag + conditional cumulative sum over one
    per-user window — two window passes on the same (user, ts) sort, which
    Catalyst executes with a single exchange + sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # ROWS frame, not the default RANGE frame: with duplicate (user, ts)
    # events RANGE makes peers share the running sum, so a session-start row
    # and its tie would absorb each other's _new — session ids would diverge
    # from a ROWS-framed oracle and be tie-order nondeterministic.  Ties have
    # gap 0 ≤ gap_seconds, so with ROWS the boundary placement is
    # deterministic regardless of tie order.
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # EXACT microsecond gaps (the full precision Spark timestamps carry).
    # A whole-second cast would silently merge sessions whose true gap is
    # within 1s of the threshold — and would diverge from the streaming
    # twin (streaming/incremental.py:streaming_sessionize), which compares
    # exact microseconds by construction.
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_s = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    with_id = df.withColumn("_new", new_s).withColumn(
        "session_seq", F.sum("_new").over(w_rows)
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
