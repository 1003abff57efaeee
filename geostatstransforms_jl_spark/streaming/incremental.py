"""Structured-Streaming variants of the stateless/associative stages.

The reference is batch-only (no streaming anywhere in GeoStatsTransforms);
this module exists for the ingest side of a 10¹²-row pipeline: the
transforms whose semantics are associative (hash aggregations, per-row
projections) run identically over a stream with watermarked windows, so new
image/document partitions fold in incrementally instead of recomputing the
world.

Only operators whose batch semantics survive incremental execution are
offered here:

* `streaming_unique_coords` — UniqueCoords over an append stream: groupBy on
  exact coordinates in update mode (mean/count are associative; `first` is
  replaced by min-by-row_id which is also associative).
* `streaming_tile_agg`     — Upscale/Aggregate grid fast path per window.
* `streaming_quality`      — per-row text quality/token columns (stateless
  projection; trivially streamable).

Sequential operators (ModeFilter/Quenching) are NOT streamable by
construction — their in-sweep feedback needs a closed tile; run them in the
batch layer on sealed partitions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_unique_coords(
    stream: DataFrame,
    coord_cols=("x", "y"),
    value_col: str = "z",
    row_id: str = "row_id",
    ts_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Append stream → exact-coordinate dedup state.

    Emits per-coordinate (count, mean, first-by-row_id) in update mode.  With
    a `ts_col` the state is windowed + watermarked so it can be dropped for
    sealed windows (bounded state at 10¹² rows)."""
    d = stream
    keys = list(coord_cols)
    if ts_col is not None:
        d = d.withWatermark(ts_col, watermark)
        keys = [F.window(F.col(ts_col), watermark).alias("window")] + keys
    return d.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.avg(value_col).alias(value_col),
        F.min(F.struct(F.col(row_id).alias("o"), F.col(value_col).alias("v"))).getField("v").alias(f"{value_col}_first"),
        F.min(row_id).alias(row_id),
    )


def streaming_tile_agg(
    stream: DataFrame,
    fx: int,
    fy: int,
    index_cols=("i", "j"),
    tile_col: str = "image_id",
    value_col: str = "z",
) -> DataFrame:
    """The Upscale/Aggregate grid fast path over an append stream of pixels."""
    ic, jc = index_cols
    return (
        stream.withColumn(ic, F.floor(F.col(ic) / fx).cast("int"))
        .withColumn(jc, F.floor(F.col(jc) / fy).cast("int"))
        .groupBy(tile_col, ic, jc)
        .agg(F.avg(value_col).alias(value_col), F.count("*").alias("n"))
    )


def streaming_time_rollup(
    stream: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_cols=("event_type",),
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked hypertable rollup: the streaming twin of
    functions.timeseries.time_rollup — tumbling window + hash agg, state
    dropped for sealed windows (median is not associative, so the streaming
    variant serves count/sum/avg; exact medians come from the batch layer
    over sealed partitions)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), bucket).alias("bucket"), *key_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
    )


def streaming_quality(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-row projection — identical plan in batch and streaming."""
    from ..textops.quality import quality_scores, token_stats

    return quality_scores(token_stats(stream, text_col), text_col)
