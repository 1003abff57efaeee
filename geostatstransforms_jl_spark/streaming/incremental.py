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
* `streaming_sessionize`   — gap-based sessions as a CUSTOM STATEFUL operator
  (`applyInPandasWithState` + event-time timeout); the one stage whose batch
  formulation (a global per-user window) cannot run incrementally.

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


def streaming_tile_cells(
    stream: DataFrame,
    grid,
    phash_col: str = "phash",
    caption_col: str = "caption",
    id_col: str = "image_id",
    id_index_expr=None,
    id_format: str = "img%08d",
) -> DataFrame:
    """The north-star tile-assignment rollup over an append stream of
    input-shaped image rows: phash georeference → Morton cell key → per-cell
    (count, caption-token average, representative image id).  All aggregates
    are associative, so new image partitions fold into the standing per-cell
    state incrementally (distinct-phash, which is not, stays in the batch
    twin `__spark_entry__.q_images_tile_cells`).

    The representative is min over a NUMERIC id index, re-formatted after
    the aggregate — a `min(string)` would carry a var-length buffer and fall
    back to the sort-based aggregate (the exact plan regression the batch
    twin engineered away; PLANS.md "images_tile_cells"), paid per
    micro-batch here.  `id_index_expr` defaults to an extraction matched to
    `id_format`: under the default ``img%08d`` it accepts ONLY canonical
    ``img<8+ digits>`` ids, so any other scheme — no trailing digits OR a
    different prefix (e.g. ``vid00000007``) — yields a NULL representative,
    the observable signal to pass your own `id_format` (and usually
    `id_index_expr`).  A custom `id_format` without `id_index_expr` falls
    back to generic trailing-digit extraction: by passing the format you
    declare the reconstruction, so re-formatting those digits is correct by
    contract."""
    from ..core.images import georef_lonlat
    from ..functions.geocell import morton_cell

    if id_index_expr is None:
        # the default format only reconstructs ids it can round-trip: anchor
        # the whole canonical shape, so 'vid00000007' gives NULL instead of
        # a fabricated 'img00000007' that does not exist in the input
        pat = r"^img(\d{8,})$" if id_format == "img%08d" else r"(\d+)$"
        # try_cast: regexp_extract yields '' on no-match, and a plain cast of
        # '' THROWS under ANSI mode (Spark 4 default) — the contract is a
        # NULL representative, not a failed micro-batch
        id_index_expr = F.regexp_extract(F.col(id_col), pat, 1).try_cast("long")
    lon, lat = georef_lonlat(phash_col)
    keyed = stream.withColumn("zkey", morton_cell(grid, lon, lat))
    return keyed.groupBy("zkey").agg(
        F.count("*").alias("n_images"),
        F.round(F.avg(F.size(F.split(caption_col, " "))), 6).alias("avg_tokens"),
        F.min(id_index_expr).alias("_min_idx"),
    ).select(
        "zkey", "n_images", "avg_tokens",
        # format_string renders a NULL arg as the literal text "null" —
        # guard so a cell with no parseable id yields a NULL representative
        F.when(F.col("_min_idx").isNull(), F.lit(None).cast("string"))
        .otherwise(F.format_string(id_format, F.col("_min_idx")))
        .alias("first_image"),
    )


def streaming_cell_pyramid(
    stream: DataFrame,
    grid,
    coords=("x", "y"),
    levels: "int | None" = None,
    sum_cols=(),
    min_cols=(),
    max_cols=(),
    key_col: str = "zkey",
    level_col: str = "level",
) -> DataFrame:
    """Streaming twin of ``functions.geocell.cell_pyramid``: every zoom
    level's rollup maintained incrementally over an append stream.

    Structured Streaming forbids chained aggregations, so the batch plan
    (aggregate the base once, re-aggregate tiers from it) is
    inexpressible here.  Instead each input row is exploded to its
    (level, ancestor-key) pairs BEFORE the single streaming aggregate:
    the shuffle/state cost of the (levels+1)× row amplification collapses
    in the map-side partial aggregate to O(occupied cells × levels) —
    the same state size the batch tiers hold — and count/sum/min/max are
    associative, so micro-batches fold into standing per-(level, cell)
    state exactly.  Distinct-count stays in the batch twin: the HLL
    sketch-union plan needs the re-aggregation shape (and min/max, while
    associative, make the state append-only-correct but not
    retractable — fine for append streams, which is this module's
    contract throughout).

    Output schema and semantics match the batch operator column for
    column (same `_pyramid_contract`); a `complete`/`update`-mode sink
    over a bounded source converges to the batch result row-for-row
    (parity-tested in tests/test_pipeline_lineage.py)."""
    from ..functions.geocell import (
        _pyramid_base_aggs, _pyramid_contract, morton_cell)

    levels, outnames = _pyramid_contract(
        grid, levels, sum_cols, min_cols, max_cols, key_col, level_col
    )
    # project down to (key, agg sources) BEFORE the explode: an input
    # column that happens to share level_col's name would otherwise make
    # the select ambiguous (the batch twin drops extra columns in its base
    # aggregate; this projection is the streaming equivalent)
    srcs = list(dict.fromkeys([*sum_cols, *min_cols, *max_cols]))
    keyed = stream.withColumn(
        key_col, morton_cell(grid, F.col(coords[0]), F.col(coords[1]))
    ).select(key_col, *srcs)
    lvl = F.explode(
        F.array(*[F.lit(l) for l in range(levels + 1)])
    ).alias(level_col)
    # shift by a COLUMN: the pyspark helper only takes a literal bit count,
    # but the underlying SQL expression is a plain binary op; backticks keep
    # non-plain identifiers (spaces, reserved words) working like the
    # Column-API batch twin does
    exploded = keyed.select("*", lvl).withColumn(
        key_col, F.expr(f"shiftrightunsigned(`{key_col}`, 2 * `{level_col}`)")
    )
    aggs = _pyramid_base_aggs(sum_cols, min_cols, max_cols)
    return exploded.groupBy(level_col, key_col).agg(*aggs)


def streaming_quality(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-row projection — identical plan in batch and streaming."""
    from ..textops.quality import quality_scores, token_stats

    return quality_scores(token_stats(stream, text_col), text_col)


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization over an append stream — the custom stateful
    operator the batch window trick can't express incrementally (a session is
    open-ended until the gap closes it, so it needs per-key state with an
    event-time timeout, not a windowed aggregate).

    `applyInPandasWithState` per user: state holds the open sessions as
    (start, end, count) epoch-microsecond arrays; each micro-batch folds its
    events in (extend a session whose [start-gap, end+gap] covers the event,
    else open one, then merge bridged neighbors), and a session is EMITTED
    exactly once — when the watermark passes `end + gap`, via the event-time
    timeout for users with no new data.  Emits
    (user, n_events, session_start, session_end); the per-user `session_seq`
    ordinal of the batch variant is intentionally absent — it is a global
    per-user order statistic, assignable only after sealing (one windowed
    pass over the emitted table in the batch layer).

    Gap semantics are EXACT microseconds, identical to the batch
    `functions.timeseries.sessionize`.  The event time enters the operator
    as a JVM-computed `unix_micros` long, NOT a pandas timestamp: Arrow
    hands Python session-timezone-naive timestamps while the state
    watermark/timeout API is UTC-epoch-based, so comparing them directly
    would shift sealing by the timezone offset in any non-UTC session —
    epoch longs are absolute on both sides of that boundary.

    Scale shape: state is O(open sessions per user) — bounded by the
    watermark horizon / gap, independent of history length; the only shuffle
    is the groupBy(user) exchange every stateful operator needs.  Late rows
    beyond the watermark are dropped by the engine before the operator."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    types = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    out_schema = (
        f"{user_col} {types[user_col]}, n_events long, "
        "_start_us long, _end_us long"
    )
    state_schema = "starts array<long>, ends array<long>, counts array<long>"
    gap = int(gap_seconds) * 1_000_000  # state keeps exact microseconds
    cols = [user_col, "n_events", "_start_us", "_end_us"]

    def fn(key, pdfs, state):
        starts, ends, counts = (
            ([], [], []) if not state.exists else [list(v) for v in state.get]
        )
        for pdf in pdfs:
            es = np.sort(pdf["_ts_us"].to_numpy())
            for t in es:
                t = int(t)
                for i in range(len(starts)):
                    if starts[i] - gap <= t <= ends[i] + gap:
                        starts[i] = min(starts[i], t)
                        ends[i] = max(ends[i], t)
                        counts[i] += 1
                        break
                else:
                    starts.append(t)
                    ends.append(t)
                    counts.append(1)
            # one event can bridge two sessions: merge overlapping neighbors
            order = sorted(range(len(starts)), key=lambda i: starts[i])
            ms, me, mc = [], [], []
            for i in order:
                if ms and starts[i] <= me[-1] + gap:
                    me[-1] = max(me[-1], ends[i])
                    mc[-1] += counts[i]
                else:
                    ms.append(starts[i])
                    me.append(ends[i])
                    mc.append(counts[i])
            starts, ends, counts = ms, me, mc
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms * 1000  # us
        sealed = [i for i in range(len(starts)) if ends[i] + gap < wm]
        live = [i for i in range(len(starts)) if ends[i] + gap >= wm]
        if live:
            state.update(
                (
                    [starts[i] for i in live],
                    [ends[i] for i in live],
                    [counts[i] for i in live],
                )
            )
            # wake up when the earliest open session COULD seal (must be
            # strictly past the current watermark per the state contract)
            state.setTimeoutTimestamp(
                max((min(ends[i] for i in live) + gap) // 1000 + 1, wm_ms + 1)
            )
        else:
            state.remove()
        yield pd.DataFrame(
            [(key[0], counts[i], starts[i], ends[i]) for i in sealed],
            columns=cols,
        )

    # watermark on the timestamp column, epoch extraction JVM-side; the
    # tagged column stays in the projection so the stateful operator keeps
    # its event-time watermark (see assign_session_seq for the batch-layer
    # ordinal pass over the sealed output)
    d = stream.withWatermark(ts_col, watermark).select(
        user_col,
        ts_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
    )
    sealed = d.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return sealed.select(
        user_col,
        "n_events",
        F.timestamp_micros("_start_us").alias("session_start"),
        F.timestamp_micros("_end_us").alias("session_end"),
    )


def assign_session_seq(sealed: DataFrame, user_col: str = "user_id") -> DataFrame:
    """The batch-layer companion to `streaming_sessionize`: add the per-user
    `session_seq` ordinal (1-based, by session_start) over a SEALED session
    table, completing parity with the batch `functions.timeseries.sessionize`
    schema.  A global per-user order statistic can only be assigned after
    sealing, so it lives here, not in the stateful operator — one window pass,
    single exchange+sort on (user, session_start), run on the sink table."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy("session_start")
    return sealed.withColumn("session_seq", F.row_number().over(w)).select(
        user_col, "session_seq", "n_events", "session_start", "session_end"
    )
