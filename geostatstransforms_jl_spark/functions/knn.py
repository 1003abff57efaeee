"""Distributed kNN / radius joins via cell-ring candidate generation.

This is the engine's replacement for the reference's in-process KD-tree and
ball searches (`KNearestSearch` / `BallSearch` / `KBallSearch`, primitive P1:
used by src/aggregate.jl:96-99, src/transfer.jl:80-83,
src/interpneighbors.jl:72-84, src/droplocallowhigh.jl:49-55,
src/clustering/slic.jl:74,105,169).

Physical strategy (scale-first):

1.  Bucket sources into quad-cells sized from the query (`core.cells`).  The
    cell assignment is a codegen'd expression; the subsequent join is a plain
    shuffled (or broadcast, when one side is small — Catalyst/AQE decides)
    **equi-join on the cell key**, which replaces the theta (distance) join.
2.  Targets explode a kRing of neighbor cells.  For radius queries the ring
    count is exact (`ceil(r / cell_edge)`); for kNN it starts at 1 and the
    driver doubles it only for targets whose k-th neighbor is not yet
    *provably* within the searched ring (distance ≤ ring × min_cell_edge) —
    an exact algorithm, typically one round at matched densities.
3.  Ranking is `row_number() OVER (PARTITION BY target ORDER BY dist, s_id)`
    — deterministic tie-break on the source row id.
4.  Skew: cells whose source count exceeds `salt_threshold` are split into
    shards; targets touching a hot cell fan out over the shards (salted
    equi-join).  The hot-cell set is collected from a cheap cell histogram
    and broadcast.  AQE's skew-join splitting also applies on top.

Output columns: targets prefixed ``t_``, sources prefixed ``s_``, plus
``dist`` (and ``rank`` for kNN).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core import cells as C


def _prefixed(df: DataFrame, prefix: str, coords: Tuple[str, str], id_col: str, carry: Sequence[str]) -> DataFrame:
    keep = [id_col, *coords, *carry]
    sel = [F.col(c).alias(f"{prefix}{c}") for c in dict.fromkeys(keep)]
    return df.select(*sel)


def _dist_expr(tx, ty, sx, sy):
    return F.sqrt((tx - sx) * (tx - sx) + (ty - sy) * (ty - sy))


def _union_bounds_and_counts(a: DataFrame, ac, b: DataFrame, bc):
    """Bounds of both sides + row counts in ONE job (union-tagged agg)."""
    u = a.select(
        F.lit(0).alias("_side"), F.col(ac[0]).alias("_x"), F.col(ac[1]).alias("_y")
    ).unionByName(
        b.select(F.lit(1).alias("_side"), F.col(bc[0]).alias("_x"), F.col(bc[1]).alias("_y"))
    )
    rows = {
        r["_side"]: r
        for r in u.groupBy("_side")
        .agg(
            F.min("_x").alias("x0"),
            F.min("_y").alias("y0"),
            F.max("_x").alias("x1"),
            F.max("_y").alias("y1"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    ra, rb = rows.get(0), rows.get(1)
    n_a = int(ra["n"]) if ra else 0
    n_b = int(rb["n"]) if rb else 0
    xs0 = [r["x0"] for r in (ra, rb) if r]
    ys0 = [r["y0"] for r in (ra, rb) if r]
    xs1 = [r["x1"] for r in (ra, rb) if r]
    ys1 = [r["y1"] for r in (ra, rb) if r]
    x0, y0 = float(min(xs0)), float(min(ys0))
    x1, y1 = float(max(xs1)), float(max(ys1))
    if x1 <= x0:
        x1 = x0 + 1.0
    if y1 <= y0:
        y1 = y0 + 1.0
    return x0, y0, x1, y1, n_a, n_b


def _hot_cells(sources_cells: DataFrame, threshold: int):
    """Histogram of source cells; return list of (cell, nshards) above threshold."""
    hist = (
        sources_cells.groupBy("_cell")
        .count()
        .filter(F.col("count") > threshold)
        .select("_cell", "count")
        .collect()
    )
    return {r["_cell"]: int(math.ceil(r["count"] / threshold)) for r in hist}


def radius_join(
    targets: DataFrame,
    sources: DataFrame,
    radius: float,
    *,
    t_id: str = "row_id",
    s_id: str = "row_id",
    t_coords: Tuple[str, str] = ("x", "y"),
    s_coords: Tuple[str, str] = ("x", "y"),
    t_carry: Sequence[str] = (),
    s_carry: Sequence[str] = (),
    exclude_same_id: bool = False,
    salt_threshold: Optional[int] = 200_000,
) -> DataFrame:
    """All (target, source) pairs with euclidean distance ≤ radius.

    Exact: the ring count covers the ball by construction.
    """
    t = _prefixed(targets, "t_", t_coords, t_id, t_carry)
    s = _prefixed(sources, "s_", s_coords, s_id, s_carry)
    tx, ty = (f"t_{c}" for c in t_coords)
    sx, sy = (f"s_{c}" for c in s_coords)

    x0, y0, x1, y1, n_t, n_s = _union_bounds_and_counts(t, (tx, ty), s, (sx, sy))
    res = C.pick_resolution(x0, y0, x1, y1, radius)
    grid = C.CellGrid(x0, y0, x1, y1, res)
    k = grid.rings_needed(radius)

    s_cells = C.with_cell(s, grid, x=sx, y=sy, out="_cell")
    t_cells = C.kring_exploded(t, grid, k, x=tx, y=ty, out="_cell")

    # salting only pays when a single cell CAN exceed the threshold
    thr = salt_threshold if (salt_threshold and n_s > salt_threshold) else None
    joined = _salted_cell_join(t_cells, s_cells, thr)
    d = _dist_expr(F.col(tx), F.col(ty), F.col(sx), F.col(sy))
    out = joined.withColumn("dist", d).filter(F.col("dist") <= F.lit(float(radius))).drop("_cell")
    if exclude_same_id:
        out = out.filter(F.col(f"t_{t_id}") != F.col(f"s_{s_id}"))
    return out


def _salted_cell_join(t_cells: DataFrame, s_cells: DataFrame, salt_threshold: Optional[int]) -> DataFrame:
    """Equi-join on `_cell`, optionally salting cells whose source count
    exceeds the threshold: hot source rows get shard = s_id % n, hot target
    rows explode all shards (a broadcast map keeps this a single pass)."""
    if not salt_threshold:
        return t_cells.join(s_cells, "_cell")
    hot = _hot_cells(s_cells, salt_threshold)
    if not hot:
        return t_cells.join(s_cells, "_cell")
    spark = t_cells.sparkSession
    hot_df = F.broadcast(
        spark.createDataFrame([(c, n) for c, n in hot.items()], "_cell long, _nshard int")
    )
    s2 = (
        s_cells.join(hot_df, "_cell", "left")
        .withColumn(
            "_salt",
            F.when(F.col("_nshard").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64(*[c for c in s_cells.columns if c != "_cell"][:1]), F.col("_nshard")).cast("int")
            ),
        )
        .drop("_nshard")
    )
    t2 = (
        t_cells.join(hot_df, "_cell", "left")
        .withColumn("_nshard", F.coalesce(F.col("_nshard"), F.lit(1)))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_nshard") - 1)))
        .drop("_nshard")
    )
    return t2.join(s2, ["_cell", "_salt"]).drop("_salt")


def _broadcast_knn(
    t: DataFrame,
    s: DataFrame,
    k: int,
    tid: str,
    sid: str,
    tx: str,
    ty: str,
    sx: str,
    sy: str,
    exclude_same_id: bool,
    max_radius,
) -> DataFrame:
    """Small-source fast path: the reference's in-memory KD-tree analogue.

    Sources (≤ broadcast threshold) are collected once and shipped in the
    UDF closure; each Arrow batch of targets computes exact kNN with one
    numpy distance matrix + argpartition.  One narrow pass over the targets:
    no shuffle, no window, no driver round-trips per round."""
    import pandas as pd
    from typing import Iterator

    spdf = s.toPandas()
    S = spdf[[sx, sy]].to_numpy(dtype=float)
    s_ids = spdf[sid].to_numpy()
    # deterministic tie-break pre-sort: stable argpartition order by id later
    s_cols = {c: spdf[c].to_numpy() for c in spdf.columns}
    n_s = len(spdf)
    kk = min(k, n_s)

    t_fields = t.schema.fields
    s_fields = s.schema.fields

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            T = pdf[[tx, ty]].to_numpy(dtype=float)
            d = np.sqrt(
                ((T[:, None, :] - S[None, :, :]) ** 2).sum(-1)
            )  # (n_t, n_s)
            if exclude_same_id:
                same = pdf[tid].to_numpy()[:, None] == s_ids[None, :]
                d = np.where(same, np.inf, d)
            if max_radius is not None:
                d = np.where(d <= float(max_radius), d, np.inf)
            # top-k with (dist, s_id) tie-break via lexsort keys
            order = np.lexsort((np.broadcast_to(s_ids, d.shape), d), axis=1)[:, :kk]
            n_t = len(pdf)
            dd = np.take_along_axis(d, order, axis=1)  # (n_t, kk) sorted
            valid = np.isfinite(dd)
            counts = valid.sum(axis=1)
            total = int(counts.sum())
            if total == 0:
                continue
            rep_idx = np.repeat(np.arange(n_t), counts)
            flat_sel = order[valid]
            block = {c: pdf[c].to_numpy()[rep_idx] for c in pdf.columns}
            for c in s_cols:
                block[c] = s_cols[c][flat_sel]
            block["dist"] = dd[valid]
            starts = np.cumsum(counts) - counts
            block["rank"] = (np.arange(total) - np.repeat(starts, counts) + 1).astype(np.int32)
            yield pd.DataFrame(block)

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in t_fields)
        + ", "
        + ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in s_fields)
        + ", dist double, rank int"
    )
    return t.mapInPandas(run, schema)


def knn_join(
    targets: DataFrame,
    sources: DataFrame,
    k: int,
    *,
    t_id: str = "row_id",
    s_id: str = "row_id",
    t_coords: Tuple[str, str] = ("x", "y"),
    s_coords: Tuple[str, str] = ("x", "y"),
    t_carry: Sequence[str] = (),
    s_carry: Sequence[str] = (),
    exclude_same_id: bool = False,
    max_radius: Optional[float] = None,
    rows_per_cell: Optional[int] = None,
    salt_threshold: Optional[int] = 200_000,
    max_rounds: int = 8,
    broadcast_threshold: int = 20_000,
) -> DataFrame:
    """Exact k-nearest-neighbors join (≤ k when fewer sources qualify).

    Returns ``t_*``, ``s_*``, ``dist``, ``rank`` (1-based, rank ≤ k).
    With ``max_radius`` it is the reference's `KBallSearch` (k nearest within
    a ball, src/interpneighbors.jl:72-84); targets with no qualifying source
    are absent from the output (consumers left-join to keep them).

    Physical strategy selection (the engine's §3.1-step-3 dispatch):
    * sources ≤ broadcast_threshold → `_broadcast_knn` (one narrow pass);
    * otherwise → cell-ring candidate join with driver-looped exact
      ring expansion and optional hot-cell salting.
    """
    t = _prefixed(targets, "t_", t_coords, t_id, t_carry)
    s = _prefixed(sources, "s_", s_coords, s_id, s_carry)
    tx, ty = (f"t_{c}" for c in t_coords)
    sx, sy = (f"s_{c}" for c in s_coords)
    tid, sid = f"t_{t_id}", f"s_{s_id}"

    x0, y0, x1, y1, n_targets, n_sources = _union_bounds_and_counts(t, (tx, ty), s, (sx, sy))
    if n_sources == 0:
        raise ValueError("knn_join: empty source side")
    if n_sources <= broadcast_threshold:
        return _broadcast_knn(
            t, s, k, tid, sid, tx, ty, sx, sy, exclude_same_id, max_radius
        )
    res = C.pick_resolution_by_count(n_sources, rows_per_cell or max(4, k))
    if max_radius is not None:
        # never finer than the ball: keeps the ring count for the radius bound small
        res = min(res, C.pick_resolution(x0, y0, x1, y1, max_radius))
    grid = C.CellGrid(x0, y0, x1, y1, res)
    diag = math.hypot(x1 - x0, y1 - y0)
    thr = salt_threshold if (salt_threshold and n_sources > salt_threshold) else None

    s_cells = C.with_cell(s, grid, x=sx, y=sy, out="_cell").persist()
    w = Window.partitionBy(tid).orderBy(F.col("dist"), F.col(sid))

    remaining = t
    n_remaining = n_targets
    # geometric ring schedule (×4): every round is one driver action, and the
    # candidate volume per round stays bounded because each round settles the
    # targets whose k-th neighbor is provably inside the searched ring —
    # by the time rings get large, few targets remain to explode them
    full_ring = int(math.ceil(diag / grid.min_cell_edge)) + 1
    schedule = []
    r = 1
    while r < full_ring and len(schedule) < max_rounds - 1:
        schedule.append(r)
        r *= 4
    schedule.append(full_ring)
    if max_radius is not None:
        cap = grid.rings_needed(max_radius)
        schedule = sorted({min(rr, cap) for rr in schedule})
    pieces = []
    for ring in schedule:
        t_cells = C.kring_exploded(remaining, grid, ring, x=tx, y=ty, out="_cell")
        cand = _salted_cell_join(t_cells, s_cells, thr)
        cand = cand.withColumn("dist", _dist_expr(F.col(tx), F.col(ty), F.col(sx), F.col(sy)))
        if max_radius is not None:
            cand = cand.filter(F.col("dist") <= F.lit(float(max_radius)))
        if exclude_same_id:
            cand = cand.filter(F.col(tid) != F.col(sid))
        if k == 1:
            # 1-NN: hash aggregate with partial (map-side) combine instead of
            # a window sort — min(struct(dist, s_id, payload)) per target
            other = [c for c in cand.columns if c not in (tid, "dist", sid, "_cell")]
            packed = cand.groupBy(tid).agg(
                F.min(
                    F.struct(F.col("dist"), F.col(sid), *[F.col(c) for c in other])
                ).alias("_b")
            )
            ranked = packed.select(
                tid,
                F.col(f"_b.{sid}").alias(sid),
                F.col("_b.dist").alias("dist"),
                *[F.col(f"_b.{c}").alias(c) for c in other],
                F.lit(1).alias("rank"),
            )
        else:
            ranked = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .drop("_cell")
            )

        guaranteed = ring * grid.min_cell_edge
        covers_all = guaranteed >= diag or (max_radius is not None and guaranteed >= max_radius)
        if covers_all:
            pieces.append(ranked)
            remaining = None
            break

        ranked = ranked.persist()
        stats = ranked.groupBy(tid).agg(F.max("dist").alias("_kth"), F.count("*").alias("_cnt"))
        settled_ids = stats.filter(
            (F.col("_cnt") >= k) & (F.col("_kth") <= F.lit(guaranteed))
        ).select(tid).persist()
        # the round's ONLY driver action: how many targets settled
        n_settled = settled_ids.count()
        pieces.append(ranked.join(settled_ids, tid, "left_semi"))
        n_remaining -= n_settled
        if n_remaining <= 0:
            remaining = None
            break
        settled_alias = settled_ids.select(F.col(tid).alias("_settled_id"))
        remaining = remaining.join(
            settled_alias, remaining[tid] == settled_alias["_settled_id"], "left_anti"
        )

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # Unpersisting is safe (lineage recomputes deterministically: the rank
    # window has a total-order tie-break); we keep the final round's ranked
    # pieces cached since consumers typically aggregate them immediately.
    s_cells.unpersist()
    return out
