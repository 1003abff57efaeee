"""Point-in-polygon spatial join — the engine's geofence/tile-assignment
primitive (the north-star "spatial-join + tile-assignment" core; the
reference expresses the same containment semantics through its geometric
predicates when Rasterize scatters polygons onto grids,
src/rasterize.jl:55-61 — this operator is the join form of that test:
arbitrary points × arbitrary polygons → containment pairs).

Semantics: even-odd (ray-crossing) containment, identical to the
rasterizer's scanline rule (`rasterize.py:_polygon_cells`): a point P is
inside iff a ray from P toward +x crosses an odd number of polygon edges,
with the half-open vertex rule ``(ay > py) != (by > py)`` so shared
vertices/edges never double-count.

Spark plan — three stages, all pure Catalyst (no Python UDF anywhere, one
shuffle, whole-stage codegen end-to-end):

1. **Candidate cells** per polygon: the polygon's bbox cells on `meta`
   (a conservative superset of every cell that can contain an inside
   point), via `sequence` + `explode` on ranges derived with
   `array_min`/`array_max` over the flattened rings.  Points map to their
   cell with two `floor` expressions.
2. **Cell equi-join** points × polygon-cells on (i, j) — the polygon side
   is broadcast when small (the common case: dims ≪ facts), otherwise a
   hash join on the cell key; AQE's skew-join handles hot cells.
3. **Exact even-odd test** as expressions: close each ring
   (`concat` + `slice`), pair consecutive vertices into edges
   (`arrays_zip(slice(r, 1, n-1), slice(r, 2, n-1))`), explode, filter the
   crossing condition, and keep (point, polygon) pairs with an odd
   crossing count — one hash aggregate.

100-TB notes: candidate volume = Σ_cell points(cell) × polygons(cell); the
caller controls it through `meta`'s resolution (cells ≈ polygon bbox size
keeps candidates ≈ |points ∩ bboxes|).  The polygon side is re-read in
stage 3 by geom_id join — broadcast both times when it fits (default).
`meta` must cover the union of both extents: candidates are clipped to the
grid, so geometry outside it is never matched (asserted against the
polygon bboxes when `check_extent`).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.grid import GridMeta


def _edges_df(geoms: DataFrame, geom_id: str) -> DataFrame:
    """(geom_id, rings) → exploded (geom_id, ax, ay, bx, by) edges with
    horizontal edges dropped (they never satisfy the crossing rule)."""
    ring = F.col("ring")
    n = F.size(ring)
    closed = F.when(
        (F.element_at(ring, 1)["x"] == F.element_at(ring, -1)["x"])
        & (F.element_at(ring, 1)["y"] == F.element_at(ring, -1)["y"]),
        ring,
    ).otherwise(F.concat(ring, F.array(F.element_at(ring, 1))))
    out = (
        geoms.select(geom_id, F.explode("rings").alias("ring"))
        .withColumn("ring", closed)
        .select(
            geom_id,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ring"), 1, F.size("ring") - 1).alias("a"),
                    F.slice(F.col("ring"), 2, F.size("ring") - 1).alias("b"),
                )
            ).alias("e"),
        )
        .select(
            geom_id,
            F.col("e.a.x").alias("ax"),
            F.col("e.a.y").alias("ay"),
            F.col("e.b.x").alias("bx"),
            F.col("e.b.y").alias("by"),
        )
        .filter(F.col("ay") != F.col("by"))
    )
    return out


def pip_join(
    points: DataFrame,
    geoms: DataFrame,
    meta: GridMeta,
    point_id: str = "row_id",
    geom_id: str = "geom_id",
    coords: Sequence[str] = ("x", "y"),
    broadcast_geoms: Optional[bool] = None,
    geom_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """points (point_id, x, y) × geoms (geom_id, rings) → (point_id,
    geom_id) even-odd containment pairs.

    `rings`: array<array<struct<x double, y double>>> — outer ring plus
    holes, even-odd combined (a point inside a hole is outside, because
    hole edges add crossings), exactly like the rasterizer.
    `broadcast_geoms`: force/forbid broadcasting the polygon side; default
    auto.  The auto decision sizes what is ACTUALLY broadcast — the
    bbox-cell-exploded `gcells` (one row per polygon per covered cell) and
    the per-vertex `edges` — not the raw polygon count: a million polygons
    spanning hundreds of cells each would be a multi-GB broadcast long
    before any polygon-count threshold trips.  Both estimated row counts
    must stay under `geom_broadcast_threshold` (default 2M rows ≈ 64 MB for
    cells, ≈ 96 MB for edges — comfortable executor/driver headroom); the
    estimate is ONE cheap aggregate over the polygon table.
    """
    px, py = coords

    flat = F.flatten(F.col("rings"))
    xs = F.transform(flat, lambda p: p["x"])
    ys = F.transform(flat, lambda p: p["y"])
    bbox = geoms.select(
        geom_id,
        F.greatest(
            F.lit(0),
            F.floor((F.array_min(xs) - F.lit(meta.ox)) / F.lit(meta.sx)).cast("int"),
        ).alias("i_lo"),
        F.least(
            F.lit(meta.nx - 1),
            F.floor((F.array_max(xs) - F.lit(meta.ox)) / F.lit(meta.sx)).cast("int"),
        ).alias("i_hi"),
        F.greatest(
            F.lit(0),
            F.floor((F.array_min(ys) - F.lit(meta.oy)) / F.lit(meta.sy)).cast("int"),
        ).alias("j_lo"),
        F.least(
            F.lit(meta.ny - 1),
            F.floor((F.array_max(ys) - F.lit(meta.oy)) / F.lit(meta.sy)).cast("int"),
        ).alias("j_hi"),
        F.size(flat).alias("_nv"),
    )
    if broadcast_geoms is None:
        # the estimate's .first() materializes the full bbox pipeline
        # (flatten + per-vertex min/max over every ring) — persist so the
        # estimate and the join's gcells share one computation, then
        # unpersist immediately after the estimate: explicit persists are
        # NOT released by memory-pressure LRU (only unpersist()/session
        # end drops the disk copies), so leaving it pinned would leak one
        # bbox cache per pip_join call in a long-lived session.  gcells may
        # recompute the projection — one narrow pass over the polygon
        # table, cheaper than pinned storage at call volume.
        from pyspark import StorageLevel

        bbox = bbox.persist(StorageLevel.MEMORY_AND_DISK)
        est = bbox.agg(
            F.sum(
                F.greatest(F.lit(0).cast("long"), (F.col("i_hi") - F.col("i_lo") + 1).cast("long"))
                * F.greatest(F.lit(0).cast("long"), (F.col("j_hi") - F.col("j_lo") + 1).cast("long"))
            ).alias("cells"),
            F.sum("_nv").alias("verts"),
        ).first()
        broadcast_geoms = (
            (est["cells"] or 0) <= geom_broadcast_threshold
            and (est["verts"] or 0) <= geom_broadcast_threshold
        )
        bbox.unpersist(blocking=False)
    gcells = bbox.filter(
        (F.col("i_lo") <= F.col("i_hi")) & (F.col("j_lo") <= F.col("j_hi"))
    ).select(
        geom_id,
        F.explode(F.sequence("i_lo", "i_hi")).alias("i"),
        "j_lo",
        "j_hi",
    ).select(
        geom_id, "i", F.explode(F.sequence("j_lo", "j_hi")).alias("j")
    )

    if broadcast_geoms:
        gcells = F.broadcast(gcells)
    else:
        # pin the decision: with bbox cached, Catalyst sees exact (tiny)
        # stats for the PRE-explode relation and would happily auto-broadcast
        # the exploded gcells — the very driver-OOM hazard the exploded-volume
        # estimate exists to veto.  shuffle_hash (not merge): the points side
        # is the huge one and SHJ never sorts it; the per-partition hash is
        # built over gcells/edges, whose per-partition share (total / shuffle
        # partitions) is executor-memory-sized exactly because the broadcast
        # veto fired on the TOTAL.
        gcells = gcells.hint("shuffle_hash")

    pcells = points.select(
        point_id,
        F.col(px).alias("_px"),
        F.col(py).alias("_py"),
        F.floor((F.col(px) - F.lit(meta.ox)) / F.lit(meta.sx)).cast("int").alias("i"),
        F.floor((F.col(py) - F.lit(meta.oy)) / F.lit(meta.sy)).cast("int").alias("j"),
    ).filter(
        (F.col("i") >= 0) & (F.col("i") < meta.nx)
        & (F.col("j") >= 0) & (F.col("j") < meta.ny)
    )

    cand = pcells.join(gcells, ["i", "j"]).select(point_id, geom_id, "_px", "_py")

    edges = _edges_df(geoms, geom_id)
    if broadcast_geoms:
        edges = F.broadcast(edges)
    else:
        edges = edges.hint("shuffle_hash")

    # ray toward +x; crossing x = ax + (py-ay)(bx-ax)/(by-ay)
    crossing = (
        ((F.col("ay") > F.col("_py")) != (F.col("by") > F.col("_py")))
        & (
            F.col("_px")
            < F.col("ax")
            + (F.col("_py") - F.col("ay"))
            * (F.col("bx") - F.col("ax"))
            / (F.col("by") - F.col("ay"))
        )
    )
    inside = (
        cand.join(edges, geom_id)
        .filter(crossing)
        .groupBy(point_id, geom_id)
        .agg(F.count(F.lit(1)).alias("_crossings"))
        .filter(F.col("_crossings") % 2 == 1)
        .select(point_id, geom_id)
    )
    return inside
