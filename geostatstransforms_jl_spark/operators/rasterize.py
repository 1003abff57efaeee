"""Rasterize — vector geometries → raster grid (reference: src/rasterize.jl).

Semantics (src/rasterize.jl:37-112):
* each geometry covers a set of grid cells (`indices(grid, geom)`):
  - point: the cell whose closed upper/right bound contains it —
    ``i = clamp(ceil((x-ox)/sx), 1, nx)`` (pinned by test/rasterize.jl:22-27
    where the on-boundary point (3, 9) lands in 1-based cell (3, 9));
  - segment: supercover line walk — every cell the segment touches,
    *including* corner touches (test/rasterize.jl:40: seg1 touches cell
    (10, 17) only at its corner (5.0, 8.5));
  - polygon: cells whose **center** lies inside (even-odd rule) — the overlap
    fixture's center test and the 0.5 m² area tolerance of the revert test
    both hold under cell-center coverage;
* cells covered by several geometries aggregate attributes (default
  mean/first, P6); uncovered cells are NULL rows;
* cache/mask = **last** covering geometry's index per cell
  (src/rasterize.jl:83 overwrites in iteration order) → `max(geom_ind)`;
* `revert` = Potrace(mask) ∘ Filter(mask>0) ∘ Reject(mask)
  (src/rasterize.jl:114-130).

Spark plan: coverage expansion happens in an Arrow-batched `mapInPandas`
(numpy scanline PIP / DDA per geometry → (row_id, i, j) triplets), then one
hash aggregate keyed on (i, j) with the P6 expressions + `max(row_id)` for
the mask, then a left join against the lazily generated full cell grid for
the NULL cells.  Hot cells (many overlapping geometries) are plain groupBy
skew — handled by partial aggregation + AQE, no salting needed since the agg
is associative.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Mapping, Optional, Tuple, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.aggregates import AggLike, grouped_agg, resolve_aggs
from ..core.geotable import GeoTable, GeomDomain, GridDomain, full_grid
from ..core.grid import GridMeta


def _point_cell(x: float, y: float, m: GridMeta) -> Tuple[int, int]:
    i = int(np.clip(np.ceil((x - m.ox) / m.sx), 1, m.nx)) - 1
    j = int(np.clip(np.ceil((y - m.oy) / m.sy), 1, m.ny)) - 1
    return i, j


def _segment_cells(x1, y1, x2, y2, m: GridMeta):
    """Supercover: all cells whose closed extent the segment touches."""
    cells = set()

    def add_point_cells(x, y):
        # all cells whose closed bounds contain (x, y) — up to 4 at corners
        fx = (x - m.ox) / m.sx
        fy = (y - m.oy) / m.sy
        ixs = {int(np.floor(fx)), int(np.ceil(fx)) - 1}
        iys = {int(np.floor(fy)), int(np.ceil(fy)) - 1}
        for i in ixs:
            for j in iys:
                if 0 <= i < m.nx and 0 <= j < m.ny:
                    cells.add((i, j))

    # crossing parameters with all grid lines
    ts = {0.0, 1.0}
    dx, dy = x2 - x1, y2 - y1
    if dx != 0:
        g_lo = int(np.floor((min(x1, x2) - m.ox) / m.sx))
        g_hi = int(np.ceil((max(x1, x2) - m.ox) / m.sx))
        for gi in range(max(0, g_lo), min(m.nx, g_hi) + 1):
            t = (m.ox + gi * m.sx - x1) / dx
            if 0.0 <= t <= 1.0:
                ts.add(t)
    if dy != 0:
        g_lo = int(np.floor((min(y1, y2) - m.oy) / m.sy))
        g_hi = int(np.ceil((max(y1, y2) - m.oy) / m.sy))
        for gj in range(max(0, g_lo), min(m.ny, g_hi) + 1):
            t = (m.oy + gj * m.sy - y1) / dy
            if 0.0 <= t <= 1.0:
                ts.add(t)
    ts = sorted(ts)
    # interval midpoints → interior cells
    for a, b in zip(ts[:-1], ts[1:]):
        tm = (a + b) / 2.0
        x, y = x1 + tm * dx, y1 + tm * dy
        i = int(np.floor((x - m.ox) / m.sx))
        j = int(np.floor((y - m.oy) / m.sy))
        if 0 <= i < m.nx and 0 <= j < m.ny:
            cells.add((i, j))
    # crossing/end points → touched (incl. corner) cells
    for t in ts:
        add_point_cells(x1 + t * dx, y1 + t * dy)
    return cells


def _polygon_cells(rings, m: GridMeta):
    """Cells whose center is inside the polygon (even-odd over all rings —
    outer ring + holes combined, matching even-odd semantics)."""
    xs = np.concatenate([[p[0] for p in ring] for ring in rings])
    ys = np.concatenate([[p[1] for p in ring] for ring in rings])
    j_lo = max(0, int(np.floor((ys.min() - m.oy) / m.sy - 0.5)))
    j_hi = min(m.ny - 1, int(np.ceil((ys.max() - m.oy) / m.sy)))
    edges = []
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts = pts + [pts[0]]
        for (ax, ay), (bx, by) in zip(pts[:-1], pts[1:]):
            if ay != by:
                edges.append((ax, ay, bx, by))
    out = []
    for j in range(j_lo, j_hi + 1):
        cy = m.oy + (j + 0.5) * m.sy
        xs_cross = []
        for ax, ay, bx, by in edges:
            if (ay > cy) != (by > cy):
                xs_cross.append(ax + (cy - ay) * (bx - ax) / (by - ay))
        if not xs_cross:
            continue
        xs_cross.sort()
        for a, b in zip(xs_cross[0::2], xs_cross[1::2]):
            # centers cx = ox + (i+0.5)sx in (a, b)
            i_lo = int(np.ceil((a - m.ox) / m.sx - 0.5))
            i_hi = int(np.floor((b - m.ox) / m.sx - 0.5))
            for i in range(max(0, i_lo), min(m.nx - 1, i_hi) + 1):
                out.append((i, j))
    return out


def coverage_cells_df(geoms: DataFrame, meta: GridMeta, geom_ind: str = "row_id") -> DataFrame:
    """(geom_ind, kind, rings) → exploded (geom_ind, i, j) coverage triplets."""

    import json

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, iis, jjs = [], [], []
            for r in pdf.itertuples(index=False):
                rings = [[(p["x"], p["y"]) for p in ring] for ring in json.loads(r.rings)]
                if r.kind == "point":
                    cov = [_point_cell(rings[0][0][0], rings[0][0][1], meta)]
                elif r.kind == "segment":
                    (x1, y1), (x2, y2) = rings[0][0], rings[0][1]
                    cov = sorted(_segment_cells(x1, y1, x2, y2, meta))
                elif r.kind == "polygon":
                    cov = _polygon_cells(rings, meta)
                else:
                    raise ValueError(f"unknown geometry kind {r.kind!r}")
                for (i, j) in cov:
                    ids.append(getattr(r, geom_ind))
                    iis.append(i)
                    jjs.append(j)
            yield pd.DataFrame({geom_ind: ids, "i": np.array(iis, dtype=np.int32), "j": np.array(jjs, dtype=np.int32)})

    # rings go through as JSON: pyspark's Arrow→pandas ndarray conversion
    # rejects ragged nested arrays when differently-shaped rows share a batch
    return geoms.select(
        geom_ind, "kind", F.to_json("rings").alias("rings")
    ).mapInPandas(run, f"{geom_ind} long, i int, j int")


def rasterize_df(
    geoms: DataFrame,
    meta: GridMeta,
    overrides: Optional[Mapping[str, AggLike]] = None,
    row_id: str = "row_id",
) -> Tuple[DataFrame, DataFrame]:
    """Returns (raster rows for ALL cells with NULLs where uncovered,
    mask cells (i, j, mask) — the revert cache)."""
    spark = geoms.sparkSession
    value_cols = [c for c in geoms.columns if c not in {row_id, "kind", "rings"}]
    cov = coverage_cells_df(geoms, meta, row_id)
    scattered = cov.join(geoms.select(row_id, *value_cols), row_id)
    aggs, pcols = resolve_aggs(geoms, value_cols, overrides, order_col=row_id)
    exprs = {"_mask": F.max(row_id).alias("_mask"), **aggs}
    agged = grouped_agg(scattered, ["i", "j"], exprs, pcols)
    cells = full_grid(spark, meta)
    out = cells.join(agged, ["i", "j"], "left")
    mask = out.select("i", "j", F.coalesce(F.col("_mask"), F.lit(0)).alias("mask"))
    return out.drop("_mask").select("i", "j", *value_cols), mask


@dataclass
class Rasterize:
    """`Rasterize(grid_or_dims, overrides)`; dims → grid over the bbox of the
    geometry set (src/rasterize.jl:58)."""

    grid: Union[GridMeta, Tuple[int, int]]
    overrides: Optional[Mapping[str, AggLike]] = None

    def apply(self, gt: GeoTable):
        assert isinstance(gt.domain, GeomDomain)
        meta = self.grid
        if not isinstance(meta, GridMeta):
            nx, ny = meta
            b = (
                gt.df.select(F.explode(F.flatten("rings")).alias("p"))
                .agg(
                    F.min("p.x").alias("x0"),
                    F.min("p.y").alias("y0"),
                    F.max("p.x").alias("x1"),
                    F.max("p.y").alias("y1"),
                )
                .first()
            )
            meta = GridMeta(
                nx, ny, b.x0, b.y0, (b.x1 - b.x0) / nx, (b.y1 - b.y0) / ny
            )
        out, mask = rasterize_df(gt.df, meta, self.overrides, gt.row_id)
        return GeoTable(out, GridDomain(meta), row_id=gt.row_id), mask

    def revert(self, gt: GeoTable, cache: DataFrame) -> GeoTable:
        """`revert(Rasterize) = Potrace(mask) ∘ Filter(mask > 0) ∘ Reject(mask)`
        (src/rasterize.jl:114-130): join the cached last-writer mask onto the
        raster, trace each surviving source index's region back into
        polygons with its per-cell attributes aggregated, drop the uncovered
        color 0, and recover the source index as row_id (the mask stores
        `max(row_id)` per cell, and row ids are ≥ 1 by ingest contract)."""
        from .potrace import potrace_df
        from ..core.geotable import GeomDomain

        d = gt.domain
        assert isinstance(d, GridDomain)
        ic, jc = d.index_cols
        # grid rows carry no row_id; aggregation order ("first"/"last") uses
        # the column-major linear cell index, matching the reference's
        # LinearIndices traversal
        df = gt.df.join(cache, list(d.index_cols)).withColumn(
            "_lin", F.col(jc).cast("long") * d.meta.nx + F.col(ic)
        )
        traced = potrace_df(
            df, "mask", d.meta, index_cols=d.index_cols,
            tile_col=d.tile_col, row_id="_lin",
        )
        out = (
            traced.filter(F.col("mask") > 0)
            .withColumn(gt.row_id, F.col("mask").cast("long"))
            .drop("mask")
        )
        return GeoTable(
            out, GeomDomain(kind_col=gt.row_id, rings_col="polys"), row_id=gt.row_id
        )

    __call__ = apply
