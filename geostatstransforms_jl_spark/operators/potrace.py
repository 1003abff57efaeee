"""Potrace — raster → vector multi-polygons per mask color.

Reference semantics (src/potrace.jl:35-297): split the grid by the distinct
values ("colors") of a mask column; per color (a) aggregate the other columns
over that color's cells (P6 defaults), (b) trace the binary mask's boundary
into outer rings + hole rings with the Selinger-style edge walk — right turn
when both probe pixels are set, straight when only the leading pixel is set,
left turn otherwise *including the ambiguous cross pattern*
(src/potrace.jl:214-222) — recursing into holes for nested regions
(src/potrace.jl:160-183).  `revert` = Rasterize on the cached grid
(src/potrace.jl:136).

Ring vertices are grid corner points: the first vertex of the pixel edge
touched by the walking direction (src/potrace.jl:100-110) — pixel (i, j)
gives corner (i, j) heading →, (i+1, j) heading ↑, (i+1, j+1) heading ←,
(i, j+1) heading ↓ (the reference's `Boundary{2,0}` quad corner order).

Spark plan: the walk is inherently sequential *per connected component* but
independent across tiles and colors — a grouped `applyInPandas` keyed on the
tile column runs the numpy walk per tile; attribute aggregation is a separate
pure-Catalyst hash aggregate joined back on (tile, color).  At 10¹² rows the
tile key is the image id, so parallelism = number of images.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.aggregates import AggLike, grouped_agg, resolve_aggs
from ..core.geotable import GeoTable, GridDomain, RING_TYPE
from ..core.grid import GridMeta

# direction encoding: 0=→ 1=↑ 2=← 3=↓
_LEFT = [1, 2, 3, 0]
_RIGHT = [3, 0, 1, 2]
# vertex (corner offset of pixel ■) touched first by each direction
_CORNER = [(0, 0), (1, 0), (1, 1), (0, 1)]

POLYS_TYPE = T.ArrayType(RING_TYPE)


def _trace_path(M: np.ndarray):
    """Trace the top-left boundary path on padded mask M[i, j] (bool).

    Returns list of (□, dir, ■) with □/■ = (i, j) tuples into M."""
    ni, nj = M.shape
    start_pix = None
    for i in range(ni):
        js = np.flatnonzero(M[i])
        if js.size:
            start_pix = (i, int(js[0]))
            break
    assert start_pix is not None, "invalid input mask"
    sq = (start_pix[0], start_pix[1] - 1)  # □ (empty) left of first ■
    fl = start_pix  # ■

    def move(state):
        (qi, qj), d, (fi, fj) = state
        # step = rotate(■-□): (dj, -di)
        di, dj = fi - qi, fj - qj
        si, sj = dj, -di
        qs = (qi + si, qj + sj)
        fs = (fi + si, fj + sj)
        mq = M[qs]
        mf = M[fs]
        if mq and mf:
            return ((qi, qj), _RIGHT[d], qs)
        if (not mq) and mf:
            return (qs, d, fs)
        return (fs, _LEFT[d], (fi, fj))

    start = (sq, 0, fl)
    nxt = move(start)
    path = [start, nxt]
    while nxt != start:
        nxt = move(nxt)
        path.append(nxt)
    return path


def _inside_out(M: np.ndarray, path):
    """Flip mask values strictly inside the path (reference flood fill,
    src/potrace.jl:238-265)."""
    visited = np.zeros(M.shape, dtype=bool)
    for (q, d, f) in path:
        visited[q] = True
    frontier = [(q, f) for (q, d, f) in path]
    while frontier:
        q, f = frontier.pop()
        if not visited[f]:
            M[f] = not M[f]
            visited[f] = True
            di, dj = f[0] - q[0], f[1] - q[1]
            for nf in ((f[0] + di, f[1] + dj), (f[0] + dj, f[1] - di), (f[0] - dj, f[1] + di)):
                if not visited[nf]:
                    frontier.append((f, nf))


def _trace_recursion(M: np.ndarray):
    paths = []
    while M.any():
        outer = _trace_path(M)
        O = M.copy()
        _inside_out(M, outer)
        I = M & ~O
        M &= ~I
        if I.any():
            inners = _trace_recursion(I)
            paths.append((outer, inners))
        else:
            paths.append((outer, []))
    return paths


def _paths_to_polys(paths):
    """Tree of paths → list of (outer, [inners]) via the reference's BFS
    (src/potrace.jl:268-297): depth-0/2/4... paths are polygon outers, their
    direct children are holes."""
    polys = []

    def bfs(root):
        visited = []  # (outer_path, [hole outer paths])
        frontier = [root]
        while frontier:
            outer, children = frontier.pop(0)
            # a path already recorded as some polygon's hole is not a new
            # polygon itself; its children (islands inside the hole) are
            seen = any(any(outer is h for h in holes) for (_, holes) in visited)
            if not seen:
                visited.append((outer, [c[0] for c in children]))
            frontier.extend(children)
        return visited

    for root in paths:
        polys.extend(bfs(root))
    return polys


def _ring_coords(path, meta: GridMeta):
    """Path → ring vertex coordinates (drop the repeated final element)."""
    pts = []
    for (q, d, f) in path[:-1]:
        # unpad: pixel (i, j) of the tile is f - (1, 1)
        pi, pj = f[0] - 1, f[1] - 1
        ci, cj = _CORNER[d]
        pts.append(
            {"x": meta.ox + (pi + ci) * meta.sx, "y": meta.oy + (pj + cj) * meta.sy}
        )
    return pts


def _selinger_simplify(ring, eps: float):
    """Selinger-style ring simplification (the reference forwards ϵ to
    `SelingerSimplification`, src/potrace.jl:125-126; Selinger 2003 §2):
    keep the minimum number of original vertices such that every dropped
    vertex lies within ϵ of the segment replacing its chain.

    Per vertex, greedily find the longest admissible straight run; then the
    minimal cyclic interval cover, trying every admissible phase for the
    first breakpoint.  O(n·run) distance checks — rings are per-tile and
    small by construction."""
    n = len(ring)
    if n <= 4 or eps <= 0:
        return ring
    P = np.array([[p["x"], p["y"]] for p in ring], dtype=float)

    def admissible(i, j_off):
        """All vertices strictly between i and i+j_off within eps of the
        chord (cyclic indexing)."""
        a = P[i % n]
        b = P[(i + j_off) % n]
        ab = b - a
        L2 = ab @ ab
        for m in range(1, j_off):
            p = P[(i + m) % n]
            if L2 == 0.0:
                d = np.hypot(*(p - a))
            else:
                t = np.clip((p - a) @ ab / L2, 0.0, 1.0)
                d = np.hypot(*(p - a - t * ab))
            if d > eps:
                return False
        return True

    # longest admissible run per start (greedy to first failure; capped at
    # n-1 so a chord never wraps onto itself)
    run = np.ones(n, dtype=int)
    for i in range(n):
        L = 1
        while L < n - 1 and admissible(i, L + 1):
            L += 1
        run[i] = L

    best = None
    # every minimal cover has a breakpoint in [1, run[0]]'s reach of vertex 0:
    # try each phase, greedy-jump the cycle
    for s in range(0, int(run[0]) + 1):
        s0 = s % n
        kept = [s0]
        pos = s0
        covered = 0
        while covered < n:
            step = min(int(run[pos % n]), n - covered)
            pos += step
            covered += step
            kept.append(pos % n)
        if kept[-1] == kept[0]:
            kept = kept[:-1]
        if best is None or len(kept) < len(best):
            best = kept
    if len(best) < 3:
        return ring
    return [ring[i] for i in best]


def trace_mask(mask: np.ndarray, meta: GridMeta, epsilon: Optional[float] = None):
    """mask[i, j] bool → list of polygons, each a list of rings (outer first),
    each ring a list of {'x','y'} dicts.  With `epsilon`, rings are
    Selinger-simplified (lossy — the exact involution holds only without ϵ,
    like the reference)."""
    M = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
    M[1:-1, 1:-1] = mask
    paths = _trace_recursion(M)
    polys = _paths_to_polys(paths)
    out = [
        [_ring_coords(outer, meta)] + [_ring_coords(i, meta) for i in inners]
        for (outer, inners) in polys
    ]
    if epsilon is not None:
        out = [[_selinger_simplify(r, float(epsilon)) for r in poly] for poly in out]
    return out


def potrace_df(
    df: DataFrame,
    mask_col: str,
    meta: GridMeta,
    overrides: Optional[Mapping[str, AggLike]] = None,
    index_cols=("i", "j"),
    tile_col: Optional[str] = None,
    row_id: str = "row_id",
    epsilon: Optional[float] = None,
) -> DataFrame:
    """(tile?, i, j, mask, attrs...) → (tile?, mask, polys, aggregated attrs)."""
    ic, jc = index_cols
    keys = [tile_col] if tile_col else []
    value_cols = [c for c in df.columns if c not in {*keys, ic, jc, mask_col, row_id}]
    mask_dtype = df.schema[mask_col].dataType

    # (a) geometry tracing per tile
    out_fields = (
        ([T.StructField(tile_col, T.StringType())] if tile_col else [])
        + [T.StructField(mask_col, mask_dtype), T.StructField("polys", POLYS_TYPE)]
    )
    schema = T.StructType(out_fields)

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.empty((meta.nx, meta.ny), dtype=object)
        ii = pdf[ic].to_numpy()
        jj = pdf[jc].to_numpy()
        vals = pdf[mask_col].to_numpy()
        img[ii, jj] = vals
        # colors in first-occurrence column-major order (src/potrace.jl:81)
        flat = img.ravel(order="F")
        colors = list(dict.fromkeys(flat.tolist()))
        rows = []
        for color in colors:
            m = np.zeros(img.shape, dtype=bool)
            m[ii, jj] = vals == color
            polys = trace_mask(m, meta, epsilon)
            row = {mask_col: color, "polys": [[ [p for p in ring] for ring in poly] for poly in polys]}
            if tile_col:
                row[tile_col] = pdf[tile_col].iloc[0]
            rows.append(row)
        return pd.DataFrame(rows)

    sel = keys + [ic, jc, mask_col]
    if keys:
        traced = df.select(*sel).groupBy(*keys).applyInPandas(per_tile, schema)
    else:
        d = df.select(*sel).withColumn("_t", F.lit(0))
        traced = d.groupBy("_t").applyInPandas(
            lambda pdf: per_tile(pdf.drop(columns=["_t"])), schema
        )

    # (b) attribute aggregation per (tile, color) — pure Catalyst
    if value_cols:
        aggs, pcols = resolve_aggs(df, value_cols, overrides, order_col=row_id)
        stats = grouped_agg(df, keys + [mask_col], aggs, pcols)
        traced = traced.join(stats, keys + [mask_col], "left")
    return traced


@dataclass
class Potrace:
    mask_col: str
    overrides: Optional[Mapping[str, AggLike]] = None
    epsilon: Optional[float] = None  # reference's ϵ (Potrace(mask; ϵ))

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain), "potrace only defined for grid data"
        out = potrace_df(
            gt.df, self.mask_col, d.meta, self.overrides, d.index_cols, d.tile_col,
            gt.row_id, self.epsilon,
        )
        from ..core.geotable import GeomDomain

        return GeoTable(out, GeomDomain(kind_col=self.mask_col, rings_col="polys"), row_id=gt.row_id), d.meta

    def revert(self, gt: GeoTable, cache) -> GeoTable:
        """`revert(Potrace) = Rasterize` on the cached grid
        (src/potrace.jl:133-136): scatter every traced polygon back onto the
        original grid meta; each cell is covered by exactly one color's
        polygon (even-odd over outer+hole rings), so the original grid is
        recovered exactly (reference test/potrace.jl:14-21)."""
        from .rasterize import rasterize_df

        meta = cache
        df = gt.df
        vals = [c for c in df.columns if c != "polys"]
        # synthetic geometry id; NOT underscore-prefixed because pandas
        # itertuples (used by coverage_cells_df) mangles such names
        geoms = (
            df.select(*vals, F.explode("polys").alias("rings"))
            .withColumn("kind", F.lit("polygon"))
            .withColumn("revertgid", F.monotonically_increasing_id())
        )
        out, _mask = rasterize_df(
            geoms.select("revertgid", "kind", "rings", *vals),
            meta,
            row_id="revertgid",
        )
        return GeoTable(out, GridDomain(meta), row_id=gt.row_id)

    __call__ = apply
