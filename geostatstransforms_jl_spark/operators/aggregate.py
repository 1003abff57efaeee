"""Aggregate — aggregate source rows onto a target domain.

Reference semantics (src/aggregate.jl:26-115):
* **grid fast path** (src/aggregate.jl:64-73): when source and target are
  grids with equal extents and divisible dims, each target cell aggregates its
  (nx/tnx)×(ny/tny) source block — tiled iteration in the reference, integer
  block keys + hash aggregate here (no kNN, no UDF).
* **general path** (src/aggregate.jl:94-115): assign every source row to its
  1-nearest target element, then aggregate per target.  Target elements with
  no assigned sources yield NULL (the reference aggregates an empty group →
  missing).  We left-join the grouped result back onto the target domain to
  materialize those NULLs.

The plan-selection mirror of the reference's multiple dispatch lives in
`apply` — a cheap driver-side metadata check (§4 of SURVEY.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.aggregates import (
    AggLike,
    dict_decode,
    dict_encode_strings,
    grouped_agg,
    resolve_aggs,
)
from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids, full_grid
from ..core.grid import GridMeta
from ..functions.knn import knn_join
from .upscale import upscale_df


def aggregate_to_points_df(
    sources: DataFrame,
    targets: DataFrame,
    overrides: Optional[Mapping[str, AggLike]] = None,
    s_coords=("x", "y"),
    t_coords=("x", "y"),
    t_id: str = "row_id",
    row_id: str = "row_id",
) -> DataFrame:
    """General path: 1-NN assign sources→targets, group by target, left-join
    back so unmatched targets surface as NULLs."""
    value_cols = [c for c in sources.columns if c not in set(s_coords) | {row_id}]
    # dictionary-encode string first/last columns BEFORE the kNN join: the
    # grouped aggregate stays hash-based AND the join carries int codes
    # instead of strings (core.aggregates.dict_encode_strings)
    sources, decode = dict_encode_strings(sources, value_cols, overrides)
    # 1-NN of each *source* against the target set (roles flipped vs knn_join's
    # naming: here "targets" of the knn search are the Aggregate sources)
    nn = knn_join(
        sources,
        targets.select(t_id, *t_coords),
        k=1,
        t_id=row_id,
        s_id=t_id,
        t_coords=s_coords,
        s_coords=t_coords,
        t_carry=value_cols,
    )
    assigned = nn.select(
        F.col(f"s_{t_id}").alias("_tgt"), *[F.col(f"t_{c}").alias(c) for c in [row_id, *value_cols]]
    )
    aggs, pandas_cols = resolve_aggs(sources, value_cols, overrides, order_col=row_id)
    grouped = dict_decode(grouped_agg(assigned, ["_tgt"], aggs, pandas_cols), decode)
    out = targets.join(grouped, targets[t_id] == grouped["_tgt"], "left").drop("_tgt")
    return out


@dataclass
class Aggregate:
    """`Aggregate(target, overrides)`: target is a GridMeta (aligned raster) or
    a GeoTable/DataFrame of target points with columns (row_id, x, y)."""

    target: Union[GridMeta, GeoTable, DataFrame]
    overrides: Optional[Mapping[str, AggLike]] = None

    def apply(self, gt: GeoTable):
        tgt = self.target
        d = gt.domain
        if isinstance(tgt, GridMeta) and isinstance(d, GridDomain):
            s, t = d.meta, tgt
            if s.aligned_with(t) and s.divides(t):
                if s.nx // t.nx < 1 or s.ny // t.ny < 1:
                    raise ValueError("cannot aggregate a coarse grid over a fine grid")
                out = upscale_df(
                    gt.df, s.nx // t.nx, s.ny // t.ny, d.index_cols, d.tile_col,
                    self.overrides, row_id=gt.row_id,
                )
                return gt.with_df(out, GridDomain(t, d.index_cols, d.tile_col)), None
        # general path: work on centroids
        if isinstance(d, GridDomain):
            src = grid_centroids(gt)
            s_coords = ("x", "y")
        else:
            assert isinstance(d, PointDomain)
            src = gt.df
            s_coords = d.coord_cols
        if isinstance(tgt, GridMeta):
            spark = gt.df.sparkSession
            cells = full_grid(spark, tgt)
            tdf = cells.select(
                (F.col("i") + F.col("j") * F.lit(tgt.nx)).cast("long").alias("row_id"),
                "i",
                "j",
                (F.lit(tgt.ox) + (F.col("i") + F.lit(0.5)) * F.lit(tgt.sx)).alias("x"),
                (F.lit(tgt.oy) + (F.col("j") + F.lit(0.5)) * F.lit(tgt.sy)).alias("y"),
            )
            tdomain = GridDomain(tgt)
        else:
            tdf = tgt.df if isinstance(tgt, GeoTable) else tgt
            tdomain = tgt.domain if isinstance(tgt, GeoTable) else PointDomain(("x", "y"))
        drop_cols = [c for c in gt.df.columns if c in set(gt.domain_cols)]
        src_vals = src.drop(*[c for c in drop_cols if c not in s_coords and c in src.columns])
        out = aggregate_to_points_df(
            src_vals, tdf, self.overrides, s_coords=s_coords, row_id=gt.row_id
        )
        if isinstance(tdomain, GridDomain):
            out = out.drop("x", "y")
        return GeoTable(out, tdomain, row_id=gt.row_id), None

    __call__ = apply
