"""Transfer — copy each target element's value from its nearest source.

Reference semantics (src/transfer.jl:23-91):
* **grid fast path** (src/transfer.jl:57-76): aligned grids where the target
  dims are integer multiples of the source dims → block replication; when the
  factors don't divide it *falls back* to kNN (src/transfer.jl:60-63).
* **general path** (src/transfer.jl:78-91): each target element takes the
  value of its 1-nearest source element.

Physical plans: replication = the Downscale explode (narrow, no shuffle);
general = 1-NN cell-ring join (functions/knn.py) then project source values —
the join is an equi-join on cell keys so Catalyst/AQE pick broadcast vs
shuffle by size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids
from ..core.grid import GridMeta
from ..functions.knn import knn_join
from .downscale import downscale_df


def transfer_to_points_df(
    sources: DataFrame,
    targets: DataFrame,
    s_coords=("x", "y"),
    t_coords=("x", "y"),
    t_id: str = "row_id",
    row_id: str = "row_id",
) -> DataFrame:
    """General path: 1-NN source for every target; project source values."""
    value_cols = [c for c in sources.columns if c not in set(s_coords) | {row_id}]
    nn = knn_join(
        targets,
        sources,
        k=1,
        t_id=t_id,
        s_id=row_id,
        t_coords=t_coords,
        s_coords=s_coords,
        s_carry=value_cols,
    )
    picked = nn.select(
        F.col(f"t_{t_id}").alias("_tgt"), *[F.col(f"s_{c}").alias(c) for c in value_cols]
    )
    return targets.join(picked, targets[t_id] == picked["_tgt"], "left").drop("_tgt")


@dataclass
class Transfer:
    target: Union[GridMeta, GeoTable, DataFrame]

    def apply(self, gt: GeoTable):
        tgt = self.target
        d = gt.domain
        if isinstance(tgt, GridMeta) and isinstance(d, GridDomain):
            s, t = d.meta, tgt
            if s.aligned_with(t) and t.nx % s.nx == 0 and t.ny % s.ny == 0 and t.nx // s.nx >= 1:
                out = downscale_df(gt.df, t.nx // s.nx, t.ny // s.ny, d.index_cols, row_id=gt.row_id)
                ic, jc = d.index_cols
                out = out.withColumn(gt.row_id, (F.col(ic) + F.col(jc) * F.lit(t.nx)).cast("long"))
                return gt.with_df(out, GridDomain(t, d.index_cols, d.tile_col)), None
        # general path on centroids
        if isinstance(d, GridDomain):
            src = grid_centroids(gt).drop(*[c for c in d.index_cols])
            if d.tile_col:
                src = src.drop(d.tile_col)
            s_coords = ("x", "y")
        else:
            assert isinstance(d, PointDomain)
            src = gt.df
            s_coords = d.coord_cols
        if isinstance(tgt, GridMeta):
            spark = gt.df.sparkSession
            from ..core.geotable import full_grid

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
        out = transfer_to_points_df(src, tdf, s_coords=s_coords, row_id=gt.row_id)
        if isinstance(tdomain, GridDomain):
            out = out.drop("x", "y")
        return GeoTable(out, tdomain, row_id=gt.row_id), None

    __call__ = apply
