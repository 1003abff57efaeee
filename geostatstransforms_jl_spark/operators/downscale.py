"""Downscale — refine a grid by integer factors, replicating each cell's value
into its f₁×f₂ block (reference: src/downscale.jl:19-55).

Physical plan: two lateral `explode(sequence(0, f-1))` generators — row count
multiplies by f₁·f₂ with **zero shuffle** (narrow dependency); Catalyst keeps
it inside one whole-stage-codegen span.  The per-tile `np.kron` alternative in
SURVEY.md §2 is strictly worse here (Arrow round-trip for a pure generate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain
from ..core.grid import fitdims


def downscale_df(
    df: DataFrame,
    fx: int,
    fy: int,
    index_cols: Tuple[str, str] = ("i", "j"),
    row_id: str = "row_id",
) -> DataFrame:
    ic, jc = index_cols
    d = df.withColumn("_dx", F.explode(F.sequence(F.lit(0), F.lit(fx - 1)))).withColumn(
        "_dy", F.explode(F.sequence(F.lit(0), F.lit(fy - 1)))
    )
    d = d.withColumn(ic, (F.col(ic) * fx + F.col("_dx")).cast("int")).withColumn(
        jc, (F.col(jc) * fy + F.col("_dy")).cast("int")
    )
    d = d.drop("_dx", "_dy")
    if row_id in df.columns:
        d = d.drop(row_id)
    return d


@dataclass
class Downscale:
    factors: Sequence[int]

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain), "Downscale requires a grid domain"
        fx, fy = fitdims(self.factors, 2)
        out = downscale_df(gt.df, fx, fy, d.index_cols, row_id=gt.row_id)
        meta = d.meta.refine(fx, fy)
        ic, jc = d.index_cols
        out = out.withColumn(gt.row_id, (F.col(ic) + F.col(jc) * F.lit(meta.nx)).cast("long"))
        return gt.with_df(out, GridDomain(meta, d.index_cols, d.tile_col)), None

    __call__ = apply
