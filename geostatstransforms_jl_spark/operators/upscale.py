"""Upscale — coarsen a grid by integer factors, aggregating each block.

Reference semantics (src/upscale.jl:23-59): target grid dims = ceil(n/f) with
the same bounding box (ragged edge blocks allowed, test/upscale.jl:68-81);
values = default aggregation (mean/first) over each f₁×f₂ block; a single
trailing factor repeats to fill dims (`_fitdims`, src/utils.jl:6).

Physical plan: `groupBy(tile?, i div fx, j div fy).agg(...)` — pure Catalyst
hash aggregate with map-side partial agg; block keys are integer arithmetic in
codegen.  This is the plan that survives 100×: no UDF, no window, one shuffle
keyed on (tile, block), and AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.aggregates import (
    AggLike,
    dict_decode,
    dict_encode_strings,
    grouped_agg,
    resolve_aggs,
)
from ..core.geotable import GeoTable, GridDomain
from ..core.grid import fitdims


def upscale_df(
    df: DataFrame,
    fx: int,
    fy: int,
    index_cols: Tuple[str, str] = ("i", "j"),
    tile_col: Optional[str] = None,
    overrides: Optional[Mapping[str, AggLike]] = None,
    row_id: str = "row_id",
    dict_encode: bool = True,
) -> DataFrame:
    ic, jc = index_cols
    keys = ([tile_col] if tile_col else []) + [ic, jc]
    value_cols = [c for c in df.columns if c not in set(keys) | {row_id}]
    # string first/last would force SortAggregate over the FULL input grid —
    # dictionary-encode so the block aggregation stays hash-based (the same
    # trick unique_coords_df uses; core.aggregates.dict_encode_strings)
    decode = {}
    if dict_encode:
        df, decode = dict_encode_strings(df, value_cols, overrides)
    aggs, pandas_cols = resolve_aggs(df, value_cols, overrides, order_col=row_id)
    blocked = df.withColumn(ic, F.floor(F.col(ic) / fx).cast("int")).withColumn(
        jc, F.floor(F.col(jc) / fy).cast("int")
    )
    out = grouped_agg(blocked, keys, aggs, pandas_cols)
    out = dict_decode(out, decode)
    return out.select(*keys, *value_cols)


@dataclass
class Upscale:
    factors: Sequence[int]

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain), "Upscale requires a grid domain"
        fx, fy = fitdims(self.factors, 2)
        out = upscale_df(gt.df, fx, fy, d.index_cols, d.tile_col, row_id=gt.row_id)
        meta = d.meta.coarsen(fx, fy)
        return gt.with_df(out, GridDomain(meta, d.index_cols, d.tile_col)), None

    __call__ = apply
