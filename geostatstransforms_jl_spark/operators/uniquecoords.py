"""UniqueCoords — dedup rows sharing exact coordinates, aggregating attributes.

Reference semantics (src/uniquecoords.jl:24-84):
* rows group by **exact coordinate equality** (hash + full collision
  resolution, src/uniquecoords.jl:98-185).  Spark's hash aggregate is already
  exact on the raw double bits, so the collision pass disappears (P5);
  we never round coordinates.
* each group keeps the **first occurrence's geometry** (`view(dom, ginds)`
  where ginds is the first index per group) — we keep the minimum ``row_id``
  and the coordinates are the group key itself.
* attributes aggregate with the default mean/first policy or user overrides
  (P6; tested in reference test/uniquecoords.jl:43-94).
* a Grid domain is a no-op — grid cells are unique by construction
  (src/uniquecoords.jl:83); the planner short-circuits.

Physical plan: one Catalyst hash aggregate (partial + final) keyed on the
coordinate columns.  Skewed hot coordinates are exactly the case Spark's
map-side partial aggregation already collapses, so no salting is needed here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.aggregates import (
    AggLike,
    dict_decode,
    dict_encode_strings,
    grouped_agg,
    resolve_aggs,
)
from ..core.geotable import GeoTable, GridDomain, PointDomain


def unique_coords_df(
    df: DataFrame,
    coord_cols=("x", "y"),
    overrides: Optional[Mapping[str, AggLike]] = None,
    row_id: str = "row_id",
    dict_encode: bool = True,
) -> DataFrame:
    value_cols = [c for c in df.columns if c not in set(coord_cols) | {row_id}]
    # keep the dedup a pure HASH aggregate even with string first/last columns
    # (see core.aggregates.dict_encode_strings for the plan rationale)
    decode = {}
    if dict_encode:
        df, decode = dict_encode_strings(df, value_cols, overrides)
    aggs, pandas_cols = resolve_aggs(df, value_cols, dict(overrides or {}), order_col=row_id)
    exprs = {row_id: F.min(row_id).alias(row_id), **aggs}
    out = grouped_agg(df, list(coord_cols), exprs, pandas_cols)
    out = dict_decode(out, decode)
    return out.select(*coord_cols, row_id, *value_cols)


@dataclass
class UniqueCoords:
    """`UniqueCoords(overrides={'a': 'last', 'b': 'max'})`"""

    overrides: Optional[Mapping[str, AggLike]] = None

    def apply(self, gt: GeoTable):
        if isinstance(gt.domain, GridDomain):
            return gt, None  # short-circuit no-op (src/uniquecoords.jl:83)
        assert isinstance(gt.domain, PointDomain)
        out = unique_coords_df(gt.df, gt.domain.coord_cols, self.overrides, gt.row_id)
        return gt.with_df(out), None

    __call__ = apply
