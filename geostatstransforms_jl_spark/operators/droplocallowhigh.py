"""DropLocalLowHigh — drop rows whose continuous values are local outliers.

Reference semantics (src/droplocallowhigh.jl:23-72): for each row, gather all
rows within `radius` (a BallSearch — the row itself included), compute the
exact `[low, high]` quantiles of each continuous column over the non-missing
neighborhood values, and drop the row if its own (non-missing) value falls
outside the interval for ANY column.  Missing center values never cause a
drop.  Aliases: DropLocalLow = (low, 1.0); DropLocalHigh = (0.0, high)
(src/droplocallowhigh.jl:81,90).

Spark plan: cell-ring radius self-join (functions/knn.py) → one hash
aggregate per center computing `percentile(col, array(low, high))` (Spark's
`percentile` is the exact sort-based type-7 interpolation, same as Julia's
`quantile` — verified in tests; primitive P8) → derive the drop predicate →
`left_anti` join back.  No pandas UDFs anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.aggregates import scitype_of
from ..core.geotable import GeoTable, PointDomain
from ..functions.knn import radius_join


def drop_local_low_high_df(
    df: DataFrame,
    radius: float,
    low: float = 0.25,
    high: float = 0.75,
    coord_cols=("x", "y"),
    row_id: str = "row_id",
    value_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    if not (0.0 <= low <= high <= 1.0):
        raise ValueError("invalid percentiles")
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cont = [
        c
        for c in (value_cols or df.columns)
        if c not in {*coord_cols, row_id} and scitype_of(dtypes[c]) == "continuous"
    ]
    if not cont:
        return df

    pairs = radius_join(
        df.select(row_id, *coord_cols, *cont),
        df.select(row_id, *coord_cols, *cont),
        radius,
        t_id=row_id,
        s_id=row_id,
        t_coords=tuple(coord_cols),
        s_coords=tuple(coord_cols),
        t_carry=cont,
        s_carry=cont,
    )
    tid = f"t_{row_id}"
    aggs = []
    for c in cont:
        aggs.append(
            F.percentile(F.col(f"s_{c}"), F.array(F.lit(float(low)), F.lit(float(high)))).alias(f"_lh_{c}")
        )
        aggs.append(F.first(F.col(f"t_{c}")).alias(f"_v_{c}"))
    stats = pairs.groupBy(tid).agg(*aggs)
    out_cond = F.lit(False)
    for c in cont:
        v = F.col(f"_v_{c}")
        l = F.col(f"_lh_{c}")[0]
        h = F.col(f"_lh_{c}")[1]
        out_cond = out_cond | (v.isNotNull() & ((v < l) | (v > h)))
    drop_ids = stats.filter(out_cond).select(F.col(tid).alias("_drop_id"))
    return df.join(drop_ids, df[row_id] == drop_ids["_drop_id"], "left_anti")


@dataclass
class DropLocalLowHigh:
    radius: float
    low: float = 0.25
    high: float = 0.75

    def apply(self, gt: GeoTable):
        assert isinstance(gt.domain, PointDomain)
        out = drop_local_low_high_df(
            gt.df, self.radius, self.low, self.high, gt.domain.coord_cols, gt.row_id
        )
        return gt.with_df(out), None

    __call__ = apply


def DropLocalLow(radius: float, low: float = 0.25) -> DropLocalLowHigh:
    return DropLocalLowHigh(radius, low=low, high=1.0)


def DropLocalHigh(radius: float, high: float = 0.75) -> DropLocalLowHigh:
    return DropLocalLowHigh(radius, low=0.0, high=high)
