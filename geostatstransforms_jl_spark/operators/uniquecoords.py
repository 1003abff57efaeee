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

from ..core.aggregates import AggLike, grouped_agg, resolve_aggs
from ..core.geotable import GeoTable, GridDomain, PointDomain


MAX_DICT = 1 << 16


def unique_coords_df(
    df: DataFrame,
    coord_cols=("x", "y"),
    overrides: Optional[Mapping[str, AggLike]] = None,
    row_id: str = "row_id",
    dict_encode: bool = True,
) -> DataFrame:
    from pyspark.sql import types as T

    value_cols = [c for c in df.columns if c not in set(coord_cols) | {row_id}]

    # Dictionary-encode low-cardinality string columns that aggregate with
    # first/last: min_by over an int code keeps the WHOLE dedup inside one
    # Catalyst HASH aggregate (string buffers force the sort-based fallback —
    # a per-partition sort of every row, which is the dominant cost at scale).
    # One tiny distinct-collect per string column buys that back; columns
    # whose dictionary exceeds MAX_DICT stay strings on the sort path.
    decode = {}
    ov = dict(overrides or {})
    if dict_encode:
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        cands = []
        for c in value_cols:
            spec = ov.get(c, "first" if not isinstance(dtypes[c], (T.DoubleType, T.FloatType, T.DecimalType)) else "mean")
            if isinstance(dtypes[c], T.StringType) and spec in ("first", "last"):
                cands.append(c)
        if cands:
            # Two scans total, regardless of string-column count (a
            # per-column distinct().collect() would be one full scan per
            # column before the real job — lethal at 100 TB):
            #   1. one agg of approx_count_distinct over all candidates
            #      (tiny single-row output) to screen out high-cardinality
            #      columns before anything is collected to the driver;
            #   2. one agg of sort_array(collect_set(...)) for the survivors.
            acd = df.agg(
                *[F.approx_count_distinct(c).alias(c) for c in cands]
            ).first()
            # ~2% approximation error on HLL; keep headroom, then verify the
            # exact size after the collect_set and drop any that slipped by.
            cands = [c for c in cands if acd[c] <= int(MAX_DICT * 0.95)]
        if cands:
            sets = df.agg(
                *[F.sort_array(F.collect_set(c)).alias(c) for c in cands]
            ).first()
            for c in cands:
                vals = list(sets[c])
                if len(vals) > MAX_DICT:
                    continue
                code = F.map_from_arrays(
                    F.array(*[F.lit(v) for v in vals]),
                    F.array(*[F.lit(i) for i in range(len(vals))]),
                )
                df = df.withColumn(c, F.element_at(code, F.col(c)))
                decode[c] = F.array(*[F.lit(v) for v in vals])

    aggs, pandas_cols = resolve_aggs(df, value_cols, ov, order_col=row_id)
    exprs = {row_id: F.min(row_id).alias(row_id), **aggs}
    out = grouped_agg(df, list(coord_cols), exprs, pandas_cols)
    for c, arr in decode.items():
        out = out.withColumn(c, F.element_at(arr, F.col(c) + 1))
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
