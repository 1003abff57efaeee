"""Interpolate / InterpolateNeighbors — interpolation onto a target domain.

Reference semantics:
* `Interpolate` (src/interpolate.jl:35-58) fits the model on **all samples at
  once** (`neighbors=false`).  Spark plan: targets × broadcast(samples) — the
  sample side is small by the operator's own contract (the reference warns
  Kriging over all samples "can be prohibitive"), so the cross join broadcasts
  and never shuffles the target side; NN/IDW then reduce per target in one
  hash aggregate.
* `InterpolateNeighbors` (src/interpneighbors.jl:47-87) uses per-target local
  neighborhoods: ≤ maxneighbors nearest samples (kNN) and/or a MetricBall
  radius; targets with < minneighbors get NULL.  Spark plan: the cell-ring
  kNN join (functions/knn.py) + per-target reduction (SQL for NN/IDW, grouped
  pandas UDF for Kriging).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, full_grid
from ..core.grid import GridMeta
from ..functions.knn import knn_join
from ..functions.models import IDW, NN, Kriging, kriging_reduce


def _target_df(spark, tgt, row_id="row_id", ndim=None):
    """Normalize a target domain (GridMeta | GeoTable | DataFrame) to a point
    DataFrame plus the output GeoTable domain and its coordinate columns —
    dimension-generic like the reference (src/interpolate.jl:35-58).

    ``ndim`` (the SAMPLE dimensionality) disambiguates plain-DataFrame
    targets: the coordinates are the first ``ndim`` canonical axis names
    (x, y, z), so a 2-D interpolation whose target happens to carry a
    non-coordinate ``z`` value column keeps interpolating over (x, y)
    instead of mistaking ``z`` for a third coordinate."""
    if isinstance(tgt, GridMeta):
        cells = full_grid(spark, tgt)
        tdf = cells.select(
            (F.col("i") + F.col("j") * F.lit(tgt.nx)).cast("long").alias(row_id),
            "i",
            "j",
            (F.lit(tgt.ox) + (F.col("i") + F.lit(0.5)) * F.lit(tgt.sx)).alias("x"),
            (F.lit(tgt.oy) + (F.col("j") + F.lit(0.5)) * F.lit(tgt.sy)).alias("y"),
        )
        return tdf, GridDomain(tgt), ("x", "y")
    if isinstance(tgt, GeoTable):
        coords = (
            tgt.domain.coord_cols
            if isinstance(tgt.domain, PointDomain)
            else ("x", "y")
        )
        return tgt.df, tgt.domain, coords
    # plain DataFrame: the first `ndim` canonical axis names are the
    # coordinates (sample arity decides; a trailing `z` VALUE column on a
    # 2-D problem is not a coordinate)
    axes = [c for c in ("x", "y", "z") if c in tgt.columns]
    if ndim is not None:
        wanted = ("x", "y", "z")[:ndim]
        missing = [c for c in wanted if c not in tgt.columns]
        if missing:
            raise ValueError(
                f"target DataFrame lacks coordinate column(s) {missing} for a "
                f"{ndim}-D interpolation (columns: {tgt.columns})"
            )
        coords = wanted
    else:
        coords = tuple(axes) if axes else ("x", "y")
    return tgt, PointDomain(coords), coords


def _samples(gt: GeoTable):
    d = gt.domain
    if isinstance(d, GridDomain):
        from ..core.geotable import grid_centroids

        df = grid_centroids(gt)
        drop = [c for c in (d.tile_col, *d.index_cols) if c]
        return df.drop(*drop), ("x", "y")
    assert isinstance(d, PointDomain)
    return gt.df, d.coord_cols


Model = Union[NN, IDW, Kriging]


def interpolate_pairs_reduce(
    pairs: DataFrame,
    model: Model,
    value_cols: Sequence[str],
    tid: str,
    min_neighbors: int = 1,
    prob: bool = False,
    support_offsets=None,
    t_coords=("t_x", "t_y"),
    s_coords=("s_x", "s_y"),
) -> DataFrame:
    """Reduce neighbor pairs per target under the model."""
    if prob and not isinstance(model, Kriging):
        raise ValueError(
            "prob=True requires a Kriging model (the reference's predictprob "
            "is only defined for probabilistic models)"
        )
    if isinstance(model, Kriging):
        out = kriging_reduce(
            pairs, model, value_cols, tid, min_neighbors=min_neighbors,
            prob=prob, support_offsets=support_offsets,
            t_coords=t_coords, s_coords=s_coords,
        )
    else:
        exprs = model.agg_exprs(value_cols, sid="s_row_id")
        aggs = [exprs[c].alias(c) for c in value_cols] + [F.count("*").alias("_n")]
        out = pairs.groupBy(tid).agg(*aggs)
        if min_neighbors > 1:
            out = out.select(
                tid,
                *[F.when(F.col("_n") >= min_neighbors, F.col(c)).otherwise(F.lit(None)).alias(c) for c in value_cols],
            )
        else:
            out = out.drop("_n")
    return out


def _support_offsets(target, point: bool, quad: int = 2):
    """Quadrature offsets for block support (reference ``point=false``):
    a quad×quad centroid grid inside the target cell.  Point support (the
    default) and non-grid targets (no geometry extent) use the centroid."""
    if point or not isinstance(target, GridMeta):
        return None
    sx, sy = target.sx, target.sy
    return [
        (sx * ((a + 0.5) / quad - 0.5), sy * ((b + 0.5) / quad - 0.5))
        for a in range(quad)
        for b in range(quad)
    ]


@dataclass
class Interpolate:
    """Global interpolation with all samples (reference default model NN).

    ``point``/``prob`` follow src/interpolate.jl:35-58: ``point=False`` is
    block support (Kriging RHS averaged over a cell quadrature; NN/IDW have
    no block form and use the centroid), ``prob=True`` adds ``<var>_var``
    kriging-variance columns (the predictive Normal's scale)."""

    target: Union[GridMeta, GeoTable, DataFrame]
    model: Model = field(default_factory=NN)
    point: bool = True
    prob: bool = False

    def apply(self, gt: GeoTable):
        spark = gt.df.sparkSession
        sdf, s_coords = _samples(gt)
        tdf, tdomain, t_coords = _target_df(spark, self.target, gt.row_id, ndim=len(s_coords))
        assert len(t_coords) == len(s_coords), (
            f"target is {len(t_coords)}-D but samples are {len(s_coords)}-D"
        )
        value_cols = [c for c in sdf.columns if c not in {*s_coords, gt.row_id}]

        # all-samples cross join; samples broadcast (small by contract)
        t = tdf.select(
            F.col(gt.row_id).alias("t_row_id"),
            *[F.col(c).alias(f"t_{c}") for c in t_coords],
        )
        s = F.broadcast(
            sdf.select(
                F.col(gt.row_id).alias("s_row_id"),
                *[F.col(sc).alias(f"s_{tc}") for sc, tc in zip(s_coords, t_coords)],
                *[F.col(c).alias(f"s_{c}") for c in value_cols],
            )
        )
        d2 = F.lit(0.0)
        for c in t_coords:
            d2 = d2 + (F.col(f"t_{c}") - F.col(f"s_{c}")) * (F.col(f"t_{c}") - F.col(f"s_{c}"))
        pairs = t.crossJoin(s).withColumn("dist", F.sqrt(d2))
        reduced = interpolate_pairs_reduce(
            pairs, self.model, value_cols, "t_row_id",
            prob=self.prob, support_offsets=_support_offsets(self.target, self.point),
            t_coords=[f"t_{c}" for c in t_coords],
            s_coords=[f"s_{c}" for c in t_coords],
        )
        out = tdf.join(reduced, tdf[gt.row_id] == reduced["t_row_id"], "left").drop("t_row_id")
        if isinstance(tdomain, GridDomain):
            out = out.drop("x", "y")
        return GeoTable(out, tdomain, row_id=gt.row_id), None

    __call__ = apply


@dataclass
class InterpolateNeighbors:
    """Local interpolation with kNN / ball neighborhoods
    (reference: src/interpneighbors.jl:47-87)."""

    target: Union[GridMeta, GeoTable, DataFrame]
    model: Model = field(default_factory=NN)
    minneighbors: int = 1
    maxneighbors: int = 10
    radius: Optional[float] = None  # MetricBall neighborhood
    point: bool = True  # block support when False (see Interpolate)
    prob: bool = False  # kriging variance columns when True
    # the reference's `distance` knob (src/interpneighbors.jl:66): per-axis
    # weights or an SPD matrix for a weighted/anisotropic MetricBall —
    # `radius` is then in metric units (functions.knn.metric_cholesky)
    metric: Optional[Sequence[float]] = None

    def apply(self, gt: GeoTable):
        spark = gt.df.sparkSession
        sdf, s_coords = _samples(gt)
        tdf, tdomain, t_coords = _target_df(spark, self.target, gt.row_id, ndim=len(s_coords))
        assert len(t_coords) == len(s_coords), (
            f"target is {len(t_coords)}-D but samples are {len(s_coords)}-D"
        )
        value_cols = [c for c in sdf.columns if c not in {*s_coords, gt.row_id}]

        pairs = knn_join(
            tdf.select(gt.row_id, *t_coords),
            sdf,
            k=self.maxneighbors,
            t_id=gt.row_id,
            s_id=gt.row_id,
            t_coords=tuple(t_coords),
            s_coords=tuple(s_coords),
            s_carry=value_cols,
            max_radius=self.radius,
            metric=self.metric,
        )
        tid = f"t_{gt.row_id}"
        reduced = interpolate_pairs_reduce(
            pairs, self.model, value_cols, tid, self.minneighbors,
            prob=self.prob, support_offsets=_support_offsets(self.target, self.point),
            t_coords=[f"t_{c}" for c in t_coords],
            s_coords=[f"s_{c}" for c in s_coords],
        )
        out = tdf.join(reduced, tdf[gt.row_id] == reduced[tid], "left").drop(tid)
        if isinstance(tdomain, GridDomain):
            out = out.drop("x", "y")
        return GeoTable(out, tdomain, row_id=gt.row_id), None

    __call__ = apply
