"""Detrend — subtract a fitted polynomial-in-coordinates trend per column.

Reference semantics (src/detrend.jl:33-93): fit GeoStatsModels `Polynomial`
of given degree on the selected columns over the domain coordinates, subtract
the prediction; `revert` re-adds the prediction (possibly on a different
domain — the fitted model is a closed form of coordinates, reference:
test/detrend.jl:16-24).

Spark plan — the classic two-pass distributed linear fit:
1. one hash aggregate computes the normal equations Σ φᵢφⱼ and Σ φᵢz
   (k = (deg+1)(deg+2)/2 monomial features — a k×k matrix, driver-tiny);
2. `numpy.linalg.solve` on the driver;
3. the trend is folded back as a literal Catalyst expression — the subtract
   pass is pure codegen, no UDF, no second shuffle.

The fitted coefficients are the revert cache.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids


def _monomials(degree: int) -> List[Tuple[int, int]]:
    return [(a, b) for s in range(degree + 1) for a in range(s + 1) for b in [s - a]]


def _feature_expr(a: int, b: int, x: Column, y: Column) -> Column:
    e = F.lit(1.0)
    if a:
        e = e * F.pow(x, F.lit(float(a)))
    if b:
        e = e * F.pow(y, F.lit(float(b)))
    return e


def fit_trend(
    df: DataFrame, cols: Sequence[str], degree: int, x: str = "x", y: str = "y"
) -> Dict[str, np.ndarray]:
    mons = _monomials(degree)
    k = len(mons)
    xs, ys = F.col(x), F.col(y)
    phi = [_feature_expr(a, b, xs, ys) for (a, b) in mons]
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(phi[i] * phi[j]).alias(f"g_{i}_{j}"))
        for c in cols:
            aggs.append(F.sum(phi[i] * F.col(c)).alias(f"b_{i}_{c}"))
    row = df.agg(*aggs).first()
    G = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    out = {}
    for c in cols:
        bvec = np.array([row[f"b_{i}_{c}"] for i in range(k)])
        try:
            out[c] = np.linalg.solve(G, bvec)
        except np.linalg.LinAlgError:
            out[c] = np.linalg.lstsq(G, bvec, rcond=None)[0]
    return out


def trend_expr(coef: np.ndarray, degree: int, x: Column, y: Column) -> Column:
    mons = _monomials(degree)
    e = F.lit(0.0)
    for (a, b), w in zip(mons, coef):
        e = e + F.lit(float(w)) * _feature_expr(a, b, x, y)
    return e


def detrend_df(
    df: DataFrame, cols: Sequence[str], degree: int = 1, x: str = "x", y: str = "y"
):
    coefs = fit_trend(df, cols, degree, x, y)
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c) - trend_expr(coefs[c], degree, F.col(x), F.col(y)))
    return out, coefs


def retrend_df(
    df: DataFrame, coefs: Dict[str, np.ndarray], degree: int, x: str = "x", y: str = "y"
) -> DataFrame:
    out = df
    for c, coef in coefs.items():
        if c in out.columns:
            out = out.withColumn(c, F.col(c) + trend_expr(coef, degree, F.col(x), F.col(y)))
    return out


@dataclass
class Detrend:
    cols: Sequence[str]
    degree: int = 1

    def _coord_df(self, gt: GeoTable):
        if isinstance(gt.domain, GridDomain):
            return grid_centroids(gt)
        assert isinstance(gt.domain, PointDomain)
        cx, cy = gt.domain.coord_cols
        df = gt.df
        if cx != "x":
            df = df.withColumn("x", F.col(cx))
        if cy != "y":
            df = df.withColumn("y", F.col(cy))
        return df

    def apply(self, gt: GeoTable):
        df = self._coord_df(gt)
        out, coefs = detrend_df(df, list(self.cols), self.degree)
        if isinstance(gt.domain, GridDomain):
            out = out.drop("x", "y")
        return gt.with_df(out), (coefs, self.degree)

    def revert(self, gt: GeoTable, cache):
        coefs, degree = cache
        df = self._coord_df(gt)
        out = retrend_df(df, coefs, degree)
        if isinstance(gt.domain, GridDomain):
            out = out.drop("x", "y")
        return gt.with_df(out)

    __call__ = apply
