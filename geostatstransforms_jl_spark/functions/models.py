"""Interpolation model registry: NN, IDW, Kriging (the reference's
GeoStatsModels surface invoked via `fitpredict`, reference:
src/interpolate.jl:47-55, src/interpneighbors.jl:72-84).

Each model consumes the neighbor-pair table produced by the cell-ring joins
(columns ``t_<id>``, ``s_<val>``, ``dist``) and reduces it per target:

* ``NN``      — value of the nearest sample: one `min(struct(dist, s_id, v))`
                per column, pure Catalyst.
* ``IDW(e)``  — Σ z/d^e / Σ 1/d^e with the exact-hit special case (a sample at
                distance ~0 wins outright, the limit of the weights), pure
                Catalyst expressions.
* ``Kriging`` — ordinary kriging with a Gaussian/spherical/exponential
                variogram; per-target linear solves in an Arrow-batched
                grouped pandas UDF (the only part with no SQL equivalent).

All reductions happen in one hash aggregate per target — the expensive part
(the spatial join) is shared across models.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPS_EXACT = 1e-12


@dataclass(frozen=True)
class NN:
    """Nearest-neighbor model (reference default, src/interpolate.jl:44)."""

    def agg_exprs(self, value_cols: Sequence[str], sid: str) -> dict:
        out = {}
        for c in value_cols:
            out[c] = F.min(
                F.when(
                    F.col(f"s_{c}").isNotNull(),
                    F.struct(F.col("dist").alias("d"), F.col(sid).alias("i"), F.col(f"s_{c}").alias("v")),
                )
            ).getField("v")
        return out


@dataclass(frozen=True)
class IDW:
    """Inverse distance weighting, weight = 1/dist^exponent."""

    exponent: float = 1.0

    def agg_exprs(self, value_cols: Sequence[str], sid: str) -> dict:
        e = float(self.exponent)
        w = F.lit(1.0) / F.pow(F.col("dist"), F.lit(e))
        exact = F.col("dist") < F.lit(EPS_EXACT)
        out = {}
        for c in value_cols:
            v = F.col(f"s_{c}")
            # limit of IDW as d→0: the exact-hit sample dominates
            exact_v = F.min(
                F.when(exact & v.isNotNull(), F.struct(F.col("dist").alias("d"), F.col(sid).alias("i"), v.alias("v")))
            ).getField("v")
            num = F.sum(F.when(~exact & v.isNotNull(), v * w))
            den = F.sum(F.when(~exact & v.isNotNull(), w))
            out[c] = F.coalesce(exact_v, num / den)
        return out


def variogram_fn(kind: str, range_: float, sill: float = 1.0, nugget: float = 0.0):
    """γ(h) — matches GeoStatsModels' parameterizations (effective range)."""
    r, s, n = float(range_), float(sill), float(nugget)

    def gaussian(h):
        return n + (s - n) * (1.0 - np.exp(-3.0 * (h / r) ** 2))

    def spherical(h):
        hr = np.clip(h / r, 0.0, 1.0)
        return n + (s - n) * (1.5 * hr - 0.5 * hr**3)

    def exponential(h):
        return n + (s - n) * (1.0 - np.exp(-3.0 * (h / r)))

    return {"gaussian": gaussian, "spherical": spherical, "exponential": exponential}[kind]


@dataclass(frozen=True)
class Kriging:
    """Ordinary kriging: solve [Γ 1; 1ᵀ 0][λ; ν] = [γ₀; 1] per target and
    predict λᵀz.  Exact interpolator (hits samples exactly) like the
    reference's Kriging(GaussianVariogram(range=35)) fixtures."""

    variogram: str = "gaussian"
    range_: float = 1.0
    sill: float = 1.0
    nugget: float = 0.0

    def gamma(self):
        return variogram_fn(self.variogram, self.range_, self.sill, self.nugget)


def kriging_reduce(
    pairs: DataFrame,
    model: Kriging,
    value_cols: Sequence[str],
    tid: str,
    t_coords=("t_x", "t_y"),
    s_coords=("s_x", "s_y"),
    min_neighbors: int = 1,
    prob: bool = False,
    support_offsets: Optional[Sequence[Tuple[float, float]]] = None,
) -> DataFrame:
    """Per-target ordinary-kriging solve over that target's neighbor rows.

    Grouped `applyInPandas`: one Arrow batch per target group; the solve is
    a (k+1)×(k+1) numpy system — k = maxneighbors is small by construction.

    ``prob`` (the reference's Interpolate ``prob=true``,
    src/interpolate.jl:16,53): also emit the ordinary-kriging variance
    σ² = λᵀγ₀ + ν per value column as ``<c>_var`` — the predictive
    distribution is Normal(mean, σ²).

    ``support_offsets`` (the reference's ``point=false``, block support):
    the right-hand-side γ₀ is averaged over these (dx, dy) offsets from the
    target centroid — block kriging by cell quadrature.  The block variance
    is σ² = λᵀγ̄₀ + ν − γ̄(B,B) where γ̄(B,B) is the mean semivariogram over
    quadrature-offset pairs (γ(0) = 0 on the diagonal by the variogram
    convention) — without the within-block term the point formula applied to
    block-averaged γ̄₀ overstates the variance.

    Null handling: a column with partial nulls re-solves the OK system on
    the reduced (non-null) neighbor set, so the reported mean and ``<c>_var``
    describe the SAME estimator; fewer than ``min_neighbors`` non-null
    samples yields NULL for that column.
    """
    gamma = model.gamma()
    tcs, scs = list(t_coords), list(s_coords)
    assert len(tcs) == len(scs), "target/sample coordinate arity mismatch"
    ndim = len(tcs)
    cols = [tid, *tcs, *scs] + [f"s_{c}" for c in value_cols]
    fields = [T.StructField(tid, pairs.schema[tid].dataType)] + [
        T.StructField(c, T.DoubleType()) for c in value_cols
    ]
    if prob:
        fields += [T.StructField(f"{c}_var", T.DoubleType()) for c in value_cols]
    schema = T.StructType(fields)
    offs = (
        np.array(support_offsets, dtype=float)
        if support_offsets is not None
        else np.zeros((1, ndim))
    )
    assert offs.shape[1] == ndim, "support offsets must match coordinate arity"
    # within-block mean semivariogram γ̄(B,B) over offset pairs; zero for
    # point support (single zero offset, γ(0) = 0)
    _dbb = np.sqrt(((offs[:, None, :] - offs[None, :, :]) ** 2).sum(-1))
    _gbb = gamma(_dbb)
    np.fill_diagonal(_gbb, 0.0)
    gamma_bb = float(_gbb.mean())

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        X = pdf[scs].to_numpy(dtype=float)
        k = len(X)
        if k < min_neighbors:
            row = {tid: pdf[tid].iloc[0], **{c: None for c in value_cols}}
            if prob:
                row.update({f"{c}_var": None for c in value_cols})
            return pd.DataFrame([row])
        D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        A = np.empty((k + 1, k + 1))
        A[:k, :k] = gamma(D)
        A[k, :k] = 1.0
        A[:k, k] = 1.0
        A[k, k] = 0.0
        c0 = pdf[tcs].iloc[0].to_numpy(dtype=float)
        # block support: average γ over the quadrature offsets (point
        # support is the single zero offset)
        g0 = np.zeros(k)
        for off in offs:
            d0 = np.sqrt(((X - (c0 + off)) ** 2).sum(-1))
            g0 += gamma(d0)
        g0 /= len(offs)
        b = np.concatenate([g0, [1.0]])
        try:
            w = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            w = np.linalg.lstsq(A, b, rcond=None)[0]
        lam, nu = w[:k], w[k]
        var = float(lam @ g0 + nu - gamma_bb)
        row = {tid: pdf[tid].iloc[0]}
        for c in value_cols:
            z = pdf[f"s_{c}"].to_numpy(dtype=float)
            m = ~np.isnan(z)
            if not m.any():
                row[c] = None
                if prob:
                    row[f"{c}_var"] = None
            elif m.all():
                row[c] = float(lam @ z)
                if prob:
                    row[f"{c}_var"] = var
            else:
                # partial nulls in this column: re-solve the OK system on the
                # reduced neighbor set so mean AND variance describe the same
                # estimator (weight renormalization would keep the full-set
                # variance, a mismatch)
                km = int(m.sum())
                if km < min_neighbors:
                    row[c] = None
                    if prob:
                        row[f"{c}_var"] = None
                    continue
                Am = np.empty((km + 1, km + 1))
                Am[:km, :km] = gamma(D[np.ix_(m, m)])
                Am[km, :km] = 1.0
                Am[:km, km] = 1.0
                Am[km, km] = 0.0
                bm = np.concatenate([g0[m], [1.0]])
                try:
                    wm = np.linalg.solve(Am, bm)
                except np.linalg.LinAlgError:
                    wm = np.linalg.lstsq(Am, bm, rcond=None)[0]
                row[c] = float(wm[:km] @ z[m])
                if prob:
                    row[f"{c}_var"] = float(wm[:km] @ g0[m] + wm[km] - gamma_bb)
        return pd.DataFrame([row])

    return pairs.select(*cols).groupBy(tid).applyInPandas(solve, schema)
