"""GSC — geostatistical spectral clustering (src/clustering/gsc.jl:40-101).

Semantics: dense pairwise table distance Δ; weights W = exp(−Δ/σ²) with
grid-adjacent entries magnified ×m (4-neighborhood on grids, the reference's
`adjacencymatrix`); normalized Laplacian D^{-1/2} W D^{-1/2}; k eigenvectors
of largest eigenvalue; k-means on the eigenvector rows (labels 1..k).

The algorithm is O(n²) dense by construction, so like GHC it runs on a
bounded sample collected to the driver (`nmax`), with 1-NN feature-space
propagation for the remainder — the reference has no nmax for GSC, but also
no path to n beyond a few thousand.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids
from ..functions.cluster_numlib import kmeans, topk_eigvecs
from .slic import _standardize


def gsc_labels(
    X: np.ndarray,
    Z: np.ndarray,
    k: int,
    m: float,
    sigma: float = 1.0,
    tol: float = 1e-4,
    maxiter: int = 10,
    adjacency: Optional[np.ndarray] = None,
    weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    n, p = Z.shape
    w = weights if weights is not None else np.ones(p)
    # TableDistance (P10): sqrt of weighted squared per-column differences
    d2 = np.zeros((n, n))
    for c in range(p):
        diff = Z[:, c][:, None] - Z[:, c][None, :]
        d2 += w[c] * diff * diff
    delta = np.sqrt(d2)
    E = np.exp(-delta / (sigma * sigma))
    if adjacency is not None:
        E = np.where(adjacency, E * m, E)
    deg = E.sum(axis=1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-300))
    L = E * np.outer(dinv, dinv)
    V = topk_eigvecs(L, k)
    labels, _ = kmeans(V, k, tol=tol, maxiter=maxiter)
    return labels


def grid_adjacency(*index_arrays: np.ndarray) -> np.ndarray:
    """Von-Neumann adjacency of grid cells given per-axis index arrays —
    2-D (i, j) gives the 4-neighborhood, 3-D (i, j, l) the 6-neighborhood;
    the reference's `adjacencymatrix` is likewise dimension-generic."""
    total = np.zeros((len(index_arrays[0]), len(index_arrays[0])), dtype=np.int64)
    for a in index_arrays:
        # signed cast first: unsigned parquet indices would wrap under np.abs
        # of the elementwise difference and produce an empty adjacency
        a = np.asarray(a, dtype=np.int64)
        total += np.abs(a[:, None] - a[None, :])
    return total == 1


def gsc_df(
    df: DataFrame,
    k: int,
    m: float,
    sigma: float = 1.0,
    tol: float = 1e-4,
    maxiter: int = 10,
    nmax: int = 2000,
    feature_cols: Optional[Sequence[str]] = None,
    coord_cols=("x", "y"),
    index_cols=None,
    row_id: str = "row_id",
) -> DataFrame:
    coords = list(coord_cols)
    feats = list(
        feature_cols
        if feature_cols is not None
        else [c for c in df.columns if c not in {*coords, row_id, *(index_cols or ())}]
    )
    sel = [row_id, *coords, *feats] + (list(index_cols) if index_cols else [])
    sdf = df.select(*sel)
    n_total = sdf.count()
    if n_total > nmax:
        samp = (
            sdf.withColumn("_h", F.xxhash64(F.col(row_id), F.lit(123)))
            .orderBy("_h").limit(nmax).drop("_h")
        )
    else:
        samp = sdf
    pdf = samp.orderBy(row_id).toPandas()
    X = pdf[coords].to_numpy(dtype=float)
    Z = pdf[feats].to_numpy(dtype=float)
    adj = None
    if index_cols:
        adj = grid_adjacency(*[pdf[c].to_numpy() for c in index_cols])
    labels = gsc_labels(X, Z, k, m, sigma, tol, maxiter, adjacency=adj)
    lab = pd.DataFrame({row_id: pdf[row_id], "label": labels})
    spark = df.sparkSession
    if n_total <= nmax:
        return df.join(spark.createDataFrame(lab), row_id, "left")

    # propagate to unsampled rows: 1-NN in FEATURE space vs the labeled
    # sample (same hybrid pattern as GHC, ghc.py:117-134; reference GSC has
    # no nmax, so rows past the bound must still get labels rather than NULL)
    Zs = Z.copy()
    labs_np = labels.copy()
    samp_lab = dict(zip(pdf[row_id].tolist(), labels.tolist()))

    def propagate(batches):
        for b in batches:
            zb = b[feats].to_numpy(dtype=float)
            d2 = ((zb[:, None, :] - Zs[None, :, :]) ** 2).sum(-1)
            nn = d2.argmin(axis=1)
            out = pd.DataFrame({row_id: b[row_id], "label": labs_np[nn]})
            mask = b[row_id].isin(samp_lab).to_numpy()
            if mask.any():
                out.loc[mask, "label"] = [
                    samp_lab[r] for r in b[row_id][mask]
                ]
            yield out

    lab_sdf = sdf.select(row_id, *feats).mapInPandas(
        propagate, f"{row_id} long, label long"
    )
    return df.join(lab_sdf, row_id, "left")


@dataclass
class GSC:
    k: int
    m: float
    sigma: float = 1.0
    tol: float = 1e-4
    maxiter: int = 10

    def apply(self, gt: GeoTable):
        if isinstance(gt.domain, GridDomain):
            df = grid_centroids(gt)
            idx = gt.domain.index_cols
            out = gsc_df(
                df, self.k, self.m, self.sigma, self.tol, self.maxiter,
                index_cols=idx, row_id=gt.row_id,
            )
            return GeoTable(out, gt.domain, row_id=gt.row_id), None
        assert isinstance(gt.domain, PointDomain)
        out = gsc_df(
            gt.df, self.k, self.m, self.sigma, self.tol, self.maxiter,
            coord_cols=gt.domain.coord_cols, row_id=gt.row_id,
        )
        return GeoTable(out, gt.domain, row_id=gt.row_id), None

    __call__ = apply
