"""GHC — geostatistical hierarchical clustering (src/clustering/ghc.jl:53-255).

Semantics: standardize features; bound the sample at nmax (the reference
hard-caps the O(n²p²) dissimilarity at 2000 rows, :34,:126); build the
kernel-weighted dissimilarity matrix

    D[k,l] = ½ Σ_{i≥j covariate pairs} (K[:,l]ᵀ Δᵢⱼ K[:,k]) / (s_l · s_k)

with Δᵢⱼ[a,b] = (zᵢ[a]−zᵢ[b])(zⱼ[a]−zⱼ[b]) and K the spatial kernel matrix
(uniform/triangular/epanechnikov, :5-9) — expressed here as two dense
matmuls per covariate pair instead of the reference's sparse kron loop;
Ward hclust + cutree per requested k (:92-98) with labels numbered by first
occurrence (pins test/clustering.jl:94-97); unsampled rows get the label of
their feature-space 1-NN within the sample (:214-255).

Spark plan (hybrid): a deterministic bounded sample is collected to the
driver (seeded numpy choice when n > nmax — the reference's Xoshiro stream
is Julia-specific, divergence documented), the O(n²)–O(n³) numerics run in
numpy, and the labeled sample is broadcast back for a vectorized 1-NN label
propagation over the full table in one mapInPandas pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids
from ..functions.cluster_numlib import cutree, ward_linkage
from .slic import _standardize

KERNELS = {
    "uniform": lambda h, lam: (h <= lam).astype(float),
    "triangular": lambda h, lam: (h <= lam) * (lam - h),
    "epanechnikov": lambda h, lam: (h <= lam) * (lam**2 - h**2),
}


def ghc_dissimilarity(X: np.ndarray, Z: np.ndarray, kern: str, lam: float) -> np.ndarray:
    """X: (n, d) coords (any d — the kernel only sees pairwise Euclidean
    distances, matching the reference's coordinate-count-agnostic form);
    Z: (n, p) standardized features."""
    n, p = Z.shape
    H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    K = KERNELS[kern](H, lam)
    s = K.sum(axis=0)
    denom = np.outer(s, s)
    D = np.zeros((n, n))
    for j in range(p):
        for i in range(j, p):
            delta = np.outer(Z[:, i], np.ones(n)) - np.outer(np.ones(n), Z[:, i])
            delta2 = np.outer(Z[:, j], np.ones(n)) - np.outer(np.ones(n), Z[:, j])
            Dij = delta * delta2
            num = K.T @ Dij @ K  # num[l, k] = K[:,l]ᵀ Δ K[:,k]
            with np.errstate(divide="ignore", invalid="ignore"):
                contrib = np.where(denom > 0, num / denom, 0.0)
            D += 0.5 * contrib
    np.fill_diagonal(D, 0.0)
    return np.maximum(D, 0.0)


def ghc_df(
    df: DataFrame,
    k: Union[int, Sequence[int]],
    lam: float,
    nmax: int = 2000,
    kern: str = "epanechnikov",
    feature_cols: Optional[Sequence[str]] = None,
    coord_cols=("x", "y"),
    row_id: str = "row_id",
    seed: int = 123,
) -> DataFrame:
    ks = [k] if isinstance(k, int) else list(k)
    coords = list(coord_cols)
    feats = list(
        feature_cols
        if feature_cols is not None
        else [c for c in df.columns if c not in {*coords, row_id}]
    )
    spark = df.sparkSession
    sdf = _standardize(df.select(row_id, *coords, *feats), feats)
    n_total = sdf.count()
    if n_total > nmax:
        # deterministic bounded sample: order by hash, take nmax (seeded)
        samp = (
            sdf.withColumn("_h", F.xxhash64(F.col(row_id), F.lit(seed)))
            .orderBy("_h")
            .limit(nmax)
            .drop("_h")
        )
    else:
        samp = sdf
    pdf = samp.orderBy(row_id).toPandas()
    X = pdf[coords].to_numpy(dtype=float)
    Z = pdf[feats].to_numpy(dtype=float)
    D = ghc_dissimilarity(X, Z, kern, float(lam))
    merges = ward_linkage(D)
    labels = {ki: cutree(merges, len(pdf), ki) for ki in ks}

    label_cols = [f"label{i+1}" for i in range(len(ks))] if len(ks) > 1 else ["label"]
    lab_pdf = pd.DataFrame({row_id: pdf[row_id]})
    for name, ki in zip(label_cols, ks):
        lab_pdf[name] = labels[ki]

    if n_total <= nmax:
        lab_sdf = spark.createDataFrame(lab_pdf)
        return df.join(lab_sdf, row_id, "left")

    # propagate to unsampled rows: 1-NN in FEATURE space vs the sample
    Zs = Z.copy()
    labs_np = {name: lab_pdf[name].to_numpy() for name in label_cols}
    samp_ids = set(pdf[row_id].tolist())

    def propagate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            zb = b[feats].to_numpy(dtype=float)
            d2 = ((zb[:, None, :] - Zs[None, :, :]) ** 2).sum(-1)
            nn = d2.argmin(axis=1)
            out = pd.DataFrame({row_id: b[row_id]})
            for name in label_cols:
                out[name] = labs_np[name][nn]
            # sampled rows keep their own labels
            mask = b[row_id].isin(samp_ids).to_numpy()
            if mask.any():
                own = lab_pdf.set_index(row_id)
                for name in label_cols:
                    out.loc[mask, name] = own[name].reindex(b[row_id][mask]).to_numpy()
            yield out

    schema = f"{row_id} long, " + ", ".join(f"{c} long" for c in label_cols)
    lab_sdf = sdf.mapInPandas(propagate, schema)
    return df.join(lab_sdf, row_id, "left")


@dataclass
class GHC:
    k: Union[int, Sequence[int]]
    lam: float
    nmax: int = 2000
    kern: str = "epanechnikov"

    def apply(self, gt: GeoTable):
        if isinstance(gt.domain, GridDomain):
            df = grid_centroids(gt)
            dcols = [c for c in (gt.domain.tile_col, *gt.domain.index_cols) if c]
            df = df.drop(*dcols)
            coord_cols = ("x", "y")
        else:
            assert isinstance(gt.domain, PointDomain)
            df = gt.df
            coord_cols = gt.domain.coord_cols
        out = ghc_df(df, self.k, self.lam, self.nmax, self.kern, coord_cols=coord_cols, row_id=gt.row_id)
        return GeoTable(out, PointDomain(coord_cols), row_id=gt.row_id), None

    __call__ = apply
