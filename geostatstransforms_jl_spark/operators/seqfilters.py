"""Sequential stochastic grid filters: ModeFilter, Quenching, MaxPosterior.

Reference semantics:
* `ModeFilter` (src/modefilter.jl:16-81): single categorical variable; visit
  cells in RNG-shuffled order; replace each with the mode of the *current*
  values of its ≤26 nearest neighbors (self excluded via mask) — an in-sweep
  feedback loop; `skip` indices are immutable.
* `Quenching` (src/quenching.jl:34-150): per shuffled cell, propose the
  neighborhood mode and accept iff it lowers a transiogram-mismatch objective
  over the neighborhood; iterate sweeps until the relative objective change
  is below tol or maxiter.
* `MaxPosterior` (src/maxposterior.jl:34-147): per shuffled cell, indicator
  (co)kriging on the one-hot matrix of the ORIGINAL values (built once,
  :62-67) over ≤26 in-range neighbors; replace with the argmax posterior
  class.  Because neighbor reads use the immutable snapshot, the sweep order
  does not feed back — it parallelizes cleanly.

Determinism & distribution: the RNG order is seeded per tile
(seed = f(global_seed, tile id)), and the tile — a whole image grid — is the
sequential unit, exactly the reference's semantics when each image is one
grid (SURVEY.md §4.4).  Spark plan: one grouped `applyInPandas` per operator;
tiles run in parallel, the sweep inside a tile is a numpy loop.

The transiogram τ_kl(h) = p_l + (δ_kl − p_l)·c(h) with c the standardized
spherical/gaussian/exponential correlation decay and p the level proportions
(idealized transiogram with uniform proportions by default, matching
GeoStatsFunctions' parameterization).  The Quenching objective uses empirical
directional transition frequencies of the neighborhood along each grid axis —
a faithful re-creation of DirectionalTransiogram on the ≤26-point view; the
reference's own tests assert only value-set preservation and skip
immutability, which hold exactly.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain


def _neighbor_offsets(maxneighbors: int):
    """Grid cell offsets sorted by (distance, offset order) covering at least
    maxneighbors cells — the KNearestSearch analogue on a grid."""
    r = 1
    while (2 * r + 1) ** 2 - 1 < maxneighbors * 2:
        r += 1
    offs = [
        (di, dj)
        for di in range(-r, r + 1)
        for dj in range(-r, r + 1)
        if (di, dj) != (0, 0)
    ]
    offs.sort(key=lambda o: (o[0] ** 2 + o[1] ** 2, o[0], o[1]))
    return offs


def _decay(kind: str, h: np.ndarray, rng_: float) -> np.ndarray:
    hr = np.asarray(h, dtype=float) / rng_
    if kind == "gaussian":
        return np.exp(-3.0 * hr**2)
    if kind == "spherical":
        c = 1.0 - (1.5 * np.clip(hr, 0, 1) - 0.5 * np.clip(hr, 0, 1) ** 3)
        return np.where(hr >= 1.0, 0.0, c)
    if kind == "exponential":
        return np.exp(-3.0 * hr)
    raise ValueError(kind)


def _mode_smallest(levels: np.ndarray, vals: np.ndarray):
    """Most frequent value; ties → smallest level (deterministic stand-in for
    the reference's Dict-order argmax, src/utils.jl:37-43)."""
    counts = {l: 0 for l in levels}
    for v in vals:
        counts[v] += 1
    top = max(counts.values())
    return min(l for l, c in counts.items() if c == top)


def _tile_runner(df, run_tile, out_schema, index_cols, tile_col, keep_cols):
    ic, jc = index_cols
    keys = [tile_col] if tile_col else []
    sel = keys + [ic, jc] + keep_cols
    if keys:
        return df.select(*sel).groupBy(*keys).applyInPandas(run_tile, out_schema)
    d = df.select(*sel).withColumn("_t", F.lit(0))
    return d.groupBy("_t").applyInPandas(
        lambda pdf: run_tile(pdf.drop(columns=["_t"])), out_schema
    )


def _tile_seed(pdf, tile_col, seed):
    # zlib.crc32, not Python hash(): hash() of a str is PYTHONHASHSEED-
    # dependent, so seeded sweeps (P14) would differ across runs/executors
    # unless the env pins the hash seed.  crc32 is stable everywhere.
    if tile_col:
        tid = str(pdf[tile_col].iloc[0]).encode("utf-8")
        return (zlib.crc32(tid) ^ seed) & 0x7FFFFFFF
    return seed


def mode_filter_df(
    df: DataFrame,
    var: str,
    skip: Sequence[int] = (),
    maxneighbors: int = 26,
    seed: int = 42,
    index_cols=("i", "j"),
    tile_col: Optional[str] = None,
    nx: Optional[int] = None,
) -> DataFrame:
    ic, jc = index_cols
    offs = _neighbor_offsets(maxneighbors)
    skip_set = set(int(s) for s in skip)
    dtype = df.schema[var].dataType.simpleString()

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas delivers the group's rows in shuffle-fetch order —
        # nondeterministic across runs.  The visit order below is built from
        # row order, so sort first: the seeded shuffle must permute a STABLE
        # base order or the sequential feedback loop isn't reproducible (P14).
        pdf = pdf.sort_values([ic, jc], ignore_index=True)
        rng = np.random.default_rng(_tile_seed(pdf, tile_col, seed))
        ii = pdf[ic].to_numpy()
        jj = pdf[jc].to_numpy()
        tnx, tny = ii.max() + 1, jj.max() + 1
        grid = np.empty((tnx, tny), dtype=object)
        present = np.zeros((tnx, tny), dtype=bool)
        grid[ii, jj] = pdf[var].to_numpy()
        present[ii, jj] = True
        levels = np.array(sorted(set(pdf[var].dropna().tolist())))
        lin_nx = nx if nx is not None else tnx
        order = [
            (i, j)
            for (i, j) in zip(ii.tolist(), jj.tolist())
            if (i + j * lin_nx) not in skip_set
        ]
        rng.shuffle(order)
        for (i, j) in order:
            nb = []
            for (di, dj) in offs:
                a, b = i + di, j + dj
                if 0 <= a < tnx and 0 <= b < tny and present[a, b]:
                    nb.append(grid[a, b])
                    if len(nb) >= maxneighbors:
                        break
            if len(nb) <= 1:
                continue
            grid[i, j] = _mode_smallest(levels, np.array(nb, dtype=object))
        out = pdf.copy()
        out[var] = [grid[a, b] for a, b in zip(ii, jj)]
        return out

    keep = [var]
    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{ic} int", f"{jc} int", f"{var} {dtype}"]
    )
    return _tile_runner(df, run_tile, schema, index_cols, tile_col, keep)


def max_posterior_df(
    df: DataFrame,
    var: str,
    variogram: str = "gaussian",
    range_: float = 1.0,
    skip: Sequence[int] = (),
    maxneighbors: int = 26,
    seed: int = 42,
    index_cols=("i", "j"),
    tile_col: Optional[str] = None,
    nx: Optional[int] = None,
) -> DataFrame:
    """Indicator-kriging MAP replacement.  Neighbor reads use the immutable
    one-hot snapshot of the input (src/maxposterior.jl:62-67), so results are
    independent of sweep order."""
    ic, jc = index_cols
    offs = _neighbor_offsets(maxneighbors)
    skip_set = set(int(s) for s in skip)
    dtype = df.schema[var].dataType.simpleString()
    ball_r = float(range_)

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ic, jc], ignore_index=True)  # stable order (P14)
        ii = pdf[ic].to_numpy()
        jj = pdf[jc].to_numpy()
        tnx, tny = ii.max() + 1, jj.max() + 1
        vals = pdf[var].to_numpy()
        levels = sorted(set(pdf[var].dropna().tolist()))
        lev_idx = {l: q for q, l in enumerate(levels)}
        grid_lab = -np.ones((tnx, tny), dtype=np.int64)
        grid_lab[ii, jj] = [lev_idx[v] for v in vals]
        onehot = np.zeros((len(levels), tnx, tny))
        for q in range(len(levels)):
            onehot[q] = grid_lab == q
        lin_nx = nx if nx is not None else tnx
        newlab = grid_lab.copy()
        in_ball = [(di, dj) for (di, dj) in offs if np.hypot(di, dj) <= ball_r]
        for (i, j) in zip(ii.tolist(), jj.tolist()):
            if (i + j * lin_nx) in skip_set:
                continue
            nb = []
            for (di, dj) in in_ball:
                a, b = i + di, j + dj
                if 0 <= a < tnx and 0 <= b < tny and grid_lab[a, b] >= 0:
                    nb.append((a, b))
                    if len(nb) >= maxneighbors:
                        break
            if len(nb) <= 1:
                continue
            P = np.array(nb, dtype=float)
            c = np.array([i, j], dtype=float)
            # ordinary indicator kriging with γ = 1 − c(h)
            k = len(nb)
            H = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
            gam = 1.0 - _decay(variogram, H, ball_r)
            A = np.empty((k + 1, k + 1))
            A[:k, :k] = gam
            A[k, :k] = 1.0
            A[:k, k] = 1.0
            A[k, k] = 0.0
            h0 = np.sqrt(((P - c) ** 2).sum(-1))
            b_ = np.concatenate([1.0 - _decay(variogram, h0, ball_r), [1.0]])
            try:
                lam = np.linalg.solve(A, b_)[:k]
            except np.linalg.LinAlgError:
                lam = np.linalg.lstsq(A, b_, rcond=None)[0][:k]
            zs = np.array([[onehot[q, a, b] for (a, b) in nb] for q in range(len(levels))])
            prob = zs @ lam
            prob = np.clip(prob, 0.0, 1.0)
            s = prob.sum()
            if s <= 0:
                continue
            newlab[i, j] = int(np.argmax(prob / s))
        out = pdf.copy()
        out[var] = [levels[newlab[a, b]] for a, b in zip(ii, jj)]
        return out

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{ic} int", f"{jc} int", f"{var} {dtype}"]
    )
    return _tile_runner(df, run_tile, schema, index_cols, tile_col, [var])


def quenching_df(
    df: DataFrame,
    var: str,
    variogram: str = "spherical",
    range_: float = 1.0,
    skip: Sequence[int] = (),
    tol: float = 1e-2,
    maxiter: int = 10,
    maxneighbors: int = 26,
    seed: int = 42,
    index_cols=("i", "j"),
    tile_col: Optional[str] = None,
    nx: Optional[int] = None,
) -> DataFrame:
    ic, jc = index_cols
    offs = _neighbor_offsets(maxneighbors)
    skip_set = set(int(s) for s in skip)
    dtype = df.schema[var].dataType.simpleString()
    ball_r = float(range_)

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ic, jc], ignore_index=True)  # stable order (P14)
        rng = np.random.default_rng(_tile_seed(pdf, tile_col, seed))
        ii = pdf[ic].to_numpy()
        jj = pdf[jc].to_numpy()
        tnx, tny = ii.max() + 1, jj.max() + 1
        vals = pdf[var].to_numpy()
        levels = sorted(set(pdf[var].dropna().tolist()))
        L = len(levels)
        lev_idx = {l: q for q, l in enumerate(levels)}
        grid = -np.ones((tnx, tny), dtype=np.int64)
        grid[ii, jj] = [lev_idx[v] for v in vals]
        props = np.array([(grid == q).sum() for q in range(L)], dtype=float)
        props /= props.sum()
        lin_nx = nx if nx is not None else tnx
        in_ball = [(di, dj) for (di, dj) in offs if np.hypot(di, dj) <= ball_r]
        lags = sorted({round(np.hypot(di, 0), 6) for di in range(1, int(np.ceil(ball_r)) + 1)})

        def tau(h):
            c = _decay(variogram, np.array([h]), ball_r)[0]
            T = np.tile(props, (L, 1)) * (1 - c)
            T[np.diag_indices(L)] += c
            return T

        def objective(cells):
            """Σ over axes/lags of squared mismatch between the empirical
            transition frequencies within `cells` and τ."""
            cellset = set(cells)
            total = 0.0
            for axis in (0, 1):
                for h in lags:
                    step = (int(h), 0) if axis == 0 else (0, int(h))
                    cnt = np.zeros((L, L))
                    for (a, b) in cells:
                        nb = (a + step[0], b + step[1])
                        if nb in cellset:
                            q1, q2 = grid[a, b], grid[nb]
                            if q1 >= 0 and q2 >= 0:
                                cnt[q1, q2] += 1
                    rows = cnt.sum(axis=1, keepdims=True)
                    if rows.sum() == 0:
                        continue
                    with np.errstate(invalid="ignore"):
                        emp = np.where(rows > 0, cnt / np.maximum(rows, 1), 0.0)
                    T = tau(h)
                    total += ((emp - T) ** 2)[rows[:, 0] > 0].sum()
            return total

        changeable = [
            (i, j)
            for (i, j) in zip(ii.tolist(), jj.tolist())
            if (i + j * lin_nx) not in skip_set
        ]
        for _ in range(maxiter):
            keepgoing = False
            order = list(changeable)
            rng.shuffle(order)
            for (i, j) in order:
                nb = [(i, j)]
                for (di, dj) in in_ball:
                    a, b = i + di, j + dj
                    if 0 <= a < tnx and 0 <= b < tny and grid[a, b] >= 0:
                        nb.append((a, b))
                        if len(nb) > maxneighbors:
                            break
                if len(nb) <= 2:
                    continue
                nvals = np.array([levels[grid[a, b]] for (a, b) in nb[1:]], dtype=object)
                mode = lev_idx[_mode_smallest(np.array(levels, dtype=object), nvals)]
                old = grid[i, j]
                if mode == old:
                    continue
                obj = objective(nb)
                grid[i, j] = mode
                newobj = objective(nb)
                if obj > 0 and abs(newobj - obj) / obj >= tol:
                    keepgoing = True
                if not (newobj < obj):
                    grid[i, j] = old
            if not keepgoing:
                break
        out = pdf.copy()
        out[var] = [levels[grid[a, b]] for a, b in zip(ii, jj)]
        return out

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{ic} int", f"{jc} int", f"{var} {dtype}"]
    )
    return _tile_runner(df, run_tile, schema, index_cols, tile_col, [var])


@dataclass
class ModeFilter:
    skip: Sequence[int] = ()
    maxneighbors: int = 26
    seed: int = 42

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain)
        var = [c for c in gt.value_cols][0]
        out = mode_filter_df(
            gt.df, var, self.skip, self.maxneighbors, self.seed, d.index_cols, d.tile_col, d.meta.nx
        )
        return GeoTable(out, d, row_id=gt.row_id), None

    __call__ = apply


@dataclass
class MaxPosterior:
    variogram: str = "gaussian"
    range_: float = 1.0
    skip: Sequence[int] = ()
    maxneighbors: int = 26
    seed: int = 42

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain)
        var = [c for c in gt.value_cols][0]
        out = max_posterior_df(
            gt.df, var, self.variogram, self.range_, self.skip, self.maxneighbors,
            self.seed, d.index_cols, d.tile_col, d.meta.nx,
        )
        return GeoTable(out, d, row_id=gt.row_id), None

    __call__ = apply


@dataclass
class Quenching:
    variogram: str = "spherical"
    range_: float = 1.0
    skip: Sequence[int] = ()
    tol: float = 1e-2
    maxiter: int = 10
    maxneighbors: int = 26
    seed: int = 42

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain)
        var = [c for c in gt.value_cols][0]
        out = quenching_df(
            gt.df, var, self.variogram, self.range_, self.skip, self.tol, self.maxiter,
            self.maxneighbors, self.seed, d.index_cols, d.tile_col, d.meta.nx,
        )
        return GeoTable(out, d, row_id=gt.row_id), None

    __call__ = apply
