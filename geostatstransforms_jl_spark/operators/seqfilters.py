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

import math
import zlib
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain


def _neighbor_offsets(maxneighbors: int, ndim: int = 2):
    """Grid cell offsets sorted by (distance, offset order) covering at least
    maxneighbors cells — the KNearestSearch analogue on a grid.  n-D like the
    reference (maxneighbors=26 IS the 3-D Moore neighborhood,
    src/modefilter.jl:22)."""
    import itertools

    r = 1
    while (2 * r + 1) ** ndim - 1 < maxneighbors * 2:
        r += 1
    offs = [
        o for o in itertools.product(range(-r, r + 1), repeat=ndim)
        if any(c != 0 for c in o)
    ]
    offs.sort(key=lambda o: (sum(c * c for c in o), *o))
    return offs


def _lin_index(idx, dims):
    """Column-major linear cell index like the reference's grid linearization
    (i + nx·(j + ny·k …))."""
    lin = idx[-1]
    for a in range(len(idx) - 2, -1, -1):
        lin = lin * dims[a] + idx[a]
    return lin


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


def _check_skip_dims(skip_set, nd, dims):
    # ADVICE r2: with >2 index axes the tile-local extent fallback
    # (max index + 1 per axis) can linearize GLOBAL skip indices wrongly
    # when a tile does not span the full grid — demand explicit dims
    if skip_set and nd > 2 and dims is None:
        raise ValueError(
            "skip with more than 2 index axes requires explicit dims=: "
            "tile-local extents cannot reproduce the global linearization"
        )


def _tile_runner(df, run_tile, out_schema, index_cols, tile_col, keep_cols):
    keys = [tile_col] if tile_col else []
    sel = keys + list(index_cols) + keep_cols
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
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    """n-D like the reference (2-D ``("i","j")`` or 3-D ``("i","j","k")``
    index columns); ``dims``/``nx`` fix the linearization used by `skip`."""
    icols = list(index_cols)
    nd = len(icols)
    offs = _neighbor_offsets(maxneighbors, nd)
    skip_set = set(int(s) for s in skip)
    _check_skip_dims(skip_set, nd, dims)
    dtype = df.schema[var].dataType.simpleString()

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas delivers the group's rows in shuffle-fetch order —
        # nondeterministic across runs.  The visit order below is built from
        # row order, so sort first: the seeded shuffle must permute a STABLE
        # base order or the sequential feedback loop isn't reproducible (P14).
        pdf = pdf.sort_values(icols, ignore_index=True)
        rng = np.random.default_rng(_tile_seed(pdf, tile_col, seed))
        idx = [pdf[c].to_numpy() for c in icols]
        shape = tuple(int(a.max()) + 1 for a in idx)
        grid = np.empty(shape, dtype=object)
        present = np.zeros(shape, dtype=bool)
        grid[tuple(idx)] = pdf[var].to_numpy()
        present[tuple(idx)] = True
        levels = np.array(sorted(set(pdf[var].dropna().tolist())))
        lin_dims = tuple(dims) if dims is not None else (
            (nx,) + shape[1:] if nx is not None else shape
        )
        cells = list(zip(*[a.tolist() for a in idx]))
        order = [c for c in cells if _lin_index(c, lin_dims) not in skip_set]
        rng.shuffle(order)
        for c in order:
            nb = []
            for off in offs:
                p = tuple(c[a] + off[a] for a in range(nd))
                if all(0 <= p[a] < shape[a] for a in range(nd)) and present[p]:
                    nb.append(grid[p])
                    if len(nb) >= maxneighbors:
                        break
            if len(nb) <= 1:
                continue
            grid[c] = _mode_smallest(levels, np.array(nb, dtype=object))
        out = pdf.copy()
        out[var] = [grid[c] for c in cells]
        return out

    keep = [var]
    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{c} int" for c in icols]
        + [f"{var} {dtype}"]
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
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Indicator-kriging MAP replacement.  Neighbor reads use the immutable
    one-hot snapshot of the input (src/maxposterior.jl:62-67), so results are
    independent of sweep order.  n-D index columns like ModeFilter."""
    icols = list(index_cols)
    nd = len(icols)
    offs = _neighbor_offsets(maxneighbors, nd)
    skip_set = set(int(s) for s in skip)
    _check_skip_dims(skip_set, nd, dims)
    dtype = df.schema[var].dataType.simpleString()
    ball_r = float(range_)

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(icols, ignore_index=True)  # stable order (P14)
        idx = [pdf[c].to_numpy() for c in icols]
        shape = tuple(int(a.max()) + 1 for a in idx)
        vals = pdf[var].to_numpy()
        levels = sorted(set(pdf[var].dropna().tolist()))
        lev_idx = {l: q for q, l in enumerate(levels)}
        grid_lab = -np.ones(shape, dtype=np.int64)
        grid_lab[tuple(idx)] = [lev_idx[v] for v in vals]
        onehot = np.zeros((len(levels),) + shape)
        for q in range(len(levels)):
            onehot[q] = grid_lab == q
        lin_dims = tuple(dims) if dims is not None else (
            (nx,) + shape[1:] if nx is not None else shape
        )
        newlab = grid_lab.copy()
        in_ball = [o for o in offs if math.sqrt(sum(c * c for c in o)) <= ball_r]
        cells = list(zip(*[a.tolist() for a in idx]))
        for cell in cells:
            if _lin_index(cell, lin_dims) in skip_set:
                continue
            nb = []
            for off in in_ball:
                p = tuple(cell[a] + off[a] for a in range(nd))
                if all(0 <= p[a] < shape[a] for a in range(nd)) and grid_lab[p] >= 0:
                    nb.append(p)
                    if len(nb) >= maxneighbors:
                        break
            if len(nb) <= 1:
                continue
            P = np.array(nb, dtype=float)
            c0 = np.array(cell, dtype=float)
            # ordinary indicator kriging with γ = 1 − c(h)
            k = len(nb)
            H = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
            gam = 1.0 - _decay(variogram, H, ball_r)
            A = np.empty((k + 1, k + 1))
            A[:k, :k] = gam
            A[k, :k] = 1.0
            A[:k, k] = 1.0
            A[k, k] = 0.0
            h0 = np.sqrt(((P - c0) ** 2).sum(-1))
            b_ = np.concatenate([1.0 - _decay(variogram, h0, ball_r), [1.0]])
            try:
                lam = np.linalg.solve(A, b_)[:k]
            except np.linalg.LinAlgError:
                lam = np.linalg.lstsq(A, b_, rcond=None)[0][:k]
            zs = np.array([[onehot[(q,) + p] for p in nb] for q in range(len(levels))])
            prob = zs @ lam
            prob = np.clip(prob, 0.0, 1.0)
            s = prob.sum()
            if s <= 0:
                continue
            newlab[cell] = int(np.argmax(prob / s))
        out = pdf.copy()
        out[var] = [levels[newlab[c]] for c in cells]
        return out

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{c} int" for c in icols]
        + [f"{var} {dtype}"]
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
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    icols = list(index_cols)
    nd = len(icols)
    offs = _neighbor_offsets(maxneighbors, nd)
    skip_set = set(int(s) for s in skip)
    _check_skip_dims(skip_set, nd, dims)
    dtype = df.schema[var].dataType.simpleString()
    ball_r = float(range_)

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(icols, ignore_index=True)  # stable order (P14)
        rng = np.random.default_rng(_tile_seed(pdf, tile_col, seed))
        idx = [pdf[c].to_numpy() for c in icols]
        shape = tuple(int(a.max()) + 1 for a in idx)
        vals = pdf[var].to_numpy()
        levels = sorted(set(pdf[var].dropna().tolist()))
        L = len(levels)
        lev_idx = {l: q for q, l in enumerate(levels)}
        grid = -np.ones(shape, dtype=np.int64)
        grid[tuple(idx)] = [lev_idx[v] for v in vals]
        props = np.array([(grid == q).sum() for q in range(L)], dtype=float)
        props /= props.sum()
        lin_dims = tuple(dims) if dims is not None else (
            (nx,) + shape[1:] if nx is not None else shape
        )
        in_ball = [o for o in offs if math.sqrt(sum(c * c for c in o)) <= ball_r]
        lags = sorted({float(d_) for d_ in range(1, int(np.ceil(ball_r)) + 1)})

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
            for axis in range(nd):
                for h in lags:
                    step = tuple(int(h) if a == axis else 0 for a in range(nd))
                    cnt = np.zeros((L, L))
                    for cell in cells:
                        nbp = tuple(cell[a] + step[a] for a in range(nd))
                        if nbp in cellset:
                            q1, q2 = grid[cell], grid[nbp]
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

        cells_all = list(zip(*[a.tolist() for a in idx]))
        changeable = [c for c in cells_all if _lin_index(c, lin_dims) not in skip_set]
        for _ in range(maxiter):
            keepgoing = False
            order = list(changeable)
            rng.shuffle(order)
            for cell in order:
                nb = [cell]
                for off in in_ball:
                    p = tuple(cell[a] + off[a] for a in range(nd))
                    if all(0 <= p[a] < shape[a] for a in range(nd)) and grid[p] >= 0:
                        nb.append(p)
                        if len(nb) > maxneighbors:
                            break
                if len(nb) <= 2:
                    continue
                nvals = np.array([levels[grid[p]] for p in nb[1:]], dtype=object)
                mode = lev_idx[_mode_smallest(np.array(levels, dtype=object), nvals)]
                old = grid[cell]
                if mode == old:
                    continue
                obj = objective(nb)
                grid[cell] = mode
                newobj = objective(nb)
                if obj > 0 and abs(newobj - obj) / obj >= tol:
                    keepgoing = True
                if not (newobj < obj):
                    grid[cell] = old
            if not keepgoing:
                break
        out = pdf.copy()
        out[var] = [levels[grid[c]] for c in cells_all]
        return out

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{c} int" for c in icols]
        + [f"{var} {dtype}"]
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
