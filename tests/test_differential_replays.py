"""Differential oracles for operators the DuckDB gate can't express
(VERDICT round 1, next-step 6): independent numpy replays of the sequential
grid filters (same seed ⇒ cell-for-cell equality) and a closed-form
ordinary-kriging solve.

The replays are written here from the documented reference semantics
(src/modefilter.jl, src/quenching.jl, src/maxposterior.jl) — they share no
code with the operators, so plumbing bugs (partition-order instability,
seed propagation, schema round-trips) and semantic drift both surface as
mismatches.
"""

import numpy as np
import pandas as pd
import pytest

from geostatstransforms_jl_spark.core.geotable import GridMeta, georef_grid
from geostatstransforms_jl_spark.operators.seqfilters import (
    MaxPosterior,
    ModeFilter,
    Quenching,
)

NX = NY = 12


def _random_grid(seed=3, levels=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    rows = [
        (i, j, levels[rng.integers(0, len(levels))])
        for j in range(NY)
        for i in range(NX)
    ]
    return rows


def _grid_df(spark, rows):
    return spark.createDataFrame(rows, "i int, j int, z string")


# ---- replay helpers (independent implementations) -----------------------


def _offsets(maxneighbors=26):
    r = 1
    while (2 * r + 1) ** 2 - 1 < maxneighbors * 2:
        r += 1
    offs = [
        (di, dj)
        for di in range(-r, r + 1)
        for dj in range(-r, r + 1)
        if (di, dj) != (0, 0)
    ]
    return sorted(offs, key=lambda o: (o[0] ** 2 + o[1] ** 2, o[0], o[1]))


def _mode_smallest(levels, vals):
    counts = {l: sum(1 for v in vals if v == l) for l in levels}
    top = max(counts.values())
    return min(l for l, c in counts.items() if c == top)


def _decay(kind, h, rng_):
    hr = np.asarray(h, dtype=float) / rng_
    if kind == "gaussian":
        return np.exp(-3.0 * hr**2)
    if kind == "spherical":
        c = 1.0 - (1.5 * np.clip(hr, 0, 1) - 0.5 * np.clip(hr, 0, 1) ** 3)
        return np.where(hr >= 1.0, 0.0, c)
    return np.exp(-3.0 * hr)


def test_modefilter_replay_same_seed(spark):
    rows = _random_grid()
    df = _grid_df(spark, rows).repartition(8)
    gt = georef_grid(df, GridMeta(NX, NY))
    out, _ = ModeFilter(seed=7, maxneighbors=8).apply(gt)
    got = {(r.i, r.j): r.z for r in out.df.collect()}

    # replay: visit cells (sorted base order) in seeded-shuffle order,
    # replacing each with the mode of the CURRENT ≤8 nearest neighbors
    grid = {}
    for (i, j, z) in rows:
        grid[(i, j)] = z
    levels = sorted(set(grid.values()))
    offs = _offsets(8)
    order = sorted(grid)  # (i, j) ascending — the operator's stable base
    rng = np.random.default_rng(7)
    rng.shuffle(order)
    for (i, j) in order:
        nb = []
        for (di, dj) in offs:
            p = (i + di, j + dj)
            if p in grid:
                nb.append(grid[p])
                if len(nb) >= 8:
                    break
        if len(nb) <= 1:
            continue
        grid[(i, j)] = _mode_smallest(levels, nb)
    assert got == grid


def test_modefilter_partitioning_invariant(spark):
    """Same seed, different physical partitioning ⇒ identical output (the
    visit order must be a pure function of seed + cell set, not of the
    shuffle-fetch row order applyInPandas happens to deliver)."""
    rows = _random_grid(seed=11)
    a_df = _grid_df(spark, rows).repartition(2)
    b_df = _grid_df(spark, list(reversed(rows))).repartition(16)
    a, _ = ModeFilter(seed=5).apply(georef_grid(a_df, GridMeta(NX, NY)))
    b, _ = ModeFilter(seed=5).apply(georef_grid(b_df, GridMeta(NX, NY)))
    ra = {(r.i, r.j): r.z for r in a.df.collect()}
    rb = {(r.i, r.j): r.z for r in b.df.collect()}
    assert ra == rb


def test_maxposterior_replay(spark):
    """MaxPosterior reads the immutable snapshot, so the replay needs no RNG:
    ordinary indicator kriging (γ = 1 − c(h)) over ≤maxneighbors in-ball
    neighbors, argmax posterior."""
    rows = _random_grid(seed=19)
    df = _grid_df(spark, rows).repartition(8)
    gt = georef_grid(df, GridMeta(NX, NY))
    vario, rng_, mn = "spherical", 3.0, 12
    out, _ = MaxPosterior(vario, range_=rng_, maxneighbors=mn).apply(gt)
    got = {(r.i, r.j): r.z for r in out.df.collect()}

    grid = {(i, j): z for (i, j, z) in rows}
    levels = sorted(set(grid.values()))
    lev_idx = {l: q for q, l in enumerate(levels)}
    offs = [o for o in _offsets(mn) if np.hypot(*o) <= rng_]
    expect = {}
    for (i, j) in grid:
        nb = []
        for (di, dj) in offs:
            p = (i + di, j + dj)
            if p in grid:
                nb.append(p)
                if len(nb) >= mn:
                    break
        if len(nb) <= 1:
            expect[(i, j)] = grid[(i, j)]
            continue
        P = np.array(nb, dtype=float)
        k = len(nb)
        H = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
        A = np.empty((k + 1, k + 1))
        A[:k, :k] = 1.0 - _decay(vario, H, rng_)
        A[k, :k] = A[:k, k] = 1.0
        A[k, k] = 0.0
        h0 = np.sqrt(((P - np.array([i, j], dtype=float)) ** 2).sum(-1))
        b = np.concatenate([1.0 - _decay(vario, h0, rng_), [1.0]])
        try:
            lam = np.linalg.solve(A, b)[:k]
        except np.linalg.LinAlgError:
            lam = np.linalg.lstsq(A, b, rcond=None)[0][:k]
        prob = np.zeros(len(levels))
        for q in range(len(levels)):
            z = np.array([1.0 if grid[p] == levels[q] else 0.0 for p in nb])
            prob[q] = lam @ z
        prob = np.clip(prob, 0.0, 1.0)
        expect[(i, j)] = levels[int(np.argmax(prob / prob.sum()))] if prob.sum() > 0 else grid[(i, j)]
    assert got == expect


def test_quenching_replay_same_seed(spark):
    """Quenching's accept-if-objective-drops sweep, replayed with the same
    seed and the engine's documented objective (squared mismatch between the
    neighborhood's empirical directional transition frequencies and the
    idealized transiogram)."""
    rows = _random_grid(seed=29)
    df = _grid_df(spark, rows).repartition(8)
    gt = georef_grid(df, GridMeta(NX, NY))
    vario, rng_, mn, tol, maxiter, seed = "spherical", 2.0, 8, 1e-2, 3, 13
    out, _ = Quenching(vario, range_=rng_, tol=tol, maxiter=maxiter,
                       maxneighbors=mn, seed=seed).apply(gt)
    got = {(r.i, r.j): r.z for r in out.df.collect()}

    grid = {(i, j): z for (i, j, z) in rows}
    levels = sorted(set(grid.values()))
    lev_idx = {l: q for q, l in enumerate(levels)}
    L = len(levels)
    g = {p: lev_idx[v] for p, v in grid.items()}
    props = np.array([sum(1 for v in g.values() if v == q) for q in range(L)], float)
    props /= props.sum()
    offs = [o for o in _offsets(mn) if np.hypot(*o) <= rng_]
    lags = sorted({float(d) for d in range(1, int(np.ceil(rng_)) + 1)})

    def tau(h):
        c = _decay(vario, np.array([h]), rng_)[0]
        T = np.tile(props, (L, 1)) * (1 - c)
        T[np.diag_indices(L)] += c
        return T

    def objective(cells):
        cellset = set(cells)
        total = 0.0
        for axis in (0, 1):
            for h in lags:
                step = (int(h), 0) if axis == 0 else (0, int(h))
                cnt = np.zeros((L, L))
                for (a, b) in cells:
                    nbp = (a + step[0], b + step[1])
                    if nbp in cellset:
                        cnt[g[(a, b)], g[nbp]] += 1
                rows_ = cnt.sum(axis=1, keepdims=True)
                if rows_.sum() == 0:
                    continue
                emp = np.where(rows_ > 0, cnt / np.maximum(rows_, 1), 0.0)
                total += ((emp - tau(h)) ** 2)[rows_[:, 0] > 0].sum()
        return total

    changeable = sorted(g)
    rng = np.random.default_rng(seed)
    for _ in range(maxiter):
        keepgoing = False
        order = list(changeable)
        rng.shuffle(order)
        for (i, j) in order:
            nb = [(i, j)]
            for (di, dj) in offs:
                p = (i + di, j + dj)
                if p in g:
                    nb.append(p)
                    if len(nb) > mn:
                        break
            if len(nb) <= 2:
                continue
            nvals = [levels[g[p]] for p in nb[1:]]
            mode = lev_idx[_mode_smallest(levels, nvals)]
            old = g[(i, j)]
            if mode == old:
                continue
            obj = objective(nb)
            g[(i, j)] = mode
            newobj = objective(nb)
            if obj > 0 and abs(newobj - obj) / obj >= tol:
                keepgoing = True
            if not (newobj < obj):
                g[(i, j)] = old
        if not keepgoing:
            break
    expect = {p: levels[q] for p, q in g.items()}
    assert got == expect


def test_kriging_closed_form(spark):
    """Interpolate+Kriging vs a direct closed-form OK solve on a 5-sample
    fixture: predictions must match to solver precision and the interpolator
    must be exact at sample locations."""
    from geostatstransforms_jl_spark.core.geotable import georef_points
    from geostatstransforms_jl_spark.functions.models import Kriging
    from geostatstransforms_jl_spark.operators.interpolate import InterpolateNeighbors

    samples = [
        (0, 10.0, 10.0, 1.0),
        (1, 30.0, 12.0, 3.0),
        (2, 18.0, 28.0, 2.0),
        (3, 5.0, 30.0, 4.0),
        (4, 28.0, 27.0, 0.5),
    ]
    sdf = spark.createDataFrame(samples, "row_id long, x double, y double, v double")
    targets = [(100, 15.0, 15.0), (101, 25.0, 20.0), (102, 10.0, 10.0)]
    tdf = spark.createDataFrame(targets, "row_id long, x double, y double")
    vario, rng_ = "gaussian", 25.0
    out, _ = InterpolateNeighbors(
        tdf, model=Kriging(vario, range_=rng_), maxneighbors=5
    ).apply(georef_points(sdf))
    got = {r.row_id: r.v for r in out.df.collect()}

    X = np.array([[s[1], s[2]] for s in samples])
    z = np.array([s[3] for s in samples])

    def gamma(h):
        return 1.0 - np.exp(-3.0 * (np.asarray(h, float) / rng_) ** 2)

    k = len(X)
    H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.empty((k + 1, k + 1))
    A[:k, :k] = gamma(H)
    A[k, :k] = A[:k, k] = 1.0
    A[k, k] = 0.0
    for rid, tx, ty in targets:
        h0 = np.sqrt(((X - [tx, ty]) ** 2).sum(-1))
        b = np.concatenate([gamma(h0), [1.0]])
        lam = np.linalg.solve(A, b)[:k]
        assert got[rid] == pytest.approx(float(lam @ z), abs=1e-9)
    # exactness at a sample location
    assert got[102] == pytest.approx(1.0, abs=1e-9)


def test_block_kriging_variance_closed_form(spark):
    """Block OK variance must carry the within-block term:
    σ² = λᵀγ̄₀ + ν − γ̄(B,B) (mean semivariogram over quadrature-offset
    pairs, zero diagonal).  Verified against an independent numpy solve;
    point support (no offsets) must keep the plain λᵀγ₀ + ν."""
    from geostatstransforms_jl_spark.functions.knn import knn_join
    from geostatstransforms_jl_spark.functions.models import Kriging, kriging_reduce

    samples = [
        (0, 10.0, 10.0, 1.0),
        (1, 30.0, 12.0, 3.0),
        (2, 18.0, 28.0, 2.0),
        (3, 5.0, 30.0, 4.0),
        (4, 28.0, 27.0, 0.5),
    ]
    sdf = spark.createDataFrame(samples, "row_id long, x double, y double, v double")
    targets = [(100, 15.0, 15.0), (101, 25.0, 20.0)]
    tdf = spark.createDataFrame(targets, "row_id long, x double, y double")
    rng_ = 25.0
    model = Kriging("gaussian", range_=rng_)
    offsets = [(-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5), (0.5, 0.5)]

    pairs = knn_join(tdf, sdf, k=5, t_id="row_id", s_id="row_id", s_carry=("v",))
    point = kriging_reduce(pairs, model, ["v"], "t_row_id", prob=True)
    block = kriging_reduce(
        pairs, model, ["v"], "t_row_id", prob=True, support_offsets=offsets
    )
    got_p = {r.t_row_id: (r.v, r.v_var) for r in point.collect()}
    got_b = {r.t_row_id: (r.v, r.v_var) for r in block.collect()}

    X = np.array([[s[1], s[2]] for s in samples])
    z = np.array([s[3] for s in samples])

    def gamma(h):
        return 1.0 - np.exp(-3.0 * (np.asarray(h, float) / rng_) ** 2)

    k = len(X)
    H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.empty((k + 1, k + 1))
    A[:k, :k] = gamma(H)
    A[k, :k] = A[:k, k] = 1.0
    A[k, k] = 0.0
    offs = np.array(offsets)
    gbb = gamma(np.sqrt(((offs[:, None, :] - offs[None, :, :]) ** 2).sum(-1)))
    np.fill_diagonal(gbb, 0.0)
    gbb = gbb.mean()
    assert gbb > 0
    for rid, tx, ty in targets:
        h0 = np.sqrt(((X - [tx, ty]) ** 2).sum(-1))
        g0p = gamma(h0)
        w = np.linalg.solve(A, np.concatenate([g0p, [1.0]]))
        assert got_p[rid][1] == pytest.approx(float(w[:k] @ g0p + w[k]), abs=1e-9)
        g0b = np.mean([gamma(np.sqrt(((X - [tx + ox, ty + oy]) ** 2).sum(-1)))
                       for ox, oy in offsets], axis=0)
        wb = np.linalg.solve(A, np.concatenate([g0b, [1.0]]))
        want_var = float(wb[:k] @ g0b + wb[k] - gbb)
        assert got_b[rid][0] == pytest.approx(float(wb[:k] @ z), abs=1e-9)
        assert got_b[rid][1] == pytest.approx(want_var, abs=1e-9)
        # block variance is strictly below the uncorrected point formula
        assert got_b[rid][1] < float(wb[:k] @ g0b + wb[k])


def test_modefilter_3d_replay(spark):
    """3-D ModeFilter (the reference's maxneighbors=26 IS the 3-D Moore
    neighborhood, src/modefilter.jl:22): seeded replay on a 6×6×6 grid."""
    import itertools

    rng = np.random.default_rng(41)
    levels = ("a", "b", "c")
    rows = [
        (i, j, kk, levels[rng.integers(0, 3)])
        for kk in range(6) for j in range(6) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "i int, j int, k int, z string").repartition(4)
    from geostatstransforms_jl_spark.operators.seqfilters import mode_filter_df

    out = mode_filter_df(df, "z", maxneighbors=26, seed=3, index_cols=("i", "j", "k"))
    got = {(r.i, r.j, r.k): r.z for r in out.collect()}

    grid = {(i, j, kk): z for (i, j, kk, z) in rows}
    levs = sorted(set(grid.values()))
    r = 1
    while (2 * r + 1) ** 3 - 1 < 26 * 2:
        r += 1
    offs = [o for o in itertools.product(range(-r, r + 1), repeat=3) if any(o)]
    offs.sort(key=lambda o: (sum(c * c for c in o), *o))
    order = sorted(grid)
    rng2 = np.random.default_rng(3)
    rng2.shuffle(order)
    for c in order:
        nb = []
        for off in offs:
            p = (c[0] + off[0], c[1] + off[1], c[2] + off[2])
            if p in grid:
                nb.append(grid[p])
                if len(nb) >= 26:
                    break
        if len(nb) <= 1:
            continue
        counts = {l: sum(1 for v in nb if v == l) for l in levs}
        top = max(counts.values())
        grid[c] = min(l for l, cn in counts.items() if cn == top)
    assert got == grid


def test_kriging_partial_null_reduced_system(spark):
    """A value column with partial nulls must re-solve OK on the non-null
    neighbor subset: mean AND variance equal an independent numpy solve of
    the reduced system (NOT renormalized full-set weights / full-set var)."""
    from geostatstransforms_jl_spark.functions.knn import knn_join
    from geostatstransforms_jl_spark.functions.models import Kriging, kriging_reduce

    samples = [
        (0, 10.0, 10.0, 1.0),
        (1, 30.0, 12.0, None),  # null value at a real location
        (2, 18.0, 28.0, 2.0),
        (3, 5.0, 30.0, 4.0),
        (4, 28.0, 27.0, 0.5),
    ]
    sdf = spark.createDataFrame(samples, "row_id long, x double, y double, v double")
    tdf = spark.createDataFrame([(100, 15.0, 15.0)], "row_id long, x double, y double")
    rng_ = 25.0
    model = Kriging("gaussian", range_=rng_)

    pairs = knn_join(tdf, sdf, k=5, t_id="row_id", s_id="row_id", s_carry=("v",))
    out = kriging_reduce(pairs, model, ["v"], "t_row_id", prob=True).first()

    # independent reduced-system solve over the 4 non-null samples
    keep = [s for s in samples if s[3] is not None]
    X = np.array([[s[1], s[2]] for s in keep])
    z = np.array([s[3] for s in keep])

    def gamma(h):
        return 1.0 - np.exp(-3.0 * (np.asarray(h, float) / rng_) ** 2)

    k = len(X)
    H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.empty((k + 1, k + 1))
    A[:k, :k] = gamma(H)
    A[k, :k] = A[:k, k] = 1.0
    A[k, k] = 0.0
    h0 = np.sqrt(((X - [15.0, 15.0]) ** 2).sum(-1))
    b = np.concatenate([gamma(h0), [1.0]])
    w = np.linalg.solve(A, b)
    lam, nu = w[:k], w[k]
    assert out.v == pytest.approx(float(lam @ z), abs=1e-9)
    assert out.v_var == pytest.approx(float(lam @ gamma(h0) + nu), abs=1e-9)

    # min_neighbors guard: 4 non-null < 5 required -> NULL for that column
    strict = kriging_reduce(
        pairs, model, ["v"], "t_row_id", prob=True, min_neighbors=5
    ).first()
    assert strict.v is None and strict.v_var is None


def test_literal_oracle_independence_boundary():
    # VERDICT r3 next-round #9: the literal-oracle generator must import
    # NOTHING from the engine package except the input-DEFINING contract
    # (core.images / core.media synthesize the image/video/audio tables —
    # they define the inputs, not the expected outputs; only the pure
    # make_* generators may be pulled from core.media).  Everything else
    # must be an independent replay; in particular the IVF k-means trainer
    # is a spec replay now, not the engine function.
    import re

    src = open("scripts/gen_literal_oracles.py").read()
    imports = re.findall(
        r"(?:from|import)\s+(geostatstransforms_jl_spark[\w.]*)", src
    )
    assert imports, "expected the input-defining core.images import"
    allowed = {
        "geostatstransforms_jl_spark.core.images",
        "geostatstransforms_jl_spark.core.media",
    }
    # from core.media only the input-defining pure generators, never the
    # operator/resize/feature code whose outputs the oracles check.  The
    # pattern also covers parenthesized/multi-line import forms so a future
    # `from ...core.media import (\n    resize_plane,\n)` can't slip past.
    media_imports = re.findall(
        r"from\s+geostatstransforms_jl_spark\.core\.media\s+import\s+"
        r"(\([^)]*\)|[^\n]+)",
        src,
    )
    for grp in media_imports:
        names = {
            n.strip()
            for n in grp.strip("()").replace("\n", ",").split(",")
            if n.strip()
        }
        assert names <= {"make_video", "make_audio"}, names
    assert set(imports) <= allowed, f"engine imports beyond the contract: {imports}"
    # the k-means trainer is replayed in-file from its spec now
    assert "def replay_kmeans_centroids" in src
