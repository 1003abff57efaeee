"""kNN/radius join service tests: physical-path equivalence (broadcast vs
cell-ring), exactness vs numpy, skew handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.functions.knn import knn_join, radius_join


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(17)
    n = 3000
    xy = rng.random((n, 2)) * 100
    # a deliberately hot region: 30% of points in a tiny box (skew)
    hot = rng.random((n // 3, 2)) * 0.5
    xy[: n // 3] = hot
    rows = [(i, float(x), float(y), float(i % 13)) for i, (x, y) in enumerate(xy)]
    return spark.createDataFrame(rows, "row_id long, x double, y double, v double").persist()


def _pairs(df):
    return {(r["t_row_id"], r["rank"]): (r["s_row_id"], round(r["dist"], 9)) for r in df.collect()}


@pytest.mark.parametrize("k", [1, 3])
def test_paths_agree(spark, pts, k):
    bc = knn_join(pts, pts, k=k, exclude_same_id=True)  # broadcast path (3000 < 20k)
    cell = knn_join(pts, pts, k=k, exclude_same_id=True, broadcast_threshold=0)
    a, b = _pairs(bc), _pairs(cell)
    assert a == b


def test_knn_exact_vs_numpy(spark, pts):
    out = knn_join(pts, pts, k=2, exclude_same_id=True, broadcast_threshold=0)
    got = _pairs(out)
    pdf = pts.orderBy("row_id").toPandas()
    X = pdf[["x", "y"]].to_numpy()
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    for t in range(0, 3000, 157):  # sample of targets
        order = np.lexsort((np.arange(len(X)), D[t]))[:2]
        for rank, s in enumerate(order, start=1):
            sid, dist = got[(t, rank)]
            assert sid == s
            assert dist == pytest.approx(D[t, s], abs=1e-9)


def test_knn_with_radius_limit(spark, pts):
    out = knn_join(pts, pts, k=5, max_radius=1.0, exclude_same_id=True, broadcast_threshold=0)
    rows = out.collect()
    assert all(r["dist"] <= 1.0 for r in rows)
    # hot-box points have many close neighbors; far-field points may have none
    t_ids = {r["t_row_id"] for r in rows}
    assert len(t_ids) > 900


def test_radius_join_exact(spark, pts):
    out = radius_join(pts, pts, radius=0.7, exclude_same_id=True)
    got = {}
    for r in out.collect():
        got.setdefault(r["t_row_id"], set()).add(r["s_row_id"])
    pdf = pts.orderBy("row_id").toPandas()
    X = pdf[["x", "y"]].to_numpy()
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    for t in range(0, 3000, 211):
        expect = set(np.flatnonzero(D[t] <= 0.7).tolist())
        assert got.get(t, set()) == expect


def test_salting_preserves_results(spark, pts):
    plain = knn_join(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0, salt_threshold=None)
    salted = knn_join(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0, salt_threshold=50)
    assert _pairs(plain) == _pairs(salted)


def test_multires_extreme_aspect_no_dropped_targets(spark):
    """Regression: a bbox with aspect ratio ~1000:1 plus isolated targets
    whose k-th candidate distance exceeds R_MAX rings even at res 0 used to
    make the verify-level expression NULL — the targets matched no verify
    branch yet were counted resolved, so they silently vanished from an
    exact join.  They must fall through to the scan instead."""
    import pandas as pd
    from geostatstransforms_jl_spark.functions.knn import knn_join, knn_join_multires

    rng = np.random.default_rng(5)
    blob = np.column_stack([rng.random(24000), rng.random(24000)])  # [0,1]²
    uni = np.column_stack([rng.random(1000) * 900, rng.random(1000)])
    iso = np.array([[950.0 + 10 * i, 0.6] for i in range(5)])
    xy = np.vstack([blob, uni, iso])
    pdf = pd.DataFrame(
        {"row_id": np.arange(len(xy), dtype=np.int64), "x": xy[:, 0], "y": xy[:, 1]}
    )
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    n = len(pdf)
    out = knn_join_multires(df, df, k=3, exclude_same_id=True, broadcast_threshold=0)
    got = (
        out.select("t_row_id", "s_row_id", "rank")
        .toPandas()
        .sort_values(["t_row_id", "rank"], ignore_index=True)
    )
    assert got["t_row_id"].nunique() == n, "targets dropped"
    ladder = (
        knn_join(df, df, k=3, exclude_same_id=True, broadcast_threshold=0)
        .select("t_row_id", "s_row_id", "rank")
        .toPandas()
        .sort_values(["t_row_id", "rank"], ignore_index=True)
    )
    assert got.equals(ladder)
    df.unpersist()


def test_multires_overfull_finest_cell_keeps_sources(spark):
    """Regression: > cap distinct-but-near-coincident sources inside one
    finest-resolution cell have no admissible quadtree leaf; the old inner
    join dropped them from the candidate pass, so nearby targets missed
    strictly nearer neighbors.  They must be kept at the finest level."""
    import pandas as pd
    from geostatstransforms_jl_spark.functions.knn import knn_join, knn_join_multires

    rng = np.random.default_rng(9)
    uni = np.column_stack([rng.random(6000) * 100, rng.random(6000) * 100])
    # 30 distinct points inside one MAX_RES cell (edge ≈ 100/2^30 ≈ 9e-8)
    pile = np.column_stack(
        [42.0 + np.arange(30) * 1e-9, np.full(30, 17.0)]
    )
    xy = np.vstack([uni, pile])
    pdf = pd.DataFrame(
        {"row_id": np.arange(len(xy), dtype=np.int64), "x": xy[:, 0], "y": xy[:, 1]}
    )
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    a = (
        knn_join(df, df, k=3, exclude_same_id=True, broadcast_threshold=0)
        .select("t_row_id", "s_row_id", "rank")
        .toPandas()
        .sort_values(["t_row_id", "rank"], ignore_index=True)
    )
    b = (
        knn_join_multires(df, df, k=3, exclude_same_id=True, broadcast_threshold=0)
        .select("t_row_id", "s_row_id", "rank")
        .toPandas()
        .sort_values(["t_row_id", "rank"], ignore_index=True)
    )
    assert a.equals(b)
    # the pile's own neighbors must come from the pile (distances ~1e-9),
    # not from the uniform background
    pile_ids = set(range(6000, 6030))
    pile_rows = b[b["t_row_id"].isin(pile_ids)]
    assert set(pile_rows["s_row_id"]) <= pile_ids
    df.unpersist()


def test_multires_matches_ladder(spark):
    """knn_join_multires (two-pass quadtree-leaf strategy) must equal the
    level-ladder knn_join row-for-row, including tie-breaks, on skewed data."""
    import numpy as np
    import pandas as pd
    from geostatstransforms_jl_spark.functions.knn import knn_join, knn_join_multires

    rng = np.random.default_rng(11)
    n = 6000
    x = np.where(rng.random(n) < 0.5, rng.random(n) * 0.001, rng.random(n) * 100)
    y = np.where(rng.random(n) < 0.5, rng.random(n) * 0.001, rng.random(n) * 100)
    x[:100] = 42.0
    y[:100] = 17.0
    pdf = pd.DataFrame({"row_id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    for k in (1, 3):
        a = (
            knn_join(df, df, k=k, exclude_same_id=True, broadcast_threshold=0,
                     salt_threshold=5000)
            .select("t_row_id", "s_row_id", "rank")
            .toPandas()
            .sort_values(["t_row_id", "rank"], ignore_index=True)
        )
        b = (
            knn_join_multires(df, df, k=k, exclude_same_id=True, broadcast_threshold=0)
            .select("t_row_id", "s_row_id", "rank")
            .toPandas()
            .sort_values(["t_row_id", "rank"], ignore_index=True)
        )
        assert a.equals(b), f"k={k}: multires != ladder"
    df.unpersist()


def test_lattice_ties_paths_bitwise_agree(spark):
    """Regression (round 2): on lattice coordinates true distance ties are
    everywhere, and the numpy paths used the BLAS form |t|²+|s|²−2·T·Sᵀ whose
    1-ulp rounding differences vs the SQL difference form flipped (dist, s_id)
    tie-breaks — 69/2M disagreeing rows between strategies at bench scale.
    All physical paths must pick the SAME neighbor, bit for bit."""
    import pandas as pd

    n_side = 64
    rows = []
    i = 0
    for a in range(n_side):
        for b in range(n_side):
            # two coincident points per lattice node → guaranteed dist ties
            for dup in range(2):
                rows.append((i, a / 100000.0 * 7, b / 32768.0 * 3))
                i += 1
    pdf = pd.DataFrame(rows, columns=["row_id", "x", "y"])
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    bc = knn_join(df, df, k=1, exclude_same_id=True)  # broadcast/numpy path
    cell = knn_join(df, df, k=1, exclude_same_id=True, broadcast_threshold=0)
    a, b = _pairs(bc), _pairs(cell)
    assert a == b
    df.unpersist()


@pytest.fixture(scope="module")
def pts3d(spark):
    rng = np.random.default_rng(23)
    n = 4000
    xyz = rng.random((n, 3)) * 50
    # skew: a dense 3-D blob plus a coincident pile
    xyz[: n // 4] = rng.random((n // 4, 3)) * 0.3
    xyz[:40] = [7.0, 8.0, 9.0]
    rows = [(i, float(p[0]), float(p[1]), float(p[2]), float(i % 11)) for i, p in enumerate(xyz)]
    return spark.createDataFrame(
        rows, "row_id long, x double, y double, z double, v double"
    ).persist()


def _brute3(pdf, exclude_same=True):
    X = pdf[["x", "y", "z"]].to_numpy()
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    if exclude_same:
        np.fill_diagonal(D, np.inf)
    return D


@pytest.mark.parametrize("k", [1, 3])
def test_knn3d_paths_agree_and_exact(spark, pts3d, k):
    """3-D kNN: broadcast and cell paths agree with each other AND with a
    numpy brute force (the reference is n-D, src/utils.jl:6)."""
    coords = ("x", "y", "z")
    bc = knn_join(pts3d, pts3d, k=k, t_coords=coords, s_coords=coords, exclude_same_id=True)
    cell = knn_join(
        pts3d, pts3d, k=k, t_coords=coords, s_coords=coords,
        exclude_same_id=True, broadcast_threshold=0, salt_threshold=2000,
    )
    a, b = _pairs(bc), _pairs(cell)
    assert a == b
    pdf = pts3d.orderBy("row_id").toPandas()
    D = _brute3(pdf)
    for t in range(0, 4000, 173):
        order = np.lexsort((np.arange(D.shape[1]), D[t]))[:k]
        for rank, s in enumerate(order, start=1):
            sid, dist = a[(t, rank)]
            assert sid == s
            assert dist == pytest.approx(D[t, s], abs=1e-9)


def test_knn3d_multires_matches_ladder(spark, pts3d):
    from geostatstransforms_jl_spark.functions.knn import knn_join_multires

    coords = ("x", "y", "z")
    a = _pairs(knn_join(pts3d, pts3d, k=2, t_coords=coords, s_coords=coords,
                        exclude_same_id=True, broadcast_threshold=0))
    b = _pairs(knn_join_multires(pts3d, pts3d, k=2, t_coords=coords, s_coords=coords,
                                 exclude_same_id=True, broadcast_threshold=0))
    assert a == b


def test_radius3d_exact(spark, pts3d):
    out = radius_join(pts3d, pts3d, radius=1.5, t_coords=("x", "y", "z"),
                      s_coords=("x", "y", "z"), exclude_same_id=True)
    got = {}
    for r in out.collect():
        got.setdefault(r["t_row_id"], set()).add(r["s_row_id"])
    pdf = pts3d.orderBy("row_id").toPandas()
    D = _brute3(pdf)
    for t in range(0, 4000, 241):
        expect = set(np.flatnonzero(D[t] <= 1.5).tolist())
        assert got.get(t, set()) == expect


def test_selfjoin_dedup_fast_path_matches_generic(spark):
    """The duplicate-compression self-join fast path must equal the generic
    path row-for-row (same ids, dists, tie-breaks) on pile-heavy data."""
    import pandas as pd

    rng = np.random.default_rng(31)
    n = 9000
    # 60% of rows on a small lattice (heavy exact duplicates), rest unique
    lat = rng.integers(0, 30, size=(n, 2)).astype(float)
    uni = rng.random((n, 2)) * 100
    pick = rng.random(n) < 0.6
    xy = np.where(pick[:, None], lat, uni)
    pdf = pd.DataFrame({
        "row_id": np.arange(n, dtype=np.int64),
        "x": xy[:, 0], "y": xy[:, 1],
        "v": (np.arange(n) % 7).astype(float),
    })
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    fast = knn_join(df, df, k=1, exclude_same_id=True, t_carry=("v",), s_carry=("v",))
    # distinct objects defeat the self-join detection → generic path
    df2 = df.select("*")
    slow = knn_join(df, df2, k=1, exclude_same_id=True, t_carry=("v",), s_carry=("v",))
    a = {r["t_row_id"]: (r["s_row_id"], round(r["dist"], 9), r["s_v"]) for r in fast.collect()}
    b = {r["t_row_id"]: (r["s_row_id"], round(r["dist"], 9), r["s_v"]) for r in slow.collect()}
    assert a == b
    df.unpersist()


def test_selfjoin_all_duplicates_no_singletons(spark):
    """Regression: when EVERY coordinate is duplicated the dedup fast path
    has zero singleton targets — the inner search must return an empty
    frame instead of crashing on an empty broadcast."""
    import pandas as pd

    rows = []
    for i in range(3000):
        coord = i // 2  # every coordinate shared by exactly 2 rows
        rows.append((i, float(coord % 50), float(coord // 50)))
    pdf = pd.DataFrame(rows, columns=["row_id", "x", "y"])
    df = spark.createDataFrame(pdf).repartition(6).persist()
    df.count()
    out = knn_join(df, df, k=1, exclude_same_id=True)
    got = {r["t_row_id"]: (r["s_row_id"], r["dist"]) for r in out.collect()}
    assert len(got) == 3000
    for i in range(0, 3000, 2):
        assert got[i] == (i + 1, 0.0)
        assert got[i + 1] == (i, 0.0)
    df.unpersist()


def test_radius_join_weighted_metric_vs_bruteforce(spark, pts):
    # VERDICT r3 next-round #7: scaled-axes (weighted Euclidean) ball search
    # vs brute force — the reference's axis-scaled MetricBall
    # (src/interpneighbors.jl:66)
    w = (4.0, 0.25)  # x counts double, y counts half (sqrt weights)
    r = 3.0
    sub = pts.filter(F.col("row_id") % 7 == 0)  # keep the O(n^2) oracle small
    out = radius_join(sub, sub, radius=r, exclude_same_id=True, metric=w)
    got = {(r_.t_row_id, r_.s_row_id) for r_ in out.collect()}
    P = {p.row_id: (p.x, p.y) for p in sub.collect()}
    want = set()
    for a, (ax, ay) in P.items():
        for b, (bx, by) in P.items():
            if a != b and 4.0 * (ax - bx) ** 2 + 0.25 * (ay - by) ** 2 <= r * r:
                want.add((a, b))
    assert got == want and len(want) > 100
    # dist column is in metric units
    for row in out.limit(50).collect():
        ax, ay = P[row.t_row_id]
        bx, by = P[row.s_row_id]
        d = (4.0 * (ax - bx) ** 2 + 0.25 * (ay - by) ** 2) ** 0.5
        assert abs(row.dist - d) < 1e-9


def test_knn_anisotropic_metric_vs_bruteforce(spark, pts):
    # full SPD matrix (rotated ellipsoid): knn under d² = Δᵀ M Δ must match
    # the numpy brute force on ids AND metric distances, on both physical
    # paths (broadcast and cell ladder)
    M = np.array([[2.0, 0.6], [0.6, 1.0]])
    sub = pts.filter(F.col("row_id") % 11 == 0)
    P = {p.row_id: np.array([p.x, p.y]) for p in sub.collect()}
    ids = sorted(P)
    X = np.array([P[i] for i in ids])
    k = 3
    for kw in (dict(), dict(broadcast_threshold=0, finish_threshold=10)):
        out = knn_join(sub, sub.select("*"), k=k, exclude_same_id=True, metric=M, **kw)
        got = {(r.t_row_id, r.rank): (r.s_row_id, round(r.dist, 9)) for r in out.collect()}
        for qi, q in zip(ids, X):
            diff = X - q
            d2 = np.einsum("ni,ij,nj->n", diff, M, diff)
            order = sorted(
                ((np.sqrt(d2[j]), ids[j]) for j in range(len(ids)) if ids[j] != qi)
            )
            for rank in range(1, k + 1):
                d, sid = order[rank - 1]
                gsid, gd = got[(qi, rank)]
                assert gsid == sid, (qi, rank)
                assert abs(gd - d) < 1e-9
    # metric must be positive definite
    with pytest.raises(Exception):
        knn_join(sub, sub.select("*"), k=1, metric=np.array([[1.0, 2.0], [2.0, 1.0]]))


def test_interpolate_neighbors_metric_knob(spark):
    # the operator-level knob: with heavy x-weighting, the nearest neighbor
    # of the probe flips from the x-close sample to the y-close sample
    from geostatstransforms_jl_spark.core.geotable import georef_points
    from geostatstransforms_jl_spark.functions.models import NN
    from geostatstransforms_jl_spark.operators import InterpolateNeighbors

    src = spark.createDataFrame(
        [(0, 1.0, 0.0, 10.0), (1, 0.0, 2.0, 20.0)],
        "row_id long, x double, y double, v double",
    )
    tgt = spark.createDataFrame([(5, 0.0, 0.0)], "row_id long, x double, y double")
    plain, _ = InterpolateNeighbors(tgt, model=NN(), maxneighbors=1).apply(georef_points(src))
    assert plain.df.first().v == 10.0  # euclidean: sample 0 at d=1
    weighted, _ = InterpolateNeighbors(
        tgt, model=NN(), maxneighbors=1, metric=(25.0, 1.0)
    ).apply(georef_points(src))
    assert weighted.df.first().v == 20.0  # metric: d(0)=5, d(1)=2
