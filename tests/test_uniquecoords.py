"""UniqueCoords tests mirroring the reference's inline oracles
(reference: test/uniquecoords.jl:26-94 — duplicate blocks with exact
mean/first/last/min/max/median/std expectations)."""

import math

import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.geotable import georef_points
from geostatstransforms_jl_spark.operators import UniqueCoords


@pytest.fixture()
def dup_points(spark):
    # K=3 distinct coordinates, each repeated 4 times with known values
    # (shape of reference test/uniquecoords.jl:26-36)
    rows = []
    rid = 0
    for k, (x, y) in enumerate([(0.0, 0.0), (1.0, 2.0), (5.0, -1.0)]):
        for r in range(4):
            a = float(10 * k + r)  # continuous
            s = f"cat{k}_{r}"  # categorical
            b = None if r == 3 else 100 * k + r  # int with nulls
            rows.append((rid, x, y, a, b, s))
            rid += 1
    return spark.createDataFrame(
        rows, "row_id long, x double, y double, a double, b long, s string"
    )


def test_default_aggs(spark, dup_points):
    gt = georef_points(dup_points)
    out, _ = UniqueCoords().apply(gt)
    rows = {(r.x, r.y): r for r in out.df.collect()}
    assert len(rows) == 3
    for k, (x, y) in enumerate([(0.0, 0.0), (1.0, 2.0), (5.0, -1.0)]):
        r = rows[(x, y)]
        # continuous → null-skipping mean
        assert r.a == pytest.approx((10 * k) + 1.5)
        # int is categorical-coded by policy → first non-null by row_id
        assert r.b == 100 * k + 0
        # categorical string → first by row_id
        assert r.s == f"cat{k}_0"
        # geometry of first occurrence
        assert r.row_id == 4 * k


def test_override_aggs(spark, dup_points):
    gt = georef_points(dup_points)
    out, _ = UniqueCoords(
        {"a": "std", "b": "max", "s": "last"}
    ).apply(gt)
    rows = {(r.x, r.y): r for r in out.df.collect()}
    for k, (x, y) in enumerate([(0.0, 0.0), (1.0, 2.0), (5.0, -1.0)]):
        r = rows[(x, y)]
        # sample std of [0,1,2,3] offsets
        assert r.a == pytest.approx(math.sqrt(5 / 3))
        assert r.b == 100 * k + 2  # max of non-null
        assert r.s == f"cat{k}_3"


def test_custom_callable_agg(spark, dup_points):
    gt = georef_points(dup_points)
    out, _ = UniqueCoords({"a": lambda v: float(v.max() - v.min())}).apply(gt)
    for r in out.df.collect():
        assert r.a == pytest.approx(3.0)


def test_median_and_mode(spark):
    df = spark.createDataFrame(
        [(i, 0.0, 0.0, float(v), s) for i, (v, s) in
         enumerate([(1, "a"), (2, "b"), (3, "b"), (100, "c")])],
        "row_id long, x double, y double, v double, s string",
    )
    gt = georef_points(df)
    out, _ = UniqueCoords({"v": "median", "s": "mode"}).apply(gt)
    r = out.df.first()
    assert r.v == pytest.approx(2.5)  # type-7 interpolated median
    assert r.s == "b"


def test_all_null_group_gives_null(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, None), (1, 0.0, 0.0, None)],
        "row_id long, x double, y double, a double",
    )
    out, _ = UniqueCoords().apply(georef_points(df))
    assert out.df.first().a is None


def test_exact_float_equality_no_rounding(spark):
    # coordinates differing in the last ulp must NOT merge
    x1 = 1.0
    x2 = 1.0 + 2.0 ** -52
    df = spark.createDataFrame(
        [(0, x1, 0.0, 1.0), (1, x2, 0.0, 2.0)],
        "row_id long, x double, y double, a double",
    )
    out, _ = UniqueCoords().apply(georef_points(df))
    assert out.df.count() == 2


def test_scale_dedup(spark):
    # shape of reference test/uniquecoords.jl:4-12: N rows → N/2 unique
    n = 200_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") % (n // 2)).cast("double"))
        .withColumn("y", F.lit(0.0))
        .withColumn("a", F.col("id").cast("double"))
        .withColumnRenamed("id", "row_id")
    )
    out, _ = UniqueCoords().apply(georef_points(df))
    assert out.df.count() == n // 2
