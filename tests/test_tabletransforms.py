"""AbsoluteUnits ingest normalization (reference AbsoluteUnits() pipe)."""

import pytest


def test_absolute_units(spark):
    from geostatstransforms_jl_spark.operators.tabletransforms import absolute_units_df

    df = spark.createDataFrame(
        [(0, 25.0, 1.0), (1, -40.0, 2.5)], "row_id long, temp double, d double"
    )
    out = absolute_units_df(df, {"temp": "degC", "d": "km"})
    rows = {r.row_id: r for r in out.collect()}
    assert rows[0].temp == pytest.approx(298.15)
    assert rows[1].temp == pytest.approx(233.15)
    assert rows[0].d == pytest.approx(1000.0)
    # degF affine (not a pure scale): -40F == -40C == 233.15K
    out2 = absolute_units_df(df.withColumn("temp", df.temp), {"temp": "degF"})
    got = {r.row_id: r.temp for r in out2.collect()}
    assert got[1] == pytest.approx(233.15)


def test_absolute_units_unknown_unit(spark):
    from geostatstransforms_jl_spark.operators.tabletransforms import absolute_units_df

    df = spark.createDataFrame([(0, 1.0)], "row_id long, v double")
    with pytest.raises(ValueError):
        absolute_units_df(df, {"v": "furlong"})


def test_absolute_units_custom_affine_tuple(spark):
    # unlisted units via explicit (scale, offset): a furlong is 201.168 m
    from geostatstransforms_jl_spark.operators.tabletransforms import absolute_units_df

    df = spark.createDataFrame(
        [(0, 2.0, 25.0)], "row_id long, d double, temp double"
    )
    out = absolute_units_df(df, {"d": (201.168, 0.0), "temp": (1.0, 273.15)})
    r = out.first()
    assert r.d == pytest.approx(402.336)
    assert r.temp == pytest.approx(298.15)
    with pytest.raises(ValueError):
        absolute_units_df(df, {"d": (1.0, 2.0, 3.0)})


def test_absolute_units_extended_table(spark):
    from geostatstransforms_jl_spark.operators.tabletransforms import absolute_units_df

    df = spark.createDataFrame(
        [(0, 1.0, 1.0, 180.0)], "row_id long, p double, vol double, ang double"
    )
    out = absolute_units_df(df, {"p": "psi", "vol": "gal", "ang": "deg"})
    r = out.first()
    assert r.p == pytest.approx(6894.757293168361)
    assert r.vol == pytest.approx(0.003785411784)
    assert r.ang == pytest.approx(3.141592653589793)
