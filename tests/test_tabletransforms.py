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
