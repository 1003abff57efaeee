"""Unit algebra + metadata derivation tests vs the reference's Unitful
behavior (test/gradient.jl:8-20 — Gradient derives unit(var)/m;
test/uniquecoords.jl:97-117 / src/utils.jl:27-31 — AbsoluteUnits fixes
affine units at ingest)."""

import pytest

from geostatstransforms_jl_spark.functions.units import (
    div_units,
    format_unit,
    mul_units,
    parse_unit,
    pow_unit,
    unit_of,
    with_units,
)
from geostatstransforms_jl_spark.core.geotable import georef_grid
from geostatstransforms_jl_spark.core.grid import GridMeta
from geostatstransforms_jl_spark.operators import Gradient
from geostatstransforms_jl_spark.operators.gradient import gradient_long_df
from geostatstransforms_jl_spark.operators.tabletransforms import absolute_units_df


# ---------------- pure algebra ----------------


def test_parse_format_roundtrip():
    assert parse_unit("K*m^-1") == {"K": 1, "m": -1}
    assert parse_unit("m/s") == {"m": 1, "s": -1}
    assert parse_unit("m^2*s^-2") == {"m": 2, "s": -2}
    assert parse_unit("1") == {} and parse_unit("") == {}
    # canonical order: positive factors first, groups alphabetical
    assert format_unit({"m": -1, "K": 1}) == "K*m^-1"
    assert format_unit({}) == "1"
    assert format_unit(parse_unit("s^-1*kg*m")) == "kg*m*s^-1"


def test_algebra_ops():
    assert div_units("K", "m") == "K*m^-1"
    assert div_units("1", "m") == "m^-1"
    assert mul_units("m*s^-1", "s") == "m"
    assert mul_units("m^-1", "m") == "1"
    assert pow_unit("m*s^-1", 2) == "m^2*s^-2"
    assert pow_unit("m", 0) == "1"


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_unit("m^")
    with pytest.raises(ValueError):
        parse_unit("3m")


# ---------------- metadata carrier ----------------


def test_with_units_roundtrip_and_canonicalization(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    out = with_units(df, {"a": "m/s"})
    assert unit_of(out, "a") == "m*s^-1"  # canonicalized on write
    assert unit_of(out, "b") is None  # never stamped ≠ dimensionless
    # survives ordinary Catalyst projections
    import pyspark.sql.functions as F

    proj = out.select("a", (F.col("b") * 2).alias("b2"))
    assert unit_of(proj, "a") == "m*s^-1"


def test_with_units_unknown_column_raises(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError, match="nope"):
        with_units(df, {"nope": "m"})


def test_absolute_units_stamps_base_symbol(spark):
    df = spark.createDataFrame([(100.0, 2.0)], "temp double, d double")
    out = absolute_units_df(df, {"temp": "degC", "d": "km"})
    row = out.first()
    assert row.temp == pytest.approx(373.15)
    assert row.d == pytest.approx(2000.0)
    assert unit_of(out, "temp") == "K"
    assert unit_of(out, "d") == "m"
    # explicit (scale, offset) pairs carry no symbol → no stamp
    out2 = absolute_units_df(df, {"temp": (2.0, 1.0)})
    assert unit_of(out2, "temp") is None


# ---------------- Gradient derivation (reference test/gradient.jl:8-20) ----


def _const_grid(spark):
    rows = [(i, j, 1.0) for i in range(5) for j in range(5)]
    return spark.createDataFrame(rows, "i int, j int, a double")


def test_gradient_dimensionless_derives_per_meter(spark):
    # reference: unit(eltype(grad.a_x)) == u"m^-1" for a unitless variable
    out, _ = Gradient("a").apply(georef_grid(_const_grid(spark), GridMeta(5, 5)))
    assert unit_of(out.df, "a_x") == "m^-1"
    assert unit_of(out.df, "a_y") == "m^-1"
    assert all(r.a_x == 0.0 and r.a_y == 0.0 for r in out.df.collect())


def test_gradient_derives_units_through(spark):
    # reference: a::K → a_x::K*m^-1
    df = with_units(_const_grid(spark), {"a": "K"})
    out, _ = Gradient("a").apply(georef_grid(df, GridMeta(5, 5)))
    assert unit_of(out.df, "a_x") == "K*m^-1"
    assert unit_of(out.df, "a_y") == "K*m^-1"


def test_gradient_long_df_default_leaves_metadata_untouched(spark):
    # driver-compared callers use the df function directly with no
    # coord_unit — schema metadata must stay empty (opt-in stamp only)
    out = gradient_long_df(_const_grid(spark), "a", 5, 5, 1.0, 1.0)
    assert unit_of(out, "a_x") is None
    out2 = gradient_long_df(
        _const_grid(spark), "a", 5, 5, 1.0, 1.0, coord_unit="m"
    )
    assert unit_of(out2, "a_x") == "m^-1"


def test_ingest_to_gradient_chain(spark):
    # end-to-end: degC ingest → values in K, symbol K → Gradient → K*m^-1
    rows = [(i, j, 20.0) for i in range(5) for j in range(5)]
    df = spark.createDataFrame(rows, "i int, j int, t double")
    df = absolute_units_df(df, {"t": "degC"})
    out, _ = Gradient("t").apply(georef_grid(df, GridMeta(5, 5)))
    assert unit_of(out.df, "t_x") == "K*m^-1"
    assert all(r.t_x == 0.0 and r.t_y == 0.0 for r in out.df.collect())
