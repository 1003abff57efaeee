"""TableTransforms vocabulary reused by the reference as sub-operators
(primitive P12, SURVEY.md §2.2): Select, Reject, Filter, OneHot, StdFeats.

The reference leans on TableTransforms.jl for these inside its own pipelines
(`Select` src/detrend.jl:51, `Only(Continuous)` src/droplocallowhigh.jl:37,
`Filter`/`Reject` in Rasterize.revert src/rasterize.jl:129, `OneHot`
src/maxposterior.jl:62, `StdFeats` src/clustering/slic.jl:64).  Here each is
a Pipeline-composable stage over a GeoTable: pure column projections and
filters stay single Catalyst expressions (and push down through earlier
lazy stages); StdFeats is the classic two-pass agg + broadcast combine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.geotable import GeoTable
from .uniquecoords import unique_coords_df  # noqa: F401  (re-export convenience)


def _meta_cols(gt: GeoTable) -> list:
    """Columns that carry geometry/identity and always survive a projection."""
    keep = [gt.row_id]
    dom = gt.domain
    for attr in ("coord_cols", "index_cols"):
        keep += list(getattr(dom, attr, ()))
    if getattr(dom, "tile_col", None):
        keep.append(dom.tile_col)
    return [c for c in dict.fromkeys(keep) if c in gt.df.columns]


@dataclass
class Select:
    """Keep only `cols` (plus geometry/row-id columns)."""

    cols: Sequence[str]

    def apply(self, gt: GeoTable):
        keep = _meta_cols(gt) + [c for c in self.cols if c in gt.df.columns]
        return gt.with_df(gt.df.select(*dict.fromkeys(keep))), None

    __call__ = apply


@dataclass
class Reject:
    """Drop `cols` (geometry/row-id columns are never dropped)."""

    cols: Sequence[str]

    def apply(self, gt: GeoTable):
        protected = set(_meta_cols(gt))
        drop = [c for c in self.cols if c in gt.df.columns and c not in protected]
        return gt.with_df(gt.df.drop(*drop)), None

    __call__ = apply


@dataclass
class Only:
    """Keep only columns of one scitype ('continuous' | 'categorical') —
    the reference's `Only(Continuous)` (src/droplocallowhigh.jl:37)."""

    scitype: str = "continuous"

    def apply(self, gt: GeoTable):
        from ..core.aggregates import scitype_of

        meta = set(_meta_cols(gt))
        keep = [
            f.name
            for f in gt.df.schema.fields
            if f.name in meta or scitype_of(f.dataType) == self.scitype
        ]
        return gt.with_df(gt.df.select(*keep)), None

    __call__ = apply


@dataclass
class Filter:
    """Row filter by a SQL predicate string or Column; REVERTIBLE — the
    cache holds the rejected rows, and revert unions them back (the
    reference's TableTransforms.Filter keeps rejected rows for revert)."""

    predicate: object

    def apply(self, gt: GeoTable):
        pred = F.expr(self.predicate) if isinstance(self.predicate, str) else self.predicate
        kept = gt.df.filter(pred)
        dropped = gt.df.filter(~pred | pred.isNull())
        return gt.with_df(kept), dropped

    def revert(self, gt: GeoTable, cache):
        return gt.with_df(gt.df.unionByName(cache))

    __call__ = apply


@dataclass
class OneHot:
    """One-hot encode one categorical column into 0/1 int columns
    `{col}_{level}`, levels discovered and ordered deterministically
    (reference src/maxposterior.jl:62 builds the same indicator matrix)."""

    col: str
    drop: bool = True

    def apply(self, gt: GeoTable):
        levels = sorted(
            r[0] for r in gt.df.select(self.col).distinct().collect() if r[0] is not None
        )
        df = gt.df
        for lv in levels:
            df = df.withColumn(
                f"{self.col}_{lv}", (F.col(self.col) == F.lit(lv)).cast("int")
            )
        if self.drop:
            df = df.drop(self.col)
        return gt.with_df(df), levels

    __call__ = apply


@dataclass
class StdFeats:
    """Standardize continuous columns to zero mean / unit variance — the
    reference's `StdFeats` (src/clustering/slic.jl:64).  Two-pass: one agg
    collects (mean, std) per column (tiny), then a vectorized subtract/
    divide; cache holds the moments so revert restores the originals."""

    cols: Optional[Sequence[str]] = None

    def _target_cols(self, gt: GeoTable):
        meta = set(_meta_cols(gt))
        if self.cols is not None:
            return [c for c in self.cols if c in gt.df.columns]
        return [
            f.name
            for f in gt.df.schema.fields
            if f.name not in meta and isinstance(f.dataType, (T.DoubleType, T.FloatType))
        ]

    def apply(self, gt: GeoTable):
        cols = self._target_cols(gt)
        if not cols:
            return gt, {}
        row = gt.df.agg(
            *[F.avg(c).alias(f"m_{c}") for c in cols],
            *[F.stddev_samp(c).alias(f"s_{c}") for c in cols],
        ).first()
        moments = {c: (row[f"m_{c}"], row[f"s_{c}"] or 1.0) for c in cols}
        df = gt.df
        for c, (m, s) in moments.items():
            df = df.withColumn(c, (F.col(c) - F.lit(m)) / F.lit(s if s else 1.0))
        return gt.with_df(df), moments

    def revert(self, gt: GeoTable, cache):
        df = gt.df
        for c, (m, s) in cache.items():
            if c in df.columns:
                df = df.withColumn(c, F.col(c) * F.lit(s) + F.lit(m))
        return gt.with_df(df)

    __call__ = apply


# affine unit conversions to absolute/SI base units: unit → (scale, offset)
# with value_abs = scale · value + offset (the reference's AbsoluteUnits()
# pipe, src/utils.jl:27-31 — Unitful's °C→K is the canonical affine case,
# tested in reference test/uniquecoords.jl:97-117)
_AFFINE_UNITS = {
    "K": (1.0, 0.0),
    "degC": (1.0, 273.15),
    "degF": (5.0 / 9.0, 273.15 - 32.0 * 5.0 / 9.0),
    "m": (1.0, 0.0),
    "km": (1000.0, 0.0),
    "cm": (0.01, 0.0),
    "mm": (0.001, 0.0),
    "ft": (0.3048, 0.0),
    "mi": (1609.344, 0.0),
    "s": (1.0, 0.0),
    "min": (60.0, 0.0),
    "h": (3600.0, 0.0),
    "g": (0.001, 0.0),
    "kg": (1.0, 0.0),
    "lb": (0.45359237, 0.0),
    "Pa": (1.0, 0.0),
    "bar": (100000.0, 0.0),
    "atm": (101325.0, 0.0),
    "psi": (6894.757293168361, 0.0),
    "mmHg": (133.322387415, 0.0),
    "in": (0.0254, 0.0),
    "yd": (0.9144, 0.0),
    "nmi": (1852.0, 0.0),
    "um": (1e-6, 0.0),
    "nm": (1e-9, 0.0),
    "d": (86400.0, 0.0),
    "ms": (0.001, 0.0),
    "us": (1e-6, 0.0),
    "t": (1000.0, 0.0),
    "mg": (1e-6, 0.0),
    "oz": (0.028349523125, 0.0),
    "degR": (5.0 / 9.0, 0.0),
    "L": (0.001, 0.0),
    "mL": (1e-6, 0.0),
    "gal": (0.003785411784, 0.0),
    "rad": (1.0, 0.0),
    "deg": (3.141592653589793 / 180.0, 0.0),
}


# SI base symbol each affine name converts INTO — stamped as column
# metadata by absolute_units_df so downstream unit-deriving operators
# (Gradient: unit(var)/coord_unit, functions/units.py) see what the
# values now are.  Pressure keeps the derived symbol "Pa" and volume
# "m^3"; angles stay "rad" (Unitful prints them, though they are
# dimensionless in its algebra).
_BASE_SYMBOL = {
    "K": "K", "degC": "K", "degF": "K", "degR": "K",
    "m": "m", "km": "m", "cm": "m", "mm": "m", "ft": "m", "mi": "m",
    "in": "m", "yd": "m", "nmi": "m", "um": "m", "nm": "m",
    "s": "s", "min": "s", "h": "s", "d": "s", "ms": "s", "us": "s",
    "g": "kg", "kg": "kg", "lb": "kg", "t": "kg", "mg": "kg", "oz": "kg",
    "Pa": "Pa", "bar": "Pa", "atm": "Pa", "psi": "Pa", "mmHg": "Pa",
    "L": "m^3", "mL": "m^3", "gal": "m^3",
    "rad": "rad", "deg": "rad",
}


def _unit_affine(u):
    """Resolve a unit spec to its (scale, offset) pair: a name from the
    built-in table, or an explicit ``(scale, offset)`` tuple for units the
    table doesn't list (the general escape hatch toward Unitful's open
    system, reference src/utils.jl:27-31)."""
    if isinstance(u, (tuple, list)):
        if len(u) != 2:
            raise ValueError(f"unit tuple must be (scale, offset), got {u!r}")
        return float(u[0]), float(u[1])
    if u not in _AFFINE_UNITS:
        raise ValueError(
            f"unknown unit {u!r}; pass an explicit (scale, offset) tuple"
        )
    return _AFFINE_UNITS[u]


def absolute_units_df(df, units: "dict[str, object]"):
    """Normalize affine-united columns to absolute base units at ingest —
    the engine's stand-in for the reference's `AbsoluteUnits()` pipe run
    before every numeric transform (SURVEY.md §1.4 documents the contract:
    the engine fixes SI units at ingest; this helper does the fixing).

    `units` maps column → source unit: a name (e.g. ``{"temp": "degC"}``)
    or an explicit affine pair ``{"temp": (scale, offset)}`` with
    value_abs = scale · value + offset.  Pure Catalyst projections — zero
    extra passes.

    Named units also stamp the converted column's metadata with the SI
    base symbol it now holds (``degC`` → values in K, ``{"unit": "K"}``),
    which unit-deriving operators read (Gradient → ``K*m^-1``,
    reference test/gradient.jl:14-19).  Explicit (scale, offset) pairs
    carry no symbol and stamp nothing.
    """
    from ..functions.units import _meta

    exprs = []
    for c in df.columns:
        if c in units:
            a, b = _unit_affine(units[c])
            e = (F.col(c).cast("double") * F.lit(a) + F.lit(b))
            sym = _BASE_SYMBOL.get(units[c]) if isinstance(units[c], str) else None
            # merge, don't replace: the column may carry unrelated metadata
            # (comments, lineage stamps) that the conversion must not drop —
            # same contract as functions.units.with_units.  A pre-existing
            # "unit" key is always superseded: by the new base symbol for
            # named units, by nothing for explicit (scale, offset) pairs
            # (the converted unit is unknown, and keeping the stale symbol
            # would mislabel converted values).
            meta = {k: v for k, v in _meta(df, c).items() if k != "unit"}
            if sym:
                meta["unit"] = sym
            exprs.append(e.alias(c, metadata=meta) if meta else e.alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


@dataclass
class AbsoluteUnits:
    """Pipeline stage: affine-normalize united columns (°C→K etc.) so every
    downstream aggregate (mean of temperatures, kriging on mixed sources)
    operates on absolute scales, as the reference guarantees by piping all
    inputs through Unitful's absoluteunit (src/utils.jl:27-31)."""

    units: "dict[str, str]"

    def apply(self, gt: GeoTable):
        return gt.with_df(absolute_units_df(gt.df, self.units)), None

    __call__ = apply
