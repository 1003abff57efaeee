"""Symbolic unit algebra carried as Spark column metadata.

The reference attaches Unitful.jl quantities to every column and derives
units through transforms — Gradient of a ``K``-valued variable over a
meter-spaced grid yields ``K*m^-1`` columns (reference
``test/gradient.jl:8-20``; ``src/gradient.jl`` divides by the grid
spacing, which carries the CRS length unit).  Spark has no quantity
type, but its schema DOES carry per-column metadata end-to-end through
Catalyst projections at zero runtime cost — so the engine's contract is:

* numeric VALUES are always in absolute base units (fixed at ingest by
  ``AbsoluteUnits`` / ``absolute_units_df``, SURVEY.md §1.4), and
* the unit SYMBOL rides in column metadata under the key ``"unit"``,
  written with :func:`with_units`, read with :func:`unit_of`, and
  derived through unit-transforming operators with :func:`mul_units` /
  :func:`div_units`.

A unit string is a ``*``-separated product of ``sym^exp`` factors with
integer exponents (``"K"``, ``"m^-1"``, ``"K*m^-1"``, ``"m^2*s^-2"``);
``"1"`` or ``""`` is dimensionless.  ``/`` is accepted on input
(``"m/s"`` ≡ ``"m*s^-1"``); output is canonical ``*``/``^`` form with
positive exponents first, each group alphabetical, so symbols compare
with ``==`` the way the reference compares ``unit(eltype(col))``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FACTOR = re.compile(r"^([A-Za-zµ%°]+)(?:\^(-?\d+))?$")


def parse_unit(s: str) -> dict:
    """``"K*m^-1"`` → ``{"K": 1, "m": -1}``; ``"m/s"`` → ``{"m": 1, "s": -1}``;
    ``"1"``/``""`` → ``{}``."""
    s = (s or "").strip()
    if s in ("", "1"):
        return {}
    out: dict = {}
    # split on * keeping / as an inversion marker for the NEXT factor
    sign = 1
    for tok in re.split(r"([*/])", s):
        tok = tok.strip()
        if tok == "*" or tok == "":
            continue
        if tok == "/":
            sign = -1
            continue
        m = _FACTOR.match(tok)
        if not m:
            raise ValueError(f"cannot parse unit factor {tok!r} in {s!r}")
        sym, exp = m.group(1), int(m.group(2) or 1) * sign
        sign = 1
        out[sym] = out.get(sym, 0) + exp
        if out[sym] == 0:
            del out[sym]
    return out


def format_unit(d: dict) -> str:
    """Canonical string: positive-exponent factors first, each group
    alphabetical; dimensionless → ``"1"``."""
    pos = sorted((s, e) for s, e in d.items() if e > 0)
    neg = sorted((s, e) for s, e in d.items() if e < 0)
    if not pos and not neg:  # empty OR all-zero exponents
        return "1"
    parts = [s if e == 1 else f"{s}^{e}" for s, e in pos + neg]
    return "*".join(parts)


def mul_units(a: str, b: str) -> str:
    da, db = parse_unit(a), parse_unit(b)
    for s, e in db.items():
        da[s] = da.get(s, 0) + e
        if da[s] == 0:
            del da[s]
    return format_unit(da)


def div_units(a: str, b: str) -> str:
    """``div_units("K", "m")`` → ``"K*m^-1"`` — the Gradient derivation."""
    return mul_units(a, format_unit({s: -e for s, e in parse_unit(b).items()}))


def pow_unit(u: str, n: int) -> str:
    return format_unit({s: e * n for s, e in parse_unit(u).items()})


def with_units(df: DataFrame, units: dict) -> DataFrame:
    """Stamp ``{"unit": <canonical symbol>}`` into the named columns'
    metadata (one Catalyst projection, no data movement).  Unknown columns
    raise — a silently ignored stamp is a wrong-units bug waiting."""
    missing = set(units) - set(df.columns)
    if missing:
        raise ValueError(f"with_units: columns not in DataFrame: {sorted(missing)}")
    canon = {c: format_unit(parse_unit(u)) for c, u in units.items()}
    return df.select(
        *[
            F.col(c).alias(c, metadata={**_meta(df, c), "unit": canon[c]})
            if c in canon
            else F.col(c)
            for c in df.columns
        ]
    )


def _meta(df: DataFrame, col: str) -> dict:
    for f in df.schema.fields:
        if f.name == col:
            return dict(f.metadata or {})
    return {}


def unit_of(df: DataFrame, col: str) -> str | None:
    """The column's unit symbol, or None if never stamped.  ``"1"`` means
    explicitly dimensionless — distinct from unknown."""
    m = _meta(df, col)
    return m.get("unit")
