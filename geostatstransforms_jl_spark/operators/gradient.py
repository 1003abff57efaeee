"""Gradient — Sobel image gradient of one variable over regular grid tiles.

Reference semantics (src/gradient.jl:19-75): separable Sobel on the grid
array with replicate border, divided by the grid spacing per axis; output
columns named ``<var>_x`` / ``<var>_y`` (CRS axis names, src/gradient.jl:64-66).
Views of grids: cells outside the view contribute zeros and only view cells
are returned (src/gradient.jl:29-32,51-61).

ImageFiltering's sobel kernels are normalized — the derivative factor is the
central difference [-1, 0, 1]/2 and the cross-smoothing is [1, 2, 1]/4, which
the reference's own view fixtures pin down (test/gradient.jl:24-31: a unit
step at the border under replicate padding gives ±0.5).

Spark plan: each image/tile is one group of a grouped `applyInPandas` — a 2-D
stencil is not expressible as a Catalyst window (windows are 1-D), and the
tile is the natural Arrow batch.  Cross-tile halos are unnecessary because a
tile IS a whole image grid.  For the packed image table there is a
`gradient_packed` variant that never explodes pixels to rows: decode → sobel →
stats per image inside one `mapInPandas` pass (the 100-TB-friendly path: zero
shuffle, zero row blowup).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core.geotable import GeoTable, GridDomain


def _stamp_grad_units(src: DataFrame, out: DataFrame, var: str, out_cols, coord_unit):
    """Derive the derivative columns' unit — unit(var) / coord_unit — into
    output-column metadata (reference test/gradient.jl:8-20: Gradient of a
    ``K`` variable on a meter grid yields ``K*m^-1``; a dimensionless one
    yields ``m^-1``).  ``coord_unit=None`` skips stamping entirely (schema
    byte-identical to pre-unit-algebra callers).  Metadata can't ride
    through applyInPandas' DDL schema, so this is a post-projection — pure
    Catalyst aliasing, zero data movement."""
    if coord_unit is None:
        return out
    from ..functions.units import div_units, unit_of, with_units

    gu = div_units(unit_of(src, var) or "1", coord_unit)
    return with_units(out, {c: gu for c in out_cols})


# Separable length-3 gradient kernels, ImageFiltering normalization:
# (derivative factor, cross-axis smoothing factor).  The reference accepts
# any `KernelFactors.*` pair via its `kern` keyword (src/gradient.jl:24);
# these are the ones its docs name.  "central" is pure central difference
# (identity smoothing) for callers that want the unsmoothed derivative.
KERNELS = {
    "sobel": ((-0.5, 0.0, 0.5), (0.25, 0.5, 0.25)),
    "prewitt": ((-0.5, 0.0, 0.5), (1.0 / 3.0, 1.0 / 3.0, 1.0 / 3.0)),
    "scharr": ((-0.5, 0.0, 0.5), (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0)),
    # Ando's consistent 3×3 (Ando 2000): published column (0.112737,
    # 0.274526, 0.112737) sums to 0.5; under this file's deriv=±0.5 +
    # smooth-sums-to-1 convention both entries scale by 2 so the full
    # 3×3 reproduces the published operator exactly
    "ando3": ((-0.5, 0.0, 0.5), (0.225474, 0.549052, 0.225474)),
    "central": ((-0.5, 0.0, 0.5), (0.0, 1.0, 0.0)),
}


def _resolve_kern(kern):
    """Accept a registry name or an explicit (deriv, smooth) pair of
    length-3 factor tuples."""
    if isinstance(kern, str):
        try:
            return KERNELS[kern]
        except KeyError:
            raise ValueError(
                f"unknown gradient kernel {kern!r}; choose from {sorted(KERNELS)} "
                "or pass an explicit (deriv, smooth) pair of length-3 tuples"
            ) from None
    deriv, smooth = kern
    if len(deriv) != 3 or len(smooth) != 3:
        raise ValueError("custom gradient kernel factors must have length 3")
    return tuple(float(v) for v in deriv), tuple(float(v) for v in smooth)


def sobel_tile(img: np.ndarray, kern="sobel") -> tuple:
    """img[i, j] → (d/di, d/dj), replicate border, ImageFiltering scaling."""
    dk, sk = _resolve_kern(kern)
    if (dk, sk) == KERNELS["sobel"]:
        # keep the original evaluation order bit-exact: the literal oracles
        # pin these values, and a reassociated sum can flip a result across
        # the comparator's round-to-6-decimals boundary
        p = np.pad(img, 1, mode="edge")
        d0 = (p[2:, :] - p[:-2, :]) / 2.0
        g0 = (d0[:, :-2] + 2.0 * d0[:, 1:-1] + d0[:, 2:]) / 4.0
        d1 = (p[:, 2:] - p[:, :-2]) / 2.0
        g1 = (d1[:-2, :] + 2.0 * d1[1:-1, :] + d1[2:, :]) / 4.0
        return g0, g1
    return gradient_axis(img, 0, (dk, sk)), gradient_axis(img, 1, (dk, sk))


def _conv1(a: np.ndarray, axis: int, kernel) -> np.ndarray:
    """Length-3 convolution along `axis` of an array padded by 1 on that
    axis; the output drops that axis' padding."""
    out = None
    for t, kv in enumerate(kernel):
        if kv == 0.0:
            continue
        s = [slice(None)] * a.ndim
        s[axis] = slice(t, a.shape[axis] - 2 + t)
        term = kv * a[tuple(s)]
        out = term if out is None else out + term
    return out


def gradient_axis(img: np.ndarray, axis: int, kern="sobel") -> np.ndarray:
    """n-D derivative along `axis`, replicate border: the kernel's
    derivative factor on `axis` and its smoothing factor on every other
    axis — the separable form ImageFiltering's `KernelFactors.*` take in
    any dimension (reference `imgradients` is dimension-generic,
    src/gradient.jl:56)."""
    deriv, smooth = _resolve_kern(kern)
    out = np.pad(img, 1, mode="edge")
    for a in range(img.ndim):
        out = _conv1(out, a, deriv if a == axis else smooth)
    return out


def sobel_axis(img: np.ndarray, axis: int) -> np.ndarray:
    return gradient_axis(img, axis, "sobel")


def gradient_nd_long_df(
    df: DataFrame,
    var: str,
    dims,
    spacings=None,
    index_cols=("i", "j", "l"),
    tile_col: Optional[str] = None,
    axis_names=None,
    kern="sobel",
    coord_unit=None,
) -> DataFrame:
    """n-D long/grid form: rows (tile?, i₀..i_{d-1}, var) →
    (tile?, i₀..i_{d-1}, var_<axis> per axis).

    `dims` are the global grid extents per axis; `spacings` the cell sizes
    (default 1.0); `axis_names` the CRS axis suffixes (default x, y, z,
    w₃, w₄, …).  Rows absent from a tile contribute zeros (view semantics,
    src/gradient.jl:51-61) and are not emitted.  `coord_unit` (e.g. "m")
    stamps unit(var)/coord_unit into the output columns' metadata
    (test/gradient.jl:8-20); None leaves metadata untouched."""
    dims = [int(n) for n in dims]
    d = len(dims)
    index_cols = list(index_cols)[:d]
    assert len(index_cols) == d, "index_cols must match dims"
    if spacings is None:
        spacings = [1.0] * d
    if axis_names is None:
        axis_names = ["x", "y", "z"][:d] + [f"w{a}" for a in range(3, d)]
    keys = [tile_col] if tile_col else []
    out_cols = [f"{var}_{ax}" for ax in axis_names]

    kern = _resolve_kern(kern)

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros(tuple(dims))
        idx = []
        for a, c in enumerate(index_cols):
            v = np.asarray(pdf[c].to_numpy(), dtype=np.int64)
            # out-of-range indices would wrap (negative) to the opposite
            # grid edge or raise deep inside the executor batch — reject
            # them with the offending axis named instead
            if v.size and (v.min() < 0 or v.max() >= dims[a]):
                raise ValueError(
                    f"gradient: index column {c!r} out of range "
                    f"[0, {dims[a]}) — min {v.min()}, max {v.max()}"
                )
            idx.append(v)
        idx = tuple(idx)
        img[idx] = pdf[var].to_numpy(dtype=float)
        res = pdf[keys + index_cols].copy()
        for a, (oc, s) in enumerate(zip(out_cols, spacings)):
            res[oc] = gradient_axis(img, a, kern)[idx] / s
        return res

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{c} int" for c in index_cols]
        + [f"{c} double" for c in out_cols]
    )
    sel = keys + index_cols + [var]
    if keys:
        out = df.select(*sel).groupBy(*keys).applyInPandas(per_tile, schema)
    else:
        import pyspark.sql.functions as F

        dd = df.select(*sel).withColumn("_t", F.lit(0))
        out = dd.groupBy("_t").applyInPandas(
            lambda pdf: per_tile(pdf.drop(columns=["_t"])), schema
        )
    return _stamp_grad_units(df, out, var, out_cols, coord_unit)


def gradient_long_df(
    df: DataFrame,
    var: str,
    nx: int,
    ny: int,
    sx: float,
    sy: float,
    index_cols=("i", "j"),
    tile_col: Optional[str] = None,
    kern="sobel",
    coord_unit=None,
) -> DataFrame:
    """Long/grid form: rows (tile?, i, j, var) → (tile?, i, j, var_x, var_y).

    Rows absent from a tile are treated as zeros (view semantics) and are not
    emitted in the output.  `coord_unit` (e.g. "m") stamps
    unit(var)/coord_unit into var_x/var_y column metadata (reference
    test/gradient.jl:8-20); None (default) leaves metadata untouched.
    """
    ic, jc = index_cols
    keys = [tile_col] if tile_col else []
    out_x, out_y = f"{var}_x", f"{var}_y"
    kern = _resolve_kern(kern)

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((nx, ny))
        ii = np.asarray(pdf[ic].to_numpy(), dtype=np.int64)
        jj = np.asarray(pdf[jc].to_numpy(), dtype=np.int64)
        for name, v, n in ((ic, ii, nx), (jc, jj, ny)):
            if v.size and (v.min() < 0 or v.max() >= n):
                raise ValueError(
                    f"gradient: index column {name!r} out of range [0, {n})"
                )
        img[ii, jj] = pdf[var].to_numpy(dtype=float)
        g0, g1 = sobel_tile(img, kern)
        res = pdf[keys + [ic, jc]].copy()
        res[out_x] = g0[ii, jj] / sx
        res[out_y] = g1[ii, jj] / sy
        return res

    schema = ", ".join(
        ([f"{tile_col} string"] if tile_col else [])
        + [f"{ic} int", f"{jc} int", f"{out_x} double", f"{out_y} double"]
    )
    sel = keys + [ic, jc, var]
    if keys:
        out = df.select(*sel).groupBy(*keys).applyInPandas(per_tile, schema)
    else:
        # single tile: still one group — route through a constant key
        import pyspark.sql.functions as F

        d = df.select(*sel).withColumn("_t", F.lit(0))
        out = d.groupBy("_t").applyInPandas(
            lambda pdf: per_tile(pdf.drop(columns=["_t"])), schema
        )
    return _stamp_grad_units(df, out, var, (out_x, out_y), coord_unit)


@dataclass
class Gradient:
    var: str
    kern: object = "sobel"  # registry name or (deriv, smooth) factor pair
    # the reference's grids georeference coordinates in meters, so Gradient
    # ALWAYS divides by a length unit: dimensionless a → a_x::m^-1, a::K →
    # a_x::K*m^-1 (test/gradient.jl:8-20).  Set None to opt out of the
    # metadata stamp.
    coord_unit: object = "m"

    def apply(self, gt: GeoTable):
        d = gt.domain
        assert isinstance(d, GridDomain), "gradient only defined over grids"
        m = d.meta
        out = gradient_long_df(
            gt.df, self.var, m.nx, m.ny, m.sx, m.sy, d.index_cols, d.tile_col,
            kern=self.kern, coord_unit=self.coord_unit,
        )
        return GeoTable(out, d, row_id=gt.row_id), None

    __call__ = apply


def gradient_packed(images: DataFrame, stats: bool = True, carry=(), kern="sobel") -> DataFrame:
    """Packed image-table fast path: (image_id, bytes, w, h, fmt) →
    per-image gradient summary (mean |∇|, max |∇|) without exploding pixels.
    One narrow mapInPandas pass — the plan a 10¹²-row table needs.

    ``carry`` columns pass through to the output so downstream stages
    (georeference, spatial join) can consume the summary WITHOUT re-reading
    or caching the wide binary table — at bench scale the 4 KB/image bytes
    column is the dominant memory traffic, and carrying the few narrow
    columns forward lets the whole synthesis→Sobel→anchor pipeline stay one
    shuffle-free codegen'd stage."""
    from ..core.png import decode_image

    carry = [c for c in carry if c != "image_id"]
    kern = _resolve_kern(kern)  # resolve once, driver-side; ships as a tuple

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pix = decode_image(r.bytes, r.fmt).astype(np.float64)
                if pix.ndim == 3:
                    pix = pix.mean(axis=2)
                g0, g1 = sobel_tile(pix.T, kern)  # [i, j] layout
                mag = np.hypot(g0, g1)
                row = {
                    "image_id": r.image_id,
                    "grad_mean": float(mag.mean()),
                    "grad_max": float(mag.max()),
                }
                for c in carry:
                    row[c] = getattr(r, c)
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["image_id", "grad_mean", "grad_max", *carry]
            )

    types = {f.name: f.dataType.simpleString() for f in images.schema.fields}
    schema = "image_id string, grad_mean double, grad_max double" + "".join(
        f", {c} {types[c]}" for c in carry
    )
    # dedupe: 'fmt' (or 'bytes') in carry must not duplicate a column label
    # in the projection — pandas batch indexing breaks on duplicates
    sel = ["image_id", "bytes", "fmt"] + [c for c in carry if c not in ("bytes", "fmt")]
    return images.select(*sel).mapInPandas(run, schema)
