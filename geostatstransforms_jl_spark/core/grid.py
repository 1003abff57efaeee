"""Grid (raster) domain metadata.

The reference keeps the raster domain as a Meshes.jl `Grid` object outside the
attribute table; transforms dispatch on it (reference: src/aggregate.jl:64-73,
src/transfer.jl:46-55).  We carry the same information as a small Python value
(driver-side metadata, never shuffled): origin, spacing, and dims.  Cell (i, j)
with 0-based indices covers [ox + i*sx, ox + (i+1)*sx) x [oy + j*sy, ...) and
its centroid is (ox + (i + 0.5) * sx, oy + (j + 0.5) * sy).

Linearization matches Julia's column-major `LinearIndices`: linear index
= i + j * nx (0-based), i fastest — the reference's tests index cells this way
(reference: test/rasterize.jl:22).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Sequence, Tuple


def fitdims(dims: Sequence[int], n: int) -> Tuple[int, ...]:
    """Fit tuple `dims` to length `n` by repeating the last entry.

    Mirrors `_fitdims` (reference: src/utils.jl:6).
    """
    dims = tuple(int(d) for d in dims)
    if not dims:
        raise ValueError("dims must be non-empty")
    return tuple(dims[i] if i < len(dims) else dims[-1] for i in range(n))


@dataclass(frozen=True)
class GridMeta:
    """A regular 2-D grid: nx × ny cells over [ox, ox+nx*sx] × [oy, oy+ny*sy]."""

    nx: int
    ny: int
    ox: float = 0.0
    oy: float = 0.0
    sx: float = 1.0
    sy: float = 1.0

    @property
    def ncells(self) -> int:
        return self.nx * self.ny

    @property
    def extrema(self) -> Tuple[Tuple[float, float], Tuple[float, float]]:
        return (
            (self.ox, self.oy),
            (self.ox + self.nx * self.sx, self.oy + self.ny * self.sy),
        )

    def centroid(self, i: int, j: int) -> Tuple[float, float]:
        return (self.ox + (i + 0.5) * self.sx, self.oy + (j + 0.5) * self.sy)

    def linear(self, i: int, j: int) -> int:
        """0-based column-major linear index (i fastest), like LinearIndices."""
        return i + j * self.nx

    def coarsen(self, fx: int, fy: int) -> "GridMeta":
        """Target grid of Upscale(fx, fy): ceil-divided dims, same extent per
        full blocks; ragged edges allowed (reference: test/upscale.jl:68-81).

        The reference's `coarsen(grid, RegularCoarsening(f))` yields dims
        ceil(n/f) and keeps the overall bounding box; edge blocks are smaller.
        Spacing of the coarse grid is extent/dims.
        """
        tnx = -(-self.nx // fx)
        tny = -(-self.ny // fy)
        return GridMeta(
            nx=tnx,
            ny=tny,
            ox=self.ox,
            oy=self.oy,
            sx=self.nx * self.sx / tnx,
            sy=self.ny * self.sy / tny,
        )

    def refine(self, fx: int, fy: int) -> "GridMeta":
        """Target grid of Downscale(fx, fy): each cell splits into fx × fy."""
        return GridMeta(
            nx=self.nx * fx,
            ny=self.ny * fy,
            ox=self.ox,
            oy=self.oy,
            sx=self.sx / fx,
            sy=self.sy / fy,
        )

    def aligned_with(self, other: "GridMeta") -> bool:
        """True when both grids share extrema — the precondition of the
        reference's grid fast path (reference: src/aggregate.jl:65)."""
        (ax, ay), (bx, by) = self.extrema
        (cx, cy), (dx, dy) = other.extrema
        return (
            abs(ax - cx) < 1e-9
            and abs(ay - cy) < 1e-9
            and abs(bx - dx) < 1e-9
            and abs(by - dy) < 1e-9
        )

    def divides(self, coarser: "GridMeta") -> bool:
        """True when self's dims are integer multiples of coarser's dims
        (reference: `all(iszero, size(sdom) .% size(tdom))`, src/aggregate.jl:65)."""
        return self.nx % coarser.nx == 0 and self.ny % coarser.ny == 0

    def with_dims(self, nx: int, ny: int) -> "GridMeta":
        return replace(self, nx=nx, ny=ny)
