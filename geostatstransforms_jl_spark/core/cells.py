"""Hierarchical quad-cell spatial index (our H3/S2 stand-in, pure Catalyst).

The reference's neighbor searches (KNearestSearch / BallSearch, primitive P1
in SURVEY.md §2.2) are KD-tree lookups inside one process.  The distributed
analogue is *key engineering*: bucket points into square cells of a regular
2^r × 2^r grid over a bounding box, then turn distance predicates into
equi-joins on cell keys expanded by a ring of neighboring cells (kRing).

Everything here is built-in column expressions — the cell assignment and ring
expansion run inside whole-stage codegen; no Python in the hot path.

Cell key layout: ``cell = (ix << 30) | iy`` with ix, iy < 2^30 (res ≤ 30).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_RES = 30


@dataclass(frozen=True)
class CellGrid:
    """A cell grid over bounding box [x0, x1] × [y0, y1] at resolution `res`
    (2^res cells per axis)."""

    x0: float
    y0: float
    x1: float
    y1: float
    res: int

    @property
    def n(self) -> int:
        return 1 << self.res

    @property
    def cell_w(self) -> float:
        return (self.x1 - self.x0) / self.n

    @property
    def cell_h(self) -> float:
        return (self.y1 - self.y0) / self.n

    @property
    def min_cell_edge(self) -> float:
        return min(self.cell_w, self.cell_h)

    def ix(self, x: Column) -> Column:
        n = self.n
        raw = F.floor((x - F.lit(self.x0)) / F.lit(self.cell_w))
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")

    def iy(self, y: Column) -> Column:
        n = self.n
        raw = F.floor((y - F.lit(self.y0)) / F.lit(self.cell_h))
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")

    def cell(self, x: Column, y: Column) -> Column:
        return F.shiftleft(self.ix(x), 30) + self.iy(y)

    def rings_needed(self, radius: float) -> int:
        """Ring count guaranteeing coverage of a ball of `radius`."""
        return max(1, int(math.ceil(radius / self.min_cell_edge)))


def pick_resolution(x0: float, y0: float, x1: float, y1: float, target_cell_edge: float) -> int:
    """Largest res whose cell edge is still ≥ target_cell_edge (so a 3×3 ring
    covers a ball of that radius), clamped to [0, MAX_RES]."""
    ext = max(x1 - x0, y1 - y0)
    if target_cell_edge <= 0 or ext <= 0:
        return 0
    res = int(math.floor(math.log2(ext / target_cell_edge)))
    return max(0, min(MAX_RES, res))


def pick_resolution_by_count(n_rows: int, rows_per_cell: int = 8) -> int:
    """Resolution such that E[rows per cell] ≲ rows_per_cell under uniformity
    (2^(2·res) cells ≥ n/rows_per_cell, rounded FINER).

    Candidate volume of a ring-1 kNN pass is n_targets × 9 × rows_per_cell —
    undersized res blows that up quadratically, while oversized res only
    costs an extra (cheap) expansion round for the sparse stragglers."""
    if n_rows <= rows_per_cell:
        return 0
    res = int(math.ceil(math.log2(n_rows / rows_per_cell) / 2))
    return max(0, min(MAX_RES, res))


def bounds_of(df: DataFrame, x: str = "x", y: str = "y") -> Tuple[float, float, float, float]:
    """One cheap agg over the input (column-pruned scan) for the bbox."""
    r = df.agg(
        F.min(x).alias("x0"), F.min(y).alias("y0"), F.max(x).alias("x1"), F.max(y).alias("y1")
    ).first()
    x0, y0, x1, y1 = float(r.x0), float(r.y0), float(r.x1), float(r.y1)
    # degenerate extents (all points equal) still need a nonzero box
    if x1 <= x0:
        x1 = x0 + 1.0
    if y1 <= y0:
        y1 = y0 + 1.0
    return x0, y0, x1, y1


def with_cell(df: DataFrame, grid: CellGrid, x: str = "x", y: str = "y", out: str = "cell") -> DataFrame:
    return df.withColumn(out, grid.cell(F.col(x), F.col(y)))


def kring_exploded_var(
    df: DataFrame,
    grid: CellGrid,
    k_col: str,
    x: str = "x",
    y: str = "y",
    out: str = "cell",
) -> DataFrame:
    """Per-row kRing: each row explodes into the (2·k_col+1)² cells of its
    OWN ring radius (an int column).  Used by the kNN verify pass, where each
    target only needs the ring covering its own candidate distance — total
    explode volume is Σ(2kᵢ+1)², not n·(2·max k)².  Pure sequence/explode."""
    n = grid.n
    d = df.withColumn("_ix", grid.ix(F.col(x))).withColumn("_iy", grid.iy(F.col(y)))
    kc = F.col(k_col).cast("long")
    d = d.withColumn("_dx", F.explode(F.sequence(-kc, kc)))
    d = d.withColumn("_dy", F.explode(F.sequence(-kc, kc)))
    d = d.withColumn("_jx", F.col("_ix") + F.col("_dx")).withColumn("_jy", F.col("_iy") + F.col("_dy"))
    d = d.filter(
        (F.col("_jx") >= 0) & (F.col("_jx") < n) & (F.col("_jy") >= 0) & (F.col("_jy") < n)
    )
    d = d.withColumn(out, F.shiftleft(F.col("_jx"), 30) + F.col("_jy"))
    return d.drop("_ix", "_iy", "_dx", "_dy", "_jx", "_jy")


def kring_exploded(
    df: DataFrame, grid: CellGrid, k: int, x: str = "x", y: str = "y", out: str = "cell"
) -> DataFrame:
    """Explode each row into the (2k+1)² cells of its kRing (clipped to the
    grid).  Pure `sequence`/`explode` — JVM-side, codegen'd.  Rows per input
    row: ≤ (2k+1)²; callers keep k small by picking the resolution from the
    query radius (see `pick_resolution`).
    """
    n = grid.n
    ix = grid.ix(F.col(x))
    iy = grid.iy(F.col(y))
    d = df.withColumn("_ix", ix).withColumn("_iy", iy)
    d = d.withColumn(
        "_dx", F.explode(F.sequence(F.lit(-k), F.lit(k)))
    ).withColumn("_dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
    d = d.withColumn("_jx", F.col("_ix") + F.col("_dx")).withColumn("_jy", F.col("_iy") + F.col("_dy"))
    d = d.filter(
        (F.col("_jx") >= 0) & (F.col("_jx") < n) & (F.col("_jy") >= 0) & (F.col("_jy") < n)
    )
    d = d.withColumn(out, F.shiftleft(F.col("_jx"), 30) + F.col("_jy"))
    return d.drop("_ix", "_iy", "_dx", "_dy", "_jx", "_jy")
