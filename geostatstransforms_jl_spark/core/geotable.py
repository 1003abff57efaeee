"""GeoTable: the engine's equivalent of the reference's geotable.

The reference pairs a columnar attribute table with an ordered geometry
domain; row i of the table belongs to geometry i (a positional join,
reference: src/uniquecoords.jl:33, src/aggregate.jl:54).  Positional identity
does not survive a shuffle, so our invariant is *explicit keys*:

* every GeoTable DataFrame carries a frozen ``row_id`` (long) assigned once at
  ingest — never re-derived after a shuffle;
* the geometry lives in ordinary columns, so Catalyst can prune/push/shuffle
  on it like any other data:

  - ``PointDomain``  → ``x:double, y:double`` (optional ``z``)
  - ``GridDomain``   → ``i:int, j:int`` (+ optional tile column such as
    ``image_id`` when the table holds many rasters), plus driver-side
    :class:`~..core.grid.GridMeta`
  - ``GeomDomain``   → ``kind:string`` + ``rings:array<array<struct<x,y>>>``
    (points/segments are degenerate ring lists)

Transforms take and return GeoTables; `df` is always a *lazy* DataFrame, so a
pipeline of transforms composes into one Catalyst plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .grid import GridMeta

RING_TYPE = T.ArrayType(
    T.ArrayType(
        T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
        )
    )
)


@dataclass(frozen=True)
class PointDomain:
    coord_cols: Tuple[str, ...] = ("x", "y")


@dataclass(frozen=True)
class GridDomain:
    meta: GridMeta
    index_cols: Tuple[str, str] = ("i", "j")
    tile_col: Optional[str] = None  # e.g. image_id for many-tile tables


@dataclass(frozen=True)
class GeomDomain:
    kind_col: str = "kind"
    rings_col: str = "rings"


Domain = object  # PointDomain | GridDomain | GeomDomain


@dataclass
class GeoTable:
    df: DataFrame
    domain: Domain
    row_id: str = "row_id"

    @property
    def domain_cols(self) -> Tuple[str, ...]:
        d = self.domain
        if isinstance(d, PointDomain):
            return d.coord_cols
        if isinstance(d, GridDomain):
            cols = d.index_cols
            return (d.tile_col, *cols) if d.tile_col else cols
        if isinstance(d, GeomDomain):
            return (d.kind_col, d.rings_col)
        raise TypeError(f"unknown domain {d!r}")

    @property
    def value_cols(self) -> Tuple[str, ...]:
        reserved = set(self.domain_cols) | {self.row_id}
        return tuple(c for c in self.df.columns if c not in reserved)

    def with_df(self, df: DataFrame, domain: Optional[Domain] = None) -> "GeoTable":
        return GeoTable(df=df, domain=domain if domain is not None else self.domain, row_id=self.row_id)


def georef_points(df: DataFrame, coord_cols: Sequence[str] = ("x", "y"), row_id: str = "row_id") -> GeoTable:
    """Attach a point domain; freeze row_id if absent.

    ``monotonically_increasing_id`` is stable per partition layout; we freeze
    it immediately (before any shuffle) so later stages treat it as data.
    """
    if row_id not in df.columns:
        df = df.withColumn(row_id, F.monotonically_increasing_id())
    return GeoTable(df=df, domain=PointDomain(tuple(coord_cols)), row_id=row_id)


def georef_grid(
    df: DataFrame,
    meta: GridMeta,
    index_cols: Tuple[str, str] = ("i", "j"),
    tile_col: Optional[str] = None,
    row_id: str = "row_id",
) -> GeoTable:
    if row_id not in df.columns:
        ic, jc = index_cols
        # deterministic row id = column-major linear cell index (LinearIndices)
        df = df.withColumn(row_id, (F.col(ic) + F.col(jc) * F.lit(meta.nx)).cast("long"))
    return GeoTable(df=df, domain=GridDomain(meta, index_cols, tile_col), row_id=row_id)


def grid_centroids(gt: GeoTable) -> DataFrame:
    """Project a grid GeoTable to point coordinates (cell centroids)."""
    d = gt.domain
    assert isinstance(d, GridDomain)
    m = d.meta
    ic, jc = d.index_cols
    return gt.df.withColumn("x", F.lit(m.ox) + (F.col(ic) + F.lit(0.5)) * F.lit(m.sx)).withColumn(
        "y", F.lit(m.oy) + (F.col(jc) + F.lit(0.5)) * F.lit(m.sy)
    )


def full_grid(spark, meta: GridMeta, tile_col: Optional[str] = None, tiles: Optional[DataFrame] = None) -> DataFrame:
    """Generate all (i, j) cells of a grid lazily — `explode(sequence(...))`
    stays JVM-side and parallelizes via a range scan, no driver materialization.
    """
    cells = (
        spark.range(meta.nx)
        .withColumnRenamed("id", "i")
        .crossJoin(spark.range(meta.ny).withColumnRenamed("id", "j"))
        .select(F.col("i").cast("int"), F.col("j").cast("int"))
    )
    if tile_col and tiles is not None:
        cells = tiles.select(tile_col).distinct().crossJoin(cells)
    return cells
