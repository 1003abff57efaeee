"""Sources: the driver testdata catalog + generic parquet readers.

At 100 TB these reads are partitioned parquet/Iceberg scans; everything
downstream relies on Catalyst pushing filters and pruning columns into the
scan, so loaders return *lazy* DataFrames and never cache by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_zordered(
    df: DataFrame,
    path: str,
    grid,
    coords=("x", "y"),
    num_files: "int | None" = None,
    key_col: str = "zkey",
    mode: str = "error",
) -> None:
    """Write `df` as parquet spatially clustered on the Z-order curve —
    the sink-side half of ``functions.geocell.zorder_repartition``: range-
    partition + sort on the Morton key so each output file holds one
    contiguous space-filling-curve segment.

    Why this is the 100-TB layout: a file whose rows are a curve segment
    has TIGHT parquet row-group min/max statistics on x, y, and `key_col`
    — so coordinate-range predicates and cell-key equi-joins prune whole
    files/row-groups at the scan, before any compute (the same reason
    Iceberg/Delta offer Z-order table maintenance).  An unsorted write
    gives every file near-global min/max and pruning never fires.  The
    key column is kept in the output (pruning needs its stats; drop it
    downstream if unwanted)."""
    from ..functions.geocell import zorder_repartition

    out = zorder_repartition(
        df, grid, coords=coords, num_partitions=num_files, key_col=key_col
    )
    out.write.mode(mode).parquet(path)


def load_media(
    spark: SparkSession,
    path: str,
    kind: str = "image",
    mode: str = "raise",
    **validate_kwargs,
) -> DataFrame:
    """Read a media-shaped parquet table and validate decodability AT THE
    SCAN BOUNDARY (core.validate): `mode='raise'` fails fast with the
    offending ids before any operator sees the rows; `mode='quarantine'`
    appends a lazy `reject_reason` column instead (the 100-TB dead-letter
    path).  Without this, an undecodable row (e.g. a real JPEG byte stream
    under the documented codec stub) only surfaces as an executor task
    failure deep inside an Arrow batch."""
    from ..core.validate import validate_media

    return validate_media(
        spark.read.parquet(path), kind, mode=mode, **validate_kwargs
    )
