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
