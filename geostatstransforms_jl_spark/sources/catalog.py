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
