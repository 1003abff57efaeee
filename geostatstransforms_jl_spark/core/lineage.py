"""Checkpoint / lineage store — Iceberg-style per-stage snapshots.

The reference is an in-memory library with `apply/revert` caches; at 10¹²
rows a pipeline instead needs durable, *validatable* stage boundaries
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").  Each committed stage directory contains:

    part-*.parquet            the stage output
    _manifest.json            stage name, schema, row count, order-insensitive
                              content hash, wall-clock metrics, and a
                              per-partition lineage table
                              (partition id, rows, key range, content hash)

Commit protocol: data is written to `<dir>.tmp`, the manifest is computed
from what was actually written, then the directory is atomically renamed —
a killed job can never leave a half-committed snapshot that validates.

`validate()` re-derives row count + content hash from the parquet files and
compares to the manifest, so resume only trusts intact snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _content_stats(df: DataFrame, key_col: Optional[str]):
    """Order-insensitive content hash + per-partition lineage in one pass."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    h = F.xxhash64(*cols)
    d = df.select(
        F.spark_partition_id().alias("_pid"),
        h.alias("_h"),
        *( [F.col(key_col).alias("_key")] if key_col and key_col in df.columns else [] ),
    )
    # decimal(38) sum: overflow-proof (ANSI mode) and multiplicity-preserving,
    # unlike xor which would let duplicate rows cancel out
    aggs = [F.count("*").alias("rows"), F.sum(F.col("_h").cast("decimal(38,0)")).alias("hash")]
    if key_col and key_col in df.columns:
        aggs += [F.min("_key").alias("key_min"), F.max("_key").alias("key_max")]
    parts = d.groupBy("_pid").agg(*aggs).collect()
    lineage = [
        {
            "partition": int(p["_pid"]),
            "rows": int(p["rows"]),
            "hash": int(p["hash"]) % (1 << 63),
            **(
                {"key_min": _js(p["key_min"]), "key_max": _js(p["key_max"])}
                if "key_min" in p.asDict()
                else {}
            ),
        }
        for p in parts
    ]
    total_rows = sum(p["rows"] for p in lineage)
    total_hash = sum(p["hash"] for p in lineage) % (1 << 63)
    return total_rows, total_hash, lineage


def _js(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


@dataclass
class LineageStore:
    root: str

    def stage_dir(self, stage: int, name: str) -> str:
        return os.path.join(self.root, f"stage-{stage:03d}-{name}")

    def commit(
        self,
        stage: int,
        name: str,
        df: DataFrame,
        key_col: Optional[str] = "row_id",
        extra_meta: Optional[dict] = None,
    ) -> DataFrame:
        """Write df as the stage snapshot, fsync the manifest, atomic rename.
        Returns the re-read (lazy) DataFrame so downstream stages consume the
        durable copy, cutting the lineage chain."""
        final = self.stage_dir(stage, name)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(tmp)
        spark = df.sparkSession
        written = spark.read.parquet(tmp)
        rows, chash, lineage = _content_stats(written, key_col)
        manifest = {
            "stage": stage,
            "name": name,
            "rows": rows,
            "content_hash": chash,
            "schema": written.schema.jsonValue(),
            "key_col": key_col if key_col and key_col in written.columns else None,
            "write_sec": round(time.perf_counter() - t0, 3),
            "partitions": lineage,
            "extra": extra_meta or {},
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return spark.read.parquet(final)

    def manifest(self, stage: int, name: str) -> Optional[dict]:
        p = os.path.join(self.stage_dir(stage, name), MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def validate(self, spark: SparkSession, stage: int, name: str) -> bool:
        """True iff the snapshot exists and its recomputed row count +
        content hash match the manifest."""
        m = self.manifest(stage, name)
        if m is None:
            return False
        d = self.stage_dir(stage, name)
        try:
            df = spark.read.parquet(d)
        except Exception:
            return False
        rows, chash, _ = _content_stats(df, m.get("key_col"))
        return rows == m["rows"] and chash == m["content_hash"]

    def load(self, spark: SparkSession, stage: int, name: str) -> DataFrame:
        return spark.read.parquet(self.stage_dir(stage, name))
