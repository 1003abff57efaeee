"""Synthetic image+caption table (the BASELINE input contract, FIXTURES.md F1):

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Generated *distributed*: `spark.range(n)` → `mapInPandas` so a 10⁶-row table
never touches the driver; per-image determinism comes from seeding PCG64 with
(seed, n) — the same image_id always carries the same pixels/caption/phash on
any cluster size or partitioning.

The phash low bits are Zipfian-skewed on purpose (FIXTURES.md F1) so the
derived spatial cells exercise the hot-cell salting path.

Each image's w×h pixel grid is one raster tile; `tile_grid_meta` georeferences
it into the engine's cell space via phash → (lon, lat).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .grid import GridMeta
from .png import decode_image, encode_image

SIZES = (16, 32, 64)
_WORDS = (
    "grid cell tile raster point ring mask color field slope cluster layer "
    "sample trace edge corner block label value pixel band patch zone contour"
).split()

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def make_image(n: int, seed: int = 42, encode: bool = True):
    """Deterministic pixels/caption/phash for image #n (pure function)."""
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + n))
    w = SIZES[n % len(SIZES)]
    h = SIZES[(n // len(SIZES)) % len(SIZES)]
    # smooth-ish field + noise so gradients/contours are non-trivial
    yy, xx = np.mgrid[0:h, 0:w]
    base = 127.5 + 100.0 * np.sin(xx / (3.0 + n % 7)) * np.cos(yy / (2.0 + n % 5))
    noise = rng.normal(0, 12, (h, w))
    pix = np.clip(base + noise, 0, 255).astype(np.uint8)
    fmt = "png" if n % 3 else "jpeg"
    # the codec consumes no RNG draws, so skipping it (encode=False: callers
    # that only need pixels/caption/phash, e.g. oracle literal generation)
    # leaves every downstream draw — and therefore the phash — unchanged
    data = encode_image(pix, fmt) if encode else None
    caption = " ".join(rng.choice(_WORDS, size=6 + n % 5))
    # content hash with Zipfian-skewed low bits → hot spatial cells
    content = int.from_bytes(pix.tobytes()[:64], "little") & ((1 << 48) - 1)
    zipf_bucket = min(int(rng.zipf(1.3)), 1 << 14)
    phash = (content << 15) | zipf_bucket
    return pix, w, h, fmt, data, caption, phash


def synthetic_images(spark: SparkSession, n: int, seed: int = 42, partitions: int = 0) -> DataFrame:
    base = spark.range(n, numPartitions=partitions or None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n_ in pdf["id"].tolist():
                _, w, h, fmt, data, caption, phash = make_image(int(n_), seed)
                rows.append(
                    {
                        "image_id": f"img{n_:08d}",
                        "bytes": data,
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": caption,
                        "phash": np.int64(phash & ((1 << 63) - 1)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return base.mapInPandas(gen, IMAGE_SCHEMA)


def georef_lonlat(phash_col="phash"):
    """Column form of :func:`phash_to_lonlat` — the JVM-side georeference
    used by the tile-assignment path (pure bit/arith expressions, codegen'd;
    phash is 63-bit non-negative so the unsigned shift equals the Python
    arithmetic shift)."""
    from pyspark.sql import functions as F

    p = F.col(phash_col) if isinstance(phash_col, str) else phash_col
    lon = (F.shiftrightunsigned(p, 15) % 100_000) / 100_000.0
    lat = (p % (1 << 15)) / float(1 << 15)
    return lon, lat


def phash_to_lonlat(phash: int) -> tuple:
    """Deterministic georeference of a tile: phash → (lon, lat) in [0, 1)²
    (an abstract unit globe — reference geometry is plain Cartesian too)."""
    lon = ((phash >> 15) % 100_000) / 100_000.0
    lat = (phash % (1 << 15)) / float(1 << 15)
    return lon, lat


def tile_grid_meta(phash: int, w: int, h: int, span: float = 1e-4) -> GridMeta:
    """The w×h pixel grid of an image as a GridMeta anchored at its cell."""
    lon, lat = phash_to_lonlat(phash)
    return GridMeta(nx=w, ny=h, ox=lon, oy=lat, sx=span / w, sy=span / h)


def images_to_long(df: DataFrame, value: str = "z") -> DataFrame:
    """Packed → long geotable form: one row per pixel
    (image_id, i, j, z:double).  Arrow-batched; used when an operator needs
    the Catalyst form (grid aggs, joins).  Per-tile UDF operators prefer the
    packed form — no explosion, no shuffle."""

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                pix = decode_image(r.bytes, r.fmt).astype(np.float64)
                h, w = pix.shape[:2]
                if pix.ndim == 3:
                    pix = pix.mean(axis=2)
                jj, ii = np.mgrid[0:h, 0:w]
                outs.append(
                    pd.DataFrame(
                        {
                            "image_id": r.image_id,
                            "i": ii.ravel().astype(np.int32),
                            "j": jj.ravel().astype(np.int32),
                            value: pix.ravel(),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        explode, f"image_id string, i int, j int, {value} double"
    )
