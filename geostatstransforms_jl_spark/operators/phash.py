"""Real DCT perceptual hash computed FROM the image bytes — the classic
pHash construction (Zauner 2010, "Implementation and Benchmarking of
Perceptual Image Hash Functions"; public algorithm), as a packed-table
operator in the `gradient_packed` family: one narrow zero-shuffle
mapInPandas pass, numpy-batched across the Arrow batch.

The input table's `phash` column is a fixture-defined content hash
(core/images.py, FIXTURES.md F1 — it drives the georeference); THIS
operator derives a genuine perceptual signature from decoded pixels, so
the image near-dup pipeline runs end-to-end from raw bytes:

    phash_images → textops.hamming_neardup_pairs   (banded, no O(n²))

Documented spec (replayed independently by the oracle generator,
scripts/gen_literal_oracles.py:_phash64_spec — keep the two in lockstep):

1. decode bytes (PNG or baseline JFIF, core/png.decode_image); RGB rows
   collapse to grayscale by exact integer mean floor ((r+g+b) // 3).
2. resize to 32×32 with the engine's exact-integer half-pixel-center
   bilinear kernel (core/media.resize_plane) — integer in, integer out,
   so steps 1–2 are bit-reproducible on any platform.
3. 2-D orthonormal DCT-II (float64) of the 32×32 plane, NO level shift.
4. keep the top-left 8×8 low-frequency block, row-major 64 coefficients.
5. threshold = median of coefficients 1..63 (DC excluded from the median,
   classic pHash; even count → numpy mean-of-middle-two convention).
6. bit k (k = 0..63, little-endian) = coefficient k > threshold; packed
   as two's-complement int64 (bit 63 set → negative value, sign-safe for
   the banding path which splits via shiftrightunsigned).

Invariance property (tested): signatures of a lossless image and its
quality-99 JFIF transcode differ by ≤ 2 Hamming bits on the synthetic
contract images — that is the planted-pair structure `image_neardup_e2e`
exploits.

No reference counterpart: GeoStatsTransforms.jl has no perceptual-hash
transform; this belongs to the LLM-training-data pipeline surface the
engine adds (SURVEY.md §2-extras).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core.jpeg import dct_matrix
from ..core.media import resize_plane
from ..core.png import decode_image

_DCT32 = dct_matrix(32)
_BITW = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _to_gray(pix: np.ndarray) -> np.ndarray:
    """Spec step 1: exact integer mean floor over RGB channels (no-op for
    2-D input) — the ONE implementation both entry points share."""
    if pix.ndim == 3:
        pix = (
            (
                pix[:, :, 0].astype(np.int64)
                + pix[:, :, 1].astype(np.int64)
                + pix[:, :, 2].astype(np.int64)
            )
            // 3
        ).astype(np.uint8)
    return pix


def phash64_batch(planes: np.ndarray) -> np.ndarray:
    """Steps 3–6 over a stacked (n, 32, 32) float64 tensor → (n,) int64.
    ONE batched matmul pair for the whole Arrow batch."""
    coefs = _DCT32 @ planes @ _DCT32.T
    flat = coefs[:, :8, :8].reshape(-1, 64)
    med = np.median(flat[:, 1:], axis=1)
    bits = flat > med[:, None]
    return (bits.astype(np.uint64) * _BITW).sum(axis=1, dtype=np.uint64).view(np.int64)


def phash64_single(pix: np.ndarray) -> int:
    """Spec steps 1(gray)–6 for one decoded uint8 array (test/debug entry)."""
    g32 = resize_plane(_to_gray(pix), 32, 32, "bilinear").astype(np.float64)
    return int(phash64_batch(g32[None])[0])


def phash_images(images: DataFrame, out_col: str = "phash64", carry=()) -> DataFrame:
    """(image_id, bytes, fmt, ...) → (image_id, <out_col>:long, *carry).

    Zero-shuffle mapInPandas; per image only the exact-integer decode+resize
    runs row-at-a-time, then the DCT/median/pack runs ONCE per Arrow batch
    on the stacked (n, 32, 32) tensor — the 100-TB plan shape: scan-bound,
    no exchange, no driver involvement."""
    carry = [c for c in carry if c not in ("image_id", "bytes")]
    if out_col in carry or out_col == "image_id":
        raise ValueError(f"out_col {out_col!r} collides with a carried/output column")
    # dedupe the input projection: 'fmt' may legitimately be carried, and a
    # duplicate column label would break the pandas batch indexing
    sel = ["image_id", "bytes", "fmt"] + [c for c in carry if c != "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, planes = [], []
            for r in pdf.itertuples(index=False):
                pix = _to_gray(decode_image(r.bytes, r.fmt))
                ids.append(r.image_id)
                planes.append(resize_plane(pix, 32, 32, "bilinear").astype(np.float64))
            out = {"image_id": pd.Series(ids, dtype=object)}
            sigs = (
                phash64_batch(np.stack(planes))
                if planes
                else np.empty(0, dtype=np.int64)
            )
            out[out_col] = pd.Series(sigs, dtype="int64")
            for c in carry:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    types = {f.name: f.dataType.simpleString() for f in images.schema.fields}
    schema = f"image_id string, {out_col} long" + "".join(
        f", {c} {types[c]}" for c in carry
    )
    return images.select(*sel).mapInPandas(run, schema)
