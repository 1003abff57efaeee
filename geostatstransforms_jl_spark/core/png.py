"""Minimal pure-numpy+zlib PNG codec (no PIL in this environment).

Supports 8-bit grayscale and RGB, which is all the synthetic image table
needs.  Encoding always uses filter type 0 (None); decoding implements all
five standard filters so externally produced PNGs also load.  Deterministic:
fixed zlib level, no timestamps or ancillary chunks.

The `fmt='jpeg'` path is REAL as of round 5: `core/jpeg.py` is a baseline
JFIF codec (encoder + decoder) in pure numpy, and `decode_image` dispatches
on the container signature — PNG bytes and JPEG/JFIF bytes both load, which
also keeps pre-r5 tables (whose fmt='jpeg' rows carried the documented
quantized-PNG stand-in) decodable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """arr: (h, w) grayscale or (h, w, 3) RGB, dtype uint8."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type = 0
        raw_rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        color_type = 2
        raw_rows = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw_rows], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = ftypes[y]
        cur = data[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need sequential left neighbor
            row = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    row[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    row[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (cur[x] + pr) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
            out[y] = row
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            ok = (depth == 8 and color_type in (0, 2)) or (
                depth in (1, 2, 4) and color_type == 0
            )
            if not ok or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit gray/RGB or 1/2/4-bit gray, non-interlaced PNG"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if color_type == 0 and depth < 8:
        # sub-byte grayscale (e.g. the reference's 1-bit letters.png
        # fixture, test/data/letters.png): filtering operates on the packed
        # bytes with bpp=1, then bits unpack MSB-first and scale to the
        # full 8-bit range (0..2^d-1 → 0..255, the PNG sample expansion)
        stride = (w * depth + 7) // 8
        out = _unfilter(raw, h, stride, 1)
        bits = np.unpackbits(out, axis=1)[:, : w * depth].reshape(h, w, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        v = (bits * weights).sum(axis=2)
        return (v * (255 // ((1 << depth) - 1))).astype(np.uint8)
    ch = 3 if color_type == 2 else 1
    stride = w * ch
    out = _unfilter(raw, h, stride, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode the `bytes` column.  Dispatch is by container signature within
    the declared fmt family: 'png'/'jpeg' accept either a PNG stream or a
    baseline JFIF stream (so pre-r5 tables whose fmt='jpeg' rows carry the
    documented quantized-PNG stand-in still load); 'raw' is a headerless
    gray8 dump."""
    if fmt in ("png", "jpeg"):
        if data[:8] == _PNG_SIG:
            return png_decode(data)
        if data[:2] == b"\xff\xd8":
            from .jpeg import jpeg_decode

            return jpeg_decode(data)
        raise ValueError(
            f"fmt={fmt!r} bytes start with neither a PNG nor a JPEG/JFIF "
            "signature — undecodable container"
        )
    if fmt == "raw":
        arr = np.frombuffer(data[8:], dtype=np.uint8)
        h, w = struct.unpack(">II", data[:8])
        return arr.reshape(h, w)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        # real baseline JFIF (core/jpeg.py); DEFAULT_QUALITY is pinned so the
        # contract's lossy round-trip stays ≥ 40 dB even on full-noise input
        from .jpeg import jpeg_encode

        return jpeg_encode(arr)
    if fmt == "raw":
        a = np.ascontiguousarray(arr, dtype=np.uint8)
        return struct.pack(">II", *a.shape[:2]) + a.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = ((a - b) ** 2).mean()
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
