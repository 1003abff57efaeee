"""Multimodal media columns: video, audio, and image resizing.

The 100-TB training-data pipeline treats every modality as an opaque
``binary`` column with typed metadata, processed by narrow Arrow-batched
``mapInPandas`` passes — no pixel/sample explosion, no shuffle, and the
parquet scan prunes to exactly the columns each pass reads.

* **Video** rows are ``(video_id, bytes, n_frames, w, h, fps, fmt)``.  The
  synthetic container (``fmt='gsv1'``) is a length-prefixed sequence of PNG
  frames, so `sample_frames` *seeks over* unsampled frames without inflating
  them — the per-row cost is O(sampled frames), not O(n_frames).  Real
  codecs (mp4/webm/…) are a documented stub: the decode libraries are not in
  this container, but the Spark-side plumbing (schema, batching, frame-skip
  seek, output shape) is identical and fully tested on gsv1.
* **Audio** rows are ``(audio_id, bytes, sr, n_samples, fmt)``.  ``pcm16``
  (headerless little-endian int16 mono) decodes for real via
  ``np.frombuffer``; compressed formats (mp3/flac/…) are the same documented
  stub.
* **Image resize** re-encodes through the repo's own PNG codec with
  half-pixel-center nearest/bilinear sampling (the OpenCV/ImageTransform
  convention), so downstream operators see a normal image table.

Reference scope note: GeoStatsTransforms.jl has no media ops — these are the
pipeline extras the build brief adds beyond reference parity, following the
same packed-table fast-path design as `operators/gradient.py:gradient_packed`.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .png import decode_image, encode_image, png_decode

_GSV1_MAGIC = b"GSV1"
_VIDEO_SIZES = (16, 32)

VIDEO_SCHEMA = (
    "video_id string, bytes binary, n_frames int, w int, h int, fps double, fmt string"
)
AUDIO_SCHEMA = "audio_id string, bytes binary, sr int, n_samples int, fmt string"


# ---- synthetic video -------------------------------------------------------


def make_video(n: int, seed: int = 42):
    """Deterministic frames/bytes for video #n (pure function; the
    input-defining contract for the `video_frame_sample` literal oracle,
    same role as `images.make_image`)."""
    rng = np.random.default_rng(np.random.PCG64(seed * 2_000_003 + n))
    w = _VIDEO_SIZES[n % len(_VIDEO_SIZES)]
    h = _VIDEO_SIZES[(n // len(_VIDEO_SIZES)) % len(_VIDEO_SIZES)]
    n_frames = 4 + n % 9
    fps = float(8 + n % 4)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n_frames):
        # a field drifting with t so per-frame means differ
        base = 127.5 + 90.0 * np.sin((xx + 2.0 * t) / (3.0 + n % 5)) * np.cos(
            (yy - t) / (2.0 + n % 3)
        )
        noise = rng.normal(0, 10, (h, w))
        frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    payload = [_GSV1_MAGIC, struct.pack(">IIId", n_frames, w, h, fps)]
    for f in frames:
        enc = encode_image(f, "png")
        payload.append(struct.pack(">I", len(enc)))
        payload.append(enc)
    return frames, w, h, fps, b"".join(payload)


def synthetic_videos(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 0
) -> DataFrame:
    """Distributed deterministic video table — same pattern as
    `images.synthetic_images` (spark.range → mapInPandas; driver never sees
    a frame)."""
    base = spark.range(n, numPartitions=partitions or None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n_ in pdf["id"].tolist():
                frames, w, h, fps, data = make_video(int(n_), seed)
                rows.append(
                    {
                        "video_id": f"vid{n_:08d}",
                        "bytes": data,
                        "n_frames": len(frames),
                        "w": w,
                        "h": h,
                        "fps": fps,
                        "fmt": "gsv1",
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "n_frames", "w", "h", "fps", "fmt"],
            )

    return base.mapInPandas(gen, VIDEO_SCHEMA)


def unpack_video(data: bytes, indices=None) -> list:
    """Parse a gsv1 container; decode only `indices` (all frames if None).
    Unrequested frames are *seeked over* via their length prefix — never
    inflated.  Returns [(frame_idx, pixel array), ...].

    Contract: out-of-range frame indices raise ``IndexError`` (they were
    silently ignored before r04) — inside ``mapInPandas`` that surfaces as
    an executor-task failure naming the offending indices.  The internal
    caller (`sample_frames`) always passes in-range indices; external
    callers must pre-clamp if skip-don't-fail is the desired behavior."""
    if data[:4] != _GSV1_MAGIC:
        raise NotImplementedError(
            "real video byte streams (mp4/webm/…) are not decodable in this "
            "container — no codec libraries; fmt='gsv1' is the tested path "
            "and the plumbing (schema, seek-skip, batch shape) is identical"
        )
    n_frames, _w, _h, _fps = struct.unpack(">IIId", data[4:24])
    if indices is not None:
        indices = list(indices)  # tolerate one-shot iterators: validate + use
        bad = [i for i in indices if not 0 <= i < n_frames]
        if bad:
            raise IndexError(
                f"unpack_video: frame indices {bad} out of range for a "
                f"{n_frames}-frame container"
            )
    want = set(range(n_frames)) if indices is None else set(indices)
    pos = 24
    out = []
    for idx in range(n_frames):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if idx in want:
            out.append((idx, png_decode(data[pos : pos + ln])))
        pos += ln
    return out


def sample_frames(videos: DataFrame, every: int = 1, offset: int = 0) -> DataFrame:
    """Frame sampling: one narrow mapInPandas pass over the packed video
    table → (video_id, frame_idx, w, h, bytes, frame_mean), keeping every
    `every`-th frame starting at `offset`.

    Scale shape: zero shuffle, zero pixel explosion — each task reads its
    parquet split of binary rows and emits ≤ n_frames/every rows per video;
    unsampled frames are skipped by seek, not decoded.  Output frames are
    standalone PNG images, so the result is itself a valid image table for
    `gradient_packed`/`images_to_long`."""
    if every < 1:
        raise ValueError("every must be >= 1")
    if offset < 0:
        # range(-1, n, k) would silently sample a shifted frame set
        raise ValueError("offset must be >= 0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "gsv1":
                    raise NotImplementedError(
                        f"fmt={r.fmt!r}: real video codecs are a documented "
                        "stub in this container; see core/media.py"
                    )
                idx = range(offset, int(r.n_frames), every)
                for i, pix in unpack_video(bytes(r.bytes), idx):
                    h, w = pix.shape[:2]
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": i,
                            "w": w,
                            "h": h,
                            "bytes": encode_image(pix, "png"),
                            "frame_mean": float(pix.astype(np.float64).mean()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "w", "h", "bytes", "frame_mean"],
            )

    return videos.select("video_id", "bytes", "n_frames", "fmt").mapInPandas(
        run,
        "video_id string, frame_idx int, w int, h int, bytes binary, frame_mean double",
    )


# ---- synthetic audio -------------------------------------------------------


def make_audio(n: int, seed: int = 42):
    """Deterministic int16 PCM samples/bytes for clip #n (pure function; the
    input-defining contract for the `audio_rms` literal oracle)."""
    rng = np.random.default_rng(np.random.PCG64(seed * 3_000_017 + n))
    sr = 8000
    n_samples = 2048 + 512 * (n % 5)
    t = np.arange(n_samples, dtype=np.float64)
    freq = 50.0 + 37.0 * (n % 13)
    env = np.linspace(1.0, 0.3, n_samples)
    sig = 0.6 * np.sin(2.0 * np.pi * freq * t / sr) * env
    sig = sig + rng.normal(0, 0.05, n_samples)
    pcm = np.clip(np.rint(sig * 29000.0), -32768, 32767).astype("<i2")
    return pcm, sr, pcm.tobytes()


def synthetic_audio(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 0
) -> DataFrame:
    base = spark.range(n, numPartitions=partitions or None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n_ in pdf["id"].tolist():
                pcm, sr, data = make_audio(int(n_), seed)
                rows.append(
                    {
                        "audio_id": f"aud{n_:08d}",
                        "bytes": data,
                        "sr": sr,
                        "n_samples": len(pcm),
                        "fmt": "pcm16",
                    }
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "bytes", "sr", "n_samples", "fmt"]
            )

    return base.mapInPandas(gen, AUDIO_SCHEMA)


def audio_features(audio: DataFrame, window: int = 512) -> DataFrame:
    """Windowed audio features: (audio_id, win_idx, rms, peak) per
    non-overlapping `window`-sample window (trailing partial window dropped,
    documented).  RMS/peak are over raw int16 amplitudes (not normalized).

    pcm16 decodes for real (`np.frombuffer('<i2')`); compressed formats are
    the documented codec stub.  Same zero-shuffle packed-pass shape as
    `sample_frames`."""
    if window < 1:
        raise ValueError("window must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "pcm16":
                    raise NotImplementedError(
                        f"fmt={r.fmt!r}: compressed audio codecs are a "
                        "documented stub in this container; see core/media.py"
                    )
                x = np.frombuffer(bytes(r.bytes), dtype="<i2").astype(np.float64)
                nwin = len(x) // window
                if nwin == 0:
                    continue
                wins = x[: nwin * window].reshape(nwin, window)
                rms = np.sqrt((wins * wins).mean(axis=1))
                peak = np.abs(wins).max(axis=1)
                rows.append(
                    pd.DataFrame(
                        {
                            "audio_id": r.audio_id,
                            "win_idx": np.arange(nwin, dtype=np.int32),
                            "rms": rms,
                            "peak": peak,
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {"audio_id": pd.Series(dtype=object),
                     "win_idx": pd.Series(dtype=np.int32),
                     "rms": pd.Series(dtype=np.float64),
                     "peak": pd.Series(dtype=np.float64)}
                )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run, "audio_id string, win_idx int, rms double, peak double"
    )


# ---- image resize ----------------------------------------------------------


def _resize_plane(a: np.ndarray, out_h: int, out_w: int, method: str) -> np.ndarray:
    """Half-pixel-center resample of one 2-D uint8 plane in EXACT integer
    arithmetic (the documented spec the oracle replays): the source center
    for destination index d is s = (d + 0.5) * in/out - 0.5, carried as the
    exact rational num/(2*out) with num = (2d+1)*in - out; 'nearest' floors
    s + 0.5, 'bilinear' blends the 4 edge-clamped neighbors and rounds half
    up.  All-integer math makes the result independent of summation order
    and float association, so the independently-formulated oracle replay is
    bit-identical by construction (floats near a rounding tie are not)."""
    in_h, in_w = a.shape
    ny = (2 * np.arange(out_h, dtype=np.int64) + 1) * in_h - out_h
    nx = (2 * np.arange(out_w, dtype=np.int64) + 1) * in_w - out_w
    dy2, dx2 = 2 * out_h, 2 * out_w
    if method == "nearest":
        # floor(s + 0.5) = floor((num + out) / (2*out))
        iy = np.clip((ny + out_h) // dy2, 0, in_h - 1)
        ix = np.clip((nx + out_w) // dx2, 0, in_w - 1)
        return a[np.ix_(iy, ix)]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    y0 = np.clip(ny // dy2, 0, in_h - 1)
    x0 = np.clip(nx // dx2, 0, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    # fractional weights scaled by 2*out: wy/dy2 == clip(s - y0, 0, 1)
    wy = np.clip(ny - y0 * dy2, 0, dy2)[:, None]
    wx = np.clip(nx - x0 * dx2, 0, dx2)[None, :]
    ai = a.astype(np.int64)
    top = ai[np.ix_(y0, x0)] * (dx2 - wx) + ai[np.ix_(y0, x1)] * wx
    bot = ai[np.ix_(y1, x0)] * (dx2 - wx) + ai[np.ix_(y1, x1)] * wx
    num = top * (dy2 - wy) + bot * wy  # value == num / (dx2*dy2), exact
    den = dx2 * dy2
    v = (2 * num + den) // (2 * den)  # round half up
    return v.astype(np.uint8)


def resize_plane(a: np.ndarray, out_h: int, out_w: int, method: str = "bilinear"):
    """Public single-plane resize (gray 2-D or HxWx3 RGB)."""
    if a.ndim == 2:
        return _resize_plane(a, out_h, out_w, method)
    return np.stack(
        [_resize_plane(a[:, :, c], out_h, out_w, method) for c in range(a.shape[2])],
        axis=2,
    )


def resize_images(
    images: DataFrame, out_w: int, out_h: int, method: str = "bilinear"
) -> DataFrame:
    """Resize every image to out_w × out_h; output is a normal image table
    (bytes re-encoded as lossless PNG, fmt='png', w/h updated, caption/phash
    carried).  One narrow mapInPandas pass, zero shuffle; fmt='jpeg' rows
    decode to their stored (lossy-quantized) pixels first, exactly like
    every other consumer of the table."""
    if out_w < 1 or out_h < 1:
        raise ValueError("output size must be positive")
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pix = decode_image(bytes(r.bytes), r.fmt)
                res = resize_plane(pix, out_h, out_w, method)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode_image(res, "png"),
                        "w": out_w,
                        "h": out_h,
                        "fmt": "png",
                        "caption": r.caption,
                        "phash": r.phash,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    from .images import IMAGE_SCHEMA

    return images.mapInPandas(run, IMAGE_SCHEMA)


def transcode_images(
    images: DataFrame, to_fmt: str = "jpeg", id_prefix: str = ""
) -> DataFrame:
    """Re-encode every image's stored pixels in `to_fmt` ('png' lossless,
    'jpeg' real baseline JFIF at the pinned contract quality, 'raw').
    Output is a normal image table with fmt/bytes swapped and every other
    column carried; `id_prefix` prepends to image_id so a transcoded twin
    table can be unioned with its source without id collisions (the
    planted-pair construction `image_neardup_e2e` uses).  One zero-shuffle
    mapInPandas pass, same plan family as resize_images."""
    if to_fmt not in ("png", "jpeg", "raw"):
        raise ValueError(f"unknown target fmt {to_fmt!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pix = decode_image(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": id_prefix + r.image_id,
                        "bytes": encode_image(pix, to_fmt),
                        "w": r.w,
                        "h": r.h,
                        "fmt": to_fmt,
                        "caption": r.caption,
                        "phash": r.phash,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    from .images import IMAGE_SCHEMA

    return images.mapInPandas(run, IMAGE_SCHEMA)
