"""Multimodal media ops (core/media.py): video frame sampling, audio
windowed features, image resize — the pipeline extras beyond reference
parity (GeoStatsTransforms.jl has no media ops).

Every Spark-side test checks the *plumbing* contract the 100-TB design
depends on: schema, multi-partition batching, zero-explosion output shape —
plus exact pixel/sample math against closed forms or the pure generator
functions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.media import (
    audio_features,
    make_audio,
    make_video,
    resize_images,
    resize_plane,
    sample_frames,
    synthetic_audio,
    synthetic_videos,
    unpack_video,
)
from geostatstransforms_jl_spark.core.images import synthetic_images
from geostatstransforms_jl_spark.core.png import decode_image


# ---- video ------------------------------------------------------------------


def test_video_container_roundtrip():
    frames, w, h, fps, data = make_video(7)
    dec = unpack_video(data)
    assert len(dec) == len(frames)
    for (idx, pix), f in zip(dec, frames):
        assert pix.shape == (h, w)
        assert np.array_equal(pix, f)
    # selective decode returns exactly the requested frames, bit-exact
    sel = unpack_video(data, indices=[1, 3])
    assert [i for i, _ in sel] == [1, 3]
    assert np.array_equal(sel[0][1], frames[1])


def test_video_codec_stub():
    with pytest.raises(NotImplementedError, match="mp4"):
        unpack_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)


def test_sample_frames_spark(spark):
    vids = synthetic_videos(spark, 12, partitions=3)
    out = sample_frames(vids, every=3).orderBy("video_id", "frame_idx").collect()
    # exact sampled index set and per-frame means vs the pure function
    expected = []
    for n in range(12):
        frames, w, h, _, _ = make_video(n)
        for i in range(0, len(frames), 3):
            expected.append(
                (f"vid{n:08d}", i, w, h, float(frames[i].astype(np.float64).mean()))
            )
    got = [(r.video_id, r.frame_idx, r.w, r.h, r.frame_mean) for r in out]
    assert got == sorted(expected)
    # sampled frames re-encode as standalone PNGs decodable bit-exact
    r0 = out[0]
    frames0 = make_video(0)[0]
    assert np.array_equal(decode_image(bytes(r0.bytes), "png"), frames0[0])


def test_sample_frames_offset_and_validation(spark):
    vids = synthetic_videos(spark, 3, partitions=1)
    out = sample_frames(vids, every=2, offset=1).collect()
    for r in out:
        assert r.frame_idx % 2 == 1
    with pytest.raises(ValueError):
        sample_frames(vids, every=0)


def test_sample_frames_stub_fmt(spark):
    vids = synthetic_videos(spark, 2, partitions=1).withColumn("fmt", F.lit("mp4"))
    with pytest.raises(Exception, match="documented stub"):
        sample_frames(vids).collect()


# ---- audio ------------------------------------------------------------------


def test_audio_features_spark(spark):
    aud = synthetic_audio(spark, 10, partitions=3)
    out = audio_features(aud, window=512).orderBy("audio_id", "win_idx").collect()
    expected = []
    for n in range(10):
        pcm, _, _ = make_audio(n)
        x = pcm.astype(np.float64)
        nwin = len(x) // 512
        wins = x[: nwin * 512].reshape(nwin, 512)
        for i in range(nwin):
            expected.append(
                (
                    f"aud{n:08d}",
                    i,
                    float(np.sqrt((wins[i] ** 2).mean())),
                    float(np.abs(wins[i]).max()),
                )
            )
    got = [(r.audio_id, r.win_idx, r.rms, r.peak) for r in out]
    assert got == sorted(expected)


def test_audio_rms_closed_form(spark):
    # constant amplitude A in a window → rms == A, peak == A
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "audio_id": ["c"],
            "bytes": [np.full(256, 1000, dtype="<i2").tobytes()],
            "sr": [8000],
            "n_samples": [256],
            "fmt": ["pcm16"],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = audio_features(df, window=128).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.rms == pytest.approx(1000.0) and r.peak == 1000.0


def test_audio_partial_window_dropped_and_stub(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "audio_id": ["p"],
            "bytes": [np.arange(300, dtype="<i2").tobytes()],
            "sr": [8000],
            "n_samples": [300],
            "fmt": ["pcm16"],
        }
    )
    rows = audio_features(spark.createDataFrame(pdf), window=256).collect()
    assert [r.win_idx for r in rows] == [0]  # trailing 44 samples dropped
    bad = spark.createDataFrame(pdf).withColumn("fmt", F.lit("mp3"))
    with pytest.raises(Exception, match="documented stub"):
        audio_features(bad).collect()


# ---- resize -----------------------------------------------------------------


def test_resize_plane_nearest_exact():
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # integer 2x upscale with half-pixel centers == pixel replication
    assert np.array_equal(resize_plane(a, 6, 8, "nearest"), np.repeat(np.repeat(a, 2, 0), 2, 1))
    # identity at same size, both methods
    assert np.array_equal(resize_plane(a, 3, 4, "nearest"), a)
    assert np.array_equal(resize_plane(a, 3, 4, "bilinear"), a)


def test_resize_plane_bilinear_closed_form():
    # linear ramp along x, slope s: 2x downsample centers land at
    # src x = 2d + 0.5 → value 2sd + s/2 exactly (before rounding)
    s = 8
    r = (s * np.arange(16, dtype=np.float64))[None, :].repeat(4, 0).astype(np.uint8)
    dn = resize_plane(r, 4, 8, "bilinear")
    exp = np.rint(2.0 * s * np.arange(8) + 0.5 * s).astype(np.uint8)
    assert np.array_equal(dn, np.tile(exp, (4, 1)))


def test_resize_images_spark(spark):
    imgs = synthetic_images(spark, 9, partitions=3)
    out = resize_images(imgs, 20, 14, "bilinear")
    rows = {r.image_id: r for r in out.collect()}
    assert len(rows) == 9
    src = {r.image_id: r for r in imgs.collect()}
    from geostatstransforms_jl_spark.core.media import resize_plane as rp

    for iid, r in rows.items():
        assert (r.w, r.h, r.fmt) == (20, 14, "png")
        assert r.caption == src[iid].caption and r.phash == src[iid].phash
        # stored pixels == spec resize of the stored (possibly jpeg-quantized)
        # source pixels, roundtripped losslessly through the PNG codec
        exp = rp(decode_image(bytes(src[iid].bytes), src[iid].fmt), 14, 20, "bilinear")
        assert np.array_equal(decode_image(bytes(r.bytes), "png"), exp)


def test_media_scan_pruning_and_no_shuffle(spark, tmp_path):
    # the 100-TB contract (PLANS.md media section): against a parquet
    # source, the narrow select feeding each media pass reaches the scan as
    # ReadSchema pruning, and the whole plan has no Exchange
    p = str(tmp_path / "vids.parquet")
    synthetic_videos(spark, 6, partitions=2).write.parquet(p)
    plan = spark.read.parquet(p).transform(
        lambda df: sample_frames(df, every=3)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    scan_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "bytes" in scan_line and "n_frames" in scan_line
    for dropped in ("fps", '"w"', '"h"'):
        assert dropped not in scan_line, scan_line


def test_resize_images_validation(spark):
    imgs = synthetic_images(spark, 1)
    with pytest.raises(ValueError):
        resize_images(imgs, 0, 4)
    with pytest.raises(ValueError):
        resize_images(imgs, 4, 4, method="lanczos")


def test_empty_partitions_schema_complete(spark):
    # partitions > n leaves some Arrow batches empty; the synthesizers and
    # packed passes must still yield schema-complete frames (regression:
    # pd.DataFrame([]) has zero columns and breaks Arrow conversion)
    vids = synthetic_videos(spark, 2, partitions=8)
    assert vids.count() == 2
    auds = synthetic_audio(spark, 2, partitions=8)
    assert auds.count() == 2
    imgs = synthetic_images(spark, 2, partitions=8)
    assert imgs.count() == 2
    assert resize_images(imgs, 4, 4).count() == 2


# ---- scan-boundary validation (VERDICT r4 #4) -------------------------------


def _mixed_image_df(spark):
    good = synthetic_images(spark, 6).select(
        "image_id", "bytes", "fmt"
    )
    bad = spark.createDataFrame(
        [
            # a GIF container smuggled under fmt='jpeg' — neither PNG nor
            # JFIF signature (real JFIF streams are decodable since r5)
            ("gif_as_jpeg", bytearray(b"GIF89a" + b"x" * 64), "jpeg"),
            ("webp_row", bytearray(b"RIFF....WEBP" + b"x" * 64), "webp"),
            ("null_row", None, "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    return good.unionByName(bad)


def test_validate_images_raise_names_offenders(spark):
    import pytest as _pytest
    from geostatstransforms_jl_spark.core.validate import validate_media

    df = _mixed_image_df(spark)
    with _pytest.raises(ValueError) as ei:
        validate_media(df, "image", mode="raise")
    msg = str(ei.value)
    # actionable context: every offending id AND its reason, plus the
    # quarantine escape hatch
    assert "gif_as_jpeg" in msg and "neither a PNG container nor a JPEG/JFIF" in msg
    assert "webp_row" in msg and "unknown fmt 'webp'" in msg
    assert "null_row" in msg and "bytes is NULL" in msg
    assert "quarantine" in msg
    # a fully-valid table passes through unchanged (same plan object)
    ok = synthetic_images(spark, 6).select("image_id", "bytes", "fmt")
    assert validate_media(ok, "image", mode="raise") is ok


def test_validate_images_quarantine_is_lazy_split(spark):
    from geostatstransforms_jl_spark.core.validate import validate_media

    out = validate_media(_mixed_image_df(spark), "image", mode="quarantine")
    rows = {r.image_id: r.reject_reason for r in out.collect()}
    assert sum(v is not None for v in rows.values()) == 3
    assert rows["gif_as_jpeg"] is not None and rows["null_row"] is not None
    # synthetic rows (including the fmt='jpeg' ones, which carry real
    # baseline JFIF bytes since r5) are all decodable
    assert all(v is None for k, v in rows.items() if k.startswith("img"))


def test_validate_video_and_audio(spark):
    import pytest as _pytest
    from geostatstransforms_jl_spark.core.validate import validate_media

    vids = synthetic_videos(spark, 3).select("video_id", "bytes", "fmt")
    mp4 = spark.createDataFrame(
        [("vid_mp4", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 32), "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    with _pytest.raises(ValueError, match="vid_mp4"):
        validate_media(vids.unionByName(mp4), "video", mode="raise")

    auds = synthetic_audio(spark, 3).select("audio_id", "bytes", "fmt")
    odd = spark.createDataFrame(
        [("aud_odd", bytearray(b"\x01\x02\x03"), "pcm16"),
         ("aud_ogg", bytearray(b"OggS" + b"x" * 16), "ogg")],
        "audio_id string, bytes binary, fmt string",
    )
    with _pytest.raises(ValueError) as ei:
        validate_media(auds.unionByName(odd), "audio", mode="raise")
    assert "aud_odd" in str(ei.value) and "aud_ogg" in str(ei.value)


def test_load_media_fails_at_scan_boundary(spark, tmp_path):
    import pytest as _pytest
    from geostatstransforms_jl_spark.sources import load_media

    path = str(tmp_path / "mixed_images")
    _mixed_image_df(spark).write.parquet(path)
    # the failure happens AT THE LOAD, before any operator/Arrow batch runs,
    # and names the rows
    with _pytest.raises(ValueError, match="gif_as_jpeg"):
        load_media(spark, path, "image")
    # quarantine mode loads lazily and lets the caller split
    q = load_media(spark, path, "image", mode="quarantine")
    assert q.filter(F.col("reject_reason").isNotNull()).count() == 3
