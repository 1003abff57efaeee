"""Property-based tests (hypothesis) over the pure numpy/python kernels,
plus a direct differential pin of the clean-room XXH64 against Spark's JVM
``xxhash64``.

The example-based suites pin closed-form values; hypothesis explores the
input space those fixtures can miss — arbitrary shapes, byte lengths
crossing every internal chunk boundary, degenerate rings, frame-subset
patterns.  All @given targets are pure functions (no SparkSession), so the
search is cheap; the one Spark test is a deterministic sweep, not a
hypothesis target.

Reference scope: the PNG codec backs the image-table contract
(/root/reference has no codec — Julia leans on ImageIO); trace_mask mirrors
src/potrace.jl:103-126 semantics; resize/media are the build brief's
pipeline extras.
"""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geostatstransforms_jl_spark.core.grid import GridMeta
from geostatstransforms_jl_spark.core.media import make_video, resize_plane, unpack_video
from geostatstransforms_jl_spark.core.png import (
    decode_image,
    encode_image,
    png_decode,
    png_encode,
    psnr,
)
from geostatstransforms_jl_spark.operators.potrace import trace_mask
from scripts.sparkhash import spark_xxhash64, xxh64_bytes

# pure-numpy targets: plenty of examples, no deadline (first-call numpy JIT
# warmup can spike), derandomized so CI failures reproduce exactly
PURE = settings(max_examples=40, deadline=None, derandomize=True)


def _arr(seed: int, h: int, w: int, channels: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# ---- PNG codec --------------------------------------------------------------


@PURE
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    channels=st.sampled_from([1, 3]),
)
def test_png_roundtrip_property(seed, h, w, channels):
    a = _arr(seed, h, w, channels)
    assert np.array_equal(png_decode(png_encode(a)), a)


@PURE
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    channels=st.sampled_from([1, 3]),
)
def test_lossy_stub_psnr_contract_property(seed, h, w, channels):
    # the north-rule invariant: lossy round-trips stay within PSNR >= 40 dB
    a = _arr(seed, h, w, channels)
    dec = decode_image(encode_image(a, "jpeg"), "jpeg")
    assert dec.shape == a.shape
    assert psnr(a, dec) >= 40.0


# ---- media: seek-skip container, exact-rational resize ----------------------


@PURE
@given(n=st.integers(0, 500), data=st.data())
def test_video_seek_skip_equals_full_decode(n, data):
    frames, w, h, fps, blob = make_video(n)
    full = unpack_video(blob)
    assert [i for i, _ in full] == list(range(len(frames)))
    assert all(np.array_equal(f, g) for (_, f), g in zip(full, frames))
    idx = data.draw(
        st.lists(st.integers(0, len(frames) - 1), unique=True, max_size=len(frames))
    )
    sub = unpack_video(blob, idx)
    assert [i for i, _ in sub] == sorted(idx)
    for i, f in sub:
        assert np.array_equal(f, frames[i])


@PURE
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    method=st.sampled_from(["nearest", "bilinear"]),
)
def test_resize_same_size_is_identity(seed, h, w, method):
    a = _arr(seed, h, w, 1)
    assert np.array_equal(resize_plane(a, h, w, method), a)


@PURE
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    f=st.integers(2, 5),
)
def test_resize_nearest_integer_upscale_subsamples_back(seed, h, w, f):
    # half-pixel centers: dst (f*i, f*j) maps to src floor((2f*i+1)/(2f)) == i
    a = _arr(seed, h, w, 1)
    up = resize_plane(a, f * h, f * w, "nearest")
    assert np.array_equal(up[:: f, :: f][:h, :w], a)


@PURE
@given(
    seed=st.integers(0, 2**32 - 1),
    in_h=st.integers(1, 20),
    in_w=st.integers(1, 20),
    out_h=st.integers(1, 20),
    out_w=st.integers(1, 20),
)
def test_resize_bilinear_matches_float_reference(seed, in_h, in_w, out_h, out_w):
    # the exact-rational kernel must agree with an independent float
    # half-pixel-center bilinear up to the final round-half-up
    a = _arr(seed, in_h, in_w, 1)
    got = resize_plane(a, out_h, out_w, "bilinear").astype(np.float64)

    sy = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    sx = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(sy), 0, in_h - 1).astype(int)
    x0 = np.clip(np.floor(sx), 0, in_w - 1).astype(int)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(sy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(sx - x0, 0.0, 1.0)[None, :]
    af = a.astype(np.float64)
    ref = (
        af[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + af[np.ix_(y0, x1)] * (1 - wy) * wx
        + af[np.ix_(y1, x0)] * wy * (1 - wx)
        + af[np.ix_(y1, x1)] * wy * wx
    )
    assert np.abs(got - ref).max() <= 0.5 + 1e-6


# ---- potrace: Selinger simplification contract ------------------------------


def _ring_pts(ring):
    return np.array([[p["x"], p["y"]] for p in ring], dtype=float)


def _max_dist_to_polyline(points, poly):
    """max over `points` of distance to the closed polyline `poly`."""
    worst = 0.0
    m = len(poly)
    for p in points:
        best = np.inf
        for i in range(m):
            a, b = poly[i], poly[(i + 1) % m]
            ab = b - a
            L2 = ab @ ab
            t = 0.0 if L2 == 0 else np.clip((p - a) @ ab / L2, 0.0, 1.0)
            best = min(best, float(np.hypot(*(p - a - t * ab))))
        worst = max(worst, best)
    return worst


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(2, 12),
    w=st.integers(2, 12),
    density=st.floats(0.2, 0.8),
    eps=st.floats(0.1, 2.0),
)
def test_selinger_simplify_eps_bound(seed, h, w, density, eps):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < density
    meta = GridMeta(nx=h, ny=w)
    exact = trace_mask(mask, meta)
    simp = trace_mask(mask, meta, epsilon=eps)
    assert len(simp) == len(exact)
    for poly_e, poly_s in zip(exact, simp):
        assert len(poly_s) == len(poly_e)
        for ring_e, ring_s in zip(poly_e, poly_s):
            pe, ps = _ring_pts(ring_e), _ring_pts(ring_s)
            # kept vertices are a subset of the original vertices
            orig = {tuple(v) for v in pe}
            assert all(tuple(v) in orig for v in ps)
            # every dropped vertex lies within eps of the simplified ring
            assert _max_dist_to_polyline(pe, ps) <= eps + 1e-9


@settings(max_examples=25, deadline=None, derandomize=True)
@given(seed=st.integers(0, 2**32 - 1), h=st.integers(2, 10), w=st.integers(2, 10))
def test_trace_mask_ring_geometry(seed, h, w):
    # exact (no-eps) rings: closed boundary walk on cell corners with unit
    # rook steps; vertices may repeat at pinch corners (diagonal contact)
    # but no undirected boundary edge is ever traversed twice
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < 0.5
    for poly in trace_mask(mask, GridMeta(nx=h, ny=w)):
        for ring in poly:
            P = _ring_pts(ring)
            assert len(P) >= 4
            d = np.roll(P, -1, axis=0) - P
            assert np.all(np.abs(d).sum(axis=1) == 1.0)  # unit rook steps
            edges = [
                frozenset((tuple(P[i]), tuple(P[(i + 1) % len(P)])))
                for i in range(len(P))
            ]
            assert len(set(edges)) == len(edges)


# ---- clean-room XXH64 vs Spark's JVM xxhash64 -------------------------------


def test_xxh64_differential_vs_spark(spark):
    """scripts/sparkhash.py is the literal-oracle hash generator; pin it
    byte-for-byte against Spark's xxhash64 on every length crossing the
    XXH64 32/8/4/1-byte chunk boundaries, plus string/int/long columns and
    multi-column seed folding."""
    rng = np.random.default_rng(7)
    blobs = [rng.integers(0, 256, n, dtype=np.uint8).tobytes() for n in range(0, 101)]
    blobs.append(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i int, b binary"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select("i", F.xxhash64("b").alias("h")).collect()
    }
    for i, b in enumerate(blobs):
        want = xxh64_bytes(b, 42)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert got[i] == want, f"len={len(b)}"

    rows = [
        ("", 0, 0),
        ("a", 1, -1),
        ("héllo wörld", 2**31 - 1, 2**63 - 1),
        ("x" * 200, -(2**31), -(2**63)),
    ]
    df2 = spark.createDataFrame(rows, "s string, i int, l long")
    got2 = df2.select(
        F.xxhash64("s").alias("hs"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", "i", "l").alias("hall"),
    ).collect()
    for (s, i, l), r in zip(rows, got2):
        assert r["hs"] == spark_xxhash64(s)
        assert r["hi"] == spark_xxhash64(i)
        assert r["hl"] == spark_xxhash64(("long", l))
        assert r["hall"] == spark_xxhash64(s, i, ("long", l))


# ---- randomized differential: gap sessionize --------------------------------


def test_sessionize_randomized_differential(spark):
    """One Spark job over 3,000 random microsecond-resolution events (60
    users, duplicate timestamps, planted gaps at exactly the threshold and
    threshold+1us) vs an independent pandas replay of the gap-session spec:
    per user, sort by ts and split where the inter-event gap EXCEEDS the
    threshold.  Fixed fixtures pin the boundary semantics; this sweep checks
    them across arbitrary gap patterns."""
    import pandas as pd

    from geostatstransforms_jl_spark.functions.timeseries import sessionize

    gap_s = 30
    gap_us = gap_s * 1_000_000
    rng = np.random.default_rng(123)
    base = 1_700_000_000_000_000  # epoch micros
    rows = []
    for u in range(60):
        t = base + int(rng.integers(0, 10**9))
        n = int(rng.integers(1, 120))
        for _ in range(n):
            rows.append((f"u{u:03d}", t))
            r = rng.random()
            if r < 0.05:
                step = 0  # duplicate timestamp
            elif r < 0.10:
                step = gap_us  # exactly the threshold: same session
            elif r < 0.15:
                step = gap_us + 1  # 1us over: split
            else:
                step = int(rng.integers(1, 3 * gap_us))
            t += step
    pdf = pd.DataFrame(rows, columns=["user_id", "us"])
    pdf["ts"] = pd.to_datetime(pdf["us"], unit="us")
    df = spark.createDataFrame(pdf[["user_id", "ts"]].sample(frac=1.0, random_state=7))

    got = (
        sessionize(df, gap_seconds=gap_s)
        .toPandas()
        .sort_values(["user_id", "session_seq"], ignore_index=True)
    )

    # independent replay on the raw events
    want = []
    for u, g in pdf.groupby("user_id"):
        us = np.sort(g["us"].to_numpy())
        splits = np.flatnonzero(np.diff(us) > gap_us) + 1
        for seq, chunk in enumerate(np.split(us, splits), start=1):
            want.append((u, seq, len(chunk), chunk[0], chunk[-1]))
    want = pd.DataFrame(
        want, columns=["user_id", "session_seq", "n_events", "start_us", "end_us"]
    ).sort_values(["user_id", "session_seq"], ignore_index=True)

    assert len(got) == len(want)
    assert (got["user_id"] == want["user_id"]).all()
    assert (got["session_seq"].astype(int) == want["session_seq"]).all()
    assert (got["n_events"].astype(int) == want["n_events"]).all()
    got_start = got["session_start"].astype("datetime64[us]").astype("int64")
    got_end = got["session_end"].astype("datetime64[us]").astype("int64")
    assert (got_start.to_numpy() == want["start_us"].to_numpy()).all()
    assert (got_end.to_numpy() == want["end_us"].to_numpy()).all()
