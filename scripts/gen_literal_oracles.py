"""Generate literal-table DuckDB oracles for the deterministic-but-not-SQL
queries (VERDICT r2 next-step 6): `modefilter`, `maxposterior`, `quenching`,
`kriging_neighbors`, `doc_fingerprint`, `hash_split`, `simhash_pairs`, `minhash_dedup`,
`minhash_dedup_cc`, `image_gradient`, `ann_lsh_topk`, `ann_ivf_topk`,
`image_potrace`.

The expected outputs are computed here with INDEPENDENT numpy replays of the
reference semantics (the same replay logic as tests/test_differential_replays.py
— written from src/modefilter.jl / src/maxposterior.jl / src/quenching.jl and
the ordinary-kriging closed form, sharing no code with the engine operators)
over the sf0.01 driver tables read via DuckDB (no Spark involved).  The
results are emitted as `VALUES` literals into `oracle_literals_sf001.py`,
which `__spark_entry__.oracle_sql()` merges in.

Run: python scripts/gen_literal_oracles.py [sf_dir]
"""

from __future__ import annotations

import itertools
import math
import os
import re
import sys
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkhash import spark_xxhash64  # noqa: E402  (pure-Python XXH64)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "oracle_literals_sf001.py"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# ---- independent replay helpers (mirrors tests/test_differential_replays) --


def _offsets(maxneighbors, nd=2):
    r = 1
    while (2 * r + 1) ** nd - 1 < maxneighbors * 2:
        r += 1
    offs = [
        o for o in itertools.product(range(-r, r + 1), repeat=nd)
        if any(c != 0 for c in o)
    ]
    return sorted(offs, key=lambda o: (sum(c * c for c in o), *o))


def _mode_smallest(levels, vals):
    counts = {l: sum(1 for v in vals if v == l) for l in levels}
    top = max(counts.values())
    return min(l for l, c in counts.items() if c == top)


def _decay(kind, h, rng_):
    hr = np.asarray(h, dtype=float) / rng_
    if kind == "gaussian":
        return np.exp(-3.0 * hr**2)
    if kind == "spherical":
        c = 1.0 - (1.5 * np.clip(hr, 0, 1) - 0.5 * np.clip(hr, 0, 1) ** 3)
        return np.where(hr >= 1.0, 0.0, c)
    return np.exp(-3.0 * hr)


def replay_modefilter(grid, maxneighbors, seed):
    """Sequential mode filter: visit cells (sorted base order) in
    seeded-shuffle order, replace with mode of the CURRENT ≤k nearest
    neighbors (src/modefilter.jl:16-81)."""
    g = dict(grid)
    levels = sorted(set(g.values()))
    offs = _offsets(maxneighbors)
    order = sorted(g)
    rng = np.random.default_rng(seed)
    rng.shuffle(order)
    for (i, j) in order:
        nb = []
        for (di, dj) in offs:
            p = (i + di, j + dj)
            if p in g:
                nb.append(g[p])
                if len(nb) >= maxneighbors:
                    break
        if len(nb) <= 1:
            continue
        g[(i, j)] = _mode_smallest(levels, nb)
    return g


def replay_maxposterior(grid, vario, rng_, maxneighbors):
    """Order-free indicator-cokriging MAP (src/maxposterior.jl:34-147):
    neighbors read the immutable snapshot; γ = 1 − c(h); argmax posterior."""
    levels = sorted(set(grid.values()))
    offs = [o for o in _offsets(maxneighbors) if math.hypot(*o) <= rng_]
    expect = {}
    for (i, j) in grid:
        nb = []
        for (di, dj) in offs:
            p = (i + di, j + dj)
            if p in grid:
                nb.append(p)
                if len(nb) >= maxneighbors:
                    break
        if len(nb) <= 1:
            expect[(i, j)] = grid[(i, j)]
            continue
        P = np.array(nb, dtype=float)
        k = len(nb)
        H = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
        A = np.empty((k + 1, k + 1))
        A[:k, :k] = 1.0 - _decay(vario, H, rng_)
        A[k, :k] = A[:k, k] = 1.0
        A[k, k] = 0.0
        h0 = np.sqrt(((P - np.array([i, j], dtype=float)) ** 2).sum(-1))
        b = np.concatenate([1.0 - _decay(vario, h0, rng_), [1.0]])
        try:
            lam = np.linalg.solve(A, b)[:k]
        except np.linalg.LinAlgError:
            lam = np.linalg.lstsq(A, b, rcond=None)[0][:k]
        prob = np.zeros(len(levels))
        for q in range(len(levels)):
            z = np.array([1.0 if grid[p] == levels[q] else 0.0 for p in nb])
            prob[q] = lam @ z
        prob = np.clip(prob, 0.0, 1.0)
        expect[(i, j)] = (
            levels[int(np.argmax(prob / prob.sum()))] if prob.sum() > 0 else grid[(i, j)]
        )
    return expect


def replay_quenching(grid, vario, rng_, maxneighbors, tol, maxiter, seed):
    """Accept-if-objective-drops sweep against the idealized transiogram
    (src/quenching.jl:34-150)."""
    levels = sorted(set(grid.values()))
    lev_idx = {l: q for q, l in enumerate(levels)}
    L = len(levels)
    g = {p: lev_idx[v] for p, v in grid.items()}
    props = np.array([sum(1 for v in g.values() if v == q) for q in range(L)], float)
    props /= props.sum()
    offs = [o for o in _offsets(maxneighbors) if math.hypot(*o) <= rng_]
    lags = sorted({float(d) for d in range(1, int(np.ceil(rng_)) + 1)})

    def tau(h):
        c = _decay(vario, np.array([h]), rng_)[0]
        T = np.tile(props, (L, 1)) * (1 - c)
        T[np.diag_indices(L)] += c
        return T

    def objective(cells):
        cellset = set(cells)
        total = 0.0
        for axis in (0, 1):
            for h in lags:
                step = (int(h), 0) if axis == 0 else (0, int(h))
                cnt = np.zeros((L, L))
                for (a, b) in cells:
                    nbp = (a + step[0], b + step[1])
                    if nbp in cellset:
                        cnt[g[(a, b)], g[nbp]] += 1
                rows_ = cnt.sum(axis=1, keepdims=True)
                if rows_.sum() == 0:
                    continue
                emp = np.where(rows_ > 0, cnt / np.maximum(rows_, 1), 0.0)
                total += ((emp - tau(h)) ** 2)[rows_[:, 0] > 0].sum()
        return total

    changeable = sorted(g)
    rng = np.random.default_rng(seed)
    for _ in range(maxiter):
        keepgoing = False
        order = list(changeable)
        rng.shuffle(order)
        for (i, j) in order:
            nb = [(i, j)]
            for (di, dj) in offs:
                p = (i + di, j + dj)
                if p in g:
                    nb.append(p)
                    if len(nb) > maxneighbors:
                        break
            if len(nb) <= 2:
                continue
            nvals = [levels[g[p]] for p in nb[1:]]
            mode = lev_idx[_mode_smallest(levels, nvals)]
            old = g[(i, j)]
            if mode == old:
                continue
            obj = objective(nb)
            g[(i, j)] = mode
            newobj = objective(nb)
            if obj > 0 and abs(newobj - obj) / obj >= tol:
                keepgoing = True
            if not (newobj < obj):
                g[(i, j)] = old
        if not keepgoing:
            break
    return {p: levels[q] for p, q in g.items()}


def replay_kriging_neighbors(src, tgt, vario, rng_, sill, nugget, k):
    """Closed-form ordinary kriging over each target's exact k nearest
    sources ((dist, id) tie-break)."""
    sid = src[:, 0].astype(np.int64)
    SX = src[:, 1:3]
    sz = src[:, 3]

    def gamma(h):
        h = np.asarray(h, dtype=float)
        if vario == "spherical":
            hr = np.clip(h / rng_, 0.0, 1.0)
            return nugget + (sill - nugget) * (1.5 * hr - 0.5 * hr**3)
        if vario == "gaussian":
            return nugget + (sill - nugget) * (1.0 - np.exp(-3.0 * (h / rng_) ** 2))
        return nugget + (sill - nugget) * (1.0 - np.exp(-3.0 * (h / rng_)))

    out = {}
    for tid, tx, ty in tgt:
        d2 = (tx - SX[:, 0]) ** 2 + (ty - SX[:, 1]) ** 2
        d = np.sqrt(d2)
        order = sorted(range(len(sid)), key=lambda q: (d[q], sid[q]))[:k]
        X = SX[order]
        z = sz[order]
        kk = len(order)
        H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        A = np.empty((kk + 1, kk + 1))
        A[:kk, :kk] = gamma(H)
        A[kk, :kk] = A[:kk, kk] = 1.0
        A[kk, kk] = 0.0
        h0 = np.sqrt(((X - [tx, ty]) ** 2).sum(-1))
        b = np.concatenate([gamma(h0), [1.0]])
        try:
            lam = np.linalg.solve(A, b)[:kk]
        except np.linalg.LinAlgError:
            lam = np.linalg.lstsq(A, b, rcond=None)[0][:kk]
        out[int(tid)] = float(lam @ z)
    return out


# ---- text-op replays (independent of the engine's Catalyst expressions) ---
#
# The hash primitive is scripts/sparkhash.py — pure-Python canonical XXH64
# (public spec), NOT the engine's JVM function.  Tokenization / shingling /
# banding / voting below are re-derived from the documented operator
# contracts; the bucket caps (1000) provably cannot bind at sf0.01 (500
# docs ⇒ max bucket membership 500), so brute-force / tuple-equality
# replays are semantically identical to the engine's banded joins.

_WS = r"[ \t\n\x0b\f\r]+"  # Java regex \s (ASCII) — documents are ASCII


def _split_ws(text: str) -> list:
    """split(trim(lower(text)), '\\s+') — Spark semantics."""
    return re.split(_WS, text.lower().strip(" "))


def _norm_words(text: str) -> list:
    """textops.dedup.words(): collapse whitespace to single spaces first."""
    return re.sub(_WS, " ", text.lower().strip(" ")).split(" ")


def _win_join(w: list, p: int, n: int) -> str:
    # concat_ws(" ", element_at(w, p+i+1)...) skips out-of-range (null) slots
    return " ".join(w[p + i] for i in range(n) if p + i < len(w))


def replay_doc_fingerprint(rows):
    """quality.doc_fingerprint: 4-word windows → xxhash64(str), folded with
    acc' = xxhash64(acc:long, h:long) from acc=0."""
    out = {}
    for did, text in rows:
        w = _split_ws(text)
        acc = 0
        for p in range(max(len(w) - 4, 0) + 1):
            h = spark_xxhash64(_win_join(w, p, 4))
            acc = spark_xxhash64(("long", acc), ("long", h))
        out[int(did)] = acc
    return out


def replay_hash_split(doc_ids, weights, seed, buckets=1_000_000):
    """packing.hash_split: bucket = pmod(xxhash64(id:long, seed:long),
    buckets); contiguous [0, buckets) ranges carved by cumulative normalized
    weight, bounds rounded once, last bound pinned to buckets."""
    names = list(weights)
    total = float(sum(weights.values()))
    bounds, acc = [], 0.0
    for n in names:
        acc += weights[n] / total
        bounds.append(min(buckets, int(round(acc * buckets))))
    bounds[-1] = buckets
    out = {}
    for did in doc_ids:
        b = spark_xxhash64(("long", did), ("long", seed)) % buckets  # py % == pmod
        for n, hi in zip(names, bounds):
            if b < hi:
                out[int(did)] = n
                break
    return out


def replay_simhash_pairs(rows, max_hamming=3):
    """simhash_64 + simhash_pairs: per-token xxhash64 bit votes → 64-bit
    signature; pairs with Hamming ≤ max_hamming.  Brute-force all-pairs —
    equivalent to the engine's banded join because bands = max_hamming + 1
    gives the pigeonhole recall guarantee and no bucket cap binds."""
    sigs = {}
    for did, text in rows:
        votes = [0] * 64
        for tok in _norm_words(text):
            if tok == "":
                continue
            h = spark_xxhash64(tok) & ((1 << 64) - 1)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sigs[int(did)] = sum(1 << i for i in range(64) if votes[i] > 0)
    ids = sorted(sigs)
    pairs = []
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= max_hamming:
                pairs.append((a, b, d))
    return pairs


def replay_minhash_dedup(rows, k=64, shingle=3, bands=16, rows_per_band=4,
                         threshold=0.7):
    """minhash_signatures + minhash_lsh_pairs + greedy dedup: distinct word
    shingles → base = xxhash64(sh) once per shingle → k
    min(xxhash64(base:long, i)) (the derived family the engine computes; see
    textops/dedup.py `minhash_signatures`) → band-tuple buckets → candidate
    pairs → est-Jaccard ≥ threshold → drop larger ids.  Returns survivor
    doc_ids.  Band-bucket equality replayed as tuple equality (the engine
    hashes the tuple; equal tuples hash equal, spurious 2⁻⁶⁴ collisions
    ignored)."""
    ids, pairs = _replay_minhash_pairs(rows, k, shingle, bands, rows_per_band, threshold)
    return ids - {b for _, b in pairs}


def _replay_minhash_pairs(rows, k=64, shingle=3, bands=16, rows_per_band=4,
                          threshold=0.7):
    """Shared pair replay: returns (all doc ids, scored pairs (a, b) with
    a < b and est-Jaccard ≥ threshold)."""
    sigs = {}
    for did, text in rows:
        w = _norm_words(text)
        grams = list(dict.fromkeys(
            _win_join(w, p, shingle) for p in range(max(len(w) - shingle, 0) + 1)
        ))
        bases = [spark_xxhash64(g) for g in grams]
        sigs[int(did)] = [
            min(spark_xxhash64(("long", b), i) for b in bases) for i in range(k)
        ]
    cand = set()
    for band in range(bands):
        buckets = defaultdict(list)
        for did in sorted(sigs):
            key = tuple(sigs[did][band * rows_per_band:(band + 1) * rows_per_band])
            buckets[key].append(did)
        for mem in buckets.values():
            assert len(mem) <= 1000, "bucket cap would bind — replay invalid"
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    cand.add((mem[i], mem[j]))
    pairs = set()
    for a, b in cand:
        eq = sum(1 for i in range(k) if sigs[a][i] == sigs[b][i])
        if eq / k >= threshold:
            pairs.add((a, b))
    return set(sigs), pairs


def replay_minhash_dedup_cc(rows, k=64, shingle=3, bands=16, rows_per_band=4,
                            threshold=0.7):
    """Connected-components policy over the SAME replayed pair set: one
    survivor (the min id) per component — independent union-find, nothing
    imported from functions/graph.py."""
    ids, pairs = _replay_minhash_pairs(rows, k, shingle, bands, rows_per_band, threshold)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i for i in ids if find(i) == i}


# ---- jpeg lossy-spec replay --------------------------------------------------
#
# fmt='jpeg' rows store REAL baseline JFIF bytes as of round 5.  The codec's
# documented lossy spec (core/jpeg.py module docstring) is: edge-pad to 8-
# multiples, level-shift, blockwise float64 orthonormal DCT-II, round(÷Q),
# ×Q, IDCT, crop, round half-even + clip — quantization is the ONLY lossy
# step.  Replayed here from the PUBLIC spec (ITU-T T.81 Annex K.1 table,
# libjpeg quality formula at the codec's pinned default quality 99), NOT by
# importing core/jpeg.py: a Huffman/bitstream bug in the codec shifts these
# pixels and flips every literal downstream.

_JPEG_Q50_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)


def _jpeg_spec_stored_pixels(pix: np.ndarray, quality: int = 99) -> np.ndarray:
    """Grayscale stored-pixel replay: what decode(encode(pix, 'jpeg')) yields."""
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((_JPEG_Q50_LUMA * scale + 50) // 100, 1, 255).astype(np.float64)
    k = np.arange(8, dtype=np.float64)
    C = np.sqrt(2.0 / 8.0) * np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 16.0)
    C[0, :] = np.sqrt(1.0 / 8.0)
    h, w = pix.shape
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pix.astype(np.float64), ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    quant = np.round((C @ (blocks - 128.0) @ C.T) / q)
    spatial = C.T @ (quant * q) @ C + 128.0
    full = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return np.clip(np.round(full[:h, :w]), 0, 255).astype(np.uint8)


# ---- perceptual-hash replay --------------------------------------------------
#
# operators/phash.py documented spec, replayed independently: grayscale →
# exact-integer bilinear 32×32 (the scalar `_bilinear_replay`, not the
# engine's vectorized kernel) → 32×32 orthonormal DCT-II re-derived in-file
# → top-left 8×8 → median of coefficients 1..63 → 64 little-endian bits →
# two's-complement int64.


def _phash64_spec(pix: np.ndarray) -> int:
    g32 = _bilinear_replay(pix, 32, 32).astype(np.float64)
    k = np.arange(32, dtype=np.float64)
    C = np.sqrt(2.0 / 32.0) * np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 64.0)
    C[0, :] = np.sqrt(1.0 / 32.0)
    flat = (C @ g32 @ C.T)[:8, :8].reshape(64)
    med = float(np.median(flat[1:]))
    v = 0
    for b in range(64):
        if flat[b] > med:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


def replay_image_phash_table(n=150, seed=42):
    """(id, phash64) for n originals ('img...') plus their jpeg transcodes
    ('cp' + id): original stored pixels are the input contract (jpeg rows =
    lossy-spec pixels); transcodes apply the jpeg lossy spec to the STORED
    pixels once more (transcode_images re-encodes what it decodes)."""
    from geostatstransforms_jl_spark.core.images import make_image

    out = []
    for i in range(n):
        # encode=False: the replay derives stored pixels from the SPEC, so
        # running the actual codec here would be both wasted work and an
        # independence leak (images.py documents this knob for oracle use)
        pix, w, h, fmt, _, _, _ = make_image(i, seed, encode=False)
        stored = _jpeg_spec_stored_pixels(pix) if fmt == "jpeg" else pix
        out.append((f"img{i:08d}", _phash64_spec(stored)))
        out.append((f"cpimg{i:08d}", _phash64_spec(_jpeg_spec_stored_pixels(stored))))
    return out


# ---- image-gradient replay -------------------------------------------------


def _sobel_dense(a: np.ndarray, axis: int) -> np.ndarray:
    """Independent 3×3 Sobel (replicate border): dense kernel accumulation,
    not the engine's separable slicing."""
    d = np.array([-0.5, 0.0, 0.5])
    s = np.array([0.25, 0.5, 0.25])
    kern = np.outer(d, s) if axis == 0 else np.outer(s, d)
    p = np.pad(a, 1, mode="edge")
    H, W = a.shape
    out = np.zeros_like(a)
    for di in range(3):
        for dj in range(3):
            if kern[di, dj] != 0.0:
                out += kern[di, dj] * p[di:di + H, dj:dj + W]
    return out


def replay_image_gradient(n=200, seed=42):
    """Per-image Sobel |∇| mean/max over the synthetic input contract.
    `make_image` reconstructs the INPUT pixels (it is the table's defining
    pure function, FIXTURES.md F1); fmt='jpeg' rows store the codec's lossy
    spec output (_jpeg_spec_stored_pixels, replayed in-file); the gradient
    itself is computed by the dense replay above, independent of
    operators/gradient.py."""
    from geostatstransforms_jl_spark.core.images import make_image

    out = []
    for i in range(n):
        pix, w, h, fmt, _, _, _ = make_image(i, seed)
        if fmt == "jpeg":
            pix = _jpeg_spec_stored_pixels(pix)
        a = pix.astype(np.float64).T  # [i, j] layout
        mag = np.hypot(_sobel_dense(a, 0), _sobel_dense(a, 1))
        out.append((f"img{i:08d}", float(mag.mean()), float(mag.max())))
    return out


def _bilinear_replay(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Independent half-pixel-center bilinear (the documented exact-integer
    spec in core/media.py:_resize_plane): scalar Python-int 4-term gather
    per destination pixel, not the engine's vectorized separable np.ix_
    row/col split.  The spec's source center for destination d is the exact
    rational ((2d+1)*in - out) / (2*out); blend weights are the scaled
    fractional parts and the blend rounds half up — all in arbitrary-
    precision ints, so both formulations are bit-identical by construction."""
    in_h, in_w = a.shape
    dy2, dx2 = 2 * out_h, 2 * out_w
    den = dx2 * dy2
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for dy in range(out_h):
        ny = (2 * dy + 1) * in_h - out_h
        y0 = min(max(ny // dy2, 0), in_h - 1)
        y1 = min(y0 + 1, in_h - 1)
        wy = min(max(ny - y0 * dy2, 0), dy2)
        for dx in range(out_w):
            nx = (2 * dx + 1) * in_w - out_w
            x0 = min(max(nx // dx2, 0), in_w - 1)
            x1 = min(x0 + 1, in_w - 1)
            wx = min(max(nx - x0 * dx2, 0), dx2)
            n = (
                int(a[y0, x0]) * (dx2 - wx) * (dy2 - wy)
                + int(a[y0, x1]) * wx * (dy2 - wy)
                + int(a[y1, x0]) * (dx2 - wx) * wy
                + int(a[y1, x1]) * wx * wy
            )
            out[dy, dx] = (2 * n + den) // (2 * den)
    return out


def replay_image_resize(n=120, seed=42, out_w=20, out_h=14):
    """Per-image mean of the bilinear-resized pixels.  `make_image`
    reconstructs the INPUT pixels (input-defining contract, like
    replay_image_gradient); fmt='jpeg' rows store the codec's lossy-spec
    pixels (_jpeg_spec_stored_pixels, replayed in-file); the resize itself
    is `_bilinear_replay`, independent of core/media.py."""
    from geostatstransforms_jl_spark.core.images import make_image

    out = []
    for i in range(n):
        pix, w, h, fmt, _, _, _ = make_image(i, seed)
        if fmt == "jpeg":
            pix = _jpeg_spec_stored_pixels(pix)
        res = _bilinear_replay(pix, out_h, out_w)
        out.append((f"img{i:08d}", float(res.astype(np.float64).mean())))
    return out


def replay_video_frame_sample(n=50, every=3, seed=42):
    """Sampled-frame means.  `make_video` reconstructs the INPUT frames
    (input-defining contract); sampling indices and means are recomputed
    here, independent of core/media.py's container parse + seek path — a
    container/codec bug on the engine side flips a mean."""
    from geostatstransforms_jl_spark.core.media import make_video

    out = []
    for i in range(n):
        frames, w, h, _, _ = make_video(i, seed)
        for idx in range(0, len(frames), every):
            out.append(
                (f"vid{i:08d}", idx, float(frames[idx].astype(np.float64).mean()))
            )
    return out


def replay_audio_rms(n=80, window=512, seed=42):
    """Windowed RMS/peak over raw int16 amplitudes.  `make_audio`
    reconstructs the INPUT samples (input-defining contract); windowing and
    the features are recomputed here independent of core/media.py's
    frombuffer decode + reshape path."""
    from geostatstransforms_jl_spark.core.media import make_audio

    out = []
    for i in range(n):
        pcm, _, _ = make_audio(i, seed)
        x = pcm.astype(np.float64)
        nwin = len(x) // window
        for wi in range(nwin):
            seg = x[wi * window : (wi + 1) * window]
            out.append(
                (
                    f"aud{i:08d}",
                    wi,
                    float(np.sqrt(np.mean(np.square(seg)))),
                    float(np.max(np.abs(seg))),
                )
            )
    return out


# ---- clustering replays ----------------------------------------------------
#
# SLIC / GHC / GSC are deterministic end-to-end (no RNG except GSC's seeded
# k-means++).  Each replay below re-derives the full algorithm from the
# reference semantics (src/clustering/slic.jl, ghc.jl, gsc.jl) in plain
# loops/numpy — independent code from the engine's Spark jobs and matmul
# formulations; eigendecomposition and RNG go through the public numpy APIs
# the contracts name.  Integer labels make the comparison exact: any
# divergence in standardization, lattice order, tie-breaks, Lloyd updates,
# ward merges, or eigenvector selection flips a label.


def _std_feat(v: np.ndarray) -> np.ndarray:
    sd = v.std(ddof=1)
    return (v - v.mean()) / (sd if sd > 0 else 1.0)


def _slic_spacing(k: int, sides):
    l = list(sides)
    d = len(l)
    if d == 1:
        return [l[0] / k]
    j = int(np.argmax(l))
    kj = math.ceil(k ** (1.0 / d))
    sj = l[j] / kj
    s = _slic_spacing(math.ceil(k / kj), l[:j] + l[j + 1:])
    return s[:j] + [sj] + s[j:]


def _nn1(qx, qy, pts):
    """(d2, row_id)-min nearest neighbor; pts: list of (rid, x, y)."""
    best = None
    for rid, x, y in pts:
        d2 = (qx - x) * (qx - x) + (qy - y) * (qy - y)
        key = (d2, rid)
        if best is None or key < best:
            best = key
    return best[1]


def replay_slic(rows, k=8, m=1.0, tol=1e-4, maxiter=10):
    """src/clustering/slic.jl:41-204 over (row_id, x, y, bal) points:
    standardized features, recursive spacing, first-axis-fastest lattice,
    unique 1-NN snaps as initial centers, ball-restricted Lloyd with
    monotone (dt, k) improvement, medoid update, mean-dist convergence,
    orphan 1-NN labels."""
    rows = sorted(rows)
    rid = [r[0] for r in rows]
    X = np.array([[r[1], r[2]] for r in rows], dtype=float)
    z = _std_feat(np.array([r[3] for r in rows], dtype=float))
    n = len(rows)
    los = X.min(axis=0)
    his = X.max(axis=0)
    spac = _slic_spacing(k, list(his - los))
    s_max = max(spac)
    axes = [
        np.arange(lo + s / 2, hi, s) if s > 0 else np.array([lo])
        for lo, hi, s in zip(los, his, spac)
    ]
    pts = list(zip(rid, X[:, 0], X[:, 1]))
    seen, center_ids = set(), []
    for y in axes[1]:          # first axis (x) fastest
        for x in axes[0]:
            r = _nn1(float(x), float(y), pts)
            if r not in seen:
                seen.add(r)
                center_ids.append(r)
    idx_of = {r: i for i, r in enumerate(rid)}

    label = np.zeros(n, dtype=np.int64)
    dist = np.full(n, np.inf)
    delta_cur = float("inf")
    ids = list(center_ids)
    for _ in range(maxiter):
        C = [(ki + 1, X[idx_of[i]], z[idx_of[i]]) for ki, i in enumerate(ids)]
        for p in range(n):
            best = None
            for kk, cx, cz in C:
                ds2 = (X[p, 0] - cx[0]) ** 2 + (X[p, 1] - cx[1]) ** 2
                if ds2 > s_max * s_max:
                    continue
                dv2 = (z[p] - cz) ** 2
                dt = math.sqrt(dv2 + m * m * ds2 / (s_max * s_max))
                key = (dt, kk)
                if best is None or key < best:
                    best = key
            if best is not None and best[0] < dist[p]:
                dist[p] = best[0]
                label[p] = best[1]
        # medoid update: member nearest the member coordinate mean
        medoid = {}
        for lab in sorted(set(label[label > 0])):
            mem = np.flatnonzero(label == lab)
            mean = X[mem].mean(axis=0)
            best = None
            for p in mem:
                dm = math.sqrt(((X[p] - mean) ** 2).sum())
                key = (dm, rid[p])
                if best is None or key < best:
                    best = key
            medoid[int(lab)] = best[1]
        ids = [medoid.get(ki + 1, i) for ki, i in enumerate(ids)]
        delta_new = float(dist.mean())
        if (
            delta_cur != 0.0
            and math.isfinite(delta_new)
            and math.isfinite(delta_cur)
            and abs(delta_new - delta_cur) / delta_cur < tol
        ):
            break
        delta_cur = delta_new

    out = {}
    assigned = [(rid[p], X[p, 0], X[p, 1]) for p in range(n) if label[p] > 0]
    lab_of = {rid[p]: int(label[p]) for p in range(n) if label[p] > 0}
    for p in range(n):
        if label[p] > 0:
            out[rid[p]] = int(label[p])
        else:
            out[rid[p]] = lab_of[_nn1(X[p, 0], X[p, 1], assigned)]
    return out


def _ward_merges(D: np.ndarray):
    """Lance-Williams Ward on squared distances; greedy global-min merges,
    surviving representative min(i, j) — re-derived from hclust(:ward)."""
    n = D.shape[0]
    w = D.astype(np.float64) ** 2
    np.fill_diagonal(w, np.inf)
    sizes = np.ones(n, dtype=np.int64)
    merges = []
    for _ in range(n - 1):
        i, j = divmod(int(np.argmin(w)), n)
        if i > j:
            i, j = j, i
        ni, nj, wij = sizes[i], sizes[j], w[i, j]
        for t in range(n):
            if t in (i, j) or not np.isfinite(w[t, t]) and False:
                continue
            new = ((ni + sizes[t]) * w[i, t] + (nj + sizes[t]) * w[j, t]
                   - sizes[t] * wij) / (ni + nj + sizes[t])
            w[i, t] = w[t, i] = new
        w[i, i] = np.inf
        w[j, :] = np.inf
        w[:, j] = np.inf
        sizes[i] = ni + nj
        merges.append((i, j))
    return merges


def _cut_labels(merges, n: int, k: int) -> np.ndarray:
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j) in merges[: max(0, n - k)]:
        ri, rj = find(i), find(j)
        parent[max(ri, rj)] = min(ri, rj)
    labels = np.zeros(n, dtype=np.int64)
    mapping = {}
    for i in range(n):
        r = find(i)
        if r not in mapping:
            mapping[r] = len(mapping) + 1
        labels[i] = mapping[r]
    return labels


def replay_ghc(rows, k=5, lam=10.0, kern="epanechnikov"):
    """src/clustering/ghc.jl:53-255 over (row_id, x, y, bal): standardized
    features, epanechnikov kernel weights, per-pair dissimilarity computed
    entry-by-entry (not the engine's dense matmuls), Ward + cutree with
    first-occurrence label numbering."""
    rows = sorted(rows)
    rid = [r[0] for r in rows]
    X = np.array([[r[1], r[2]] for r in rows], dtype=float)
    z = _std_feat(np.array([r[3] for r in rows], dtype=float))
    n = len(rows)
    H = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    if kern == "epanechnikov":
        K = (H <= lam) * (lam ** 2 - H ** 2)
    elif kern == "triangular":
        K = (H <= lam) * (lam - H)
    else:
        K = (H <= lam).astype(float)
    s = K.sum(axis=0)
    delta = z[:, None] - z[None, :]
    Dij = delta * delta
    num = K.T @ Dij @ K
    denom = np.outer(s, s)
    with np.errstate(divide="ignore", invalid="ignore"):
        D = np.where(denom > 0, 0.5 * num / denom, 0.0)
    np.fill_diagonal(D, 0.0)
    D = np.maximum(D, 0.0)
    labels = _cut_labels(_ward_merges(D), n, k)
    return dict(zip(rid, labels.tolist()))


def _kmeans_pp(X: np.ndarray, k: int, tol: float, maxiter: int, seed: int):
    """k-means++ + Lloyd re-derived from the documented contract (seeded
    default_rng; integers / p-weighted choice draws; relative-objective
    stop after the first iteration)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    centers = [X[int(rng.integers(n))]]
    for _ in range(1, k):
        d2 = np.min(((X[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1), axis=1)
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[int(rng.integers(n))])
            continue
        centers.append(X[int(rng.choice(n, p=d2 / tot))])
    C = np.asarray(centers, dtype=float)
    prev = None
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(maxiter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        labels = np.argmin(d2, axis=1)
        obj = d2[np.arange(n), labels].sum()
        for c in range(k):
            msk = labels == c
            if msk.any():
                C[c] = X[msk].mean(axis=0)
        if prev is not None and prev - obj <= tol * abs(prev):
            break
        prev = obj
    return labels + 1


def replay_gsc(rows, k=4, m=2.0, sigma=1.0, tol=1e-4, maxiter=10, seed=0):
    """src/clustering/gsc.jl:40-101 over (row_id, x, y, bal) points:
    TableDistance affinity exp(−Δ/σ²) (no grid adjacency on a point
    domain, so `m` never applies), normalized Laplacian, top-k
    eigenvectors, seeded k-means++ on the spectral rows."""
    rows = sorted(rows)
    rid = [r[0] for r in rows]
    z = np.array([r[3] for r in rows], dtype=float)  # NOT standardized
    diff = z[:, None] - z[None, :]
    delta = np.sqrt(1.0 * diff * diff)
    E = np.exp(-delta / (sigma * sigma))
    deg = E.sum(axis=1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-300))
    L = E * np.outer(dinv, dinv)
    vals, vecs = np.linalg.eigh(L)
    V = vecs[:, np.argsort(vals)[::-1][:k]]
    labels = _kmeans_pp(V, k, tol, maxiter, seed)
    return dict(zip(rid, labels.tolist()))


# ---- potrace polygon-count replay ------------------------------------------


def _count_components_4(mask: np.ndarray) -> int:
    """4-connected components via flood fill — independent of the engine's
    Selinger edge walk.  Equivalence: with the reference's left-turn policy
    at ambiguous crossings (src/potrace.jl:214-222) foreground diagonals are
    split, so the region is 4-connected, and _paths_to_polys makes every
    even-depth contour (= every foreground component, top-level or island)
    exactly one polygon — n_polys == #components."""
    seen = np.zeros(mask.shape, dtype=bool)
    n = 0
    H, W = mask.shape
    for si in range(H):
        for sj in range(W):
            if mask[si, sj] and not seen[si, sj]:
                n += 1
                stack = [(si, sj)]
                seen[si, sj] = True
                while stack:
                    i, j = stack.pop()
                    for ni, nj in ((i-1, j), (i+1, j), (i, j-1), (i, j+1)):
                        if 0 <= ni < H and 0 <= nj < W and mask[ni, nj] and not seen[ni, nj]:
                            seen[ni, nj] = True
                            stack.append((ni, nj))
    return n


def replay_image_potrace(seed=42):
    """q_image_potrace: 24 synthetic images filtered to 32×32 (n = 4, 13, 22
    — all PNG, no jpeg quantization), threshold mask z > 127.5, per-(image,
    mask-value) polygon count."""
    from geostatstransforms_jl_spark.core.images import SIZES, make_image

    rows = []
    for n in range(24):
        if SIZES[n % 3] != 32 or SIZES[(n // 3) % 3] != 32:
            continue
        pix, w, h, fmt, _, _, _ = make_image(n, seed)
        if fmt == "jpeg":
            pix = _jpeg_spec_stored_pixels(pix)
        grid = pix.astype(np.float64).T  # [i, j]
        for m in (0, 1):
            mask = (grid > 127.5) == bool(m)
            rows.append((f"img{n:08d}", m, _count_components_4(mask)))
    return rows


# ---- ANN replays -----------------------------------------------------------
#
# Deterministic by construction (seeded hyperplanes / seeded-hash sample
# order / seeded k-means++).  The replays re-derive the DISTRIBUTED pipeline
# — bucket assignment, candidate joins, dedup, exact re-rank, windowed
# top-k — in plain numpy/python.  Two driver-side pure functions are shared
# by contract rather than re-implemented: the hyperplane draw and k-means++
# centroid training (both run on the driver in the engine too; the oracle's
# risk surface is the distributed plumbing around them).  Cosines mimic the
# JVM evaluation order: float32 elementwise product, float64 accumulation.


def _cosine_jvm(a: np.ndarray, b: np.ndarray) -> float:
    prod = (a.astype(np.float32) * b.astype(np.float32)).astype(np.float64)
    na = math.sqrt(float(np.sum((a.astype(np.float32) * a.astype(np.float32)).astype(np.float64))))
    nb = math.sqrt(float(np.sum((b.astype(np.float32) * b.astype(np.float32)).astype(np.float64))))
    return float(np.sum(prod)) / (na * nb)


def _topk_rerank(cand: dict, vecs: dict, k: int) -> list:
    """cand: q_id -> set of c_ids; exact cosine re-rank, ties by c_id."""
    out = []
    for qid in sorted(cand):
        scored = sorted(
            ((c, _cosine_jvm(vecs[qid], vecs[c])) for c in cand[qid]),
            key=lambda t: (-t[1], t[0]),
        )
        out.extend((qid, c, cos) for c, cos in scored[:k])
    return out


def replay_ann_lsh_topk(vecs, k=5, dim=64, n_tables=12, n_bits=8, seed=7,
                        n_queries=16):
    """functions/ann.lsh_topk: sign-bit buckets per table, bucket equi-join
    candidates, exact re-rank."""
    ids = sorted(vecs)
    V = np.stack([vecs[i] for i in ids])  # float32
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables, n_bits, dim))
    cand = defaultdict(set)
    for t in range(n_tables):
        signs = (V @ H[t].T) > 0
        buckets = (signs * (1 << np.arange(n_bits))).sum(axis=1)
        by_bucket = defaultdict(list)
        for i, b in zip(ids, buckets):
            by_bucket[int(b)].append(i)
        for mem in by_bucket.values():
            qs = [i for i in mem if i < n_queries]
            for qid in qs:
                for c in mem:
                    if c != qid:
                        cand[qid].add(c)
    return _topk_rerank(cand, vecs, k)


def replay_kmeans_centroids(X, k, tol=1e-4, maxiter=10, seed=0):
    """Independent replay of the engine's DOCUMENTED k-means spec
    (functions/cluster_numlib.kmeans): numpy PCG64(seed) draws — one
    `integers(n)` for the first center, then k-means++ `choice(n, p=d²/Σd²)`
    per remaining center (uniform re-draw on a zero total) — Lloyd with
    argmin labels, empty clusters keep their centroid, stop when
    prev − obj ≤ tol·|prev|.  Written here from that spec with no engine
    import, the same contract status as the modefilter/quenching RNG
    replays (SURVEY §7): a regression in the engine's trainer now shows up
    as an oracle mismatch instead of being silently shared."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    centers = [X[int(rng.integers(n))]]
    while len(centers) < k:
        cc = np.asarray(centers)
        d2 = np.min(((X[:, None, :] - cc[None, :, :]) ** 2).sum(-1), axis=1)
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[int(rng.integers(n))])
        else:
            centers.append(X[int(rng.choice(n, p=d2 / tot))])
    C = np.asarray(centers, dtype=float)
    prev = None
    for _ in range(maxiter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        labels = np.argmin(d2, axis=1)
        obj = d2[np.arange(n), labels].sum()
        for c in range(k):
            m = labels == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        if prev is not None and prev - obj <= tol * abs(prev):
            break
        prev = obj
    return C


def replay_ann_ivf_topk(vecs, k=5, n_centroids=8, nprobe=3, seed=7,
                        train_sample=2000, n_queries=16):
    """functions/ann.ivf_topk: seeded-hash sample order → k-means centroids
    (independent spec replay, `replay_kmeans_centroids`) → inverted lists
    (corpus: nearest list; queries: nprobe lists) → list equi-join
    candidates → exact re-rank."""
    order = sorted(vecs, key=lambda vid: spark_xxhash64(("long", vid), seed))
    X = np.stack([vecs[i] for i in order[:train_sample]]).astype(float)
    C = replay_kmeans_centroids(X, n_centroids, maxiter=20, seed=seed)

    ids = sorted(vecs)
    V = np.stack([vecs[i] for i in ids]).astype(float)
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)
    corpus_list = {i: int(idx[r, 0]) for r, i in enumerate(ids)}
    lists = defaultdict(list)
    for i, l in corpus_list.items():
        lists[l].append(i)
    cand = defaultdict(set)
    for r, i in enumerate(ids):
        if i >= n_queries:
            continue
        for l in idx[r, :nprobe]:
            for c in lists[int(l)]:
                if c != i:
                    cand[i].add(c)
    return _topk_rerank(cand, vecs, k)


# ---- inputs via DuckDB (identical derivations to __spark_entry__) ---------


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    li_grid = """
        SELECT (l_orderkey * 10 + l_linenumber)::BIGINT AS row_id,
               (l_partkey % 64)::INT AS i,
               (l_suppkey % 64)::INT AS j,
               l_returnflag AS flag
        FROM lineitem
    """
    g32 = con.execute(
        f"WITH g AS ({li_grid}) SELECT (i // 2)::INT AS i, (j // 2)::INT AS j, "
        "ARG_MIN(flag, row_id) AS flag FROM g GROUP BY 1, 2"
    ).fetchall()
    grid32 = {(i, j): flag for i, j, flag in g32}

    g16 = con.execute(
        f"WITH g AS ({li_grid}) SELECT (i // 4)::INT AS i, (j // 4)::INT AS j, "
        "ARG_MIN(flag, row_id) AS flag FROM g GROUP BY 1, 2"
    ).fetchall()
    grid16 = {(i, j): flag for i, j, flag in g16}

    cust = np.array(
        con.execute(
            "SELECT c_custkey::BIGINT, (c_custkey % 97)::DOUBLE, "
            "(c_custkey % 89)::DOUBLE, c_acctbal::DOUBLE FROM customer"
        ).fetchall(),
        dtype=float,
    )
    supp = con.execute(
        "SELECT s_suppkey::BIGINT, (s_suppkey % 97)::DOUBLE, "
        "(s_suppkey % 89)::DOUBLE FROM supplier"
    ).fetchall()

    mf = replay_modefilter(grid32, maxneighbors=8, seed=42)
    mp = replay_maxposterior(grid32, "gaussian", 2.0, maxneighbors=8)
    qu = replay_quenching(
        grid16, "spherical", 2.0, maxneighbors=26, tol=1e-2, maxiter=2, seed=42
    )
    kr = replay_kriging_neighbors(
        cust, [(int(s), x, y) for s, x, y in supp],
        "spherical", 30.0, 1.0, 0.01, k=8,
    )

    def grid_values_sql(g):
        rows = ", ".join(
            f"({i}, {j}, '{v}')" for (i, j), v in sorted(g.items())
        )
        return (
            "SELECT col0::INT AS i, col1::INT AS j, col2 AS flag "
            f"FROM (VALUES {rows})"
        )

    def round4(v):
        return Decimal(repr(v)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)

    kr_rows = ", ".join(
        f"({s}, {round4(v)})" for s, v in sorted(kr.items())
    )
    kr_sql = (
        "SELECT col0::BIGINT AS supp, col1::DOUBLE AS bal "
        f"FROM (VALUES {kr_rows})"
    )

    docs = con.execute(
        "SELECT doc_id::BIGINT, text, lang, source FROM documents ORDER BY doc_id"
    ).fetchall()
    doc_rows = [(d, t) for d, t, _, _ in docs]

    fp = replay_doc_fingerprint(doc_rows)
    fp_sql = (
        "SELECT col0::BIGINT AS doc_id, col1::BIGINT AS fingerprint FROM (VALUES "
        + ", ".join(f"({d}, {h})" for d, h in sorted(fp.items()))
        + ")"
    )

    hs = replay_hash_split(
        [d for d, *_ in docs], {"train": 0.9, "val": 0.05, "test": 0.05}, seed=7
    )
    hs_sql = (
        "SELECT col0::BIGINT AS doc_id, col1 AS split FROM (VALUES "
        + ", ".join(f"({d}, '{s}')" for d, s in sorted(hs.items()))
        + ")"
    )

    sp = replay_simhash_pairs(doc_rows, max_hamming=3)
    sp_sql = (
        "SELECT col0::BIGINT AS a, col1::BIGINT AS b, col2::INT AS hamming "
        "FROM (VALUES "
        + ", ".join(f"({a}, {b}, {d})" for a, b, d in sorted(sp))
        + ")"
    )

    def q(s):  # SQL string literal
        return "'" + s.replace("'", "''") + "'"

    survivors = replay_minhash_dedup(doc_rows, threshold=0.7)
    md_sql = (
        "SELECT col0::BIGINT AS doc_id, col1 AS lang, col2 AS source "
        "FROM (VALUES "
        + ", ".join(
            f"({d}, {q(lang)}, {q(src)})"
            for d, _, lang, src in docs if d in survivors
        )
        + ")"
    )

    cc_survivors = replay_minhash_dedup_cc(doc_rows, threshold=0.7)
    mdcc_sql = (
        "SELECT col0::BIGINT AS doc_id, col1 AS lang, col2 AS source "
        "FROM (VALUES "
        + ", ".join(
            f"({d}, {q(lang)}, {q(src)})"
            for d, _, lang, src in docs if d in cc_survivors
        )
        + ")"
    )

    def round6(v):
        return Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)

    def round5(v):
        return Decimal(repr(v)).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP)

    import pyarrow.parquet as pq

    et = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = {
        int(vid): np.asarray(emb, dtype=np.float32)
        for vid, emb in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }

    def ann_sql(rows):
        return (
            "SELECT col0::BIGINT AS q_id, col1::BIGINT AS c_id, "
            "col2::DOUBLE AS cosine FROM (VALUES "
            + ", ".join(f"({a}, {b}, {round5(c)})" for a, b, c in rows)
            + ")"
        )

    lsh = replay_ann_lsh_topk(vecs)
    ivf = replay_ann_ivf_topk(vecs)

    pot = replay_image_potrace(seed=42)
    pot_sql = (
        "SELECT col0 AS image_id, col1::INT AS m, col2::INT AS n_polys "
        "FROM (VALUES "
        + ", ".join(f"({q(i)}, {m}, {c})" for i, m, c in pot)
        + ")"
    )

    # clustering trio: deterministic end-to-end (GSC's k-means++ is seeded),
    # so integer labels admit literal oracles like the sequential filters
    slic_rows = [
        (int(r[0]), float(r[1]), float(r[2]), float(r[3])) for r in cust
    ]
    sl = replay_slic(slic_rows, k=8, m=1.0)
    sl_sql = (
        "SELECT col0::BIGINT AS row_id, col1::INT AS label FROM (VALUES "
        + ", ".join(f"({r}, {l})" for r, l in sorted(sl.items()))
        + ")"
    )

    supp4 = con.execute(
        "SELECT s_suppkey::BIGINT, (s_suppkey % 97)::DOUBLE, "
        "(s_suppkey % 89)::DOUBLE, s_acctbal::DOUBLE FROM supplier"
    ).fetchall()
    gh = replay_ghc(supp4, k=5, lam=10.0)
    gh_sql = (
        "SELECT col0::BIGINT AS row_id, col1::BIGINT AS label FROM (VALUES "
        + ", ".join(f"({r}, {l})" for r, l in sorted(gh.items()))
        + ")"
    )
    gs = replay_gsc(supp4, k=4, m=2.0)
    gs_sql = (
        "SELECT col0::BIGINT AS row_id, col1::BIGINT AS label FROM (VALUES "
        + ", ".join(f"({r}, {l})" for r, l in sorted(gs.items()))
        + ")"
    )

    ig = replay_image_gradient(200, seed=42)
    ig_sql = (
        "SELECT col0 AS image_id, col1::DOUBLE AS grad_mean, "
        "col2::DOUBLE AS grad_max FROM (VALUES "
        + ", ".join(f"({q(i)}, {round6(m)}, {round6(x)})" for i, m, x in ig)
        + ")"
    )

    rz = replay_image_resize(120, seed=42, out_w=20, out_h=14)
    rz_sql = (
        "SELECT col0 AS image_id, col1::DOUBLE AS mean_z FROM (VALUES "
        + ", ".join(f"({q(i)}, {round6(m)})" for i, m in rz)
        + ")"
    )

    ph = replay_image_phash_table(150, seed=42)
    ph_sql = (
        "SELECT col0 AS image_id, col1::BIGINT AS phash64 FROM (VALUES "
        + ", ".join(f"({q(i)}, {h})" for i, h in ph if i.startswith("img"))
        + ")"
    )
    # near-dup pairs enumerated IN SQL (brute-force cross join over the
    # replayed signatures), so the banded engine path is checked against the
    # unbanded definition, not against a python re-derivation of pairs
    nd_sql = (
        "WITH sigs(id, h) AS (VALUES "
        + ", ".join(f"({q(i)}, {h}::BIGINT)" for i, h in ph)
        + ") SELECT a.id AS a, b.id AS b, "
        "bit_count(xor(a.h, b.h))::INT AS hamming "
        "FROM sigs a JOIN sigs b ON a.id < b.id "
        "WHERE bit_count(xor(a.h, b.h)) <= 2"
    )

    vf = replay_video_frame_sample(50, every=3, seed=42)
    vf_sql = (
        "SELECT col0 AS video_id, col1::INT AS frame_idx, "
        "col2::DOUBLE AS frame_mean FROM (VALUES "
        + ", ".join(f"({q(v)}, {i}, {round6(m)})" for v, i, m in vf)
        + ")"
    )

    au = replay_audio_rms(80, window=512, seed=42)
    au_sql = (
        "SELECT col0 AS audio_id, col1::INT AS win_idx, col2::DOUBLE AS rms, "
        "col3::DOUBLE AS peak FROM (VALUES "
        + ", ".join(f"({q(a)}, {w}, {round6(r)}, {round6(p)})" for a, w, r, p in au)
        + ")"
    )

    body = (
        '"""Literal-table DuckDB oracles for the deterministic non-SQL queries,\n'
        "generated by scripts/gen_literal_oracles.py from INDEPENDENT numpy\n"
        "replays of the reference semantics over the sf0.01 driver tables.\n"
        'Regenerate after changing any of those query definitions."""\n\n'
        "LITERAL_ORACLES = {\n"
        f'    "modefilter": """{grid_values_sql(mf)}""",\n'
        f'    "maxposterior": """{grid_values_sql(mp)}""",\n'
        f'    "quenching": """{grid_values_sql(qu)}""",\n'
        f'    "kriging_neighbors": """{kr_sql}""",\n'
        f'    "doc_fingerprint": """{fp_sql}""",\n'
        f'    "hash_split": """{hs_sql}""",\n'
        f'    "simhash_pairs": """{sp_sql}""",\n'
        f'    "minhash_dedup": """{md_sql}""",\n'
        f'    "minhash_dedup_cc": """{mdcc_sql}""",\n'
        f'    "image_gradient": """{ig_sql}""",\n'
        f'    "ann_lsh_topk": """{ann_sql(lsh)}""",\n'
        f'    "ann_ivf_topk": """{ann_sql(ivf)}""",\n'
        f'    "image_potrace": """{pot_sql}""",\n'
        f'    "slic_clusters": """{sl_sql}""",\n'
        f'    "ghc_clusters": """{gh_sql}""",\n'
        f'    "gsc_clusters": """{gs_sql}""",\n'
        f'    "image_resize": """{rz_sql}""",\n'
        f'    "image_phash64": """{ph_sql}""",\n'
        f'    "image_neardup_e2e": """{nd_sql}""",\n'
        f'    "video_frame_sample": """{vf_sql}""",\n'
        f'    "audio_rms": """{au_sql}""",\n'
        "}\n"
    )
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: modefilter={len(mf)} maxposterior={len(mp)} "
          f"quenching={len(qu)} kriging={len(kr)} fingerprint={len(fp)} "
          f"hash_split={len(hs)} "
          f"simhash_pairs={len(sp)} minhash_survivors={len(survivors)} "
          f"minhash_cc_survivors={len(cc_survivors)} "
          f"image_gradient={len(ig)} ann_lsh={len(lsh)} ann_ivf={len(ivf)} potrace={len(pot)} "
          f"slic={len(sl)} ghc={len(gh)} gsc={len(gs)} "
          f"resize={len(rz)} video={len(vf)} audio={len(au)}")


if __name__ == "__main__":
    main()
