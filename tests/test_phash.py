"""Perceptual hash operator (operators/phash.py) tests: spec conformance,
transcode invariance (the planted-pair property image_neardup_e2e rests on),
banded-pairs ≡ brute force, and the zero-Exchange plan contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.images import make_image, synthetic_images
from geostatstransforms_jl_spark.core.media import transcode_images
from geostatstransforms_jl_spark.core.png import decode_image, encode_image
from geostatstransforms_jl_spark.operators.phash import (
    phash64_batch,
    phash64_single,
    phash_images,
)
from geostatstransforms_jl_spark.textops.dedup import hamming_neardup_pairs


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_deterministic_and_batch_equals_single():
    rng = np.random.default_rng(4)
    from geostatstransforms_jl_spark.core.media import resize_plane

    pix = [rng.integers(0, 256, (h, w), dtype=np.uint8)
           for h, w in ((16, 16), (33, 17), (64, 64))]
    singles = [phash64_single(p) for p in pix]
    assert singles == [phash64_single(p) for p in pix]
    planes = np.stack([resize_plane(p, 32, 32, "bilinear").astype(np.float64) for p in pix])
    np.testing.assert_array_equal(phash64_batch(planes), np.array(singles, dtype=np.int64))


def test_known_small_structure():
    # half-black/half-white vertical split: dominated by horizontal frequency
    # 1 — its phash must differ strongly from the transposed (vertical-split)
    # image, and each must equal its own recomputation
    a = np.zeros((32, 32), dtype=np.uint8)
    a[:, 16:] = 255
    b = a.T.copy()
    ha, hb = phash64_single(a), phash64_single(b)
    assert ha != hb and _ham(ha, hb) > 8


def test_transcode_invariance_and_discrimination():
    # jpeg quality-99 transcode moves <= 2 bits on the contract images;
    # unrelated images sit near 32
    for n in range(24):
        pix, w, h, fmt, data, _, _ = make_image(n)
        stored = decode_image(data, fmt)
        trans = decode_image(encode_image(stored, "jpeg"), "jpeg")
        assert _ham(phash64_single(stored), phash64_single(trans)) <= 2


def test_unrelated_images_far_apart():
    sigs = []
    for n in range(12):
        pix, w, h, fmt, data, _, _ = make_image(n)
        sigs.append(phash64_single(decode_image(data, fmt)))
    close = sum(
        1
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
        if _ham(sigs[i], sigs[j]) <= 2
    )
    assert close == 0


def test_rgb_grayscale_rule():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    gray = (
        (rgb[:, :, 0].astype(np.int64) + rgb[:, :, 1] + rgb[:, :, 2]) // 3
    ).astype(np.uint8)
    assert phash64_single(rgb) == phash64_single(gray)


def test_phash_images_matches_local_and_no_exchange(spark):
    imgs = synthetic_images(spark, 30, partitions=4)
    out = phash_images(imgs).collect()
    assert len(out) == 30
    got = {r.image_id: r.phash64 for r in out}
    for n in range(30):
        pix, w, h, fmt, data, _, _ = make_image(n)
        assert got[f"img{n:08d}"] == phash64_single(decode_image(data, fmt))
    plan = phash_images(imgs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_carry_columns_pass_through(spark):
    imgs = synthetic_images(spark, 6, partitions=2)
    out = phash_images(imgs, carry=("w", "caption")).collect()
    ref = {r.image_id: (r.w, r.caption) for r in imgs.select("image_id", "w", "caption").collect()}
    for r in out:
        assert (r.w, r.caption) == ref[r.image_id]
    # 'fmt' is an input column AND a legal carry — must not duplicate labels
    out = phash_images(imgs, carry=("fmt",)).collect()
    assert {r.fmt for r in out} == {"png", "jpeg"}
    with pytest.raises(ValueError, match="collides"):
        phash_images(imgs, carry=("w",), out_col="w")


def test_banded_pairs_equal_brute_force(spark):
    imgs = synthetic_images(spark, 40, partitions=4)
    both = imgs.unionByName(transcode_images(imgs, "jpeg", id_prefix="cp"))
    sigs = phash_images(both)
    pairs = {
        (r.a, r.b): r.hamming
        for r in hamming_neardup_pairs(
            sigs, sig_col="phash64", id_col="image_id", max_hamming=2,
            max_bucket_size=None,
        ).collect()
    }
    local = {r.image_id: r.phash64 for r in sigs.collect()}
    ids = sorted(local)
    brute = {
        (a, b): _ham(local[a], local[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _ham(local[a], local[b]) <= 2
    }
    assert pairs == brute
    # every original pairs with its transcode at <= 2 bits in this fixture
    planted = {k for k in brute if k[0] == "cp" + k[1] or k[1] == "cp" + k[0]}
    assert len(planted) >= 36


def test_transcode_images_contract(spark):
    imgs = synthetic_images(spark, 9, partitions=2)
    out = transcode_images(imgs, "jpeg", id_prefix="cp").collect()
    assert all(r.fmt == "jpeg" and r.image_id.startswith("cpimg") for r in out)
    assert all(bytes(r.bytes)[:2] == b"\xff\xd8" for r in out)
    with pytest.raises(ValueError):
        transcode_images(imgs, "webp")
