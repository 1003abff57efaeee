"""Baseline JFIF codec (core/jpeg.py) tests.

The load-bearing pin is codec ≡ documented lossy spec, BIT-FOR-BIT: encode→
decode must equal the 15-line DCT-quantization spec (level-shift → blockwise
float64 DCT-II → round(÷Q) → ×Q → IDCT → round+clip).  Because the spec has
no entropy coding at all, equality transitively proves the Huffman/bitstream
layer round-trips every quantized coefficient — the same independence
argument the oracle generator relies on (scripts/gen_literal_oracles.py:
_jpeg_spec_stored_pixels).

Decoder-only features our encoder never emits (restart intervals, 4:2:2 /
4:2:0 chroma subsampling) are exercised through hand-assembled streams built
from the module's block/Huffman primitives.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geostatstransforms_jl_spark.core import jpeg as J
from geostatstransforms_jl_spark.core.png import decode_image, encode_image


# ---- independent spec replays ------------------------------------------------


def spec_gray(pix: np.ndarray, quality: int = J.DEFAULT_QUALITY) -> np.ndarray:
    ql, _ = J.quant_tables(quality)
    h, w = pix.shape
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pix.astype(np.float64), ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    quant = np.round((J.DCT_MAT @ (blocks - 128.0) @ J.DCT_MAT.T) / ql)
    spatial = J.DCT_MAT.T @ (quant * ql) @ J.DCT_MAT + 128.0
    full = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return np.clip(np.round(full[:h, :w]), 0, 255).astype(np.uint8)


def spec_rgb(arr: np.ndarray, quality: int = J.DEFAULT_QUALITY) -> np.ndarray:
    ql, qc = J.quant_tables(quality)
    y, cb, cr = J._rgb_to_ycbcr(arr)
    h, w = arr.shape[:2]
    planes = []
    for plane, qt in ((y, ql), (cb, qc), (cr, qc)):
        by, bx = (h + 7) // 8, (w + 7) // 8
        padded = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
        blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        quant = np.round((J.DCT_MAT @ (blocks - 128.0) @ J.DCT_MAT.T) / qt)
        spatial = J.DCT_MAT.T @ (quant * qt) @ J.DCT_MAT + 128.0
        planes.append(
            spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)[:h, :w]
        )
    rgb = J._ycbcr_to_rgb(*planes)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---- codec ≡ spec, bit for bit -----------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.sampled_from([30, 50, 75, 90, 99]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_roundtrip_equals_spec(h, w, quality, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(pix, quality))
    assert dec.shape == (h, w) and dec.dtype == np.uint8
    np.testing.assert_array_equal(dec, spec_gray(pix, quality))


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    quality=st.sampled_from([50, 90, 99]),
    seed=st.integers(0, 2**31 - 1),
)
def test_rgb_roundtrip_equals_spec(h, w, quality, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(arr, quality))
    assert dec.shape == (h, w, 3)
    np.testing.assert_array_equal(dec, spec_rgb(arr, quality))


def test_structured_images_all_shapes():
    # the synthetic contract's smooth+noise fields at every SIZES shape,
    # including flat / gradient / checkerboard degenerate content
    rng = np.random.default_rng(0)
    cases = [
        np.zeros((16, 16), dtype=np.uint8),
        np.full((32, 16), 255, dtype=np.uint8),
        (np.add.outer(np.arange(64), np.arange(32)) % 256).astype(np.uint8),
        ((np.indices((17, 23)).sum(0) % 2) * 255).astype(np.uint8),
        rng.integers(0, 256, (64, 64), dtype=np.uint8),
    ]
    for pix in cases:
        np.testing.assert_array_equal(J.jpeg_decode(J.jpeg_encode(pix)), spec_gray(pix))


def test_deterministic_bytes():
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    assert J.jpeg_encode(pix) == J.jpeg_encode(pix.copy())
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert J.jpeg_encode(arr) == J.jpeg_encode(arr.copy())


# ---- PSNR contract -----------------------------------------------------------


def test_default_quality_meets_psnr_contract_worst_shapes():
    # the input contract's lossy tolerance is PSNR ≥ 40 dB; the adversarial
    # worst case is tiny full-noise RGB (2×2×3).  DEFAULT_QUALITY is pinned
    # so even that clears 40 dB (jpeg.py DEFAULT_QUALITY note).
    rng = np.random.default_rng(11)
    worst = np.inf
    for shape in ((2, 2, 3), (3, 5, 3), (2, 2), (8, 8)):
        for _ in range(300):
            x = rng.integers(0, 256, shape, dtype=np.uint8)
            d = J.jpeg_decode(J.jpeg_encode(x))
            mse = np.mean((d.astype(np.float64) - x) ** 2)
            if mse > 0:
                worst = min(worst, 10 * np.log10(255.0**2 / mse))
    assert worst >= 40.0, worst


# ---- decoder-only features -----------------------------------------------------


def _assemble(ncomp, h, w, samp, scan, ql, qc, dri=0):
    """Hand-assembled JFIF headers around a pre-built entropy segment —
    independent of jpeg_encode's header writer."""
    out = [b"\xff\xd8"]
    dqt = bytes([0]) + bytes(ql.reshape(64)[J.ZIGZAG].astype(np.uint8))
    if ncomp == 3:
        dqt += bytes([1]) + bytes(qc.reshape(64)[J.ZIGZAG].astype(np.uint8))
    out.append(b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt)
    if dri:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, dri))
    comps = b""
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        comps += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + comps
    out.append(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    dht = J._dht_payload(0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS) + J._dht_payload(
        1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS
    )
    if ncomp == 3:
        dht += J._dht_payload(0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS) + J._dht_payload(
            1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS
        )
    out.append(b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    out.append(scan)
    out.append(b"\xff\xd9")
    return b"".join(out)


def test_restart_interval_stream_decodes():
    # grayscale 32×8 = 4 MCUs, DRI=2 → RST0 between MCU 1 and 2.  Re-encode
    # the two halves independently (DC predictor resets at a restart) and
    # splice with an RST marker.
    rng = np.random.default_rng(5)
    pix = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    ql, qc = J.quant_tables(90)
    blocks, by, bx = J._to_blocks(pix.astype(np.float64))
    quant = J._fdct_quant(blocks, ql)
    c0, n0, _ = J._encode_plane_symbols(quant[:2], 0)
    c1, n1, _ = J._encode_plane_symbols(quant[2:], 0)
    scan = J._pack_bits(c0, n0) + b"\xff\xd0" + J._pack_bits(c1, n1)
    data = _assemble(1, 8, 32, [(1, 1)], scan, ql, qc, dri=2)
    dec = J.jpeg_decode(data)
    np.testing.assert_array_equal(dec, spec_gray(pix, 90))


def test_chroma_subsampled_stream_decodes():
    # 4:2:0: Y at full res (2×2 blocks per MCU), Cb/Cr at half res.  Chroma
    # planes constant → subsampling is exact; Y carries real detail.
    rng = np.random.default_rng(9)
    h = w = 16  # one MCU
    y_plane = rng.integers(40, 216, (h, w)).astype(np.float64)
    cb = np.full((8, 8), 100.0)
    cr = np.full((8, 8), 160.0)
    ql, qc = J.quant_tables(99)
    yb, _, _ = J._to_blocks(y_plane)
    # MCU block order for h=v=2: the 2×2 Y blocks row-major, then Cb, Cr
    yq = J._fdct_quant(yb, ql)
    cbq = J._fdct_quant(J._to_blocks(cb)[0], qc)
    crq = J._fdct_quant(J._to_blocks(cr)[0], qc)
    cy, ny, _ = J._encode_plane_symbols(yq, 0)
    ccb, ncb, _ = J._encode_plane_symbols(cbq, 1)
    ccr, ncr, _ = J._encode_plane_symbols(crq, 1)
    scan = J._pack_bits(
        np.concatenate([cy, ccb, ccr]), np.concatenate([ny, ncb, ncr])
    )
    data = _assemble(3, h, w, [(2, 2), (1, 1), (1, 1)], scan, ql, qc)
    dec = J.jpeg_decode(data)
    assert dec.shape == (16, 16, 3)
    # expected: per-plane spec round-trip, chroma upsampled 2×, then YCbCr→RGB
    ysp = J._dequant_idct(yq, ql)
    ydec = J._from_blocks(ysp, 2, 2, 16, 16)
    cbdec = np.repeat(np.repeat(J._dequant_idct(cbq, qc)[0], 2, 0), 2, 1)
    crdec = np.repeat(np.repeat(J._dequant_idct(crq, qc)[0], 2, 0), 2, 1)
    ref = np.clip(np.round(J._ycbcr_to_rgb(ydec, cbdec, crdec)), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(dec, ref)


# ---- error paths ---------------------------------------------------------------


def test_progressive_raises_with_marker_name():
    rng = np.random.default_rng(2)
    data = bytearray(J.jpeg_encode(rng.integers(0, 256, (8, 8), dtype=np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="0xFFC2"):
        J.jpeg_decode(bytes(data))


def test_truncated_stream_raises_valueerror_not_indexerror():
    rng = np.random.default_rng(17)
    data = J.jpeg_encode(rng.integers(0, 256, (32, 32), dtype=np.uint8))
    # cut the entropy segment in half (keep headers + some scan bytes)
    sos = data.find(b"\xff\xda")
    cut = data[: sos + (len(data) - sos) // 2]
    with pytest.raises(ValueError):
        J.jpeg_decode(cut)


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: 0xFF fill bytes may pad any marker; inject some before
    # DQT and SOS and the stream must still decode identically
    rng = np.random.default_rng(18)
    pix = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    data = J.jpeg_encode(pix)
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xda", 1
    )
    np.testing.assert_array_equal(J.jpeg_decode(padded), J.jpeg_decode(data))


def test_single_component_scan_ignores_sampling_factors():
    # T.81 A.2.2: a non-interleaved scan uses MCU = one data unit and plain
    # row-major ceil(dim/8) geometry even when SOF declares h=v=2
    rng = np.random.default_rng(19)
    pix = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    ql, qc = J.quant_tables(90)
    blocks, by, bx = J._to_blocks(pix.astype(np.float64))
    codes, nbits, _ = J._encode_plane_symbols(J._fdct_quant(blocks, ql), 0)
    scan = J._pack_bits(codes, nbits)
    data = _assemble(1, 24, 24, [(2, 2)], scan, ql, qc)  # declares 2x2!
    np.testing.assert_array_equal(J.jpeg_decode(data), spec_gray(pix, 90))


def test_multi_scan_stream_raises_notimplemented():
    # a 3-component SOF whose first SOS covers only component 1 must fail
    # loudly, not KeyError on the missing Huffman assignment
    rng = np.random.default_rng(20)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(J.jpeg_encode(arr))
    i = data.find(b"\xff\xda")
    ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
    one_comp_sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    data = bytes(data[:i]) + one_comp_sos + bytes(data[i + 2 + ln :])
    with pytest.raises(NotImplementedError, match="multi-scan"):
        J.jpeg_decode(data)


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        J.quant_tables(0)


# ---- integration with the image-table contract ---------------------------------


def test_encode_image_jpeg_emits_real_jfif_and_decodes():
    rng = np.random.default_rng(21)
    pix = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    data = encode_image(pix, "jpeg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_image(data, "jpeg")
    np.testing.assert_array_equal(dec, spec_gray(pix))
    # and the pre-r5 stand-in (PNG container under fmt='jpeg') still loads
    legacy = encode_image(pix, "png")
    np.testing.assert_array_equal(decode_image(legacy, "jpeg"), pix)


def test_oracle_spec_replay_matches_codec():
    # the oracle generator's in-file replay must track the codec's stored
    # pixels exactly (independence boundary: it re-derives the spec, so this
    # is a real cross-check, not a tautology)
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "gen_literal_oracles.py"
    spec = importlib.util.spec_from_file_location("gen_literal_oracles", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.default_rng(13)
    for shape in ((16, 16), (32, 64), (17, 23)):
        pix = rng.integers(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(
            J.jpeg_decode(J.jpeg_encode(pix)), mod._jpeg_spec_stored_pixels(pix)
        )
