"""Baseline JPEG codec (functions/jpeg.py) — pure-numpy T.81.

The encoder and decoder are exercised on paths the OTHER side does not
share (4:2:0 subsampling, restart intervals, grayscale files, foreign
marker layouts), so a mirrored encode/decode bug cannot silently pass:
every structural claim (marker layout, standard tables, zigzag
storage) is asserted against the public spec's byte layout directly.
"""

from __future__ import annotations

import numpy as np
import pytest

from python_crawler_spark.functions import images as IMG
from python_crawler_spark.functions import jpeg as J


def _noise(h, w, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def _smooth(h, w):
    gx = np.linspace(0, 255, w)
    gy = np.linspace(255, 0, h)
    return np.stack(np.meshgrid(gx, gy) + [np.full((h, w), 90.0)], axis=-1).astype(np.uint8)


# ------------------------------------------------------------ roundtrip


def test_q100_noise_psnr_holds_input_hint():
    """quality=100 -> all-ones quant tables; even random noise (the
    hardest DCT content) stays above the 40 dB pipeline invariant."""
    for seed in (1, 2, 3):
        px = _noise(40, 30, seed)
        w, h, fmt, dec = J.decode_jpeg(J.encode_jpeg(px, 100))
        assert (w, h, fmt) == (30, 40, "jpeg")
        assert IMG.psnr(px, dec) >= 40.0


def test_quality_ladder_monotonic():
    """Lower quality -> smaller files and (on smooth content) lower
    PSNR; every rung stays a decodable, consistent image."""
    px = _smooth(64, 64)
    sizes, psnrs = [], []
    for q in (50, 75, 90, 100):
        blob = J.encode_jpeg(px, q)
        _, _, _, dec = J.decode_jpeg(blob)
        sizes.append(len(blob))
        psnrs.append(IMG.psnr(px, dec))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)
    assert psnrs[0] >= 30.0  # q50 on a smooth gradient is still clean


def test_odd_dimensions_crop():
    """Non-multiple-of-8 frames pad on encode and crop on decode."""
    px = _noise(13, 27)
    for sub in ("444", "420"):
        w, h, _, dec = J.decode_jpeg(J.encode_jpeg(px, 100, sub))
        assert (w, h) == (27, 13)
        assert dec.shape == (13, 27, 3)


def test_420_subsampling_decodes():
    """4:2:0 exercises the decoder's general MCU path (4 Y blocks +
    Cb + Cr per 16x16 MCU, chroma upsampling). Grayscale content is
    chroma-flat, so 4:2:0 loses nothing beyond the Y path there."""
    y = np.random.RandomState(3).randint(0, 256, (21, 33)).astype(np.uint8)
    px = np.repeat(y[:, :, None], 3, axis=2)
    w, h, _, dec = J.decode_jpeg(J.encode_jpeg(px, 100, "420"))
    assert (w, h) == (33, 21)
    assert IMG.psnr(px, dec) >= 40.0
    # colored smooth content survives with sensible fidelity
    px2 = _smooth(32, 48)
    _, _, _, dec2 = J.decode_jpeg(J.encode_jpeg(px2, 95, "420"))
    assert IMG.psnr(px2, dec2) >= 28.0


def test_restart_intervals_identical():
    """DRI/RSTn segmentation must not change decoded pixels (predictor
    resets are exactly compensated)."""
    px = _noise(48, 56, 11)
    base = J.decode_jpeg(J.encode_jpeg(px, 100))[3]
    for ri in (1, 3, 7):
        dec = J.decode_jpeg(J.encode_jpeg(px, 100, restart_interval=ri))[3]
        assert np.array_equal(dec, base)
    dec420 = J.decode_jpeg(J.encode_jpeg(px, 90, "420", restart_interval=2))[3]
    assert np.array_equal(dec420, J.decode_jpeg(J.encode_jpeg(px, 90, "420"))[3])


def test_grayscale_single_component():
    """1-component files decode through the grayscale branch and
    replicate to the pipeline's RGB schema."""
    g = np.random.RandomState(5).randint(0, 256, (17, 26)).astype(np.uint8)
    w, h, fmt, dec = J.decode_jpeg(J.encode_jpeg_gray(g, 100))
    assert (w, h, fmt) == (26, 17, "jpeg")
    assert dec.shape == (17, 26, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert IMG.psnr(np.repeat(g[:, :, None], 3, axis=2), dec) >= 40.0


# ----------------------------------------------------- spec conformance


def test_marker_layout_and_standard_tables():
    """Byte-level conformance facts a mirrored codec bug cannot fake:
    SOI/EOI framing, JFIF APP0, zigzag-order DQT storage, Annex-K
    Huffman table bytes, SOF0 frame header fields."""
    px = _noise(16, 24)
    blob = J.encode_jpeg(px, 75)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    # DQT stores values in zigzag order: element 0 is the DC step,
    # element 1 the (0,1) step, element 2 the (1,0) step (T.81 B.2.4.1)
    i = blob.index(b"\xff\xdb")
    qlum, _ = J.quality_tables(75)
    stored = blob[i + 5 : i + 5 + 64]
    assert stored[0] == qlum[0, 0]
    assert stored[1] == qlum[0, 1]
    assert stored[2] == qlum[1, 0]
    # DHT carries the Annex-K BITS/HUFFVAL verbatim
    j = blob.index(b"\xff\xc4")
    assert blob[j + 5 : j + 21] == bytes(J.DC_LUM_BITS)
    # SOF0: precision 8, height, width, 3 components
    k = blob.index(b"\xff\xc0")
    assert blob[k + 4] == 8
    assert int.from_bytes(blob[k + 5 : k + 7], "big") == 16
    assert int.from_bytes(blob[k + 7 : k + 9], "big") == 24
    assert blob[k + 9] == 3


def test_byte_stuffing():
    """Every 0xFF inside the entropy segment must be followed by 0x00
    or a RST marker (T.81 F.1.2.3) — scan the whole stream."""
    px = _noise(32, 32, 13)
    blob = J.encode_jpeg(px, 100, restart_interval=2)
    sos = blob.index(b"\xff\xda")
    body_start = sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big")
    i = body_start
    while i < len(blob) - 2:
        if blob[i] == 0xFF:
            nxt = blob[i + 1]
            assert nxt == 0x00 or 0xD0 <= nxt <= 0xD9, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_dqt_16bit_precision_decodes():
    """Foreign files may carry 16-bit quant tables (Pq=1); the decoder
    must honor them. Rewrite our 8-bit DQT segments as 16-bit."""
    px = _noise(16, 16, 17)
    blob = bytearray(J.encode_jpeg(px, 100))
    out = bytearray()
    i = 0
    while i < len(blob):
        if blob[i] == 0xFF and blob[i + 1] == 0xDB:
            ln = int.from_bytes(blob[i + 2 : i + 4], "big")
            tid = blob[i + 4]
            vals = blob[i + 5 : i + 5 + 64]
            body = bytes([0x10 | tid]) + b"".join(
                int(v).to_bytes(2, "big") for v in vals
            )
            out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
            i += 2 + ln
        else:
            out.append(blob[i])
            i += 1
    dec8 = J.decode_jpeg(bytes(blob))[3]
    dec16 = J.decode_jpeg(bytes(out))[3]
    assert np.array_equal(dec8, dec16)


# ----------------------------------------------------------- error edges


def test_sof2_retag_decodes_via_generic_path():
    """Progressive (SOF2) no longer raises (round 5,
    functions/jpeg_progressive.py). A baseline stream retagged SOF2 is
    a spec bend (a progressive DC scan may not span Se=63), but the
    generic multi-scan path decodes it tolerantly — and identically."""
    px = _noise(16, 16)
    base = J.decode_jpeg(J.encode_jpeg(px, 100))[3]
    blob = bytearray(J.encode_jpeg(px, 100))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert np.array_equal(J.decode_jpeg(bytes(blob))[3], base)


def test_arithmetic_coding_raises():
    px = _noise(16, 16)
    blob = bytearray(J.encode_jpeg(px, 100))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC9  # SOF9: arithmetic sequential — out of scope
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_jpeg(bytes(blob))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_truncated_raises():
    px = _noise(16, 16)
    blob = J.encode_jpeg(px, 100)
    sos = blob.index(b"\xff\xda")
    with pytest.raises(ValueError, match="no SOS"):
        J.decode_jpeg(blob[:sos])


# ------------------------------------------------------ pipeline wiring


def test_images_dispatch_real_jpeg():
    """encode_image(fmt='jpeg') now emits real JFIF bytes; the decode
    dispatch routes them through decode_jpeg; legacy PCS1 lossy blobs
    (pre-round-4 snapshots) still decode."""
    px = _noise(24, 18, 23)
    blob = IMG.encode_image(px, "jpeg")
    assert blob[:3] == b"\xff\xd8\xff"
    w, h, fmt, dec = IMG.decode_image(blob)
    assert (w, h, fmt) == (18, 24, "jpeg")
    assert IMG.psnr(px, dec) >= 40.0
    legacy = IMG.encode_pcs1_lossy(px)
    w2, h2, fmt2, dec2 = IMG.decode_image(legacy)
    assert (w2, h2, fmt2) == (18, 24, "jpeg")
    assert IMG.psnr(px, dec2) >= 40.0
