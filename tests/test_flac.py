"""FLAC codec tests: lossless round-trips (the defining invariant),
checksum fail-loudness, and decoder-only paths the encoder never emits
(LPC subframes, multi-partition residuals, stereo decorrelation modes)
constructed bit-by-bit from RFC 9639."""

import hashlib
import struct

import numpy as np
import pytest

import python_crawler_spark.functions.flac as FLAC
import python_crawler_spark.functions.media as MED


def _sine(n=12_000, rate=16_000, f=440.0, amp=9000):
    t = np.arange(n) / rate
    return np.round(amp * np.sin(2 * np.pi * f * t)).astype(np.int16)


def test_roundtrip_mono_is_bit_exact():
    pcm = _sine()
    blob = FLAC.encode_flac(pcm, 16_000)
    assert blob[:4] == b"fLaC"
    rate, out = FLAC.decode_flac(blob)
    assert rate == 16_000
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, pcm)


def test_roundtrip_stereo_and_partial_last_block():
    rng = np.random.default_rng(7)
    # 2.5 blocks -> exercises the 16-bit-blocksize last-frame header
    left = _sine(10_240, f=330.0)
    right = (rng.integers(-500, 500, 10_240) + left // 2).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    rate, out = FLAC.decode_flac(FLAC.encode_flac(pcm, 44_100))
    assert rate == 44_100
    np.testing.assert_array_equal(out, pcm)


def test_roundtrip_hard_signals():
    """Constant, silence, white noise (Rice-hostile -> escape/verbatim
    paths), single full-scale impulses."""
    cases = [
        np.zeros(5000, np.int16),
        np.full(5000, -1234, np.int16),
        np.random.default_rng(0).integers(-32768, 32768, 9000).astype(np.int16),
        np.concatenate([np.zeros(4095, np.int16), [np.int16(32767)],
                        np.zeros(4096, np.int16), [np.int16(-32768)]]),
    ]
    for pcm in cases:
        _, out = FLAC.decode_flac(FLAC.encode_flac(pcm, 8000))
        np.testing.assert_array_equal(out, pcm)


def test_nonstandard_rate_defers_to_streaminfo():
    pcm = _sine(5000)
    rate, out = FLAC.decode_flac(FLAC.encode_flac(pcm, 11_025))
    assert rate == 11_025
    np.testing.assert_array_equal(out, pcm)


def test_corruption_fails_loud():
    blob = bytearray(FLAC.encode_flac(_sine(6000), 16_000))
    # flip a bit deep in the entropy-coded frame body
    blob[len(blob) - 40] ^= 0x10
    with pytest.raises(ValueError):
        FLAC.decode_flac(bytes(blob))


def test_md5_mismatch_fails_loud():
    blob = bytearray(FLAC.encode_flac(_sine(6000), 16_000))
    # STREAMINFO MD5 lives at bytes 8+18 .. 8+34
    blob[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        FLAC.decode_flac(bytes(blob))


def _manual_frame(subframe_bits, ch=1, bs=None, chan_code=None, rate=16000):
    """Assemble one conformant frame around hand-written subframe bit
    payload(s), then wrap it in a minimal fLaC stream."""
    n = bs
    bw = FLAC._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)                    # 16-bit blocksize-1 follows
    bw.write(5, 4)                    # 16 kHz
    bw.write(chan_code if chan_code is not None else ch - 1, 4)
    bw.write(4, 3)                    # 16-bit samples
    bw.write(0, 1)
    bw.write(0, 8)                    # frame number 0
    bw.write(n - 1, 16)
    bw.align()
    head = bw.bytes()
    body = FLAC._BitWriter()
    for write_one in subframe_bits:
        write_one(body)
    body.align()
    frame = head + bytes([FLAC.crc8(head)]) + body.bytes()
    frame += struct.pack(">H", FLAC.crc16(frame))

    nch = 2 if (chan_code or 0) >= 8 else ch
    info = FLAC._BitWriter()
    info.write(n, 16), info.write(n, 16)
    info.write(0, 24), info.write(0, 24)
    info.write(rate, 20), info.write(nch - 1, 3), info.write(15, 5)
    info.write(n, 36)
    streaminfo = info.bytes() + b"\x00" * 16  # MD5 unset -> skip verify
    return b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo + frame


def test_decodes_foreign_lpc_subframe():
    """LPC subframe the encoder never emits: order-2 predictor
    x[i] = r[i] + (c0*x[i-1] + c1*x[i-2]) >> shift."""
    n, shift, c0, c1 = 64, 4, 30, -14
    rng = np.random.default_rng(3)
    x = np.zeros(n, np.int64)
    x[0], x[1] = 100, 103
    res = rng.integers(-40, 40, n)
    for i in range(2, n):
        x[i] = res[i] + ((c0 * x[i - 1] + c1 * x[i - 2]) >> shift)
    assert np.abs(x).max() < 32768

    def subframe(bw):
        bw.write(0, 1)
        bw.write(0b100001, 6)         # LPC, order 2
        bw.write(0, 1)                # no wasted bits
        bw.write(int(x[0]), 16), bw.write(int(x[1]), 16)
        bw.write(14, 4)               # precision-1 -> 15-bit coefs
        bw.write(shift, 5)
        bw.write(c0, 15), bw.write(c1, 15)
        FLAC._write_residual(bw, res[2:], 16)

    rate, out = FLAC.decode_flac(_manual_frame([subframe], bs=n))
    np.testing.assert_array_equal(out.astype(np.int64), x)


def test_decodes_multi_partition_residual():
    """Partition order 2 (4 partitions, distinct Rice params) on a
    FIXED order-1 subframe."""
    n = 64
    x = np.cumsum(np.tile([3, -2, 5, -1], n // 4)).astype(np.int64) + 50
    res = np.diff(x)

    def subframe(bw):
        bw.write(0, 1)
        bw.write(0b001001, 6)         # FIXED order 1
        bw.write(0, 1)
        bw.write(int(x[0]), 16)
        bw.write(0b00, 2)             # 4-bit Rice params
        bw.write(2, 4)                # partition order 2
        per = n >> 2
        u = FLAC._zigzag(res)
        filled = 0
        for part in range(4):
            count = per - (1 if part == 0 else 0)
            p = 3 + part              # different param per partition
            bw.write(p, 4)
            for q in u[filled : filled + count].tolist():
                bw.write_unary(int(q) >> p)
                bw.write(int(q), p)
            filled += count

    rate, out = FLAC.decode_flac(_manual_frame([subframe], bs=n))
    np.testing.assert_array_equal(out.astype(np.int64), x)


def test_decodes_stereo_decorrelation_modes():
    """left/side (8), right/side (9), mid/side (10) — side carries the
    extra bit; verbatim subframes keep the construction transparent."""
    n = 16
    left = np.array([100, -5, 32767, -32768] * 4, np.int64)
    right = np.array([90, 5, 32760, -32700] * 4, np.int64)
    side = left - right
    mid = (left + right) >> 1

    def verbatim(vals, bits):
        def w(bw):
            bw.write(0, 1), bw.write(0b000001, 6), bw.write(0, 1)
            for v in vals.tolist():
                bw.write(int(v), bits)
        return w

    for code, subs in [
        (8, [verbatim(left, 16), verbatim(side, 17)]),
        (9, [verbatim(side, 17), verbatim(right, 16)]),
        (10, [verbatim(mid, 16), verbatim(side, 17)]),
    ]:
        rate, out = FLAC.decode_flac(_manual_frame(subs, bs=n, chan_code=code))
        np.testing.assert_array_equal(out[:, 0].astype(np.int64), left)
        np.testing.assert_array_equal(out[:, 1].astype(np.int64), right)


def test_md5_matches_reference_layout():
    """STREAMINFO MD5 is over little-endian interleaved samples —
    pin the layout so foreign decoders agree."""
    pcm = _sine(3000)
    blob = FLAC.encode_flac(pcm, 16_000)
    md5 = blob[8 + 18 : 8 + 34]
    assert md5 == hashlib.md5(pcm.astype("<i2").tobytes()).digest()


# ------------------------------------------------- media.py dispatch


def test_decode_audio_dispatches_flac():
    pcm = _sine(8000)
    blob = FLAC.encode_flac(pcm, 16_000)
    rate, out = MED.decode_audio(blob)
    assert rate == 16_000
    np.testing.assert_array_equal(out, pcm)
    feats = MED.audio_features(blob)
    wav_feats = MED.audio_features(MED.encode_wav(pcm, 16_000))
    assert feats == wav_feats  # lossless -> identical feature vector


def test_flac_stereo_downmix_through_media():
    left, right = _sine(4000, f=200.0), _sine(4000, f=350.0)
    blob = FLAC.encode_flac(np.stack([left, right], axis=1), 16_000)
    rate, mono = MED.decode_audio(blob)
    expect = np.stack([left, right], 1).astype(np.float64).mean(1)
    np.testing.assert_array_equal(
        mono, np.clip(np.round(expect), -32768, 32767).astype(np.int16)
    )


def test_perceptual_codecs_still_raise():
    with pytest.raises(NotImplementedError, match="mp3/aac"):
        MED.decode_audio(b"ID3\x04" + b"\x00" * 16)


def test_frame_region_byte_flips_always_raise():
    """Every byte of the frame region is covered by CRC-8/CRC-16 (a
    single-byte flip is a burst <= 8 bits, always detected) or by the
    MD5 over the decoded samples — corruption can never decode
    silently wrong."""
    pcm = _sine(9000)
    blob = FLAC.encode_flac(pcm, 16_000)
    frames_start = 8 + 34  # magic + header + STREAMINFO
    rng = np.random.default_rng(11)
    for _ in range(40):
        i = int(rng.integers(frames_start, len(blob)))
        delta = int(rng.integers(1, 256))
        bad = bytearray(blob)
        bad[i] ^= delta
        with pytest.raises(ValueError):
            FLAC.decode_flac(bytes(bad))
