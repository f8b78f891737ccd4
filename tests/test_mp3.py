"""MP3 framing-parser tests: synthetic conformant streams (the frame
grammar is public 11172-3 math; payload bytes are irrelevant to
framing), ID3v2/ID3v1 tags, VBR averaging, and fail-loud desync."""

import numpy as np
import pytest

import python_crawler_spark.functions.mp3 as MP3


def _frame(kbps=128, rate_idx=0, pad=0, version=0b11, layer=0b01):
    """One MPEG frame: 4-byte header + filler payload of the exact
    frame length."""
    bidx = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
            128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}[kbps]
    h = (0x7FF << 21) | (version << 19) | (layer << 17) | (1 << 16)
    h |= (bidx << 12) | (rate_idx << 10) | (pad << 9)
    rate = (44100, 48000, 32000)[rate_idx]
    flen = 144 * kbps * 1000 // rate + pad
    return h.to_bytes(4, "big") + b"\xAA" * (flen - 4)


def _id3v2(payload_size=200):
    size = payload_size
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x04\x00\x00" + ss + b"\x00" * size


def test_cbr_stream_with_tags():
    data = _id3v2() + _frame() * 38 + b"TAG" + b"\x00" * 125
    info = MP3.mp3_info(data)
    assert info["n_frames"] == 38
    assert info["sample_rate"] == 44100
    assert info["avg_bitrate_kbps"] == 128
    assert info["duration_s"] == pytest.approx(38 * 1152 / 44100)
    assert (info["version"], info["layer"]) == (1, 3)


def test_vbr_average_is_measured_not_declared():
    data = _frame(kbps=64) * 10 + _frame(kbps=320) * 10
    info = MP3.mp3_info(data)
    assert info["n_frames"] == 20
    assert info["avg_bitrate_kbps"] == pytest.approx(192.0)


def test_padding_bit_changes_frame_length():
    data = _frame(pad=1) * 5 + _frame(pad=0) * 5
    assert MP3.mp3_info(data)["n_frames"] == 10


def test_mpeg2_layer3():
    # version bits 0b10 = MPEG-2: 576 samples/frame, 72-slot formula
    h = (0x7FF << 21) | (0b10 << 19) | (0b01 << 17) | (1 << 16)
    h |= (4 << 12) | (0 << 10)  # 32 kbps, 22050 Hz
    flen = 72 * 32 * 1000 // 22050
    frame = h.to_bytes(4, "big") + b"\xBB" * (flen - 4)
    info = MP3.mp3_info(frame * 8)
    assert info["n_frames"] == 8
    assert info["sample_rate"] == 22050
    assert info["duration_s"] == pytest.approx(8 * 576 / 22050)


def test_desync_fails_loud():
    data = _frame() * 3 + b"\x00garbage-that-is-not-a-frame" * 4
    with pytest.raises(ValueError, match="lost frame sync"):
        MP3.mp3_info(data)


def test_free_format_fails_loud():
    h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) | (0 << 12)
    with pytest.raises(ValueError, match="free-format|no frame sync|no complete"):
        MP3.mp3_info(h.to_bytes(4, "big") + b"\x00" * 400)


def test_no_sync_fails_loud():
    with pytest.raises(ValueError, match="no frame sync"):
        MP3.mp3_info(b"\x00" * 1000)


def test_truncated_final_frame_fails_loud():
    # same contract as the ADTS walk: a header whose declared payload
    # runs past EOF is an error, never a counted frame
    with pytest.raises(ValueError, match="truncated final frame"):
        MP3.mp3_info(_frame() * 5 + _frame()[:-20])


def test_rate_change_mid_stream_fails_loud():
    with pytest.raises(ValueError, match="sample rate changes"):
        MP3.mp3_info(_frame(rate_idx=0) * 3 + _frame(rate_idx=1) * 3)


# ---------------------------------------------------------- AAC ADTS


def _adts_frame(payload=100, ridx=8, profile=1, ch=2, raw_blocks=1, crc=False):
    hdr_len = 9 if crc else 7
    flen = hdr_len + payload
    h = bytearray(hdr_len)
    h[0] = 0xFF
    h[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    h[2] = ((profile - 1) << 6) | (ridx << 2) | ((ch >> 2) & 1)
    h[3] = ((ch & 3) << 6) | ((flen >> 11) & 3)
    h[4] = (flen >> 3) & 0xFF
    h[5] = ((flen & 7) << 5) | 0x1F
    h[6] = 0xFC | (raw_blocks - 1)
    return bytes(h) + b"\xCC" * payload


def test_adts_walk():
    data = _adts_frame() * 43
    info = MP3.aac_adts_info(data)
    assert info["n_frames"] == 43
    assert info["sample_rate"] == 16000
    assert info["n_samples"] == 43 * 1024
    assert info["duration_s"] == pytest.approx(43 * 1024 / 16000)
    assert (info["profile"], info["channels"]) == (1, 2)


def test_adts_with_crc_and_multi_raw_blocks():
    data = _adts_frame(crc=True) * 3 + _adts_frame(raw_blocks=2) * 2
    info = MP3.aac_adts_info(data)
    assert info["n_frames"] == 5
    assert info["n_samples"] == 3 * 1024 + 2 * 2048


def test_adts_desync_fails_loud():
    with pytest.raises(ValueError, match="lost frame sync"):
        MP3.aac_adts_info(_adts_frame() + b"\x00" * 50)
    with pytest.raises(ValueError, match="truncated"):
        MP3.aac_adts_info(_adts_frame()[:-3])
