"""MP3 framing parser — pure stdlib, public ISO/IEC 11172-3 header
layout + the de-facto ID3v2 spec.

The container/framing half of the mp3 seam: PERCEPTUAL decode
(hybrid filterbank + Huffman spectral data) stays a codec library's
job (functions/media.decode_audio_standard), but the frame grammar is
public structured parsing, so duration/bitrate/sample-rate metadata
extracts natively — the same container-vs-codec split as
functions/mp4.py and functions/matroska.py on the video side.

- **mp3_info**: skips an ID3v2 tag (syncsafe size), syncs on the
  first 0xFFE frame header, then walks EVERY frame header (11172-3
  frame-length formula, padding bit, free-format rejected fail-loud)
  — never trusting a single header or a Xing estimate — and returns
  frame count, sample rate, duration, and the average bitrate
  (correct for VBR streams because it is measured, not declared).
  MPEG-1/2/2.5, Layers I/II/III.
- **aac_adts_info**: the same walk over AAC ADTS framing (ISO/IEC
  13818-7 §6.2 fixed+variable header: 0xFFF sync, profile, sampling
  index, 13-bit frame length, raw-block count, optional CRC) —
  frame/sample counts and duration without touching the spectral
  payload.
"""

from __future__ import annotations

# bitrate tables, kbps (ISO 11172-3 / 13818-3): [version][layer][index]
_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000), 25: (11025, 12000, 8000)}
# samples per frame: [version group][layer]
_SPF = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
        (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _id3v2_size(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("MP3: non-syncsafe ID3v2 size")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if data[5] & 0x10 else 0)  # footer flag


def _parse_header(h: int):
    """(version_key, version_group, layer, bitrate_kbps, rate, padding)
    or None if h is not a valid frame header."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 0b11
    version = {0b11: 1, 0b10: 2, 0b00: 25}.get(ver_bits)
    layer = {0b11: 1, 0b10: 2, 0b01: 3}.get((h >> 17) & 0b11)
    if version is None or layer is None:
        return None
    bidx = (h >> 12) & 0xF
    ridx = (h >> 10) & 0b11
    if bidx == 0xF or ridx == 0b11:
        return None
    vgroup = 1 if version == 1 else 2
    kbps = _BITRATES[(vgroup, layer)][bidx]
    rate = _RATES[version][ridx]
    return version, vgroup, layer, kbps, rate, (h >> 9) & 1


def _frame_len(vgroup: int, layer: int, kbps: int, rate: int, pad: int) -> int:
    if layer == 1:
        return (12 * kbps * 1000 // rate + pad) * 4
    per = 144 if (layer == 2 or vgroup == 1) else 72
    return per * kbps * 1000 // rate + pad


def mp3_info(data: bytes) -> dict:
    """Walk every frame header: {n_frames, sample_rate, duration_s,
    avg_bitrate_kbps, version, layer}. Fail-loud on free-format
    (bitrate index 0) and on garbage between frames."""
    pos = _id3v2_size(data)
    # resync: scan for the first valid header after the tag
    start = None
    for p in range(pos, min(len(data) - 4, pos + 65536)):
        h = int.from_bytes(data[p : p + 4], "big")
        parsed = _parse_header(h)
        if parsed:
            start = p
            first = parsed
            break
    if start is None:
        raise ValueError("MP3: no frame sync found")
    version, vgroup, layer, _, rate, _ = first
    spf = _SPF[(vgroup, layer)]
    n = 0
    bits = 0
    pos = start
    while pos + 4 <= len(data):
        parsed = _parse_header(int.from_bytes(data[pos : pos + 4], "big"))
        if parsed is None:
            # trailing ID3v1 tag is the one legal tail
            if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
                break
            raise ValueError(f"MP3: lost frame sync at byte {pos}")
        v, vg, ly, kbps, r, pad = parsed
        if (v, ly) != (version, layer):
            raise ValueError("MP3: version/layer changes mid-stream")
        if r != rate:
            # duration math assumes one clock for the whole stream
            raise ValueError("MP3: sample rate changes mid-stream")
        if kbps == 0:
            raise ValueError("MP3: free-format bitrate not supported")
        flen = _frame_len(vg, ly, kbps, r, pad)
        if flen <= 4:
            raise ValueError("MP3: degenerate frame length")
        if pos + flen > len(data):
            # mirror the ADTS walk: a header whose declared payload
            # runs past EOF is a truncated frame, not a counted one
            raise ValueError("MP3: truncated final frame")
        bits += kbps
        n += 1
        pos += flen
    if n == 0:
        raise ValueError("MP3: no complete frames")
    duration = n * spf / rate
    return {
        "n_frames": n,
        "sample_rate": rate,
        "duration_s": duration,
        "avg_bitrate_kbps": bits / n,
        "version": version,
        "layer": layer,
    }


# ------------------------------------------------------------- AAC ADTS
_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)


def aac_adts_info(data: bytes) -> dict:
    """Walk every ADTS frame header: {n_frames, n_samples, sample_rate,
    duration_s, profile, channels}. Fail-loud on desync."""
    pos = _id3v2_size(data)
    if pos + 7 > len(data):
        raise ValueError("ADTS: stream too short")
    n = samples = 0
    rate = profile = channels = None
    while pos + 7 <= len(data):
        h = data[pos : pos + 7]
        if h[0] != 0xFF or (h[1] & 0xF6) != 0xF0:  # sync + layer 00
            raise ValueError(f"ADTS: lost frame sync at byte {pos}")
        prof = (h[2] >> 6) + 1
        ridx = (h[2] >> 2) & 0xF
        if ridx >= len(_ADTS_RATES):
            raise ValueError(f"ADTS: reserved sampling index {ridx}")
        ch = ((h[2] & 1) << 2) | (h[3] >> 6)
        flen = ((h[3] & 0x03) << 11) | (h[4] << 3) | (h[5] >> 5)
        raw_blocks = (h[6] & 0x03) + 1
        min_len = 7 if (h[1] & 1) else 9  # protection_absent ? 7 : +CRC
        if flen < min_len:
            raise ValueError("ADTS: degenerate frame length")
        if rate is None:
            rate, profile, channels = _ADTS_RATES[ridx], prof, ch
        elif _ADTS_RATES[ridx] != rate:
            raise ValueError("ADTS: sample rate changes mid-stream")
        n += 1
        samples += 1024 * raw_blocks
        pos += flen
    if n == 0 or pos != len(data):
        raise ValueError("ADTS: truncated final frame")
    return {
        "n_frames": n,
        "n_samples": samples,
        "sample_rate": rate,
        "duration_s": samples / rate,
        "profile": profile,
        "channels": channels,
    }
