"""MP4 / ISO BMFF container — pure stdlib, public ISO/IEC 14496-12 spec.

Narrows the video seam: rounds 1-4 documented "mp4/h264/webm" as one
library-class blob. The CONTAINER half is public structured parsing
(the ISO base media file format box grammar), implemented here from
scratch:

- **encode_mp4_mjpeg**: JPEG frames (functions/jpeg.py) -> a
  conformant fragmentless MP4: ftyp + mdat (samples) + moov
  (mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/vmhd/dinf/stbl with a 'jpeg'
  VisualSampleEntry, stts/stsc/stsz/stco sample tables). Motion-JPEG
  in MP4 is a registered, widely-decodable coding (ISO 14496-12 +
  the QuickTime/MP4RA 'jpeg' entry), so foreign players read our
  output.
- **mp4_info / mp4_iter_samples**: general demux — box walker
  (64-bit largesize supported), video-track discovery via hdlr,
  timescale/duration from mdhd+stts, and the full
  stsc -> stco/co64 -> stsz chunk-run expansion, so samples are
  located for ANY fragmentless MP4 layout (multi-chunk, co64),
  not just this encoder's single-chunk output. Sampling N of F
  frames reads the sample tables, never the other F-N samples'
  bytes (lazy, like the AVI demuxer).

What remains a seam after this is exactly the CODEC half: an
avc1/hev1/vp09 track demuxes fine (codec fourcc reported, sample
bytes extracted) but its bitstream decode raises NotImplementedError
— inter-frame DCT/CABAC decode is ffmpeg's job. 'jpeg'-coded tracks
decode end-to-end via functions/jpeg.py.

Reference analog: the reference streams images only
(weixin_public.py:315-321); video is part of this engine's
beyond-reference multimodal family (operators/multimodal.py), where
per-clip demux runs inside Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import struct

import numpy as np

_MJPEG_FOURCCS = {b"jpeg", b"mjpa", b"mjpb", b"MJPG"}


# ------------------------------------------------------------ box writer
def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90,
    samples_per_chunk: int = 0,
) -> bytes:
    """RGB frames -> MP4 with one motion-JPEG video track.
    samples_per_chunk=0 puts all samples in one chunk (the compact
    layout); a positive value splits mdat into chunk runs, exercising
    the general stsc mapping foreign muxers produce."""
    from . import jpeg as JPEG

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [JPEG.encode_jpeg(f, quality=quality) for f in frames]
    n = len(blobs)
    spc = samples_per_chunk if samples_per_chunk > 0 else n

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(blobs)
    mdat_off = len(ftyp)  # file offset of the mdat box itself

    # chunk offsets point at each chunk's first sample inside mdat
    chunk_offsets = []
    pos = mdat_off + 8
    for i in range(0, n, spc):
        chunk_offsets.append(pos)
        pos += sum(len(b) for b in blobs[i : i + spc])

    duration = n  # mdhd timescale = fps -> duration in ticks = frames
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, fps, duration
    ) + struct.pack(">iH", 0x10000, 0x100) + b"\x00" * 10 + _MATRIX
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration
    ) + b"\x00" * 12 + struct.pack(">HH", 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, fps, duration, 0x55C4, 0
    ))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")

    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # data_ref_index
             + b"\x00" * 16
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x480000, 0x480000)    # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)        # frame_count
             + bytes([10]) + b"Motion-JPG".ljust(31, b"\x00")
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc_entries = [(1, spc, 1)]
    if n % spc and n > spc:
        # final short chunk gets its own run
        stsc_entries.append((len(chunk_offsets), n % spc, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                 + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(b)) for b in blobs))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                 + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


# ------------------------------------------------------------ box reader
def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) over a box sequence
    (ISO 14496-12 §4.2: 32-bit size, size==1 -> 64-bit largesize,
    size==0 -> to end of enclosing scope)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"MP4: bad box size at offset {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    for fourcc, b, e in _iter_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return b, e
            return _find(data, b, e, *path[1:])
    raise ValueError(f"MP4: missing box {b'/'.join(path).decode()}")


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _video_track(data: bytes) -> tuple[int, int]:
    """(body_start, body_end) of the first trak whose hdlr is 'vide'."""
    moov_b, moov_e = _find(data, 0, len(data), b"moov")
    for fourcc, b, e in _iter_boxes(data, moov_b, moov_e):
        if fourcc != b"trak":
            continue
        try:
            hb, _ = _find(data, b, e, b"mdia", b"hdlr")
        except ValueError:
            continue
        if data[hb + 8 : hb + 12] == b"vide":
            return b, e
    raise ValueError("MP4: no video track")


def _parse_stbl(data: bytes, trak_b: int, trak_e: int):
    stbl_b, stbl_e = _find(data, trak_b, trak_e, b"mdia", b"minf", b"stbl")
    boxes = {f: (b, e) for f, b, e in _iter_boxes(data, stbl_b, stbl_e)}
    for need in (b"stsd", b"stts", b"stsz", b"stsc"):
        if need not in boxes:
            raise ValueError(f"MP4: missing {need.decode()} box")

    sb, _ = boxes[b"stsd"]
    codec = data[sb + 12 : sb + 16]  # first sample entry's fourcc

    tb, te = boxes[b"stts"]
    n_entries = struct.unpack(">I", data[tb + 4 : tb + 8])[0]
    stts = [struct.unpack(">II", data[tb + 8 + 8 * i : tb + 16 + 8 * i])
            for i in range(n_entries)]
    n_samples = sum(c for c, _ in stts)

    zb, _ = boxes[b"stsz"]
    fixed, count = struct.unpack(">II", data[zb + 4 : zb + 12])
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack(f">{count}I", data[zb + 12 : zb + 12 + 4 * count]))

    cb, _ = boxes[b"stsc"]
    n_runs = struct.unpack(">I", data[cb + 4 : cb + 8])[0]
    stsc = [struct.unpack(">III", data[cb + 8 + 12 * i : cb + 20 + 12 * i])
            for i in range(n_runs)]

    if b"stco" in boxes:
        ob, _ = boxes[b"stco"]
        n_ch = struct.unpack(">I", data[ob + 4 : ob + 8])[0]
        offsets = list(struct.unpack(f">{n_ch}I", data[ob + 8 : ob + 8 + 4 * n_ch]))
    elif b"co64" in boxes:
        ob, _ = boxes[b"co64"]
        n_ch = struct.unpack(">I", data[ob + 4 : ob + 8])[0]
        offsets = list(struct.unpack(f">{n_ch}Q", data[ob + 8 : ob + 8 + 8 * n_ch]))
    else:
        raise ValueError("MP4: missing stco/co64")
    return codec, n_samples, sizes, stsc, offsets


def _sample_offsets(sizes, stsc, chunk_offsets):
    """Expand stsc chunk runs (first_chunk, samples_per_chunk, _) into
    one absolute file offset per sample (ISO 14496-12 §8.7.4)."""
    out = []
    n_chunks = len(chunk_offsets)
    si = 0
    for run_idx, (first, per, _sd) in enumerate(stsc):
        last = (stsc[run_idx + 1][0] - 1) if run_idx + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            pos = chunk_offsets[chunk - 1]
            for _ in range(per):
                if si >= len(sizes):
                    return out
                out.append(pos)
                pos += sizes[si]
                si += 1
    return out


def mp4_info(data: bytes) -> tuple[int, int, str]:
    """(n_frames, fps, codec_fourcc) from the sample tables alone."""
    trak_b, trak_e = _video_track(data)
    mb, _ = _find(data, trak_b, trak_e, b"mdia", b"mdhd")
    version = data[mb]
    if version == 1:
        timescale = struct.unpack(">I", data[mb + 20 : mb + 24])[0]
    else:
        timescale = struct.unpack(">I", data[mb + 12 : mb + 16])[0]
    codec, n, _sizes, _stsc, _off = _parse_stbl(data, trak_b, trak_e)
    tb = _find(data, trak_b, trak_e, b"mdia", b"minf", b"stbl", b"stts")[0]
    n_entries = struct.unpack(">I", data[tb + 4 : tb + 8])[0]
    total_ticks = sum(
        c * d for c, d in (struct.unpack(">II", data[tb + 8 + 8 * i : tb + 16 + 8 * i])
                           for i in range(n_entries))
    )
    fps = round(n * timescale / total_ticks) if total_ticks else 0
    return n, fps, codec.decode("latin-1")


def mp4_iter_samples(data: bytes):
    """Yield (idx, sample_bytes) lazily; reading sample k touches the
    sample tables + that sample's byte range only."""
    trak_b, trak_e = _video_track(data)
    codec, n, sizes, stsc, chunks = _parse_stbl(data, trak_b, trak_e)
    offs = _sample_offsets(sizes, stsc, chunks)
    if len(offs) < n:
        raise ValueError("MP4: sample tables inconsistent (stsc runs short)")
    for i in range(n):
        yield i, data[offs[i] : offs[i] + sizes[i]]


def mp4_frame_decodable(data: bytes) -> None:
    """Fail-loud check that the video track's coding is one this repo
    decodes natively (motion-JPEG); the container always demuxes."""
    trak_b, trak_e = _video_track(data)
    codec = _parse_stbl(data, trak_b, trak_e)[0]
    if codec not in _MJPEG_FOURCCS:
        raise NotImplementedError(
            f"MP4 demuxes, but codec {codec.decode('latin-1')!r} bitstream "
            "decode (h264/hevc/vp9-class) requires an ffmpeg-class library; "
            "'jpeg'-coded tracks decode natively"
        )
