"""Matroska / WebM container — pure stdlib, public EBML + Matroska
specs (RFC 8794 EBML structure; the Matroska element registry /
RFC 9559).

Completes the container half of the video seam (functions/mp4.py did
ISO BMFF, functions/media.py did RIFF/AVI): WebM is Matroska with a
restricted codec set, and the container is public structured parsing:

- **encode_mkv_mjpeg**: JPEG frames -> a conformant Matroska file:
  EBML header (DocType matroska) + Segment(Info with TimestampScale,
  Tracks with one video TrackEntry carrying CodecID V_MJPEG +
  DefaultDuration, Clusters of SimpleBlocks). V_MJPEG is a registered
  Matroska codec id, so foreign players (ffmpeg/vlc) read our output.
- **mkv_info / mkv_iter_frames**: general demux — EBML vint
  ids/sizes (unknown-size elements supported for Segment/Cluster,
  which live muxers emit), video-track discovery by TrackType,
  SimpleBlock AND BlockGroup/Block paths, fixed-size and EBML lacing.
  Frame iteration skips other blocks' payload bytes (lazy, like the
  AVI/MP4 demuxers).

The seam after this is exactly the codec half: a V_VP8/V_VP9/V_AV1
(webm) or V_MPEG4/ISO/AVC track demuxes fine — codec id reported,
frame bytes extracted — but its bitstream decode raises
NotImplementedError. V_MJPEG tracks decode end-to-end via
functions/jpeg.py.

Reference analog: the reference streams images only
(weixin_public.py:315-321); video is this engine's beyond-reference
multimodal family (operators/multimodal.py), demuxing per-clip inside
Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import struct

import numpy as np

# Matroska element ids (RFC 9559 registry), with their EBML id bytes.
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_NATIVE_CODECS = {"V_MJPEG"}


# ------------------------------------------------------------- EBML write
def _id_bytes(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(value: int) -> bytes:
    """EBML data-size coding: length marker bit + value."""
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:  # all-ones is the unknown-size code
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + _vint_size(len(payload)) + payload


def _uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def encode_mkv_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90,
    frames_per_cluster: int = 16,
) -> bytes:
    """RGB frames -> Matroska with one V_MJPEG video track."""
    from . import jpeg as JPEG

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [JPEG.encode_jpeg(f, quality=quality) for f in frames]

    head = _elem(_EBML, b"".join([
        _uint(0x4286, 1),            # EBMLVersion
        _uint(0x42F7, 1),            # EBMLReadVersion
        _uint(0x42F2, 4),            # EBMLMaxIDLength
        _uint(0x42F3, 8),            # EBMLMaxSizeLength
        _elem(0x4282, b"matroska"),  # DocType
        _uint(0x4287, 4),            # DocTypeVersion
        _uint(0x4285, 2),            # DocTypeReadVersion
    ]))
    info = _elem(_INFO, _uint(_TIMESTAMP_SCALE, 1_000_000))  # 1 ms ticks
    track = _elem(_TRACKS, _elem(_TRACK_ENTRY, b"".join([
        _uint(_TRACK_NUMBER, 1),
        _uint(0x73C5, 1),            # TrackUID
        _uint(_TRACK_TYPE, 1),       # video
        _elem(_CODEC_ID, b"V_MJPEG"),
        _uint(_DEFAULT_DURATION, round(1e9 / fps)),
        _elem(_VIDEO, _uint(_PIXEL_W, w) + _uint(_PIXEL_H, h)),
    ])))

    clusters = b""
    for c0 in range(0, len(blobs), frames_per_cluster):
        base_ms = round(c0 * 1000 / fps)
        body = _uint(_CLUSTER_TS, base_ms)
        for i in range(c0, min(c0 + frames_per_cluster, len(blobs))):
            rel = round(i * 1000 / fps) - base_ms
            block = (b"\x81"                     # track 1 as vint
                     + struct.pack(">h", rel)    # relative timestamp
                     + b"\x80"                   # keyframe, no lacing
                     + blobs[i])
            body += _elem(_SIMPLE_BLOCK, block)
        clusters += _elem(_CLUSTER, body)

    return head + _elem(_SEGMENT, info + track + clusters)


# -------------------------------------------------------------- EBML read
def _read_id(data: bytes, pos: int) -> tuple[int, int]:
    first = data[pos]
    for n in range(1, 5):
        if first & (0x80 >> (n - 1)):
            return int.from_bytes(data[pos : pos + n], "big"), pos + n
    raise ValueError(f"EBML: invalid element id at {pos}")


def _read_size(data: bytes, pos: int) -> tuple[int | None, int]:
    """Returns (size, next_pos); size None = unknown-size element."""
    first = data[pos]
    for n in range(1, 9):
        if first & (0x80 >> (n - 1)):
            raw = int.from_bytes(data[pos : pos + n], "big")
            val = raw & ((1 << (7 * n)) - 1)
            if val == (1 << (7 * n)) - 1:
                return None, pos + n
            return val, pos + n
    raise ValueError(f"EBML: invalid size at {pos}")


# ids that TERMINATE an unknown-size element (RFC 8794 §6.2: it ends
# at the first id that is not a valid descendant — for Segment that is
# another Segment/EBML header; for Cluster, any other Segment child).
_SEGMENT_CHILDREN = {_INFO, _TRACKS, _CLUSTER, 0x114D9B74,  # SeekHead
                     0x1C53BB6B, 0x1254C367, 0x1043A770, 0x1941A469}
_UNKNOWN_STOPS = {
    _SEGMENT: {_SEGMENT, _EBML},
    _CLUSTER: _SEGMENT_CHILDREN | {_SEGMENT, _EBML},
}


def _iter_elems(data: bytes, start: int, end: int):
    """Yield (id, body_start, body_end). Unknown-size elements
    (Segment/Cluster from live muxers) end at the next id outside
    their allowed descendants, or the enclosing scope."""
    pos = start
    while pos < end:
        eid, p = _read_id(data, pos)
        size, p = _read_size(data, p)
        if size is None:
            stops = _UNKNOWN_STOPS.get(eid)
            if stops is None:
                raise ValueError(f"EBML: unknown-size element {eid:#x}")
            stop = end
            scan = p
            while scan < end:
                # candidate terminators all start with a 4-byte id
                # whose lead byte is 0x1A/0x18/0x1F/0x11/0x1C/0x12/0x10/0x19
                if data[scan] in (0x1A, 0x18, 0x1F, 0x11, 0x1C, 0x12, 0x10, 0x19):
                    try:
                        nid, _ = _read_id(data, scan)
                    except (ValueError, IndexError):
                        scan += 1
                        continue
                    if nid in stops and scan > p:
                        stop = scan
                        break
                scan += 1
            yield eid, p, stop
            pos = stop
        else:
            if p + size > end:
                raise ValueError(f"EBML: element at {pos} overruns scope")
            yield eid, p, p + size
            pos = p + size


def _uint_at(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _video_track(data: bytes):
    """(track_number, codec_id, default_duration_ns, segment bounds)."""
    seg = None
    for eid, b, e in _iter_elems(data, 0, len(data)):
        if eid == _SEGMENT:
            seg = (b, e)
            break
    if seg is None:
        raise ValueError("Matroska: no Segment")
    for eid, b, e in _iter_elems(data, *seg):
        if eid != _TRACKS:
            continue
        for tid, tb, te in _iter_elems(data, b, e):
            if tid != _TRACK_ENTRY:
                continue
            num = codec = dur = None
            ttype = 0
            for fid, fb, fe in _iter_elems(data, tb, te):
                if fid == _TRACK_NUMBER:
                    num = _uint_at(data, fb, fe)
                elif fid == _TRACK_TYPE:
                    ttype = _uint_at(data, fb, fe)
                elif fid == _CODEC_ID:
                    codec = data[fb:fe].decode("latin-1").rstrip("\x00")
                elif fid == _DEFAULT_DURATION:
                    dur = _uint_at(data, fb, fe)
            if ttype == 1 and num is not None:
                return num, codec or "", dur, seg
    raise ValueError("Matroska: no video track")


def _block_frames(data: bytes, b: int, e: int, want_track: int):
    """Frames inside one (Simple)Block: vint track, 2-byte timestamp,
    flags, then no lacing / fixed-size lacing / EBML lacing / Xiph."""
    first = data[b]
    n = next(k for k in range(1, 5) if first & (0x80 >> (k - 1)))
    track = int.from_bytes(data[b : b + n], "big") & ((1 << (7 * n)) - 1)
    p = b + n + 2  # skip relative timestamp
    flags = data[p]
    p += 1
    if track != want_track:
        return
    lacing = (flags >> 1) & 0b11
    if lacing == 0b00:
        yield data[p:e]
        return
    nframes = data[p] + 1
    p += 1
    if lacing == 0b10:  # fixed-size
        size = (e - p) // nframes
        for i in range(nframes):
            yield data[p + i * size : p + (i + 1) * size]
        return
    sizes = []
    if lacing == 0b01:  # Xiph: 255-run coded sizes for first n-1
        for _ in range(nframes - 1):
            s = 0
            while data[p] == 255:
                s += 255
                p += 1
            s += data[p]
            p += 1
            sizes.append(s)
    else:  # EBML lacing: first size is a vint, rest signed-vint deltas
        size, p = _read_size(data, p)
        sizes.append(size)
        for _ in range(nframes - 2):
            first = data[p]
            k = next(j for j in range(1, 9) if first & (0x80 >> (j - 1)))
            raw = int.from_bytes(data[p : p + k], "big") & ((1 << (7 * k)) - 1)
            delta = raw - ((1 << (7 * k - 1)) - 1)  # signed bias
            sizes.append(sizes[-1] + delta)
            p += k
    for s in sizes:
        yield data[p : p + s]
        p += s
    yield data[p:e]  # final frame takes the rest


def mkv_info(data: bytes) -> tuple[int, int, str]:
    """(n_frames, fps, codec_id) by walking block HEADERS only."""
    num, codec, dur, seg = _video_track(data)
    n = 0
    for eid, b, e in _iter_elems(data, *seg):
        if eid != _CLUSTER:
            continue
        for bid, bb, be in _iter_elems(data, b, e):
            if bid == _SIMPLE_BLOCK:
                n += sum(1 for _ in _block_frames(data, bb, be, num))
            elif bid == _BLOCK_GROUP:
                for gid, gb, ge in _iter_elems(data, bb, be):
                    if gid == _BLOCK:
                        n += sum(1 for _ in _block_frames(data, gb, ge, num))
    fps = round(1e9 / dur) if dur else 0
    return n, fps, codec


def mkv_iter_frames(data: bytes):
    """Yield (idx, frame_bytes) lazily across clusters and blocks."""
    num, codec, _dur, seg = _video_track(data)
    i = 0
    for eid, b, e in _iter_elems(data, *seg):
        if eid != _CLUSTER:
            continue
        for bid, bb, be in _iter_elems(data, b, e):
            blocks = ()
            if bid == _SIMPLE_BLOCK:
                blocks = _block_frames(data, bb, be, num)
            elif bid == _BLOCK_GROUP:
                blocks = (f for gid, gb, ge in _iter_elems(data, bb, be)
                          if gid == _BLOCK
                          for f in _block_frames(data, gb, ge, num))
            for frame in blocks:
                yield i, frame
                i += 1


def mkv_frame_decodable(data: bytes) -> None:
    """Fail-loud check that the track's codec is one this repo decodes
    natively (V_MJPEG); the container always demuxes."""
    codec = _video_track(data)[1]
    if codec not in _NATIVE_CODECS:
        raise NotImplementedError(
            f"Matroska/webm demuxes, but codec {codec!r} bitstream decode "
            "(vp8/vp9/av1/h264-class) requires an ffmpeg-class library; "
            "V_MJPEG tracks decode natively"
        )


def is_matroska(data: bytes) -> bool:
    return data[:4] == b"\x1aE\xdf\xa3"
