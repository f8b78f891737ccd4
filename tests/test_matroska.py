"""Matroska/WebM demux tests: V_MJPEG round-trip, foreign layouts
(BlockGroup, unknown-size Segment/Cluster, all three lacing modes),
lazy iteration, and the codec-half seam (V_VP9 demuxes but refuses
bitstream decode)."""

import struct

import numpy as np
import pytest

import python_crawler_spark.functions.images as IMG
import python_crawler_spark.functions.matroska as MKV
import python_crawler_spark.functions.media as MED


def _frames(n=6, h=40, w=56, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : (i + 1) * 6] = (30 * i) % 255
        out.append(f)
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_mjpeg():
    frames = _frames()
    blob = MKV.encode_mkv_mjpeg(frames, fps=25, quality=100)
    assert MKV.is_matroska(blob)
    n, fps, codec = MKV.mkv_info(blob)
    assert (n, fps, codec) == (6, 25, "V_MJPEG")
    for i, fb in MKV.mkv_iter_frames(blob):
        assert _psnr(IMG.decode_image(fb)[3], frames[i]) >= 40.0


def test_multi_cluster():
    frames = _frames(10)
    blob = MKV.encode_mkv_mjpeg(frames, fps=10, quality=100, frames_per_cluster=3)
    n, fps, _ = MKV.mkv_info(blob)
    assert (n, fps) == (10, 10)
    seen = [i for i, _ in MKV.mkv_iter_frames(blob)]
    assert seen == list(range(10))


def _wrap_segment(track_payload: bytes, clusters: bytes) -> bytes:
    head = MKV._elem(MKV._EBML, b"".join([
        MKV._uint(0x4286, 1), MKV._uint(0x42F7, 1),
        MKV._elem(0x4282, b"matroska"),
        MKV._uint(0x4287, 4), MKV._uint(0x4285, 2),
    ]))
    info = MKV._elem(MKV._INFO, MKV._uint(MKV._TIMESTAMP_SCALE, 1_000_000))
    return head + MKV._elem(MKV._SEGMENT, info + track_payload + clusters)


def _video_track_elem(codec=b"V_MJPEG", track=2):
    return MKV._elem(MKV._TRACKS, MKV._elem(MKV._TRACK_ENTRY, b"".join([
        MKV._uint(MKV._TRACK_NUMBER, track),
        MKV._uint(MKV._TRACK_TYPE, 1),
        MKV._elem(MKV._CODEC_ID, codec),
        MKV._uint(MKV._DEFAULT_DURATION, 40_000_000),  # 25 fps
    ])))


def test_blockgroup_and_nondefault_track_number():
    """Foreign shape: frames in BlockGroup/Block (not SimpleBlock),
    video on track 2, plus a non-video track-1 block to be skipped."""
    frames = _frames(3)
    import python_crawler_spark.functions.jpeg as JPEG
    blobs = [JPEG.encode_jpeg(f, quality=100) for f in frames]

    body = MKV._uint(MKV._CLUSTER_TS, 0)
    body += MKV._elem(MKV._SIMPLE_BLOCK, b"\x81" + struct.pack(">h", 0) + b"\x80" + b"AUDIOJUNK")
    for i, b in enumerate(blobs):
        block = b"\x82" + struct.pack(">h", i * 40) + b"\x00" + b
        body += MKV._elem(MKV._BLOCK_GROUP, MKV._elem(MKV._BLOCK, block))
    blob = _wrap_segment(_video_track_elem(track=2), MKV._elem(MKV._CLUSTER, body))

    n, fps, codec = MKV.mkv_info(blob)
    assert (n, fps, codec) == (3, 25, "V_MJPEG")
    for i, fb in MKV.mkv_iter_frames(blob):
        assert _psnr(IMG.decode_image(fb)[3], frames[i]) >= 40.0


def test_lacing_modes():
    """Fixed-size, Xiph, and EBML lacing inside one SimpleBlock."""
    payloads = [b"A" * 7, b"B" * 7, b"C" * 7]

    def block_with(lacing_flags, lace_header, payload):
        return (b"\x81" + struct.pack(">h", 0)
                + bytes([lacing_flags]) + lace_header + payload)

    # fixed-size lacing (flags 0b100): count-1 then equal frames
    fixed = block_with(0x04, bytes([2]), b"".join(payloads))
    # Xiph (0b010): count-1, then sizes 7,7 (each < 255)
    xiph = block_with(0x02, bytes([2, 7, 7]), b"".join(payloads))
    # EBML (0b110): count-1, first size vint(7), delta svint(0)
    ebml = block_with(0x06, bytes([2]) + MKV._vint_size(7) + bytes([0xBF]),
                      b"".join(payloads))
    # 0xBF = 1-byte svint raw 0x3F -> 0x3F - 0x3F = delta 0

    for lace in (fixed, xiph, ebml):
        blob = _wrap_segment(
            _video_track_elem(track=1),
            MKV._elem(MKV._CLUSTER,
                      MKV._uint(MKV._CLUSTER_TS, 0)
                      + MKV._elem(MKV._SIMPLE_BLOCK, lace)))
        got = [f for _, f in MKV.mkv_iter_frames(blob)]
        assert got == payloads, got


def test_unknown_size_segment_and_cluster():
    """Live muxers emit unknown-size Segment/Cluster (all-ones vint);
    the walker must bound them at the next sibling id / EOF."""
    frames = _frames(2)
    blob = bytearray(MKV.encode_mkv_mjpeg(frames, fps=25, quality=100))
    # rewrite Segment's size to the 1-byte unknown marker 0xFF and keep
    # the payload bytes: must re-emit the whole file since vint width
    # changes -> rebuild manually instead
    import python_crawler_spark.functions.jpeg as JPEG
    blobs = [JPEG.encode_jpeg(f, quality=100) for f in frames]
    head = MKV._elem(MKV._EBML, MKV._elem(0x4282, b"matroska"))
    info = MKV._elem(MKV._INFO, MKV._uint(MKV._TIMESTAMP_SCALE, 1_000_000))
    track = _video_track_elem(track=1)
    cbody = MKV._uint(MKV._CLUSTER_TS, 0)
    for i, b in enumerate(blobs):
        cbody += MKV._elem(MKV._SIMPLE_BLOCK,
                           b"\x81" + struct.pack(">h", i * 40) + b"\x80" + b)
    cluster = MKV._id_bytes(MKV._CLUSTER) + b"\xff" + cbody  # unknown size
    seg = MKV._id_bytes(MKV._SEGMENT) + b"\xff" + info + track + cluster
    out = head + seg
    n, fps, codec = MKV.mkv_info(out)
    assert (n, codec) == (2, "V_MJPEG")
    for i, fb in MKV.mkv_iter_frames(out):
        assert _psnr(IMG.decode_image(fb)[3], frames[i]) >= 40.0


def test_vp9_demuxes_but_codec_decode_raises():
    fake_vp9 = [b"\x9fVP9FRAME" * 4, b"\x9fVP9FRAME" * 3]
    body = MKV._uint(MKV._CLUSTER_TS, 0)
    for i, b in enumerate(fake_vp9):
        body += MKV._elem(MKV._SIMPLE_BLOCK,
                          b"\x81" + struct.pack(">h", i * 40) + b"\x80" + b)
    blob = _wrap_segment(_video_track_elem(codec=b"V_VP9", track=1),
                         MKV._elem(MKV._CLUSTER, body))
    n, fps, codec = MKV.mkv_info(blob)
    assert (n, codec) == (2, "V_VP9")
    assert [f for _, f in MKV.mkv_iter_frames(blob)] == fake_vp9
    with pytest.raises(NotImplementedError, match="vp8/vp9"):
        MKV.mkv_frame_decodable(blob)


# ------------------------------------------------- media.py dispatch


def test_video_info_and_iter_frames_dispatch_mkv():
    frames = _frames(4)
    blob = MKV.encode_mkv_mjpeg(frames, fps=20, quality=100)
    assert MED.video_info(blob) == (4, 20)
    for i, fb in MED.iter_frames(blob):
        assert _psnr(IMG.decode_image(fb)[3], frames[i]) >= 40.0


def test_unknown_container_still_raises():
    with pytest.raises(NotImplementedError, match="unrecognized"):
        MED.video_info(b"FLV\x01" + b"\x00" * 32)


def test_corruption_never_crashes_unstructured():
    """Same crash-safety contract as the MP4 fuzz: random single-byte
    corruption either demuxes or raises a structured error."""
    blob = MKV.encode_mkv_mjpeg(_frames(5), fps=25, quality=90)
    rng = np.random.default_rng(17)
    for _ in range(60):
        i = int(rng.integers(0, len(blob)))
        bad = bytearray(blob)
        bad[i] ^= int(rng.integers(1, 256))
        try:
            MKV.mkv_info(bytes(bad))
            for _idx, _f in MKV.mkv_iter_frames(bytes(bad)):
                pass
        except (ValueError, NotImplementedError):
            pass
